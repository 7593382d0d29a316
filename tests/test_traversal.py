"""PredictionDegree attribute traversal (wire TraversalType=1): the
reference declares the enum variant but ships no sequencer
(shared/connectivity/edgebreaker/mod.rs:59-88, flagged dead_code); ours is
a working opt-in. Round-trips, coverage property, wire rejection, strict
mode, CLI."""

import os

import numpy as np
import pytest

REF_DATA = "/root/reference/draco-oxide/tests/data"
FIXTURES = ["tetrahedron.obj", "sphere.obj", "torus.obj", "cube_quads.obj",
            "punctured_sphere.obj"]
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted")


@needs_ref
@pytest.mark.parametrize("name", FIXTURES)
def test_prediction_degree_roundtrip(name):
    """Every attribute decodes to the same per-point values as the
    depth-first stream (different traversal, same mesh)."""
    from tpudraco.decode import decode
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj

    mesh = load_obj(os.path.join(REF_DATA, name))
    base = decode(encode(mesh))
    blob = encode(mesh, cfg=Config(attribute_traversal="prediction-degree"))
    got = decode(blob)
    assert len(got.attributes) == len(base.attributes)
    for ga, ba in zip(got.attributes, base.attributes):
        assert np.array_equal(ga.values_per_point(), ba.values_per_point())


@needs_ref
def test_prediction_degree_covers_same_vertices():
    """The PD sequence is a complete vertex visit: same length and same
    visited-vertex set as depth-first, one corner per new vertex."""
    from tpudraco.encode.connectivity import EdgebreakerEncoder
    from tpudraco.io import load_obj
    from tpudraco.models.corner_table import TableView
    from tpudraco.shared.sequencer import (
        compute_sequence, compute_sequence_prediction_degree,
    )
    from tpudraco.wire.byte_io import ByteWriter

    mesh = load_obj(os.path.join(REF_DATA, "torus.obj"))
    eb = EdgebreakerEncoder(mesh.faces, mesh.attributes)
    conn = eb.encode(ByteWriter())
    view = TableView(conn.corner_table.corner_table, None)
    seeds = list(conn.corners_of_edgebreaker)
    df = compute_sequence(view, list(seeds))
    pd = compute_sequence_prediction_degree(view, list(seeds))
    assert len(pd) == len(df)
    df_verts = {view.vertex(c) for c in df}
    pd_verts = {view.vertex(c) for c in pd}
    assert pd_verts == df_verts
    assert len(pd_verts) == len(pd)  # one corner per newly visited vertex
    assert pd != df  # it is actually a different order on this mesh


@needs_ref
def test_unknown_traversal_byte_rejected():
    """A stream carrying an undefined TraversalType must fail loudly, not
    silently sequence depth-first (TraversalType::read_from rejects too,
    mod.rs:67-77)."""
    from tpudraco.decode import decode
    from tpudraco.decode.connectivity import DecodeError
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj

    mesh = load_obj(os.path.join(REF_DATA, "torus.obj"))
    df = encode(mesh)
    pd = encode(mesh, cfg=Config(attribute_traversal="prediction-degree"))
    # the streams are byte-identical up to the per-attribute traversal
    # byte (header + connectivity + att count + dec_id + domain precede
    # it), so the first difference locates it exactly
    k = next(i for i, (a, b) in enumerate(zip(df, pd)) if a != b)
    assert df[k] == 0 and pd[k] == 1
    bad = bytearray(df)
    bad[k] = 7
    with pytest.raises((DecodeError, ValueError)):
        decode(bytes(bad))


def test_invalid_traversal_config_rejected():
    from tpudraco.encode import Config, encode
    from tpudraco.models import AttributeType, MeshBuilder
    from tpudraco.models.attribute import AttributeDomain

    b = MeshBuilder()
    b.set_connectivity_attribute(np.array([[0, 1, 2]], dtype=np.int64))
    b.add_attribute(np.eye(3, dtype=np.float32), AttributeType.POSITION,
                    AttributeDomain.POSITION)
    mesh = b.build()
    with pytest.raises(ValueError, match="attribute_traversal"):
        encode(mesh, cfg=Config(attribute_traversal="bogus"))


@needs_ref
def test_strict_rejects_prediction_degree():
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj

    mesh = load_obj(os.path.join(REF_DATA, "torus.obj"))
    cfg = Config(attribute_traversal="prediction-degree", strict=True)
    with pytest.raises(ValueError, match="prediction-degree"):
        encode(mesh, cfg=cfg)


@needs_ref
def test_cli_traversal_order_flag(tmp_path):
    from tpudraco.tools.cli import main

    drc = tmp_path / "torus.drc"
    obj = tmp_path / "torus.obj"
    assert main(["-i", os.path.join(REF_DATA, "torus.obj"), "-o", str(drc),
                 "--traversal-order", "prediction-degree"]) == 0
    assert main(["-i", str(drc), "-o", str(obj)]) == 0
    assert obj.stat().st_size > 0


@needs_ref
def test_prediction_degree_with_batch_encoder_host_plane():
    """BatchEncoder(cfg=) honors the traversal on the host grouped plane
    (cached depth-first sequences must not leak into PD streams)."""
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.parallel.batch import BatchEncoder

    mesh = load_obj(os.path.join(REF_DATA, "sphere.obj"))
    cfg = Config(attribute_traversal="prediction-degree")
    be = BatchEncoder(use_device=False, cfg=cfg)
    blobs = be.encode_meshes([mesh, mesh])
    want = encode(mesh, cfg=cfg)
    assert blobs[0] == want and blobs[1] == want
