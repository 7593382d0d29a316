"""Predictive edgebreaker (EdgebreakerKind=1): the reference declares the
enum variant with no semantics or code (shared/connectivity/edgebreaker/
mod.rs:20-53); this dialect defines it as order-1 previous-symbol-context
rANS over the CLERS stream. Round-trips, stream integrity, strict, CLI,
and the BatchEncoder connectivity-config regression the feature exposed."""

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
def test_predictive_roundtrip(name):
    from tpudraco.decode import decode
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.shared.clers import EB_PREDICTIVE

    mesh = load_obj(os.path.join(REF_DATA, name))
    base = decode(encode(mesh))
    blob = encode(mesh, cfg=Config(traversal=EB_PREDICTIVE))
    got = decode(blob)
    assert got.num_faces == mesh.num_faces
    for ga, ba in zip(got.attributes, base.attributes):
        assert np.array_equal(ga.values_per_point(), ba.values_per_point())


@needs_ref
def test_predictive_beats_standard_on_torus():
    """The order-1 context model must actually earn its keep where context
    coders win (enough symbols to amortize the six tables)."""
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.shared.clers import EB_PREDICTIVE

    mesh = load_obj(os.path.join(REF_DATA, "torus.obj"))
    std = encode(mesh)
    pred = encode(mesh, cfg=Config(traversal=EB_PREDICTIVE))
    assert len(pred) < len(std)


@needs_ref
def test_predictive_corrupt_streams_fail_loudly():
    from tpudraco.decode import decode
    from tpudraco.decode.connectivity import DecodeError
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.shared.clers import EB_PREDICTIVE

    mesh = load_obj(os.path.join(REF_DATA, "torus.obj"))
    blob = bytearray(encode(mesh, cfg=Config(traversal=EB_PREDICTIVE)))
    # flipping a byte in the symbol-stream region must not crash outside
    # the codec's error surface
    for k in (len(blob) // 2, len(blob) // 2 + 7):
        bad = bytearray(blob)
        bad[k] ^= 0xFF
        try:
            decode(bytes(bad))
        except (DecodeError, ValueError, IndexError):
            pass


@needs_ref
def test_predictive_strict_and_cli(tmp_path):
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.shared.clers import EB_PREDICTIVE
    from tpudraco.tools.cli import main

    mesh = load_obj(os.path.join(REF_DATA, "torus.obj"))
    with pytest.raises(ValueError, match="traversal"):
        encode(mesh, cfg=Config(traversal=EB_PREDICTIVE, strict=True))

    drc = tmp_path / "t.drc"
    obj = tmp_path / "t.obj"
    assert main(["-i", os.path.join(REF_DATA, "torus.obj"), "-o", str(drc),
                 "--traversal", "predictive"]) == 0
    assert main(["-i", str(drc), "-o", str(obj)]) == 0
    assert obj.stat().st_size > 0


@needs_ref
def test_batch_encoder_honors_connectivity_config():
    """Regression (round 5): BatchEncoder.encode_mesh used to reuse
    STANDARD-built connectivity for valence/predictive/single-connectivity
    configs — the topology cache now keys on the connectivity-relevant
    knobs and the bytes must equal plain encode()."""
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.parallel.batch import BatchEncoder
    from tpudraco.shared.clers import EB_PREDICTIVE, EB_VALENCE

    sphere = load_obj(os.path.join(REF_DATA, "sphere.obj"))
    torus = load_obj(os.path.join(REF_DATA, "torus.obj"))
    for cfg in (Config(traversal=EB_VALENCE),
                Config(traversal=EB_PREDICTIVE),
                Config(use_single_connectivity=True)):
        be = BatchEncoder(cfg=cfg)
        for m in (sphere, torus):
            assert be.encode_mesh(m) == encode(m, cfg=cfg), cfg
    # and the default config still shares the plain-signature cache
    be = BatchEncoder()
    assert be.encode_mesh(sphere) == encode(sphere)
