"""The batched normal/texcoord prediction paths must be bit-identical to
the scalar reference loops, and whole-stream encodes must be byte-equal."""

import os

import numpy as np
import pytest

from tpudraco.encode import encode
from tpudraco.encode.connectivity import EdgebreakerEncoder
from tpudraco.encode.portabilization import (default_portabilization_for,
                                             portabilize)
from tpudraco.models import (Attribute, AttributeDomain, AttributeType,
                             TableView)
from tpudraco.models.mesh import Mesh
from tpudraco.shared.prediction import (NormalPrediction, PredictionState,
                                        TexCoordPrediction, make_prediction)
from tpudraco.shared.sequencer import compute_sequence
from tpudraco.wire import ByteWriter

REF_DATA = "/root/reference/draco-oxide/tests/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted")


class _Buf:
    def write_u8(self, v):
        pass

    def write_u32(self, v):
        pass

    def write_f32(self, v):
        pass


def _textured_grid(n=7, seed=0):
    """Grid mesh with positions + per-corner normals and texcoords."""
    rng = np.random.RandomState(seed)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    z = rng.rand(n * n).astype(np.float32) * 2
    pos = np.stack([xs.ravel(), ys.ravel(), z], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (i * n + j, i * n + j + 1,
                          (i + 1) * n + j, (i + 1) * n + j + 1)
            faces += [[a, b, c], [b, d, c]]
    faces = np.asarray(faces, dtype=np.int64)
    nrm = rng.randn(n * n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    uv = (pos[:, :2] / n + rng.rand(n * n, 2).astype(np.float32) * 0.01
          ).astype(np.float32)
    atts = [
        Attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION),
        Attribute(nrm, AttributeType.NORMAL, AttributeDomain.POSITION,
                  parents=[0]),
        Attribute(uv, AttributeType.TEX_COORD, AttributeDomain.POSITION,
                  parents=[0]),
    ]
    for i, a in enumerate(atts):
        a.att_id = i
    return Mesh(faces=faces, attributes=atts)


def _setup(mesh, att_type):
    atts = mesh.attributes
    eb = EdgebreakerEncoder(mesh.faces, atts)
    conn = eb.encode(ByteWriter())
    aict = conn.corner_table
    idx = next(i for i, a in enumerate(atts) if a.att_type == att_type)
    att_table = aict.attribute_tables[idx - 1] if idx > 0 else None
    view = TableView(aict.corner_table, att_table)
    seq = compute_sequence(view, list(conn.corners_of_edgebreaker))
    pt, bits = default_portabilization_for(atts[0].att_type)
    port_pos = portabilize(atts[0], pt, bits, _Buf())
    pt, bits = default_portabilization_for(att_type)
    port_att = portabilize(atts[idx], pt, bits, _Buf())
    per_point = port_att.values[port_att.unique_indices()].astype(np.int64)
    return view, seq, port_pos, per_point


def test_normal_prediction_vector_matches_scalar():
    mesh = _textured_grid()
    view, seq, port_pos, per_point = _setup(mesh, AttributeType.NORMAL)
    vec = NormalPrediction.predict_sequence(view, seq, port_pos)
    pred = make_prediction(6, view, [port_pos], 2)
    pred.pending_flip = False  # bypass flip bookkeeping; compare raw preds
    state = PredictionState(view.num_vertices)
    for k, c in enumerate(seq):
        p = pred.predict(c, state, lambda pp: per_point[pp])
        state.push(view.vertex(c))
        assert np.array_equal(p, vec[k]), k


def test_texcoord_prediction_vector_matches_scalar():
    mesh = _textured_grid()
    view, seq, port_pos, per_point = _setup(mesh, AttributeType.TEX_COORD)
    vec, orients = TexCoordPrediction.predict_sequence(
        view, seq, port_pos, per_point)
    pred = make_prediction(5, view, [port_pos], 2)
    state = PredictionState(view.num_vertices)
    for k, c in enumerate(seq):
        p = pred.predict(c, state, lambda pp: per_point[pp])
        state.push(view.vertex(c))
        assert np.array_equal(p, vec[k]), k
    assert [bool(o) for o in orients] == pred.orientations


def test_encode_bytes_equal_scalar_path(monkeypatch):
    """Whole-stream byte equality: vectorized vs scalar prediction paths."""
    from tpudraco.encode import attribute as ea

    mesh = _textured_grid(n=6, seed=3)
    blob_fast = encode(mesh)
    monkeypatch.setattr(ea, "VECTORIZED_PREDICTIONS", False)
    blob_scalar = encode(mesh)
    assert blob_fast == blob_scalar


@needs_ref
@pytest.mark.parametrize("name", ["sphere.obj", "torus.obj",
                                  "punctured_sphere.obj",
                                  "tetrahedron.obj"])
def test_multi_parallelogram_vector_matches_scalar(name, monkeypatch):
    """Vectorized MultiParallelogram must be byte-identical to the scalar
    swing-ring loop on every fixture (boundaries, seams, handles)."""
    from tpudraco.encode import Config
    from tpudraco.encode import attribute as ea
    from tpudraco.io import load_obj
    from tpudraco.shared.prediction import PRED_MULTI_PARALLELOGRAM

    mesh = load_obj(os.path.join(REF_DATA, name))
    cfg = Config(prediction={
        AttributeType.POSITION: PRED_MULTI_PARALLELOGRAM})
    blob_fast = encode(mesh, cfg=cfg)
    monkeypatch.setattr(ea, "VECTORIZED_PREDICTIONS", False)
    assert blob_fast == encode(mesh, cfg=cfg)


@needs_ref
def test_duck_encode_bytes_equal_scalar_path(monkeypatch):
    from tests.test_roundtrip import assert_roundtrip
    from tpudraco.encode import attribute as ea
    from tpudraco.io import load_gltf

    mesh = load_gltf(os.path.join(REF_DATA, "Duck/Duck.glb"))
    assert_roundtrip(mesh)
    blob_fast = encode(mesh)
    monkeypatch.setattr(ea, "VECTORIZED_PREDICTIONS", False)
    assert blob_fast == encode(mesh)


def test_native_uv_decode_chain_matches_scalar(monkeypatch):
    from tpudraco.decode import decode
    from tpudraco.native import topo as NT

    mesh = _textured_grid(n=6, seed=5)
    blob = encode(mesh)
    fast = decode(blob)
    monkeypatch.setattr(NT, "decode_texcoords", lambda *a, **k: None)
    slow = decode(blob)
    for a, b in zip(fast.attributes, slow.attributes):
        assert np.array_equal(np.asarray(a.values), np.asarray(b.values))


def test_fused_native_predict_matches_numpy_twin(monkeypatch):
    """The native fused parallelogram+wrap+zigzag step
    (tpud_predict_wrapped_zigzag) must emit bytes identical to the numpy
    _vectorized_predict + WrappedDifferenceTransform.squeeze chain — on
    plain and seam-carrying (multi-attribute) meshes."""
    from tpudraco.encode import attribute as ea
    import tpudraco.native as native

    if native.load_library() is None:
        pytest.skip("native library unavailable")

    for mesh in (_textured_grid(n=7, seed=2), _textured_grid(n=5, seed=9)):
        fast = encode(mesh)
        monkeypatch.setattr(ea, "_fused_predict_squeeze",
                            lambda *a, **k: None)
        assert encode(mesh) == fast
        monkeypatch.undo()
