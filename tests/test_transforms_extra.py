"""OctReflection (wire id 2) and Orthogonal (wire id 4) transforms: exact
round-trips at multiple depths, scalar/vectorized twins, config/CLI opt-in,
strict rejection. The reference declares both ids but leaves their bodies
unimplemented!() (oct_reflection.rs, orthogonal.rs:44) — these are the
completed forms."""

import numpy as np
import pytest

from tpudraco.decode.attribute import _make_inverse_transform
from tpudraco.encode.transforms import (
    XFORM_OCT_ORTHOGONAL, XFORM_OCT_REFLECTION, XFORM_ORTHOGONAL,
    OrthogonalTransform, make_transform,
)

FIXTURE = "/root/reference/draco-oxide/tests/data/sphere.obj"


class _Buf:
    def __init__(self):
        self.u32s = []

    def write_u32(self, v):
        self.u32s.append(v)


def _quantized(rng, n, bits):
    from tpudraco.shared.octahedral import oct_quantize_normals
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return oct_quantize_normals(v.astype(np.float32), bits).astype(np.int64)


def test_oct_reflection_roundtrip():
    rng = np.random.default_rng(0)
    # reflection round-trips exactly on *faithful* quantized coords (the
    # only coords the codec produces); raw corner-of-square points are
    # ambiguous under the diamond involution by design
    origs = _quantized(rng, 500, 8)
    preds = _quantized(rng, 500, 8)

    xf = make_transform(XFORM_OCT_REFLECTION)
    buf = _Buf()
    corr = xf.squeeze(origs, preds, buf)
    assert buf.u32s == [255, 127]

    inv = _make_inverse_transform(XFORM_OCT_REFLECTION,
                                  {"max_q": 255, "center": 127})
    for k in range(len(origs)):
        got = inv(corr[k], preds[k])
        assert np.array_equal(got, origs[k]), k


@pytest.mark.parametrize("bits", [7, 8, 12, 16])
def test_orthogonal_exact_roundtrip(bits):
    """Forward D4 squeeze -> scalar inverse recovers every original exactly
    (every step is a bijection on Z^2 — no mod-boundary ambiguity)."""
    rng = np.random.default_rng(bits)
    origs = _quantized(rng, 400, bits)
    preds = _quantized(rng, 400, bits)
    mx = (1 << bits) - 1

    xf = make_transform(XFORM_ORTHOGONAL, normal_bits=bits)
    assert isinstance(xf, OrthogonalTransform)
    buf = _Buf()
    corr = xf.squeeze(origs, preds, buf)
    assert buf.u32s == [mx, mx // 2]

    inv = _make_inverse_transform(XFORM_ORTHOGONAL,
                                  {"max_q": mx, "center": mx // 2})
    for k in range(len(origs)):
        got = inv(corr[k], preds[k])
        assert np.array_equal(got, origs[k]), k


@pytest.mark.parametrize("xf_id,qn", [(XFORM_ORTHOGONAL, 7),
                                      (XFORM_ORTHOGONAL, 8),
                                      (XFORM_ORTHOGONAL, 12),
                                      (XFORM_ORTHOGONAL, 16),
                                      (XFORM_OCT_REFLECTION, 8),
                                      (XFORM_OCT_REFLECTION, 12)])
def test_transform_override_mesh_roundtrip(xf_id, qn):
    """Full encode->decode with a Config.transform override yields the same
    decoded quantized normals as the default OctOrthogonal stream."""
    from tpudraco.decode import decode
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.models.attribute import AttributeType

    mesh = load_obj(FIXTURE)
    qb = {AttributeType.NORMAL: qn}
    base = decode(encode(mesh, cfg=Config(quant_bits=qb)))
    blob = encode(mesh, cfg=Config(quant_bits=qb,
                                   transform={AttributeType.NORMAL: xf_id}))
    got = decode(blob)
    bn = next(a for a in base.attributes
              if a.att_type == AttributeType.NORMAL)
    gn = next(a for a in got.attributes
              if a.att_type == AttributeType.NORMAL)
    assert np.array_equal(gn.values_per_point(), bn.values_per_point())


def test_transform_override_scalar_decode_twin(monkeypatch):
    """The scalar decode loop (per-vertex _make_inverse_transform) produces
    the same values as the batched normal decode for both opt-in
    transforms."""
    import importlib
    da = importlib.import_module("tpudraco.decode.attribute")
    from tpudraco.decode import decode
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.models.attribute import AttributeType

    mesh = load_obj(FIXTURE)
    for xf_id in (XFORM_ORTHOGONAL, XFORM_OCT_REFLECTION):
        blob = encode(mesh, cfg=Config(
            transform={AttributeType.NORMAL: xf_id}))
        fast = decode(blob)
        monkeypatch.setattr(da, "_decode_normals_vectorized",
                            lambda *a, **k: None)
        slow = decode(blob)
        monkeypatch.undo()
        fn = next(a for a in fast.attributes
                  if a.att_type == AttributeType.NORMAL)
        sn = next(a for a in slow.attributes
                  if a.att_type == AttributeType.NORMAL)
        assert np.array_equal(fn.values_per_point(), sn.values_per_point())


def test_transform_override_scalar_encode_twin():
    """VECTORIZED_PREDICTIONS off (scalar normal prediction loop) spells the
    identical bytes for the orthogonal-transform stream."""
    import importlib
    ea = importlib.import_module("tpudraco.encode.attribute")
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.models.attribute import AttributeType

    mesh = load_obj(FIXTURE)
    cfg = Config(transform={AttributeType.NORMAL: XFORM_ORTHOGONAL})
    fast = encode(mesh, cfg=cfg)
    ea.VECTORIZED_PREDICTIONS = False
    try:
        slow = encode(mesh, cfg=cfg)
    finally:
        ea.VECTORIZED_PREDICTIONS = True
    assert fast == slow


def test_orthogonal_beats_oct_orthogonal_at_depth():
    """The zigzag residual's alphabet stays narrow while OctOrthogonal's
    mod-max residual spans [0, max) — at deep depths the DirectCoded table
    alone dwarfs the payload. Pin the size win (it is the reason this
    transform exists as an opt-in)."""
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj
    from tpudraco.models.attribute import AttributeType

    mesh = load_obj(FIXTURE)
    qb = {AttributeType.NORMAL: 12}
    base = encode(mesh, cfg=Config(quant_bits=qb))
    orth = encode(mesh, cfg=Config(
        quant_bits=qb, transform={AttributeType.NORMAL: XFORM_ORTHOGONAL}))
    assert len(orth) < len(base)


def test_transform_override_validation_and_strict():
    from tpudraco.encode import Config, encode
    from tpudraco.encode.attribute import default_prediction_for
    from tpudraco.io import load_obj
    from tpudraco.models.attribute import AttributeType

    # only NORMAL takes octahedral transforms
    with pytest.raises(ValueError, match="transform override"):
        default_prediction_for(AttributeType.POSITION,
                               transform={AttributeType.POSITION:
                                          XFORM_ORTHOGONAL})
    with pytest.raises(ValueError, match="transform override"):
        default_prediction_for(AttributeType.NORMAL,
                               transform={AttributeType.NORMAL: 0})
    assert default_prediction_for(
        AttributeType.NORMAL,
        transform={AttributeType.NORMAL: XFORM_ORTHOGONAL})[1] \
        == XFORM_ORTHOGONAL
    assert default_prediction_for(AttributeType.NORMAL)[1] \
        == XFORM_OCT_ORTHOGONAL

    mesh = load_obj(FIXTURE)
    cfg = Config(transform={AttributeType.NORMAL: XFORM_ORTHOGONAL},
                 strict=True)
    with pytest.raises(ValueError, match="transform overrides"):
        encode(mesh, cfg=cfg)


def test_cli_transform_flag(tmp_path):
    from tpudraco.tools.cli import main

    drc = tmp_path / "sphere.drc"
    obj = tmp_path / "sphere.obj"
    assert main(["-i", FIXTURE, "-o", str(drc),
                 "--transform", "orthogonal"]) == 0
    assert main(["-i", str(drc), "-o", str(obj)]) == 0
    assert obj.stat().st_size > 0
