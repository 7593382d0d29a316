"""OctReflection (wire id 2) transform round-trip; Orthogonal (4) stub."""

import numpy as np
import pytest

from tpudraco.decode.attribute import _make_inverse_transform
from tpudraco.encode.transforms import (
    XFORM_OCT_REFLECTION, XFORM_ORTHOGONAL, OrthogonalTransform,
    make_transform,
)


class _Buf:
    def __init__(self):
        self.u32s = []

    def write_u32(self, v):
        self.u32s.append(v)


def test_oct_reflection_roundtrip():
    from tpudraco.shared.octahedral import oct_quantize_normals

    rng = np.random.default_rng(0)
    # reflection round-trips exactly on *faithful* quantized coords (the
    # only coords the codec produces); raw corner-of-square points are
    # ambiguous under the diamond involution by design
    def quantized(n):
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        return oct_quantize_normals(v.astype(np.float32), 8).astype(np.int64)

    origs = quantized(500)
    preds = quantized(500)

    xf = make_transform(XFORM_OCT_REFLECTION)
    buf = _Buf()
    corr = xf.squeeze(origs, preds, buf)
    assert buf.u32s == [255, 127]

    inv = _make_inverse_transform(XFORM_OCT_REFLECTION,
                                  {"max_q": 255, "center": 127})
    for k in range(len(origs)):
        got = inv(corr[k], preds[k])
        assert np.array_equal(got, origs[k]), k


def test_orthogonal_is_reference_faithful_stub():
    xf = make_transform(XFORM_ORTHOGONAL)
    assert isinstance(xf, OrthogonalTransform)
    with pytest.raises(NotImplementedError):
        xf.squeeze(np.zeros((1, 2)), np.zeros((1, 2)), _Buf())
