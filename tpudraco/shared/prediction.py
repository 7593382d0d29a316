"""Prediction schemes over the traversal order.

Used by both encoder and decoder: predictions only ever read vertices already
visited, so the same code drives both directions.

Reference behavior: draco-oxide/src/shared/attribute/prediction_scheme/
(wire ids mod.rs:74-86; parallelogram mesh_parallelogram_prediction.rs:186-237;
delta delta_prediction.rs:56-71; normal mesh_normal_prediction.rs;
texcoord mesh_prediction_for_texture_coordinates.rs).
"""

from __future__ import annotations

import numpy as np

from ..models.corner_table import NONE, TableView, next_corner, prev_corner
from .octahedral import into_faithful_oct_quantization, octahedral_transform

# wire ids (prediction_scheme/mod.rs:74-86)
PRED_DELTA = 0
PRED_PARALLELOGRAM = 1
PRED_MULTI_PARALLELOGRAM = 2
PRED_TEX_COORDS = 5
PRED_NORMAL = 6
PRED_DERIVATIVE = 7
PRED_NONE = 0xFE


def _i32(v: int) -> int:
    return ((int(v) + (1 << 31)) & 0xFFFFFFFF) - (1 << 31)


def trunc_div(a: int, b: int) -> int:
    """Rust-style integer division (truncation toward zero)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


class PredictionState:
    """Tracks visited vertices in traversal order (the reference's
    ``vertices_processed_up_till_now``)."""

    def __init__(self, num_vertices: int) -> None:
        self.visited = np.zeros(num_vertices, dtype=bool)
        self.order: list[int] = []

    def push(self, v: int) -> None:
        self.order.append(v)
        self.visited[v] = True

    def contains(self, v: int) -> bool:
        return bool(self.visited[v])

    def last(self) -> int | None:
        return self.order[-1] if self.order else None


class BasePrediction:
    scheme_id = PRED_NONE

    def __init__(self, view: TableView, parents) -> None:
        self.view = view
        self.parents = parents

    def predict(self, c: int, state: PredictionState, att_get) -> np.ndarray:
        raise NotImplementedError

    def metadata_bytes(self, writer) -> None:  # most schemes have none
        return None


class NoPrediction(BasePrediction):
    scheme_id = PRED_NONE

    def __init__(self, view, parents, n):
        super().__init__(view, parents)
        self.n = n

    def predict(self, c, state, att_get):
        return np.zeros(self.n, dtype=np.int64)


def _last_value_fallback(view: TableView, state: PredictionState, att_get, n):
    last_v = state.last()
    if last_v is None:
        return np.zeros(n, dtype=np.int64)
    return att_get(view.point(view.left_most_corner(last_v)))


class DeltaPrediction(BasePrediction):
    """Previous visited vertex's value (delta_prediction.rs:56-71)."""
    scheme_id = PRED_DELTA

    def __init__(self, view, parents, n):
        super().__init__(view, parents)
        self.n = n

    def predict(self, c, state, att_get):
        return _last_value_fallback(self.view, state, att_get, self.n)


class ParallelogramPrediction(BasePrediction):
    """a + b - diagonal across the opposite corner when all three are
    visited, else the most recent vertex value
    (mesh_parallelogram_prediction.rs:186-237)."""
    scheme_id = PRED_PARALLELOGRAM

    def __init__(self, view, parents, n):
        super().__init__(view, parents)
        self.n = n

    def predict(self, c, state, att_get):
        view = self.view
        opp = view.opp(c)
        if opp != NONE:
            nc, pc = next_corner(c), prev_corner(c)
            if (state.contains(view.vertex(opp)) and state.contains(view.vertex(nc))
                    and state.contains(view.vertex(pc))):
                a = att_get(view.point(nc))
                b = att_get(view.point(pc))
                d = att_get(view.point(opp))
                return a.astype(np.int64) + b.astype(np.int64) - d.astype(np.int64)
        return _last_value_fallback(view, state, att_get, self.n)


class NormalPrediction(BasePrediction):
    """Ring sum of face-normal cross products from quantized positions,
    octahedral-quantized to 8 bits, with per-vertex flip bits
    (mesh_normal_prediction.rs)."""
    scheme_id = PRED_NORMAL

    def __init__(self, view, parents, n):
        super().__init__(view, parents)
        assert parents, "normal prediction needs a position parent"
        self.pos = parents[0]
        self.flips: list[bool] = []
        self.pending_flip: bool | None = None  # decoder injects stored flips

    def _face_normal(self, c: int, pos_c: np.ndarray) -> np.ndarray:
        view = self.view
        pn = self._pos(view.point(next_corner(c))) - pos_c
        pp = self._pos(view.point(prev_corner(c))) - pos_c
        # cross in i32 then widen (mesh_normal_prediction.rs:31-44)
        cross = np.array([
            _i32(pn[1] * pp[2] - pn[2] * pp[1]),
            _i32(pn[2] * pp[0] - pn[0] * pp[2]),
            _i32(pn[0] * pp[1] - pn[1] * pp[0]),
        ], dtype=np.int64)
        return cross

    def _pos(self, p: int) -> np.ndarray:
        return self.pos.value_at_point(p).astype(np.int64)

    def predict(self, c, state, att_get):
        view = self.view
        pos_c = self._pos(view.point(c))
        # swing to the leftmost corner (or full circle)
        curr = c
        left = view.swing_left(curr)
        while left != NONE:
            curr = left
            if curr == c:
                break
            left = view.swing_left(curr)
        start = curr
        total = self._face_normal(curr, pos_c)
        nxt = view.swing_right(curr)
        while nxt != NONE:
            curr = nxt
            if curr == start:
                break
            total = total + self._face_normal(curr, pos_c)
            nxt = view.swing_right(curr)

        upper = 1 << 29
        abs_sum = int(np.abs(total).sum())
        if abs_sum > upper:
            q = abs_sum // upper
            total = np.array([trunc_div(int(t), q) for t in total], dtype=np.int64)
        total = np.array([_i32(t) for t in total], dtype=np.int64)

        if not total.any():
            out = np.zeros(2, dtype=np.int64)
        else:
            oct = octahedral_transform(total.astype(np.int32)) + np.float32(1.0)
            quant = (oct * np.float32((1 << 7) - 1)).astype(np.float32)
            q = quant.astype(np.int64)  # trunc toward zero
            out = into_faithful_oct_quantization(q).astype(np.int64)

        if self.pending_flip is not None:
            if self.pending_flip:
                out = -out
            return out
        actual = att_get(view.point(c)).astype(np.int64)
        d1 = out - actual
        d2 = -out - actual
        if int(d1 @ d1) > int(d2 @ d2):
            self.flips.append(True)
            out = -out
        else:
            self.flips.append(False)
        return out

    def metadata_bytes(self, writer) -> None:
        """Flip bits RAbS-coded, written in forward order
        (mesh_normal_prediction.rs:147-164)."""
        from ..entropy.rans import RabsEncoder
        from ..wire.varint import leb128_write
        n0 = sum(1 for f in self.flips if not f)
        zp = int(np.float32(n0) / np.float32(len(self.flips)) * np.float32(256.0)
                 + np.float32(0.5))
        zero_prob = max(1, min(255, zp))
        writer.write_u8(zero_prob)
        enc = RabsEncoder(zero_prob)
        for f in self.flips:
            enc.write(1 if f else 0)
        blob = enc.flush()
        leb128_write(len(blob), writer)
        writer.write_bytes(blob)


class TexCoordPrediction(BasePrediction):
    """Draco's UV prediction from quantized positions with integer sqrt and
    per-vertex orientation bits; replicates the reference's fallback quirk
    (the prev-vertex branch is intentionally omitted,
    mesh_prediction_for_texture_coordinates.rs:64-73)."""
    scheme_id = PRED_TEX_COORDS

    def __init__(self, view, parents, n):
        super().__init__(view, parents)
        self.pos = parents[0]
        self.orientations: list[bool] = []
        self.pending_orientations: list[bool] | None = None  # decoder side
        self._pending_idx = 0

    def _pos(self, p: int) -> np.ndarray:
        if p < self.pos.num_points:
            return self.pos.value_at_point(p).astype(np.int64)
        return np.zeros(3, dtype=np.int64)

    @staticmethod
    def _int_sqrt(value: int) -> int:
        if value == 0:
            return 0
        act, sqrt = value, 1
        while act >= 2:
            sqrt *= 2
            act //= 4
        sqrt = (sqrt + value // sqrt) // 2
        while sqrt * sqrt > value:
            sqrt = (sqrt + value // sqrt) // 2
        return sqrt

    def _fallback(self, c, state, att_get):
        view = self.view
        nc = next_corner(c)
        if state.contains(view.vertex(nc)):
            return att_get(view.point(nc)).astype(np.int64)
        return _last_value_fallback(view, state, att_get, 2)

    def predict(self, c, state, att_get):
        view = self.view
        nc, pc = next_corner(c), prev_corner(c)
        next_pt, prev_pt, curr_pt = view.point(nc), view.point(pc), view.point(c)
        if state.contains(view.vertex(nc)) and state.contains(view.vertex(pc)):
            next_uv = att_get(next_pt).astype(np.int64)
            prev_uv = att_get(prev_pt).astype(np.int64)
            if np.array_equal(next_uv, prev_uv):
                return prev_uv
            curr_pos = self._pos(curr_pt)
            next_pos = self._pos(next_pt)
            prev_pos = self._pos(prev_pt)
            pn = prev_pos - next_pos
            pn_norm2 = int(pn @ pn)
            if pn_norm2 != 0:
                cn = curr_pos - next_pos
                cn_dot_pn = int(pn @ cn)
                pn_uv = prev_uv - next_uv
                i64max = (1 << 63) - 1
                n_uv_absmax = int(np.abs(next_uv).max())
                if n_uv_absmax > i64max // pn_norm2:
                    return self._fallback(c, state, att_get)
                pn_uv_absmax = int(np.abs(pn_uv).max())
                if pn_uv_absmax and abs(cn_dot_pn) > i64max // pn_uv_absmax:
                    return self._fallback(c, state, att_get)
                x_uv = next_uv * pn_norm2 + pn_uv * cn_dot_pn
                pn_absmax = int(np.abs(pn).max())
                if abs(cn_dot_pn) > i64max // pn_absmax:
                    return self._fallback(c, state, att_get)
                x_pos = next_pos + np.array(
                    [trunc_div(int(p) * cn_dot_pn, pn_norm2) for p in pn],
                    dtype=np.int64)
                cx = curr_pos - x_pos
                cx_norm2 = int(cx @ cx)
                cx_uv = np.array([int(pn_uv[1]), -int(pn_uv[0])], dtype=np.int64)
                norm_sq = self._int_sqrt((cx_norm2 * pn_norm2) & ((1 << 64) - 1))
                cx_uv = cx_uv * norm_sq
                pred0 = np.array([trunc_div(int(x_uv[0] + cx_uv[0]), pn_norm2),
                                  trunc_div(int(x_uv[1] + cx_uv[1]), pn_norm2)],
                                 dtype=np.int64)
                pred1 = np.array([trunc_div(int(x_uv[0] - cx_uv[0]), pn_norm2),
                                  trunc_div(int(x_uv[1] - cx_uv[1]), pn_norm2)],
                                 dtype=np.int64)
                if self.pending_orientations is not None:
                    o = self.pending_orientations[self._pending_idx]
                    self._pending_idx += 1
                    pred = pred0 if o else pred1
                else:
                    curr_uv = att_get(curr_pt).astype(np.int64)
                    d0 = curr_uv - pred0
                    d1 = curr_uv - pred1
                    if int(d0 @ d0) < int(d1 @ d1):
                        self.orientations.append(True)
                        pred = pred0
                    else:
                        self.orientations.append(False)
                        pred = pred1
                return np.array([_i32(pred[0]), _i32(pred[1])], dtype=np.int64)
        return self._fallback(c, state, att_get)

    def decode_orientation(self, o: bool) -> None:
        self.orientations.append(o)

    def metadata_bytes(self, writer) -> None:
        """u32 count, prob byte, RAbS-coded delta-orientation bits
        (mesh_prediction_for_texture_coordinates.rs:221-260)."""
        from ..entropy.rans import RabsEncoder
        from ..wire.varint import leb128_write
        # change count computed with a *forward* delta chain...
        n0 = 0
        last = True
        for o in self.orientations:
            if o != last:
                last = o
                n0 += 1
        denom = np.float32(len(self.orientations)) + np.float32(0.001)
        zp = int(np.float32(n0) / denom * np.float32(256.0) + np.float32(0.5))
        zero_prob = max(1, min(255, zp))
        writer.write_u32(len(self.orientations))
        writer.write_u8(zero_prob)
        # ...but the bits themselves use a reverse delta chain, re-reversed
        # before coding (the reference's exact quirk)
        last = True
        rev_bits = []
        for o in reversed(self.orientations):
            if o == last:
                rev_bits.append(1)
            else:
                last = o
                rev_bits.append(0)
        enc = RabsEncoder(zero_prob)
        for bit in reversed(rev_bits):
            enc.write(bit)
        blob = enc.flush()
        leb128_write(len(blob), writer)
        writer.write_bytes(blob)


def make_prediction(scheme_id: int, view: TableView, parents, n: int) -> BasePrediction:
    if scheme_id == PRED_DELTA:
        return DeltaPrediction(view, parents, n)
    if scheme_id == PRED_PARALLELOGRAM:
        return ParallelogramPrediction(view, parents, n)
    if scheme_id == PRED_NORMAL:
        return NormalPrediction(view, parents, n)
    if scheme_id == PRED_TEX_COORDS:
        return TexCoordPrediction(view, parents, n)
    if scheme_id == PRED_NONE:
        return NoPrediction(view, parents, n)
    raise ValueError(f"unsupported prediction scheme {scheme_id}")
