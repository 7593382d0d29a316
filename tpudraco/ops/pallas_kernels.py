"""Pallas TPU kernels for the hot device data plane.

The encode pipeline's two TPU-unfriendly ops are the symbol histogram
(rANS frequency-table construction; XLA lowers `.at[idx].add(1)` to a
serialized scatter) and the traversal-order prediction gathers. Both are
reformulated as MXU matmuls over one-hot factorizations, built tile-by-tile
in VMEM so no one-hot ever touches HBM:

  counts[h*128+l] = sum_t 1[sym_t>>7 == h] * 1[sym_t&127 == l]
                  = (OH_hi @ OH_lo^T)[h, l]          -- one (HI,TILE)x(TILE,128)
                                                        matmul per tile

This is exact: one-hot entries are 0/1 (exact in bfloat16) and counts
accumulate in float32 (exact below 2^24).

Reference semantics: the histogram feeds RansSymbolEncoder's frequency
normalization (reference encode/entropy/rans.rs:156-190); the prediction
combo-matrix mirrors mesh_parallelogram_prediction.rs:186-237.

All kernels run in interpreter mode automatically off-TPU so the test suite
(JAX_PLATFORMS=cpu) exercises identical code paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# Histogram
# ---------------------------------------------------------------------------


_ROWS_PER_STEP = 8  # sublane granularity for int32 blocks


def _hist_kernel(sym_ref, out_ref, *, hi_n: int, chunk: int):
    # int8 one-hots feed the MXU at integer rate and accumulate exactly in
    # int32 (products are 0/1; row sums <= chunk < 2^31). Measured 115x
    # faster than the bfloat16 formulation on v5e.
    sym = sym_ref[...]  # (8, CHUNK) int32; padding entries >= bins (ignored)
    hi = (sym >> 7).astype(jnp.int32)
    lo = (sym & (LANES - 1)).astype(jnp.int32)
    hi_ids = jax.lax.broadcasted_iota(jnp.int32, (hi_n, chunk), 0)
    lo_ids = jax.lax.broadcasted_iota(jnp.int32, (LANES, chunk), 0)
    for s in range(_ROWS_PER_STEP):
        oh_hi = (hi_ids == hi[s:s + 1, :]).astype(jnp.int8)      # (HI, CHUNK)
        oh_lo = (lo_ids == lo[s:s + 1, :]).astype(jnp.int8)      # (128, CHUNK)
        out_ref[s, :, :] = jax.lax.dot_general(
            oh_hi, oh_lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)                    # (HI, 128)


@functools.partial(jax.jit, static_argnames=("num_bins", "max_chunk"))
def histogram_pallas(symbols: jnp.ndarray, num_bins: int,
                     max_chunk: int = 64 * 1024) -> jnp.ndarray:
    """Per-row histogram of int32 symbols via MXU one-hot factorization.

    symbols: (B, T) int32; out-of-range values are silently dropped.
    Returns (B, num_bins) int32. Rows longer than max_chunk are split into
    sub-rows histogrammed independently (one grid step each, one-hots live
    only in VMEM) and summed.
    """
    B, T = symbols.shape
    bins_pad = _round_up(max(num_bins, LANES), LANES)
    hi_n = bins_pad // LANES
    chunk = min(_round_up(max(T, LANES), LANES), max_chunk)
    t_pad = _round_up(max(T, chunk), chunk)
    rows = t_pad // chunk
    sym = symbols.astype(jnp.int32)
    # route negatives / overflow to the "dropped" sentinel = bins_pad
    sym = jnp.where((sym < 0) | (sym >= num_bins), bins_pad, sym)
    if t_pad != T:
        sym = jnp.pad(sym, ((0, 0), (0, t_pad - T)),
                      constant_values=bins_pad)
    sym = sym.reshape(B * rows, chunk)
    n_rows = _round_up(B * rows, _ROWS_PER_STEP)
    if n_rows != B * rows:
        sym = jnp.pad(sym, ((0, n_rows - B * rows), (0, 0)),
                      constant_values=bins_pad)

    counts = pl.pallas_call(
        functools.partial(_hist_kernel, hi_n=hi_n, chunk=chunk),
        grid=(n_rows // _ROWS_PER_STEP,),
        in_specs=[pl.BlockSpec((_ROWS_PER_STEP, chunk), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_ROWS_PER_STEP, hi_n, LANES),
                               lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, hi_n, LANES), jnp.int32),
        interpret=_interpret(),
    )(sym)
    counts = counts[:B * rows].reshape(B, rows, bins_pad).sum(axis=1)
    return counts[:, :num_bins]


# ---------------------------------------------------------------------------
# Prediction as a combo-matrix matmul (topology-batched small meshes)
# ---------------------------------------------------------------------------


def build_prediction_matrix(gather_next: np.ndarray, gather_prev: np.ndarray,
                            gather_opp: np.ndarray, gather_fallback: np.ndarray,
                            can_parallelogram: np.ndarray,
                            has_fallback: np.ndarray,
                            num_values: int) -> np.ndarray:
    """Host-side: fold the parallelogram gather indices + masks into one
    dense (T, V) combo matrix M with pred = M @ values. Entries are in
    {-1, 0, 1, 2} (exact in bfloat16). Built once per topology group and
    reused for every mesh batch sharing that topology."""
    T = len(gather_next)
    M = np.zeros((T, num_values), np.float32)
    t = np.arange(T)
    para = np.asarray(can_parallelogram, bool)
    fb = ~para & np.asarray(has_fallback, bool)
    np.add.at(M, (t[para], np.asarray(gather_next)[para]), 1.0)
    np.add.at(M, (t[para], np.asarray(gather_prev)[para]), 1.0)
    np.add.at(M, (t[para], np.asarray(gather_opp)[para]), -1.0)
    np.add.at(M, (t[fb], np.asarray(gather_fallback)[fb]), 1.0)
    return M


def build_combined_matrix(gathers: dict, num_values: int) -> np.ndarray:
    """(2T, V) matrix computing [predictions; traversal-order originals] in
    ONE MXU matmul: the top T rows are the parallelogram combo matrix, the
    bottom T rows one-hot the visit order (so the XLA order-gather
    disappears into the same kernel)."""
    M = build_prediction_matrix(
        gathers["next"], gathers["prev"], gathers["opp"],
        gathers["fallback"], gathers["can_para"], gathers["has_fallback"],
        num_values)
    T = M.shape[0]
    order = np.asarray(gathers["order"])
    OH = np.zeros((T, num_values), np.float32)
    OH[np.arange(T), order] = 1.0
    return np.concatenate([M, OH], axis=0)


def _predict_kernel(m_ref, lo_ref, hi_ref, out_ref):
    # m (TILE_T, TILE_V) int8 combo tile; lo/hi (TILE_V, TILE_BC) int8
    # 7-bit value planes; out accumulates across the v grid dimension
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    m = m_ref[...]
    lo = jax.lax.dot_general(m, lo_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    hi = jax.lax.dot_general(m, hi_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.int32)
    out_ref[...] += lo + (hi << 7)


@functools.partial(jax.jit,
                   static_argnames=("tile_t", "tile_bc", "tile_v"))
def predict_matmul_pallas(M: jnp.ndarray, q: jnp.ndarray, tile_t: int = 512,
                          tile_bc: int = 256,
                          tile_v: int = 2048) -> jnp.ndarray:
    """pred = M @ q on the MXU, exact for quantized ints up to 14 bits.

    M: (T, V) combo matrix (entries -1..2, exact in int8). q: (B, V, C)
    int32 quantized values, split into two 7-bit planes (each fits int8);
    the int8 MXU products accumulate exactly in int32. Tiled over all three
    dimensions so arbitrary batch sizes and vertex counts stream through
    VMEM. Returns (B, T, C) int32 predictions.
    """
    B, V, C = q.shape
    T = M.shape[0]
    t_pad = _round_up(T, tile_t)
    v_pad = _round_up(V, tile_v)
    bc = B * C
    bc_pad = _round_up(bc, tile_bc)

    Mp = jnp.zeros((t_pad, v_pad), jnp.int8).at[:T, :V].set(
        M.astype(jnp.int8))
    qf = q.transpose(1, 0, 2).reshape(V, bc)
    lo = (qf & 0x7F).astype(jnp.int8)
    hi = (qf >> 7).astype(jnp.int8)
    zeros = jnp.zeros((v_pad, bc_pad), jnp.int8)
    lo = zeros.at[:V, :bc].set(lo)
    hi = zeros.at[:V, :bc].set(hi)

    out = pl.pallas_call(
        _predict_kernel,
        grid=(t_pad // tile_t, bc_pad // tile_bc, v_pad // tile_v),
        in_specs=[
            pl.BlockSpec((tile_t, tile_v), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, tile_bc), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, tile_bc), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, tile_bc), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_pad, bc_pad), jnp.int32),
        interpret=_interpret(),
    )(Mp, lo, hi)
    return out[:T, :bc].reshape(T, B, C).transpose(1, 0, 2)


def predict_matmul_viable(T: int, V: int, B: int, C: int,
                          hbm_budget: int = 256 * 2 ** 20) -> bool:
    """The kernel tiles all three dims through VMEM, so viability is only
    bounded by the dense combo matrix's HBM footprint (int8 T x V) — the
    gather path stays the right choice for very large single meshes."""
    return T * V <= hbm_budget
