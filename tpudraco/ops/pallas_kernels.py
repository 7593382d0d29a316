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


# ---------------------------------------------------------------------------
# Multi-lane rANS scan (the sequential entropy recurrence)
# ---------------------------------------------------------------------------
#
# The XLA lax.scan formulation pays ~30 us of loop overhead per iteration;
# at one vector-op bundle per symbol that overhead IS the runtime. This
# kernel runs the identical recurrence as a fori_loop inside one Pallas
# program per 1024-lane tile: states live in a VMEM scratch register tile
# (8, 128), the per-symbol freq/cum values arrive pre-gathered (the table
# lookup is hoisted to one big parallel XLA gather), and renormalization
# bytes + emission masks stream to HBM blocks. Grid = (lane tiles,
# T chunks); TPU grids iterate the last dimension sequentially, so the
# scratch carries states across chunks. Bit-exact with the lax.scan path
# (pinned by tests).

RANS_LANE_TILE = 1024  # 8 sublanes x 128 lanes
RANS_CHUNK_T = 256
_RANS_R = 3            # MAX_RENORM_PER_SYMBOL


def _rans_scan_kernel(fs_ref, cs_ref, len_ref, byte_ref, mask_ref,
                      state_out_ref, states_ref, *, precision: int,
                      chunk_t: int):
    j = pl.program_id(1)
    l_base = jnp.uint32((1 << precision) << 2)
    base_sh = jnp.uint32(((1 << precision) << 2) >> precision)

    @pl.when(j == 0)
    def _():
        states_ref[...] = jnp.full((8, LANES), l_base, jnp.uint32)

    lengths = len_ref[0]  # (8, 128) int32

    def body(t, states):
        f = fs_ref[0, t]
        c = cs_ref[0, t]
        active = (j * chunk_t + t) < lengths
        limit = (base_sh * f) << jnp.uint32(8)
        for r in range(_RANS_R):
            do = active & (states >= limit)
            byte_ref[0, t, r] = jnp.where(
                do, states & jnp.uint32(0xFF), 0).astype(jnp.uint8)
            mask_ref[0, t, r] = do.astype(jnp.uint8)
            states = jnp.where(do, states >> jnp.uint32(8), states)
        new_states = ((states // f) << jnp.uint32(precision)) \
            + states % f + c
        return jnp.where(active, new_states, states)

    states = jax.lax.fori_loop(0, chunk_t, body, states_ref[...])
    states_ref[...] = states
    state_out_ref[0] = states


@functools.partial(jax.jit, static_argnames=("precision",))
def rans_scan_pallas(fs: jnp.ndarray, cs: jnp.ndarray,
                     lengths: jnp.ndarray, precision: int = 12):
    """Run the rANS recurrence over L lanes with pre-gathered per-symbol
    (freq, cum) pairs. fs/cs: (L, T) uint32; lengths: (L,) int32.
    Returns (bytes (L, T*R) uint8, is_byte (L, T*R) bool, states (L,)
    uint32) in emission order per lane."""
    L, T = fs.shape
    tile = RANS_LANE_TILE
    chunk = RANS_CHUNK_T
    L_pad = _round_up(max(L, tile), tile)
    T_pad = _round_up(max(T, chunk), chunk)
    nb, nt = L_pad // tile, T_pad // chunk

    def lanes_tiled(a, fill):
        a = jnp.pad(a, ((0, L_pad - L), (0, T_pad - T)),
                    constant_values=fill)
        # (L_pad, T_pad) -> (nb, T_pad, 8, 128): lane tile in the minor dims
        return a.reshape(nb, 8, LANES, T_pad).transpose(0, 3, 1, 2)

    fsx = lanes_tiled(fs.astype(jnp.uint32), 1)  # freq 0 would divide by 0
    csx = lanes_tiled(cs.astype(jnp.uint32), 0)
    lenx = jnp.pad(lengths.astype(jnp.int32), (0, L_pad - L)) \
        .reshape(nb, 8, LANES)

    bytes_out, mask_out, states_out = pl.pallas_call(
        functools.partial(_rans_scan_kernel, precision=precision,
                          chunk_t=chunk),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((1, chunk, 8, LANES), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 8, LANES), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, _RANS_R, 8, LANES),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, _RANS_R, 8, LANES),
                         lambda b, j: (b, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, T_pad, _RANS_R, 8, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((nb, T_pad, _RANS_R, 8, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 8, LANES), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.uint32)],
        interpret=_interpret(),
    )(fsx, csx, lenx)

    # back to (L, T*R) emission-major layout
    def untile(a):
        a = a.transpose(0, 3, 4, 1, 2)           # (nb, 8, 128, T_pad, R)
        return a.reshape(L_pad, T_pad * _RANS_R)[:L, :T * _RANS_R]

    emitted = untile(bytes_out)
    is_byte = untile(mask_out).astype(jnp.bool_)
    states = states_out.reshape(L_pad)[:L]
    return emitted, is_byte, states


def _rans_words_kernel(fs_ref, cs_ref, len_ref, prec_ref, word_ref,
                       flag_ref, carry_out_ref, states_ref, lo_ref,
                       hi_ref, nacc_ref, *, chunk_t: int):
    """Word-packing rANS scan chunk: the EXACT _words_scan_core
    recurrence (ops/rans_lanes.py one_symbol) as an in-kernel fori_loop —
    the XLA lax.scan pays ~70 us of loop overhead PER STEP, which IS the
    stage runtime at one vector-op bundle per symbol. Emissions pack
    little-endian into (lo, hi, nacc) carried in VMEM scratch; at most
    one full uint32 word flushes per symbol. Per-lane precision arrives
    as data (covers both the static and vprec callers)."""
    j = pl.program_id(1)
    prec = prec_ref[0].astype(jnp.uint32)   # (8, 128)
    u8_ = jnp.uint32(8)

    @pl.when(j == 0)
    def _():
        states_ref[...] = jnp.uint32(4) << prec   # l_base per lane
        lo_ref[...] = jnp.zeros((8, LANES), jnp.uint32)
        hi_ref[...] = jnp.zeros((8, LANES), jnp.uint32)
        nacc_ref[...] = jnp.zeros((8, LANES), jnp.uint32)

    lengths = len_ref[0]  # (8, 128) int32

    def body(t, carry):
        states, lo, hi, nacc = carry
        f = fs_ref[0, t]
        c = cs_ref[0, t]
        active = (j * chunk_t + t) < lengths
        limit = (jnp.uint32(4) * f) << u8_
        for _ in range(_RANS_R):
            do = active & (states >= limit)
            b = states & jnp.uint32(0xFF)
            in_lo = nacc < 4
            sh_lo = u8_ * jnp.where(in_lo, nacc, 0)
            sh_hi = u8_ * jnp.where(in_lo, 0, nacc - 4)
            lo = jnp.where(do & in_lo, lo | (b << sh_lo), lo)
            hi = jnp.where(do & ~in_lo, hi | (b << sh_hi), hi)
            nacc = nacc + do.astype(jnp.uint32)
            states = jnp.where(do, states >> u8_, states)
        new_states = ((states // f) << prec) + states % f + c
        states = jnp.where(active, new_states, states)
        fl = nacc >= 4
        word_ref[0, t] = lo
        flag_ref[0, t] = fl.astype(jnp.uint8)
        lo = jnp.where(fl, hi, lo)
        hi = jnp.where(fl, jnp.uint32(0), hi)
        nacc = jnp.where(fl, nacc - 4, nacc)
        return states, lo, hi, nacc

    carry = (states_ref[...], lo_ref[...], hi_ref[...], nacc_ref[...])
    states, lo, hi, nacc = jax.lax.fori_loop(0, chunk_t, body, carry)
    states_ref[...], lo_ref[...] = states, lo
    hi_ref[...], nacc_ref[...] = hi, nacc
    # carry out: [states, lo, nacc] (hi is always drained below nacc<=3)
    carry_out_ref[0, 0] = states
    carry_out_ref[0, 1] = lo
    carry_out_ref[0, 2] = nacc


def rans_words_scan_pallas(fs: jnp.ndarray, cs: jnp.ndarray,
                           lengths: jnp.ndarray, prec: jnp.ndarray):
    """Word-packing rANS scan over L lanes with pre-gathered per-symbol
    (freq, cum) pairs. fs/cs: (L, T_pad) uint32; lengths (L,) int32;
    prec (L,) uint32 per-lane precisions (broadcast a scalar for the
    static-precision callers). Returns (words (L, T_pad) uint32,
    flags (L, T_pad) bool, states (L,), lo (L,), nacc (L,)) — the exact
    (wq, flq, carry) of _words_scan_core's lax.scan, so the caller's
    framing + compaction stay untouched."""
    L, T = fs.shape
    tile = RANS_LANE_TILE
    chunk = RANS_CHUNK_T
    L_pad = _round_up(max(L, tile), tile)
    T_pad = _round_up(max(T, chunk), chunk)
    nb, nt = L_pad // tile, T_pad // chunk

    def lanes_tiled(a, fill):
        a = jnp.pad(a, ((0, L_pad - L), (0, T_pad - T)),
                    constant_values=fill)
        return a.reshape(nb, 8, LANES, T_pad).transpose(0, 3, 1, 2)

    fsx = lanes_tiled(fs.astype(jnp.uint32), 1)  # freq 0 would divide by 0
    csx = lanes_tiled(cs.astype(jnp.uint32), 0)
    lenx = jnp.pad(lengths.astype(jnp.int32), (0, L_pad - L)) \
        .reshape(nb, 8, LANES)
    precx = jnp.pad(jnp.broadcast_to(prec.astype(jnp.uint32), (L,)),
                    (0, L_pad - L), constant_values=12) \
        .reshape(nb, 8, LANES)

    words, flags, carry = pl.pallas_call(
        functools.partial(_rans_words_kernel, chunk_t=chunk),
        grid=(nb, nt),
        in_specs=[
            pl.BlockSpec((1, chunk, 8, LANES), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 8, LANES), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, LANES), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, chunk, 8, LANES), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, 8, LANES), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8, LANES), lambda b, j: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, T_pad, 8, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((nb, T_pad, 8, LANES), jnp.uint8),
            jax.ShapeDtypeStruct((nb, 3, 8, LANES), jnp.uint32),
        ],
        scratch_shapes=[pltpu.VMEM((8, LANES), jnp.uint32),
                        pltpu.VMEM((8, LANES), jnp.uint32),
                        pltpu.VMEM((8, LANES), jnp.uint32),
                        pltpu.VMEM((8, LANES), jnp.uint32)],
        interpret=_interpret(),
    )(fsx, csx, lenx, precx)

    def untile(a):
        a = a.transpose(0, 2, 3, 1)              # (nb, 8, 128, T_pad)
        return a.reshape(L_pad, T_pad)[:L]

    w = untile(words)
    fl = untile(flags).astype(jnp.bool_)
    cr = carry.reshape(nb, 3, tile).transpose(0, 2, 1) \
        .reshape(L_pad, 3)[:L]
    return w, fl, cr[:, 0], cr[:, 1], cr[:, 2]


def rans_words_scan_pallas_viable(L: int, T: int) -> bool:
    """The words kernel replaces ONLY the lax.scan recurrence (the
    ~70 us/step XLA loop overhead); pre-gathers, compaction, and framing
    stay in XLA. Worth it when the scan has enough steps for the
    overhead to dominate and lanes tile the (8, 128) registers."""
    import jax as _jax
    if _jax.default_backend() != "tpu":
        return False
    return T >= 1024 and L >= 64


def rans_scan_pallas_viable(L: int, T: int) -> bool:
    """Retired as a production path (round 3, measured in-context on v5e:
    the word-packed XLA scan + word compaction runs the full e2e entropy
    stage in 478 ms vs 656 ms for this kernel + dense-slot compaction at
    L=512, T=12288 — the dense (L, 3T) emission layout forces a 2.4x
    larger stable-partition sort, which dominates the kernel's win on the
    recurrence itself). The kernel and its dense-slot path remain the
    bit-exact twin of the words path (tests/test_rans_lanes.py
    test_word_packed_scan_matches_dense forces this path;
    tests/test_pallas_kernels.py pins the kernel on both backends)."""
    return False


def predict_matmul_viable(T: int, V: int, B: int, C: int,
                          hbm_budget: int = 256 * 2 ** 20,
                          bits: int = 11) -> bool:
    """The kernel tiles all three dims through VMEM, so viability is
    bounded by the dense combo matrix's HBM footprint (int8 T x V) — the
    gather path stays the right choice for very large single meshes —
    and by the two-7-bit-plane int8 decomposition: quantized values past
    14 bits overflow the hi plane (hardware-caught at -qp 16: spurious
    \\xff bytes in the position payload), so deep depths take the gather
    step instead."""
    return T * V <= hbm_budget and bits <= 14
