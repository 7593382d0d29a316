"""Batched multi-lane rANS on the accelerator.

Each lane is one independent Draco rANS stream (per-attribute, per-mesh —
draco streams are independent, so lane parallelism preserves bit-exactness).
The sequential per-symbol recurrence runs as a lax.scan over symbol steps
with all lanes vectorized; renormalization bytes scatter-add into
per-lane output buffers at running cursors (each slot is written at most
once). See PAPERS.md (Recoil; interleaved entropy coders) for the lane
formulation.

Bit-exact with the host coder (tpudraco/entropy/rans.py): same state
update, same renormalization condition, same flush framing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

MAX_RENORM_PER_SYMBOL = 3  # state <= l_base<<8 drains in <= 2 emissions; +1 margin


def rans_encode_lanes(symbols: jnp.ndarray, freqs: jnp.ndarray,
                      cums: jnp.ndarray, lengths: jnp.ndarray,
                      precision: int = 12):
    """Encode L lanes of up to T symbols each.

    symbols: (L, T) int32, entries beyond lengths[l] ignored.
    freqs/cums: (S,) shared normalized table (sum == 1<<precision), or
    (L, S) per-lane tables (per-mesh tables in corpus batches).
    lengths: (L,) int32 active symbol counts.
    Returns (buffers (L, CAP) uint8, nbytes (L,) int32)."""
    L, T = symbols.shape
    cap = 2 * T + 8
    l_base = (1 << precision) << 2
    base_sh = l_base >> precision
    S = freqs.shape[-1]

    lane_ids = jnp.arange(L)
    buffers = jnp.zeros((L, cap), dtype=jnp.uint32)

    def table_at(table, sym):
        idx = jnp.clip(sym, 0, S - 1)
        if table.ndim == 2:
            return table[lane_ids, idx].astype(jnp.uint32)
        return table[idx].astype(jnp.uint32)

    def step(carry, i):
        states, cursors, bufs = carry
        sym = symbols[:, i]
        active = i < lengths
        f = table_at(freqs, sym)
        cum = table_at(cums, sym)
        limit = (jnp.uint32(base_sh) * f) << jnp.uint32(8)

        def renorm(j, val):
            states, cursors, bufs = val
            do = active & (states >= limit)
            byte = (states & jnp.uint32(0xFF)).astype(jnp.uint32)
            bufs = bufs.at[lane_ids, cursors].add(
                jnp.where(do, byte, 0), mode="drop")
            states = jnp.where(do, states >> jnp.uint32(8), states)
            cursors = jnp.where(do, cursors + 1, cursors)
            return states, cursors, bufs

        states, cursors, bufs = jax.lax.fori_loop(
            0, MAX_RENORM_PER_SYMBOL, renorm, (states, cursors, bufs))

        new_states = ((states // f) << jnp.uint32(precision)) \
            + states % f + cum
        states = jnp.where(active, new_states, states)
        return (states, cursors, bufs), None

    states0 = jnp.full((L,), l_base, dtype=jnp.uint32)
    cursors0 = jnp.zeros((L,), dtype=jnp.int32)
    (states, cursors, buffers), _ = jax.lax.scan(
        step, (states0, cursors0, buffers), jnp.arange(T))

    # flush: final state with 2-bit size flag (encode/entropy/rans.rs:48-68)
    st = states - jnp.uint32(l_base)
    nbytes_state = jnp.where(st < (1 << 6), 1,
                             jnp.where(st < (1 << 14), 2,
                                       jnp.where(st < (1 << 22), 3, 4)))
    flag = (nbytes_state - 1).astype(jnp.uint32)
    packed = st + (flag << (jnp.uint32(6) + jnp.uint32(8) * (nbytes_state - 1).astype(jnp.uint32)))

    def flush_byte(k, val):
        cursors, bufs = val
        do = k < nbytes_state
        byte = ((packed >> (jnp.uint32(8) * jnp.uint32(k))) & jnp.uint32(0xFF)).astype(jnp.uint32)
        bufs = bufs.at[lane_ids, cursors].add(jnp.where(do, byte, 0), mode="drop")
        cursors = jnp.where(do, cursors + 1, cursors)
        return cursors, bufs

    cursors, buffers = jax.lax.fori_loop(0, 4, flush_byte, (cursors, buffers))
    return buffers.astype(jnp.uint8), cursors


def rans_decode_lanes(buffers: jnp.ndarray, nbytes: jnp.ndarray,
                      freqs: jnp.ndarray, cums: jnp.ndarray,
                      slots: jnp.ndarray, counts: jnp.ndarray,
                      precision: int = 12):
    """Decode L lanes: buffers (L, CAP) uint8, nbytes (L,), counts (L,)
    symbols per lane (max T). freqs/cums (S,) + slots (1<<P,) shared, or
    (L, S) / (L, 1<<P) per-lane. Returns (L, T) int32 symbols."""
    L, cap = buffers.shape
    T = int(counts.max()) if isinstance(counts, np.ndarray) else None
    l_base = (1 << precision) << 2
    lane_ids = jnp.arange(L)
    bufs = buffers.astype(jnp.uint32)

    # init: read the tail metadata byte per lane
    pos = nbytes.astype(jnp.int32) - 1
    metadata = bufs[lane_ids, pos].astype(jnp.uint32)
    flag = (metadata >> jnp.uint32(6)).astype(jnp.int32)

    def read_back(k, val):
        states, pos = val
        do = k < flag
        pos2 = jnp.where(do, pos - 1, pos)
        byte = bufs[lane_ids, jnp.maximum(pos2, 0)].astype(jnp.uint32)
        states = jnp.where(do, (states << jnp.uint32(8)) | byte, states)
        return states, pos2

    states, pos = jax.lax.fori_loop(
        0, 3, read_back, (jnp.zeros((L,), jnp.uint32), pos))
    states = states | ((metadata & jnp.uint32(0x3F))
                       << (jnp.uint32(8) * flag.astype(jnp.uint32)))
    states = states + jnp.uint32(l_base)

    max_T = T if T is not None else cap * 2
    mask = jnp.uint32((1 << precision) - 1)

    def step(carry, i):
        states, pos = carry
        active = i < counts

        def refill(j, val):
            states, pos = val
            need = active & (states < jnp.uint32(l_base)) & (pos > 0)
            pos2 = jnp.where(need, pos - 1, pos)
            byte = bufs[lane_ids, jnp.maximum(pos2, 0)].astype(jnp.uint32)
            states = jnp.where(need, states * jnp.uint32(256) + byte, states)
            return states, pos2

        states, pos = jax.lax.fori_loop(0, MAX_RENORM_PER_SYMBOL, refill,
                                        (states, pos))
        q = states >> jnp.uint32(precision)
        r = states & mask
        if slots.ndim == 2:
            idx = slots[lane_ids, r.astype(jnp.int32)]
            f = freqs[lane_ids, idx].astype(jnp.uint32)
            c = cums[lane_ids, idx].astype(jnp.uint32)
        else:
            idx = slots[r.astype(jnp.int32)]
            f = freqs[idx].astype(jnp.uint32)
            c = cums[idx].astype(jnp.uint32)
        new_states = q * f + r - c
        states = jnp.where(active, new_states, states)
        return (states, pos), jnp.where(active, idx, -1)

    (_, _), out = jax.lax.scan(step, (states, pos), jnp.arange(max_T))
    return out.T  # (L, T)


def encode_streams_device(symbol_streams: list[np.ndarray], freq_counts,
                          precision: int = 12) -> list[bytes]:
    """Host convenience wrapper: pad streams into lanes, run the device
    encoder, slice the per-lane byte blobs (bit-exact with the host coder)."""
    from ..entropy.rans import normalize_freq_counts

    dist = normalize_freq_counts(freq_counts, precision)
    cums = np.concatenate(([0], np.cumsum(dist)[:-1]))
    L = len(symbol_streams)
    T = max(len(s) for s in symbol_streams)
    symbols = np.zeros((L, T), dtype=np.int32)
    lengths = np.zeros(L, dtype=np.int32)
    for i, s in enumerate(symbol_streams):
        symbols[i, :len(s)] = s
        lengths[i] = len(s)
    bufs, nbytes = jax.jit(
        rans_encode_lanes, static_argnames=("precision",))(
        jnp.asarray(symbols), jnp.asarray(dist, dtype=jnp.uint32),
        jnp.asarray(cums, dtype=jnp.uint32), jnp.asarray(lengths),
        precision=precision)
    bufs = np.asarray(bufs)
    nbytes = np.asarray(nbytes)
    return [bufs[i, :nbytes[i]].tobytes() for i in range(L)]


def encode_direct_coded_streams_device(streams: list[np.ndarray]) -> list[bytes]:
    """Full DirectCoded symbol payloads for many independent streams with
    the rANS inner loop on the accelerator, bit-exact with the host
    ``encode_symbols(s, n, DIRECT_CODED, w)`` (tests pin this).

    Each stream gets its own frequency table (per-mesh tables in corpus
    batches); lanes are bucketed by rANS precision (a function of each
    stream's nonzero count) and each bucket runs as one device call with
    per-lane tables. Header bytes (method, bit length, serialized table,
    leb128 blob length) are assembled on host.
    """
    from ..entropy.rans import normalize_freq_counts, serialize_rans_table
    from ..entropy.symbol_coding import (
        DIRECT_CODED, bit_length_u64, rans_precision_for_bit_length)
    from ..wire.byte_io import ByteWriter
    from ..wire.varint import leb128_write

    L = len(streams)
    streams = [np.asarray(s, dtype=np.int64).ravel() for s in streams]
    precisions = np.empty(L, dtype=np.int64)
    dists: list[np.ndarray] = []
    for i, s in enumerate(streams):
        num_nonzero = int(np.count_nonzero(s))
        bl = int(bit_length_u64(np.asarray([num_nonzero]))[0]) + 1
        bl = max(1, min(18, bl))
        precisions[i] = rans_precision_for_bit_length(bl)
        max_symbol = int(s.max()) if len(s) else 0
        counts = np.bincount(s, minlength=max_symbol + 1)
        dists.append(normalize_freq_counts(counts, int(precisions[i])))

    blobs: list[bytes | None] = [None] * L
    for prec in sorted(set(precisions.tolist())):
        lanes = [i for i in range(L) if precisions[i] == prec]
        T = max((len(streams[i]) for i in lanes), default=0)
        S = max((len(dists[i]) for i in lanes), default=1)
        sym = np.zeros((len(lanes), max(T, 1)), dtype=np.int32)
        lengths = np.zeros(len(lanes), dtype=np.int32)
        freqs = np.zeros((len(lanes), S), dtype=np.uint32)
        cums = np.zeros((len(lanes), S), dtype=np.uint32)
        for k, i in enumerate(lanes):
            sym[k, :len(streams[i])] = streams[i][::-1]  # reversed feed
            lengths[k] = len(streams[i])
            d = dists[i]
            freqs[k, :len(d)] = d
            cums[k, 1:len(d)] = np.cumsum(d)[:-1]
        bufs, nbytes = jax.jit(
            rans_encode_lanes, static_argnames=("precision",))(
            jnp.asarray(sym), jnp.asarray(freqs), jnp.asarray(cums),
            jnp.asarray(lengths), precision=int(prec))
        bufs = np.asarray(bufs)
        nbytes = np.asarray(nbytes)
        for k, i in enumerate(lanes):
            blobs[i] = bufs[k, :nbytes[k]].tobytes()

    out: list[bytes] = []
    for i in range(L):
        w = ByteWriter()
        w.write_u8(DIRECT_CODED)
        num_nonzero = int(np.count_nonzero(streams[i]))
        bl = max(1, min(18, int(bit_length_u64(
            np.asarray([num_nonzero]))[0]) + 1))
        w.write_u8(bl)
        serialize_rans_table(dists[i], w)
        leb128_write(len(blobs[i]), w)
        w.write_bytes(blobs[i])
        out.append(w.getvalue())
    return out
