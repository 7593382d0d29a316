"""Round-3 profiling: where does the e2e device encode wall time go?

Breaks the serial chain in encode_group_entropy_device into stages and
times each (in-context, warm). Not part of the shipped package.
"""
import os
import time

import sys, os as _os
sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), '..'))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "tests/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp

import __graft_entry__ as g
from tpudraco.ops import encode_step
from tpudraco.ops.rans_lanes import (_rans_scan_lanes, _flip_lanes,
                                     _cast_u16)
from tpudraco.entropy.rans import normalize_freq_counts, serialize_rans_table
from tpudraco.entropy.symbol_coding import (
    DIRECT_CODED, bit_length_u64, rans_precision_for_bit_length)
from tpudraco.wire.byte_io import ByteWriter
from tpudraco.wire.varint import leb128_write

BATCH, N = 512, 64
positions, faces = g._make_mesh_batch(batch=BATCH, n=N, seed=1)
gn = g._topology_gathers(positions[0], faces)
gathers = {k: jnp.asarray(v) for k, v in gn.items()}


@jax.jit
def step(pos):
    out = encode_step(pos, gathers, bits=11)
    return out["symbols"], out["counts"]


pos = jnp.asarray(positions)

def run_once(timings):
    t0 = time.perf_counter()
    syms, counts_dev = step(pos)
    syms.block_until_ready()
    t1 = time.perf_counter(); timings.setdefault("step_compute", []).append(t1 - t0)

    counts = np.asarray(_cast_u16(counts_dev)).astype(np.int64)
    t2 = time.perf_counter(); timings.setdefault("counts_readback", []).append(t2 - t1)

    B, T, C = syms.shape
    n_sym = T * C
    num_nonzero = n_sym - counts[:, 0]
    bls = np.clip(bit_length_u64(num_nonzero.astype(np.uint64)) + 1, 1, 18)
    precisions = np.asarray([rans_precision_for_bit_length(int(b)) for b in bls])
    max_syms = np.array([int(np.flatnonzero(c)[-1]) if c.any() else 0 for c in counts])
    dists = [normalize_freq_counts(counts[i][:max_syms[i] + 1], int(precisions[i]))
             for i in range(B)]
    t3 = time.perf_counter(); timings.setdefault("table_build", []).append(t3 - t2)

    lanes_dev = _flip_lanes(syms)
    prec = int(precisions[0])
    assert np.all(precisions == prec)
    S = 16
    while S < max(len(d) for d in dists):
        S *= 2
    freqs = np.zeros((B, S), dtype=np.uint32)
    cums = np.zeros((B, S), dtype=np.uint32)
    for i in range(B):
        d = dists[i]
        freqs[i, :len(d)] = d
        cums[i, 1:len(d)] = np.cumsum(d)[:-1]
    lengths = np.full(B, n_sym, np.int32)
    t4 = time.perf_counter(); timings.setdefault("table_pack", []).append(t4 - t3)

    compacted, cnts, packed, nflush = _rans_scan_lanes(
        lanes_dev, jnp.asarray(freqs), jnp.asarray(cums),
        jnp.asarray(lengths), precision=prec)
    compacted.block_until_ready()
    t5 = time.perf_counter(); timings.setdefault("scan_compute", []).append(t5 - t4)

    counts_b = np.asarray(cnts).astype(np.int64)
    max_b = int(counts_b.max())
    bucket = min(int(compacted.shape[1]), max(2048, -(-max_b // 2048) * 2048))
    got = np.asarray(compacted[:, :bucket]) if bucket < int(compacted.shape[1]) else np.asarray(compacted)
    packed_np = np.asarray(packed).astype(np.uint64)
    nflush_np = np.asarray(nflush).astype(np.int64)
    t6 = time.perf_counter(); timings.setdefault("bytes_readback", []).append(t6 - t5)
    timings.setdefault("bytes_mb", []).append(got.nbytes / 1e6)

    cap = 2 * n_sym + 8
    buffers = np.zeros((B, cap), dtype=np.uint8)
    buffers[:, :got.shape[1]] = got
    b_idx = np.arange(4, dtype=np.int64)[None, :]
    mask = b_idx < nflush_np[:, None]
    rows = np.repeat(np.arange(B, dtype=np.int64)[:, None], 4, axis=1)
    cols = counts_b[:, None] + b_idx
    vals = ((packed_np[:, None] >> (8 * b_idx).astype(np.uint64)) & np.uint64(0xFF)).astype(np.uint8)
    buffers[rows[mask], cols[mask]] = vals[mask]
    nbytes = (counts_b + nflush_np).astype(np.int32)

    out = []
    for i in range(B):
        w = ByteWriter()
        w.write_u8(DIRECT_CODED)
        w.write_u8(int(bls[i]))
        serialize_rans_table(dists[i], w)
        leb128_write(len(blob := buffers[i, :nbytes[i]].tobytes()), w)
        w.write_bytes(blob)
        out.append(w.getvalue())
    t7 = time.perf_counter(); timings.setdefault("assembly", []).append(t7 - t6)
    timings.setdefault("total", []).append(t7 - t0)
    return out


timings = {}
run_once(timings)  # warm/compile
timings = {}
for _ in range(3):
    run_once(timings)
for k, v in timings.items():
    print(f"{k:18s} min={min(v)*1e3:8.1f} ms  all={[round(x*1e3,1) for x in v]}")
raw_mb = positions.nbytes / 1e6
print(f"raw MB: {raw_mb:.1f}; best e2e MB/s: {raw_mb / min(timings['total']):.2f}")
