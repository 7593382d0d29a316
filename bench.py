"""Benchmarks on the real chip. Default prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N} for the
END-TO-END device encode (step -> device entropy -> final per-mesh
DirectCoded payload bytes) over a batched mesh corpus.

  python bench.py                 # e2e encode metric (the recorded one)
  python bench.py --metric step   # round-1 fused-step metric (continuity)
  python bench.py --metric decode # device rANS decode-lanes throughput
  python bench.py --metric all    # one JSON line per metric

Baselines are the equivalent single-threaded host pipelines measured once
on this machine (the reference publishes no numbers, BASELINE.md):
  - step: reference-style host-python pipeline for the same fused stage
  - e2e:  this framework's own topology-cached host encoder (C++ entropy,
          vectorized predictions) — a HARDER baseline than the reference
  - decode: the host C++ symbol decoder, single stream at a time

All device numbers include host<->device transfer through the axon tunnel
(~3 ms/dispatch, ~25 MB/s readback); on directly-attached chips the
on-chip compute (reported separately in BASELINE.md) dominates instead.
"""

import argparse
import json
import time

import numpy as np

BASELINE_STEP_HOST_MBPS = 60.0    # host-python fused step (round 1)
BASELINE_E2E_HOST_MBPS = 22.5     # host topology-cached encode_mesh loop
BASELINE_DECODE_HOST_MSYM = 4.5   # host C++ decode_symbols, single-thread

BATCH, N, SLICES = 512, 64, 16


def _setup():
    import jax.numpy as jnp

    import __graft_entry__ as g

    positions, faces = g._make_mesh_batch(batch=BATCH, n=N, seed=1)
    gn = g._topology_gathers(positions[0], faces)
    gathers = {k: jnp.asarray(v) for k, v in gn.items()}
    return positions, faces, gn, gathers


def bench_step(positions, gn, gathers):
    """Round-1 metric: the fused device step only, streaming SLICES batch
    slices per dispatch (quantize -> predict -> residual -> histogram)."""
    import jax
    import jax.numpy as jnp

    from tpudraco.ops import (build_combined_matrix, encode_step,
                              encode_step_pallas, predict_matmul_viable)

    num_vals = positions.shape[1]
    T = int(gn["order"].shape[0])
    use_pallas = predict_matmul_viable(2 * T, num_vals, BATCH, 3)
    M = (jnp.asarray(build_combined_matrix(gn, num_vals))
         if use_pallas else None)

    def one(pos):
        if use_pallas:
            out = encode_step_pallas(pos, gathers, M, bits=11)
        else:
            out = encode_step(pos, gathers, bits=11)
        return out["symbols"], out["counts"]

    @jax.jit
    def step(pos_slices):
        return jax.lax.map(one, pos_slices)

    pos = jnp.asarray(
        np.broadcast_to(positions, (SLICES,) + positions.shape).copy())
    syms, counts = step(pos)
    syms.block_until_ready()  # compile

    iters, trials = 5, 4
    dt = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            syms, counts = step(pos)
        syms.block_until_ready()
        dt = min(dt, (time.perf_counter() - t0) / iters)

    mbps = positions.nbytes * SLICES / dt / 1e6
    return {"metric": "device_encode_step_throughput",
            "value": round(mbps, 2), "unit": "MB/s",
            "vs_baseline": round(mbps / BASELINE_STEP_HOST_MBPS, 3)}


def _e2e_once(step, pos):
    from tpudraco.ops.rans_lanes import encode_group_entropy_device

    syms, counts = step(pos)
    return encode_group_entropy_device(syms, counts)


def bench_e2e(positions, gathers):
    """End-to-end device encode: fused step -> device multi-lane rANS ->
    final per-mesh DirectCoded payload bytes on host. This is the recorded
    cross-round metric (VERDICT r1 #3: entropy + assembly included)."""
    import jax
    import jax.numpy as jnp

    from tpudraco.ops import encode_step

    @jax.jit
    def step(pos):
        out = encode_step(pos, gathers, bits=11)
        return out["symbols"], out["counts"]

    pos = jnp.asarray(positions)
    payloads = _e2e_once(step, pos)  # compile both stages
    assert payloads and all(p for p in payloads)

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        payloads = _e2e_once(step, pos)
        best = min(best, time.perf_counter() - t0)

    mbps = positions.nbytes / best / 1e6
    return {"metric": "device_encode_e2e_throughput",
            "value": round(mbps, 2), "unit": "MB/s",
            "vs_baseline": round(mbps / BASELINE_E2E_HOST_MBPS, 3)}


def bench_decode(positions, gathers):
    """Device rANS decode lanes: per-lane tables, buffers up, symbols
    back (the decoder-side entropy stage, VERDICT r1 #3)."""
    import jax
    import jax.numpy as jnp

    from tpudraco.entropy.rans import normalize_freq_counts
    from tpudraco.ops import encode_step
    from tpudraco.ops.rans_lanes import (rans_decode_lanes,
                                         rans_encode_lanes)

    @jax.jit
    def step(pos):
        out = encode_step(pos, gathers, bits=11)
        return out["symbols"], out["counts"]

    syms, counts = step(jnp.asarray(positions))
    syms_np = np.asarray(syms)
    B, T, C = syms_np.shape
    n_sym = T * C
    counts_np = np.asarray(counts)
    prec = 12
    dists = [normalize_freq_counts(
        counts_np[i][:int(np.flatnonzero(counts_np[i])[-1]) + 1], prec)
        for i in range(B)]
    S = 16
    while S < max(len(d) for d in dists):
        S *= 2
    freqs = np.zeros((B, S), np.uint32)
    cums = np.zeros((B, S), np.uint32)
    slots = np.zeros((B, 1 << prec), np.int32)
    for i, d in enumerate(dists):
        freqs[i, :len(d)] = d
        cums[i, 1:len(d)] = np.cumsum(d)[:-1]
        reps = np.repeat(np.arange(len(d)), d)
        slots[i, :len(reps)] = reps
    lanes = syms_np.reshape(B, n_sym)[:, ::-1].astype(np.int32)
    bufs, nbytes = rans_encode_lanes(
        jnp.asarray(lanes), jnp.asarray(freqs), jnp.asarray(cums),
        jnp.asarray(np.full(B, n_sym, np.int32)), precision=prec)

    cnts = np.full(B, n_sym, np.int64)
    out = rans_decode_lanes(jnp.asarray(bufs), jnp.asarray(nbytes),
                            jnp.asarray(freqs), jnp.asarray(cums),
                            jnp.asarray(slots), cnts, precision=prec)
    got = np.asarray(out)
    # decode pops in reverse emission order == the original forward stream
    assert np.array_equal(got, lanes[:, ::-1]), "decode mismatch"

    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        out = rans_decode_lanes(jnp.asarray(bufs), jnp.asarray(nbytes),
                                jnp.asarray(freqs), jnp.asarray(cums),
                                jnp.asarray(slots), cnts, precision=prec)
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)

    msym = B * n_sym / best / 1e6
    return {"metric": "device_rans_decode_throughput",
            "value": round(msym, 2), "unit": "Msym/s",
            "vs_baseline": round(msym / BASELINE_DECODE_HOST_MSYM, 3)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--metric", choices=("e2e", "step", "decode", "all"),
                    default="e2e")
    args = ap.parse_args()

    positions, faces, gn, gathers = _setup()
    if args.metric in ("e2e", "all"):
        print(json.dumps(bench_e2e(positions, gathers)))
    if args.metric in ("step", "all"):
        print(json.dumps(bench_step(positions, gn, gathers)))
    if args.metric in ("decode", "all"):
        print(json.dumps(bench_decode(positions, gathers)))


if __name__ == "__main__":
    main()
