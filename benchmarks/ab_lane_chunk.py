"""A/B the pipelined lane-chunked group entropy encode vs the one-shot
scan, back-to-back in ONE process (CLAUDE.md: never compare timings from
different windows through this tunnel).

The chunked path (rans_lanes.LANE_CHUNK) queues every chunk's word scan
plus its readback slices up front so chunk k's D2H overlaps chunk k+1's
compute (probe_overlap.py scenario C). Whether that wins depends on how
the scan cost scales with lane width: if each scan step is fixed-overhead
bound, C chunks cost ~C x the one-shot scan compute and the overlap
saving drowns. This measures the real trade on the live backend.

Usage: python benchmarks/ab_lane_chunk.py [B] [T]
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "..", "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from tpudraco.ops import rans_lanes  # noqa: E402


def make_inputs(B, T, C=3, seed=7):
    rng = np.random.default_rng(seed)
    syms = (rng.integers(0, 9, size=(B, T, C)) ** 2).astype(np.int32)
    counts = np.stack([np.bincount(s.ravel(), minlength=128)
                       for s in syms]).astype(np.int32)
    return jnp.asarray(syms), jnp.asarray(counts), syms


def run(chunk, tables_dev, syms_dev, counts_dev, iters=3, compact="sort",
        k=8, kern=False):
    rans_lanes.LANE_CHUNK = chunk
    rans_lanes.DEVICE_TABLES = tables_dev
    rans_lanes.SYMBOLS_PER_STEP = k
    rans_lanes.set_words_kernel(kern)
    if rans_lanes.WORDS_COMPACT != compact:
        rans_lanes.set_words_compact(compact)
    rans_lanes.encode_group_entropy_device(syms_dev, counts_dev)  # warm
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        blobs = rans_lanes.encode_group_entropy_device(syms_dev, counts_dev)
        best = min(best, time.perf_counter() - t0)
    return best, blobs


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 4070
    syms_dev, counts_dev, syms = make_inputs(B, T)
    print(f"backend={jax.default_backend()} B={B} T={T}")

    one_shot = 1 << 30  # never triggers the chunk condition
    results = {}
    # interleave trials so tunnel drift hits all settings equally; cover
    # the {host,device}-tables x {one-shot,chunked} x {sort,marks}
    # compaction matrix, the contested cells twice
    settings = [(one_shot, False, "sort", 8), (one_shot, True, "sort", 8),
                (one_shot, True, "marks", 8),
                (one_shot, True, "sortkv", 8),
                (64, True, "sort", 8),
                (128, True, "sort", 8), (128, True, "marks", 8),
                # the PRODUCTION default combo (LANE_CHUNK=128 + sortkv
                # on TPU), twice — it was missing from the round-4 matrix
                (128, True, "sortkv", 8), (128, True, "sortkv", 8),
                (256, True, "sort", 8), (128, False, "sort", 8),
                (one_shot, False, "marks", 8),
                (one_shot, False, "sortkv", 8),
                (one_shot, True, "sort", 16),
                (one_shot, True, "sortkv", 16),
                (one_shot, True, "marks", 16),
                (one_shot, False, "sort", 8),
                (one_shot, True, "sort", 8), (one_shot, True, "marks", 8),
                (one_shot, True, "sortkv", 8),
                (one_shot, True, "sortkv", 16),
                (one_shot, True, "sortkv", 32),
                (one_shot, True, "sortkv", 8, True),
                (one_shot, True, "sortkv", 32),
                (one_shot, True, "sortkv", 8, True),
                (one_shot, True, "sortkv", 16)]
    for cell in settings:
        ch, dtab, compact, k = cell[:4]
        kern = cell[4] if len(cell) > 4 else False
        dt, blobs = run(ch, dtab, syms_dev, counts_dev, compact=compact,
                        k=k, kern=kern)
        label = (("dtab" if dtab else "htab") + "/"
                 + ("one-shot" if ch == one_shot else f"chunk={ch}")
                 + "/" + compact + (f"/k={k}" if k != 8 else "")
                 + ("/KERNEL" if kern else ""))
        results.setdefault(label, []).append(dt)
        print(f"{label:>22}: {dt*1e3:8.1f} ms "
              f"({B*T*3*4/dt/1e6:7.1f} MB/s syms)", flush=True)
    base = min(results["htab/one-shot/sort"])
    for label, ts in results.items():
        if label != "htab/one-shot/sort":
            print(f"{label}: {base/min(ts):.2f}x vs htab/one-shot/sort")
    # byte sanity across the matrix
    ref = None
    for ch, dtab, compact, k in ((one_shot, False, "sort", 8),
                                 (128, True, "sort", 8),
                                 (128, False, "sort", 8),
                                 (one_shot, True, "sort", 8),
                                 (one_shot, True, "marks", 8),
                                 (one_shot, False, "marks", 8),
                                 (one_shot, True, "sortkv", 8),
                                 (one_shot, False, "sortkv", 8),
                                 (one_shot, True, "sort", 16),
                                 (one_shot, True, "sortkv", 16),
                                 (one_shot, True, "marks", 16)):
        rans_lanes.LANE_CHUNK = ch
        rans_lanes.DEVICE_TABLES = dtab
        rans_lanes.SYMBOLS_PER_STEP = k
        rans_lanes.set_words_compact(compact)
        got = rans_lanes.encode_group_entropy_device(syms_dev, counts_dev)
        assert ref is None or got == ref, \
            f"bytes differ at {ch},{dtab},{compact}"
        ref = got
    # kernel byte check rides the matrix too
    rans_lanes.set_words_kernel(True)
    rans_lanes.LANE_CHUNK = one_shot
    rans_lanes.DEVICE_TABLES = True
    rans_lanes.SYMBOLS_PER_STEP = 8
    rans_lanes.set_words_compact("sortkv")
    got = rans_lanes.encode_group_entropy_device(syms_dev, counts_dev)
    assert got == ref, "bytes differ under the Pallas words kernel"
    rans_lanes.set_words_kernel(None)
    rans_lanes.set_words_compact(None)
    rans_lanes.SYMBOLS_PER_STEP = 8
    print("bytes identical across the settings matrix")


if __name__ == "__main__":
    main()
