"""Decompose the word-packed entropy path on the live backend:
pre-gather (packed tables) vs scan core (recurrence + word compaction)
vs a same-shape sort proxy, plus the full kernel — all in one process so
the shares are comparable (CLAUDE.md timing rule).

  python benchmarks/profile_words.py [L] [T]

Use on real hardware to decide where the entropy stage's device time
actually goes before optimizing (the gather-vs-MXU-one-hot question)."""
import os
import sys
import time

import numpy as np

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "..", "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import functools  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from tpudraco.ops import rans_lanes as rl  # noqa: E402


def timeit(label, fn, *a, n=5):
    fn(*a)  # warm/compile
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*a)
        jax.tree_util.tree_map(
            lambda x: np.asarray(x[..., :1]) if hasattr(x, "shape") else x,
            r)  # tiny readback = real sync point through the tunnel
        best = min(best, time.perf_counter() - t0)
    print(f"{label:>24}: {best * 1e3:8.1f} ms")
    return best


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 12288
    prec = 13
    rng = np.random.default_rng(0)
    S = 128
    dist = np.maximum(rng.poisson(40, S), 1).astype(np.int64)
    dist = np.minimum(dist * (1 << prec) // dist.sum(), (1 << prec) - S)
    dist[0] += (1 << prec) - dist.sum()
    cums = np.concatenate([[0], np.cumsum(dist)[:-1]])
    syms = rng.integers(0, S, (L, T)).astype(np.int32)
    freqs_b = jnp.asarray(np.broadcast_to(dist.astype(np.uint32),
                                          (L, S)).copy())
    cums_b = jnp.asarray(np.broadcast_to(cums.astype(np.uint32),
                                         (L, S)).copy())
    syms_dev = jnp.asarray(syms)
    lengths = jnp.asarray(np.full(L, T, np.int32))
    prec_dev = jnp.asarray(np.full(L, prec, np.int32))
    print(f"backend={jax.default_backend()} L={L} T={T} S={S} prec={prec}")

    @jax.jit
    def pregather(sym, fq, cq):
        idx = jnp.clip(sym, 0, S - 1)

        def take(tbl):
            return jnp.take_along_axis(tbl, idx, axis=1)

        return rl._take_packed_u32u8(fq, cq, take)

    @jax.jit
    def core(fs, cs, lengths, prec_dev):
        return rl._words_scan_core(fs, cs, lengths, T,
                                   jnp.uint32(4) << prec_dev.astype(
                                       jnp.uint32),
                                   prec_dev.astype(jnp.uint32))

    @jax.jit
    def sort_proxy(keys):
        return jnp.sort(keys, axis=1)

    fs, cs = jax.block_until_ready(pregather(syms_dev, freqs_b, cums_b))
    keys = jnp.asarray(rng.integers(0, 1 << 62, (L, T)).astype(np.uint64))

    t_g = timeit("pre-gather (packed)", pregather, syms_dev, freqs_b,
                 cums_b)
    t_c = timeit("scan core (rec+sort)", core, fs, cs, lengths, prec_dev)
    t_s = timeit("sort proxy (L,T) u64", sort_proxy, keys)
    def full(compact):
        return rl._rans_scan_lanes_words_vprec(
            syms_dev, freqs_b, cums_b, lengths, prec_dev,
            compact=compact)

    t_f = timeit("full words kernel", full, "sort")
    t_m = timeit("full kernel (marks)", full, "marks")
    t_kv = timeit("full kernel (sortkv)", full, "sortkv")
    t_f2 = timeit("full kernel (sort, again)", full, "sort")
    print(f"shares of full: gather {t_g / t_f:.0%}, core {t_c / t_f:.0%} "
          f"(sort proxy {t_s / t_f:.0%} of full); "
          f"marks vs sort: {min(t_f, t_f2) / t_m:.2f}x; "
          f"sortkv vs sort: {min(t_f, t_f2) / t_kv:.2f}x")


if __name__ == "__main__":
    main()
