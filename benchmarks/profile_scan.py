"""Decompose _rans_scan_lanes: scan recurrence vs argsort compaction vs
Pallas kernel, on the bench workload (512 lanes x 12288 symbols)."""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "tests/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import functools
import jax.numpy as jnp

from tpudraco.ops.rans_lanes import MAX_RENORM_PER_SYMBOL, SYMBOLS_PER_STEP

L, T = 512, 12288
prec = 12
rng = np.random.RandomState(0)
# realistic small-alphabet tables
S = 64
dist = np.maximum(rng.poisson(60, S), 1).astype(np.int64)
dist = np.minimum(dist * (1 << prec) // dist.sum(), (1 << prec) - S)
dist[0] += (1 << prec) - dist.sum()
cums = np.concatenate([[0], np.cumsum(dist)[:-1]]).astype(np.uint32)
syms = rng.randint(0, S, (L, T)).astype(np.int32)
fs = jnp.asarray(dist.astype(np.uint32)[syms])
cs = jnp.asarray(cums[syms])
lengths = jnp.asarray(np.full(L, T, np.int32))


@functools.partial(jax.jit, static_argnames=("precision",))
def scan_only(fs, cs, lengths, precision=12):
    l_base = (1 << precision) << 2
    base_sh = l_base >> precision
    LL, TT = fs.shape
    K = SYMBOLS_PER_STEP

    def one_symbol(states, f, cum, active):
        limit = (jnp.uint32(base_sh) * f) << jnp.uint32(8)
        emitted = []
        for _ in range(MAX_RENORM_PER_SYMBOL):
            do = active & (states >= limit)
            byte = (states & jnp.uint32(0xFF)).astype(jnp.int16)
            emitted.append(jnp.where(do, byte, jnp.int16(256)))
            states = jnp.where(do, states >> jnp.uint32(8), states)
        new_states = ((states // f) << jnp.uint32(precision)) \
            + states % f + cum
        states = jnp.where(active, new_states, states)
        return states, emitted

    def step(states, s):
        emitted = []
        for k in range(K):
            i = s * K + k
            states, e = one_symbol(states, fs[:, i], cs[:, i], i < lengths)
            emitted.extend(e)
        return states, jnp.stack(emitted)

    states0 = jnp.full((LL,), l_base, dtype=jnp.uint32)
    states, emits = jax.lax.scan(step, states0, jnp.arange(TT // K))
    emits = emits.reshape(TT, MAX_RENORM_PER_SYMBOL, LL)
    flat = emits.transpose(2, 0, 1).reshape(LL, TT * MAX_RENORM_PER_SYMBOL)
    return flat.astype(jnp.uint8), flat != 256, states


@jax.jit
def compact_only(emitted, is_byte):
    not_byte = ~is_byte
    order = jnp.argsort(not_byte, axis=1, stable=True)
    compacted = jnp.take_along_axis(emitted, order, axis=1)
    counts = is_byte.sum(axis=1).astype(jnp.int32)
    return compacted[:, :2 * T + 8], counts


def timeit(fn, *a, n=3):
    out = fn(*a)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


t_scan, (em, ib, st) = timeit(scan_only, fs, cs, lengths)
print(f"scan only:        {t_scan*1e3:8.1f} ms")
t_comp, _ = timeit(compact_only, em, ib)
print(f"argsort compact:  {t_comp*1e3:8.1f} ms")

from tpudraco.ops.pallas_kernels import rans_scan_pallas
t_pal, (em2, ib2, st2) = timeit(
    functools.partial(rans_scan_pallas, precision=prec), fs, cs, lengths)
print(f"pallas scan:      {t_pal*1e3:8.1f} ms")
assert np.array_equal(np.asarray(st), np.asarray(st2)), "state mismatch"
# byte-stream equality where mask set
a = np.asarray(em); am = np.asarray(ib)
b = np.asarray(em2); bm = np.asarray(ib2)
assert np.array_equal(am, bm) and np.array_equal(a[am], b[bm]), "bytes differ"
t_pc, _ = timeit(compact_only, em2, ib2)
print(f"pallas + compact: {(t_pal + t_pc)*1e3:8.1f} ms")
