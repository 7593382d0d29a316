"""Probe: can a D2H readback overlap queued device compute through the
axon tunnel, and is execution strictly in dispatch order?

Scenario A: materialize BIG on device; queue HEAVY; read BIG back while
HEAVY computes. If t_read ~= t_read_alone and the post-wait ~= t_heavy,
transfers overlap compute. If t_read ~= t_heavy + t_read_alone, the
readback waits for the queue.

Scenario B: queue HEAVY; dispatch a tiny slice op on an INDEPENDENT
array and read it. Fast return => out-of-order; slow => in-order queue.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

import os
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "..", "tests", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@jax.jit
def heavy(x):
    def body(c, _):
        c = (c * jnp.uint32(1664525) + jnp.uint32(1013904223))
        return c, None
    c, _ = jax.lax.scan(body, x, None, length=30000)
    return c


@jax.jit
def tiny_slice(y):
    return y[:1, :1]


def sync(a):
    return np.asarray(a)


def main():
    x = jnp.arange(512 * 12288, dtype=jnp.uint32).reshape(512, 12288)
    big = jnp.ones((512, 4096), jnp.uint32)  # ~8.4 MB

    r = heavy(x)
    sync(r[:1, :1])  # compile + settle
    sync(tiny_slice(big))

    t0 = time.perf_counter()
    r = heavy(x)
    sync(r[:1, :1])
    t_heavy = time.perf_counter() - t0
    print(f"heavy compute: {t_heavy*1e3:.1f} ms")

    t0 = time.perf_counter()
    sync(big)
    t_read = time.perf_counter() - t0
    print(f"readback alone (8.4 MB): {t_read*1e3:.1f} ms")

    # A: read BIG while HEAVY is queued
    r = heavy(x)
    t0 = time.perf_counter()
    sync(big)
    t1 = time.perf_counter()
    sync(r[:1, :1])
    t2 = time.perf_counter()
    print(f"A: read-during-compute {1e3*(t1-t0):.1f} ms, "
          f"then wait-for-heavy {1e3*(t2-t1):.1f} ms")

    # B: tiny independent op behind HEAVY in the queue
    r = heavy(x)
    job = tiny_slice(big)
    t0 = time.perf_counter()
    sync(job)
    t1 = time.perf_counter()
    sync(r[:1, :1])
    t2 = time.perf_counter()
    print(f"B: tiny-slice-behind-heavy {1e3*(t1-t0):.1f} ms, "
          f"then wait-for-heavy {1e3*(t2-t1):.1f} ms")

    # C: does a D2H of result k overlap compute k+1 when the readback op
    # was dispatched BEFORE compute k+1? (the pipelined-encoder shape)
    rA = heavy(x)
    sliceA = tiny_slice(rA)  # dispatched before heavy B
    bigA = rA[:, :4096]      # 8.4 MB view op, dispatched before heavy B
    rB = heavy(x + jnp.uint32(1))
    t0 = time.perf_counter()
    sync(sliceA)
    t1 = time.perf_counter()
    sync(bigA)
    t2 = time.perf_counter()
    sync(rB[:1, :1])
    t3 = time.perf_counter()
    print(f"C: sync sliceA {1e3*(t1-t0):.1f} ms, big readback A "
          f"{1e3*(t2-t1):.1f} ms, then wait heavy B {1e3*(t3-t2):.1f} ms")


if __name__ == "__main__":
    main()
