"""Upload-leg A/B (round 5 residue attack): the packed upload currently
ships TWO buffers (lo bytes + high nibbles) as separate H2D transfers.
Does a single concatenated buffer (one transfer message) beat it on the
tunnel? Also re-times the u16 direct upload for reference. Fresh buffers
per trial (jax caches host copies), interleaved best-of, one tiny
readback per trial as the sync point (its ~25-31 ms latency is constant
across variants, so deltas are transfer-side).

  python benchmarks/ab_upload.py [B] [N] [TRIALS]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..",
                               "tests/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import jax.numpy as jnp  # noqa: E402

import __graft_entry__ as g  # noqa: E402
from tpudraco.native import pack12, quantize_batch  # noqa: E402
from tpudraco.ops import unpack12_kernel  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 5
BITS = 11

positions, faces = g._make_mesh_batch(batch=B, n=N, seed=1)
q_u16 = quantize_batch(positions, BITS)[0]
lo0, hb0 = pack12(q_u16)
lo_n, hb_n = lo0.nbytes, hb0.nbytes
print(f"B={B} V={q_u16.shape[1]} u16={q_u16.nbytes/1e6:.2f}MB "
      f"packed={(lo_n+hb_n)/1e6:.2f}MB backend={jax.default_backend()}")


@jax.jit
def _two(lo, hb):
    return unpack12_kernel(lo, hb).sum()


@jax.jit
def _one(buf):
    lo = buf[:lo_n].reshape(lo0.shape)
    hb = buf[lo_n:].reshape(hb0.shape)
    return unpack12_kernel(lo, hb).sum()


@jax.jit
def _u16(q):
    return q.astype(jnp.int32).sum()


def run(label, make, fn):
    # warm compile
    np.asarray(fn(*make()))
    best = float("inf")
    for _ in range(TRIALS):
        args = make()
        t0 = time.perf_counter()
        np.asarray(fn(*(jax.device_put(a) for a in args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:26s} {best*1e3:8.1f} ms")
    return best


results = {}
for _ in range(2):  # interleave the whole set twice, keep global best
    t = run("two_buffers(lo,hb)", lambda: (lo0.copy(), hb0.copy()), _two)
    results["two"] = min(results.get("two", 9e9), t)
    t = run("one_concat_buffer",
            lambda: (np.concatenate([lo0.reshape(-1), hb0.reshape(-1)]),),
            _one)
    results["one"] = min(results.get("one", 9e9), t)
    t = run("u16_direct", lambda: (q_u16.copy(),), _u16)
    results["u16"] = min(results.get("u16", 9e9), t)
print({k: round(v * 1e3, 1) for k, v in results.items()},
      "one_vs_two_saving_ms:", round((results["two"] - results["one"]) * 1e3, 1))
