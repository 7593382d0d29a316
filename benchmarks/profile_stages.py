"""Round-4 stage profiler for the honest e2e pipeline: splits the
opaque upload_step_sync / hist_sync walls into their parts, measured
in-context warm on the real chip. Every timed read uses FRESH data (jax
caches an array's host copy after the first np.asarray — CLAUDE.md).

  python benchmarks/profile_stages.py [B] [N]

Stages timed (each synced by a tiny readback, latency reported apart):
  upload      H2D of the uint16 quantized batch, nothing else
  step        fused predict/residual/hist from resident q
  flip        _flip_lanes of resident symbols
  normalize   _normalize_tables_x64 from resident counts
  combo       the [tiny|dist] packed readback
  scan        one LANE_CHUNK words-scan chunk
  payload     the words readback slice for that chunk
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
from tpudraco.parallel.batch import (PreparedTopology,  # noqa: E402
                                     _jit_step_gather_q, _jit_step_pallas_q,
                                     topology_gathers_np)
from tpudraco.models import (AttributeDomain, AttributeType,  # noqa: E402
                             MeshBuilder)
from tpudraco.native import quantize_batch  # noqa: E402
from tpudraco.ops import build_combined_matrix, predict_matmul_viable  # noqa: E402
from tpudraco.ops.rans_lanes import (LANE_CHUNK, SYMBOLS_PER_STEP,  # noqa: E402
                                     _concat_tiny_dist, _dispatch_words_readback,
                                     _flip_lanes, _normalize_tables_x64,
                                     _words_compact, _words_scan_chunk_vprec)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BITS = 11

positions, faces = g._make_mesh_batch(batch=B, n=N, seed=1)
mb = MeshBuilder()
mb.set_connectivity_attribute(faces)
mb.add_attribute(positions[0], AttributeType.POSITION,
                 AttributeDomain.POSITION)
mesh0 = mb.build()
topo = PreparedTopology(mesh0)
gn = topology_gathers_np(topo, mesh0.position_attribute())
gathers = {k: jnp.asarray(v) for k, v in gn.items()}
T = int(len(gn["order"]))
V = positions.shape[1]

q_u16, mins, delta, vmin, vmax = quantize_batch(positions, BITS)

use_pallas = (jax.default_backend() == "tpu"
              and predict_matmul_viable(2 * T, V, B, 3, bits=BITS))
M = jnp.asarray(build_combined_matrix(gn, V)) if use_pallas else None
print(f"B={B} V={V} T={T} pallas={use_pallas} "
      f"h2d={q_u16.nbytes/1e6:.2f}MB")


def sync():
    return float(np.asarray(jnp.zeros((1,), jnp.int32))[0])


def timed(label, fn, trials=3):
    best = float("inf")
    for _ in range(trials):
        sync()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:22s} {best*1e3:8.1f} ms")
    return best


# tiny-readback latency in this window
timed("sync_latency", sync)

# 1. upload only (fresh buffer each trial to defeat put caching)
bufs = [q_u16.copy() for _ in range(3)]
it = iter(bufs)


def upload_once():
    d = jax.device_put(next(it))
    np.asarray(d.ravel()[:1])
    return d


timed("upload+sync", upload_once, trials=3)

# 1b. the PACKED upload (12-bit: lo bytes + paired nibbles) + the fused
# device unpack — what device_encode_group actually ships at bits<=12
from tpudraco.native import pack12
from tpudraco.parallel.batch import _jit_unpack12

lo0, hb0 = pack12(q_u16)
print(f"packed h2d={(lo0.nbytes + hb0.nbytes)/1e6:.2f}MB "
      f"(u16 {q_u16.nbytes/1e6:.2f})")
pk = [(lo0.copy(), hb0.copy()) for _ in range(3)]
itp = iter(pk)


def upload_packed_once():
    lo, hb = next(itp)
    q = _jit_unpack12(jax.device_put(lo), jax.device_put(hb))
    np.asarray(q.ravel()[:1])
    return q


timed("upload_packed+unpack", upload_packed_once, trials=3)
timed("host_pack12", lambda: pack12(q_u16), trials=3)
q_dev = jax.block_until_ready(jax.device_put(q_u16))

# 2. step from resident q
step = _jit_step_pallas_q if use_pallas else _jit_step_gather_q
args = (q_dev, gathers, M, BITS) if use_pallas else (q_dev, gathers, BITS)
syms, counts = step(*args)
jax.block_until_ready(counts)


def step_once():
    s, c = step(*args)
    np.asarray(c[:1, :1])


timed("step+hist", step_once)

syms = jax.block_until_ready(syms)
counts = jax.block_until_ready(counts)
n_sym = T * 3


def flip_once():
    f = _flip_lanes(syms)
    np.asarray(f.ravel()[:1])


timed("flip", flip_once)
lanes_dev = jax.block_until_ready(_flip_lanes(syms))


def normalize_once():
    with jax.enable_x64(True):
        d, c, p, t = _normalize_tables_x64(counts, jnp.int32(n_sym))
    np.asarray(t[:1, :1])


timed("normalize_x64", normalize_once)
with jax.enable_x64(True):
    dist_dev, cums_dev, prec_dev, tiny_job = _normalize_tables_x64(
        counts, jnp.int32(n_sym))
jax.block_until_ready(dist_dev)

W = int(dist_dev.shape[1])
guess = min(W, 512)


def combo_once():
    cj = _concat_tiny_dist(tiny_job, dist_dev, guess)
    raw = np.asarray(cj)
    return raw


timed(f"combo_readback(g={guess})", combo_once)

lengths_dev = jnp.full((B,), n_sym, jnp.int32)
ch = min(LANE_CHUNK, B)
kern = False
combined = _words_scan_chunk_vprec(
    lanes_dev, np.int32(0), dist_dev, cums_dev, lengths_dev, prec_dev,
    ch=ch, compact=_words_compact(), k=SYMBOLS_PER_STEP, kernel=kern)
jax.block_until_ready(combined)


def scan_once():
    c = _words_scan_chunk_vprec(
        lanes_dev, np.int32(0), dist_dev, cums_dev, lengths_dev, prec_dev,
        ch=ch, compact=_words_compact(), k=SYMBOLS_PER_STEP, kernel=kern)
    np.asarray(c[:1, :1])


timed(f"scan_chunk(ch={ch})", scan_once)
combined = jax.block_until_ready(_words_scan_chunk_vprec(
    lanes_dev, np.int32(0), dist_dev, cums_dev, lengths_dev, prec_dev,
    ch=ch, compact=_words_compact(), k=SYMBOLS_PER_STEP, kernel=kern))


def payload_once():
    pre = _dispatch_words_readback(combined, ch, n_sym, -1)
    sliced, bucket, _ = pre
    got = np.asarray(sliced)
    return got


got = payload_once()
print(f"payload bytes/chunk: {got.nbytes/1e6:.2f} MB "
      f"(bucket cols {got.shape[1]})")
timed("payload_readback", payload_once)
