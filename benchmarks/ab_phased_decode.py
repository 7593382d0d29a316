"""Production phased-decode A/B on the real chip: grouped decode of B
pos+normal(+uv) blobs with normals="host" vs normals="device" through the
ACTUAL decode_blobs_shared_topology path (not the proxy experiment).
Interleaved best-of; asserts identical decoded values first.

  python benchmarks/ab_phased_decode.py [B] [N] [TRIALS]
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

from tpudraco.encode import encode  # noqa: E402
from tpudraco.decode import decode  # noqa: E402
from tpudraco.models import AttributeType, MeshBuilder  # noqa: E402
from tpudraco.models.attribute import AttributeDomain  # noqa: E402
from tpudraco.parallel.decode_batch import BatchDecoder  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
N = int(sys.argv[2]) if len(sys.argv) > 2 else 64
TRIALS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def grid(n, seed):
    rng = np.random.RandomState(seed)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.rand(n * n).astype(np.float32)], axis=1)
    nrm = rng.randn(n * n, 3).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    b = MeshBuilder()
    b.set_connectivity_attribute(np.asarray(faces))
    pid = b.add_attribute(pos, AttributeType.POSITION,
                          AttributeDomain.POSITION)
    b.add_attribute(nrm, AttributeType.NORMAL, AttributeDomain.CORNER,
                    parents=[pid])
    return b.build()


print(f"building {B} blobs (V={N*N})...", flush=True)
blobs = [encode(grid(N, s)) for s in range(B)]
bd = BatchDecoder()

# equality first
ref = bd.decode_blobs_shared_topology(blobs, normals="host")
got = bd.decode_blobs_shared_topology(blobs, normals="device")  # + compile
for g, r in zip(got, ref):
    for ga, ra in zip(g.attributes, r.attributes):
        assert np.array_equal(ga.values_per_point(), ra.values_per_point())
print("bytes equal; timing...", flush=True)

best = {"host": float("inf"), "device": float("inf")}
for _ in range(TRIALS):
    for mode in ("host", "device"):
        t0 = time.perf_counter()
        bd.decode_blobs_shared_topology(blobs, normals=mode)
        best[mode] = min(best[mode], time.perf_counter() - t0)
print({"backend": jax.default_backend(), "blobs": B, "verts": N * N,
       "host_s": round(best["host"], 3),
       "device_s": round(best["device"], 3),
       "speedup": round(best["host"] / best["device"], 2)})
