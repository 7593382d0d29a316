"""Mixed-size corpus: host-only vs device-only vs use_device='auto',
measured back-to-back in one process (BASELINE.md row, VERDICT r2 #8).

Corpus: 128 small meshes (4096 verts, 2 topologies) + 3 large meshes
(262144 verts, 1 topology) + one BULK group (512 meshes, 4225 verts) —
the corpus shape where the device batch genuinely wins (round-4
pipeline: ~1.8x host at 512 lanes), so the auto router has a real
routing decision to make in both directions. Jits and topology caches
are warmed before timing (compile cost is one-time per shape and
amortizes over corpora).
"""
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", "tests/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tpudraco.models import AttributeDomain, AttributeType, MeshBuilder
from tpudraco.parallel import BatchEncoder


def grid_mesh(n, seed):
    rng = np.random.RandomState(seed)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.rand(n * n).astype(np.float32)], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    b = MeshBuilder()
    b.set_connectivity_attribute(np.asarray(faces))
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    return b.build()


def main():
    print("building corpus...", flush=True)
    small = [grid_mesh(64, s) for s in range(64)] + \
            [grid_mesh(63, s) for s in range(64)]
    large = [grid_mesh(512, s) for s in range(3)]
    bulk = [grid_mesh(65, s) for s in range(512)]
    meshes = small + large + bulk
    raw_mb = sum(m.position_attribute().values.nbytes for m in meshes) / 1e6
    print(f"corpus: {len(meshes)} meshes, {raw_mb:.1f} MB raw positions",
          flush=True)
    
    # shared warm topology cache + jit warm (one pass of each plane on
    # representative shapes)
    warm = BatchEncoder(use_device="auto")
    print("warming (topology caches + remote compiles)...", flush=True)
    t0 = time.perf_counter()
    warm.encode_meshes_auto([small[0], small[1], small[64], large[0],
                             bulk[0]])
    # warm the REAL bucket shapes each mode will hit (a 2-mesh warm left
    # device_only to compile its 64-lane shapes inside the timed region)
    warm.encode_meshes_device(small[:64])
    warm.encode_meshes_device(large)
    warm.encode_meshes_device(bulk[:128])
    warm.encode_meshes_device(bulk)
    print(f"warm done in {time.perf_counter() - t0:.1f}s; routing so far: "
          f"{warm.routing_log}", flush=True)
    cache = warm._topo_cache
    
    
    def with_cache(**kw):
        be = BatchEncoder(**kw)
        be._topo_cache = cache
        return be
    
    
    results = {}
    for name, fn in (
        ("host_only", lambda: with_cache().encode_meshes(meshes)),
        ("device_only", lambda: with_cache(
            use_device=True).encode_meshes_device(meshes)),
        ("auto", lambda: with_cache(
            use_device="auto").encode_meshes_auto(meshes)),
    ):
        t0 = time.perf_counter()
        blobs = fn()
        dt = time.perf_counter() - t0
        assert all(b is not None for b in blobs), name
        results[name] = (dt, blobs)
        print(f"{name:12s} {dt:8.2f} s  ({raw_mb/dt:.1f} MB/s)", flush=True)
    
    # byte equality across modes
    h = results["host_only"][1]
    for name in ("device_only", "auto"):
        assert results[name][1] == h, f"{name} bytes diverge"
    print("bytes identical across all three modes", flush=True)
    
    be_auto = with_cache(use_device="auto")
    t0 = time.perf_counter()
    be_auto.encode_meshes_auto(meshes)
    print(f"auto (2nd run) {time.perf_counter() - t0:8.2f} s", flush=True)
    print("routing:", be_auto.routing_log, flush=True)


if __name__ == "__main__":
    main()
