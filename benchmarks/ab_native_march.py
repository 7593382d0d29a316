"""A/B the native host plane built with vs without -march=native.

The hypervisor's effective CPU speed swings wildly (CLAUDE.md), so the
two variants run ALTERNATED in fresh subprocesses (A B A B ...) and the
comparison is per-adjacent-pair medians, not absolute numbers.

  python benchmarks/ab_native_march.py [pairs]
"""
import json
import os
import statistics
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(root)r)
import numpy as np
from tpudraco.native import load_library, quantize_batch
from tpudraco.encode import encode
from tpudraco.io.obj import load_obj

assert load_library() is not None, "native build failed"
rng = np.random.default_rng(7)
pos = rng.random((256, 4096, 3), dtype=np.float32)

# warm
quantize_batch(pos[:8], 11)
t0 = time.perf_counter(); quantize_batch(pos, 11)
qt = time.perf_counter() - t0

m = load_obj("/root/reference/draco-oxide/tests/data/torus.obj")
encode(m)  # warm (build + caches)
t0 = time.perf_counter()
for _ in range(40):
    encode(m)
et = time.perf_counter() - t0

print(json.dumps({"quantize_s": qt, "encode40_s": et}))
"""


def run(march: str | None) -> dict:
    env = dict(os.environ)
    env.pop("TPUDRACO_NATIVE_MARCH", None)
    if march:
        env["TPUDRACO_NATIVE_MARCH"] = march
    out = subprocess.run([sys.executable, "-c", WORKER % {"root": ROOT}],
                         env=env, capture_output=True, text=True,
                         timeout=600)
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main():
    pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    ratios_q, ratios_e = [], []
    for i in range(pairs):
        a = run(None)
        b = run("native")
        ratios_q.append(a["quantize_s"] / b["quantize_s"])
        ratios_e.append(a["encode40_s"] / b["encode40_s"])
        print(f"pair {i}: quantize base/native={ratios_q[-1]:.3f} "
              f"encode base/native={ratios_e[-1]:.3f}", flush=True)
    print(json.dumps({
        "median_quantize_speedup": statistics.median(ratios_q),
        "median_encode_speedup": statistics.median(ratios_e),
        "pairs": pairs,
    }))


if __name__ == "__main__":
    main()
