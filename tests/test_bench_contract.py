"""The driver-captured bench line must be unkillable and keep regression
power (VERDICT r4 weak #1/#2, next #1):

- dead tunnel -> a REAL host-plane number with tunnel_state="down", not
  an error line with value 0 (round 4's BENCH_r04.json failure mode);
- live tunnel -> the one JSON line carries per-plane sub-metrics
  (bulk_device_mbs / bulk_host_mbs) and a same-window link probe, so the
  single-plane device e2e — the number that CAN regress — stays in the
  recorded evidence.

Both paths run bench.py as a subprocess at tiny scale (TPUDRACO_BENCH_*
knobs); the dead path is forced via TPUDRACO_BENCH_FORCE_DEAD so the
test never depends on actual tunnel state.
"""

import json
import os
import subprocess
import sys

BENCH = os.path.join(os.path.dirname(__file__), "..", "bench.py")

TINY = {
    "TPUDRACO_BENCH_BATCH": "8",
    "TPUDRACO_BENCH_N": "12",
    "TPUDRACO_BENCH_HUGE_N": "32",
}


def _run(extra_env, args=()):
    env = dict(os.environ, **TINY, **extra_env)
    r = subprocess.run([sys.executable, BENCH, *args],
                       capture_output=True, text=True, timeout=900,
                       env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [ln for ln in r.stdout.strip().splitlines()
             if ln.startswith("{")]
    assert lines, r.stdout
    return [json.loads(ln) for ln in lines]


def test_dead_tunnel_still_emits_real_number():
    (res,) = _run({"TPUDRACO_BENCH_FORCE_DEAD": "1"})
    assert res["metric"] == "corpus_encode_auto_throughput"
    assert res["value"] > 0, "dead tunnel must still measure the host plane"
    assert res["tunnel_state"] == "down"
    assert "tunnel_error" in res
    assert 0.5 < res["vs_baseline"] < 2.0, \
        "host-vs-host interleaved ratio should be ~1"


def test_live_line_carries_single_plane_submetrics():
    # CPU backend stands in for the tunnel: same code path, same JSON
    # contract (the real-link numbers land in BENCH_r*.json on hardware)
    (res,) = _run({"TPUDRACO_BENCH_CPU": "1"}, args=("--no-probe",))
    assert res["tunnel_state"] == "up"
    assert res["value"] > 0
    assert res.get("bulk_device_mbs", 0) > 0, \
        "single-plane device number must ride the recorded line"
    assert res.get("bulk_host_mbs", 0) > 0
    assert "link_d2h_mbps" in res and "link_latency_ms" in res
    assert res["routing"], "routing decisions must be visible"
    # cold vs warm auto (VERDICT r4 #5): the cold pass and the fresh-
    # encoder-with-disk-route-cache pass both ride the recorded line
    assert res.get("auto_cold_s", 0) > 0
    assert res.get("auto_cold_cached_s", 0) > 0
    assert res.get("route_cache_hits", -1) >= 0
