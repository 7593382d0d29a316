"""Randomized round-trip soak: wider mesh-shape x config space than the
committed fuzz tests, run for a wall-clock budget. Reuses the tests'
geometric round-trip oracle (per-face dequantized value multisets) and,
every few trials, the device-batch byte oracle.

  python benchmarks/soak_roundtrip.py [minutes] [seed]

Prints one line per 25 trials and a final summary; any failure logs the
full repro tuple (seed, trial index, config) and the soak continues, so
one bad corner doesn't hide others. Exit code 1 if anything failed.
"""
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

# soak runs on the host CPU backend regardless of the axon pin; set this
# BEFORE any backend query (default_backend() would block on a dead
# tunnel — CLAUDE.md)
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from tpudraco.encode import Config, encode  # noqa: E402
from tpudraco.models import (AttributeDomain, AttributeType,  # noqa: E402
                             MeshBuilder)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))
from test_roundtrip import assert_roundtrip  # noqa: E402


def random_mesh(rng):
    n = int(rng.integers(3, 18))
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.random(n * n).astype(np.float32) * 3], axis=1)
    scale = rng.choice([1e-3, 1.0, 1e4]).astype(np.float32)
    pos = (pos * scale + rng.normal(0, scale, 3).astype(np.float32)
           ).astype(np.float32)
    hole_p = float(rng.uniform(0.0, 0.35))
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (i * n + j, i * n + j + 1,
                          (i + 1) * n + j, (i + 1) * n + j + 1)
            if rng.random() > hole_p:
                faces.append([a, b, c])
            if rng.random() > hole_p:
                faces.append([b, d, c])
    if not faces:
        faces = [[0, 1, n]]
    faces = np.asarray(faces, dtype=np.int64)
    if rng.random() < 0.15:  # degenerate faces: builder must filter
        k = faces[int(rng.integers(len(faces)))].copy()
        k[1] = k[0]
        faces = np.vstack([faces, k[None]])
    mb = MeshBuilder()
    mb.set_connectivity_attribute(faces)
    pid = mb.add_attribute(pos, AttributeType.POSITION,
                           AttributeDomain.POSITION)
    P = n * n
    extras = []
    if rng.random() < 0.5:  # unit normals, corner domain
        v = rng.normal(size=(P, 3)).astype(np.float32)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-9)
        mb.add_attribute(v.astype(np.float32), AttributeType.NORMAL,
                         AttributeDomain.CORNER, parents=[pid])
        extras.append(AttributeType.NORMAL)
    if rng.random() < 0.5:
        uv = rng.random((P, 2)).astype(np.float32)
        if rng.random() < 0.3:
            uv[: P // 2] = uv[0]  # duplicate values: dedup + seams
        mb.add_attribute(uv, AttributeType.TEX_COORD,
                         AttributeDomain.CORNER, parents=[pid])
        extras.append(AttributeType.TEX_COORD)
    if rng.random() < 0.25:
        col = rng.random((P, 3)).astype(np.float32)
        mb.add_attribute(col, AttributeType.COLOR,
                         AttributeDomain.POSITION)
    return mb.build(), extras


def random_config(rng, has_extras):
    cfg = Config()
    r = rng.random()
    if r < 0.15:
        cfg.encoder_method = 0
        if rng.random() < 0.5:
            cfg.sequential_method = "compressed"
    elif r < 0.30:
        cfg.traversal = 2  # valence
    elif r < 0.40:
        cfg.traversal = 1  # predictive (round-5 context-model coder)
    if rng.random() < 0.4:
        cfg.symbol_coding = str(rng.choice(["length", "auto"]))
    if rng.random() < 0.2 and cfg.encoder_method != 0:
        from tpudraco.shared.prediction import PRED_MULTI_PARALLELOGRAM
        cfg.prediction = {AttributeType.POSITION: PRED_MULTI_PARALLELOGRAM}
    if rng.random() < 0.15 and cfg.encoder_method != 0:
        # round-4 knob: derivative UV prediction (wire id 7, opt-in)
        from tpudraco.shared.prediction import PRED_DERIVATIVE
        cfg.prediction = dict(cfg.prediction or {})
        cfg.prediction[AttributeType.TEX_COORD] = PRED_DERIVATIVE
    if rng.random() < 0.6:
        cfg.quant_bits[AttributeType.POSITION] = int(rng.integers(4, 22))
    if rng.random() < 0.5:
        cfg.quant_bits[AttributeType.NORMAL] = int(rng.integers(7, 17))
    if rng.random() < 0.5:
        cfg.quant_bits[AttributeType.TEX_COORD] = int(rng.integers(4, 22))
    if rng.random() < 0.2:
        cfg.metadata = True
    if rng.random() < 0.15 and cfg.encoder_method != 0:
        # round-4 knob: one corner table for all attributes
        cfg.use_single_connectivity = True
    if rng.random() < 0.15 and cfg.encoder_method != 0:
        # round-5 knob: normal residual-transform override (exact D4
        # orthogonal / OctReflection)
        cfg.transform = {AttributeType.NORMAL: int(rng.choice([4, 2]))}
    if rng.random() < 0.15 and cfg.encoder_method != 0:
        # round-5 knob: prediction-degree attribute traversal
        cfg.attribute_traversal = "prediction-degree"
    return cfg


def phased_decode_oracle(mesh, cfg):
    """Grouped decode with device-batched normals must equal per-blob
    decode() (the phased decoder, round 5): replicate the blob into a
    group past the auto threshold and compare decoded values."""
    from tpudraco.decode import decode
    from tpudraco.parallel.decode_batch import BatchDecoder

    blob = encode(mesh, cfg=cfg)
    ref = decode(blob)
    group = [blob] * 4
    got = BatchDecoder().decode_blobs_shared_topology(group,
                                                      normals="device")
    for g in got:
        assert g is not None, "phased decode dropped a blob"
        for ga, ra in zip(g.attributes, ref.attributes):
            assert np.array_equal(ga.values_per_point(),
                                  ra.values_per_point()), \
                "phased decode values diverge"


def device_batch_oracle(rng, mesh, cfg):
    """Quant-only configs must produce identical bytes through the device
    batch plane (BatchEncoder routes them there on the CPU mesh too),
    under a randomized entropy-path knob draw (table flow x word
    compaction)."""
    from tpudraco.ops import rans_lanes
    from tpudraco.parallel import BatchEncoder
    qcfg = Config(quant_bits=dict(cfg.quant_bits))
    want = encode(mesh, cfg=qcfg)
    dtab, compact = rans_lanes.DEVICE_TABLES, rans_lanes.WORDS_COMPACT
    kprev = rans_lanes.SYMBOLS_PER_STEP
    kern_prev = rans_lanes.WORDS_KERNEL
    try:
        rans_lanes.DEVICE_TABLES = bool(rng.random() < 0.7)
        rans_lanes.set_words_compact(
            str(rng.choice(["sort", "sortkv", "marks"])))
        # the Pallas words kernel (round 4) rides the draw too
        # (interpret mode on this CPU backend)
        rans_lanes.set_words_kernel(bool(rng.random() < 0.25))
        # mostly k=8 (the compiled-cache default); k=16 occasionally so
        # the unroll sweep variant keeps fuzz coverage without paying
        # its one-time compile on every trial
        rans_lanes.SYMBOLS_PER_STEP = int(
            rng.choice([8, 8, 8, 16]))
        got = BatchEncoder(use_device=True, cfg=qcfg).encode_meshes_device(
            [mesh, mesh])
    finally:
        rans_lanes.DEVICE_TABLES = dtab
        rans_lanes.set_words_compact(compact)
        rans_lanes.SYMBOLS_PER_STEP = kprev
        rans_lanes.set_words_kernel(kern_prev)
    assert all(bytes(b) == want for b in got), "device batch != sequential"


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 30.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1234
    rng = np.random.default_rng(seed)
    deadline = time.time() + minutes * 60
    trials = fails = dev_checks = 0
    while time.time() < deadline:
        trials += 1
        state = rng.bit_generator.state["state"]["state"]
        try:
            mesh, extras = random_mesh(rng)
            cfg = random_config(rng, extras)
            if mesh.num_faces == 0:
                continue
            assert_roundtrip(mesh, cfg=cfg)
            if trials % 10 == 0:
                device_batch_oracle(rng, mesh, cfg)
                dev_checks += 1
            if trials % 7 == 3 and cfg.encoder_method != 0:
                phased_decode_oracle(mesh, cfg)
        except Exception:
            fails += 1
            print(f"FAIL trial={trials} seed={seed} rng_state={state} "
                  f"cfg={cfg!r}")
            traceback.print_exc()
        if trials % 25 == 0:
            print(f"... {trials} trials ({dev_checks} device-batch "
                  f"oracles), {fails} failures, "
                  f"{(deadline - time.time()) / 60:.1f} min left",
                  flush=True)
    print(f"SOAK DONE: {trials} trials, {dev_checks} device-batch oracles, "
          f"{fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
