"""Phased decode-normals experiment (VERDICT r4 #8).

The decoder's NORMAL chain stays on host (vectorized numpy per blob)
because batching it across blobs on device needs a PHASED decoder:
positions for every blob first, then all normal chains as one batch.
Round 3/4 judged that not worth building on tunnel physics — this script
re-verifies the judgment with ONE measured experiment and records the
number either way (BASELINE.md "Phased decode-normals").

Host side (production): grouped decode of B pos+normal blobs minus
grouped decode of B pos-only twins = the normals marginal cost.

Device side (timing proxy, NOT product code): the exact compute a phased
device decode-normals would run — batched ring prediction from decoded
positions (the same gathers/arithmetic as ops/normals.py's encode chain)
+ the vectorized OctOrthogonal inverse — jitted once, then timed
including the (B,Vp,3) position upload, the (B,T,2) u16 symbol upload,
and the (B,T,2) value readback. Inputs are random at the right
shapes/dtypes (timing only; the real chain is byte-pinned elsewhere).

Run on the real chip (axon): python benchmarks/decode_normals_phased.py
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B = int(os.environ.get("PHASED_B", 128))
N = int(os.environ.get("PHASED_N", 64))   # grid side; V = N*N


def _meshes(with_normals: bool):
    from tpudraco.models import AttributeType, MeshBuilder
    from tpudraco.models.attribute import AttributeDomain

    rng = np.random.RandomState(7)
    xs, ys = np.meshgrid(np.arange(N, dtype=np.float32),
                         np.arange(N, dtype=np.float32))
    faces = []
    for i in range(N - 1):
        for j in range(N - 1):
            a = i * N + j
            faces.append([a, a + 1, a + N])
            faces.append([a + 1, a + N + 1, a + N])
    faces = np.asarray(faces, dtype=np.int64)
    out = []
    for b in range(B):
        pos = np.stack([xs.ravel(), ys.ravel(),
                        rng.rand(N * N).astype(np.float32)], axis=1)
        mb = MeshBuilder()
        mb.set_connectivity_attribute(faces)
        pid = mb.add_attribute(pos, AttributeType.POSITION,
                               AttributeDomain.POSITION)
        if with_normals:
            nrm = rng.randn(N * N, 3).astype(np.float32)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
            mb.add_attribute(nrm, AttributeType.NORMAL,
                             AttributeDomain.CORNER, parents=[pid])
        out.append(mb.build())
    return out


def host_side():
    from tpudraco.encode import encode
    from tpudraco.parallel.decode_batch import BatchDecoder

    blobs_pn = [encode(m) for m in _meshes(True)]
    blobs_p = [encode(m) for m in _meshes(False)]
    bd = BatchDecoder()
    bd.decode_blobs_shared_topology(blobs_pn)  # warm
    bd.decode_blobs_shared_topology(blobs_p)
    t_pn = t_p = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        bd.decode_blobs_shared_topology(blobs_pn)
        t_pn = min(t_pn, time.perf_counter() - t0)
        t0 = time.perf_counter()
        bd.decode_blobs_shared_topology(blobs_p)
        t_p = min(t_p, time.perf_counter() - t0)
    return t_pn, t_p, blobs_pn


def device_side():
    import jax
    import jax.numpy as jnp

    from tpudraco.models import AttributeType
    from tpudraco.ops.normals import (
        into_faithful_device, invert_diamond_device, oct_transform_device,
    )
    from tpudraco.parallel.batch import PreparedTopology

    mesh = _meshes(True)[0]
    topo = PreparedTopology(mesh)
    i_n = next(i for i, a in enumerate(mesh.attributes)
               if a.att_type == AttributeType.NORMAL)
    rings = topo.rings_for(i_n)
    # random grid positions are unique per point -> identity point->row map
    point_to_row = np.arange(mesh.attributes[0].num_points, dtype=np.int32)

    T = len(rings["tip_pt"])
    Vp = mesh.attributes[0].num_points
    bits = 8
    mx = (1 << bits) - 1
    one = mx // 2

    tip_i = jnp.asarray(point_to_row[rings["tip_pt"]])
    next_i = jnp.asarray(point_to_row[rings["next_pt"]])
    prev_i = jnp.asarray(point_to_row[rings["prev_pt"]])
    mask = jnp.asarray(rings["mask"])

    @functools.partial(jax.jit, donate_argnums=())
    def phased_decode_normals(q_pos, symbols, flips):
        # ring prediction from decoded positions (== encode-chain math)
        pos_tip = q_pos[:, tip_i, :]
        pn = q_pos[:, next_i, :] - pos_tip[:, :, None, :]
        pp = q_pos[:, prev_i, :] - pos_tip[:, :, None, :]
        cr = jnp.stack([
            pn[..., 1] * pp[..., 2] - pn[..., 2] * pp[..., 1],
            pn[..., 2] * pp[..., 0] - pn[..., 0] * pp[..., 2],
            pn[..., 0] * pp[..., 1] - pn[..., 1] * pp[..., 0],
        ], axis=-1)
        cr = jnp.where(mask[None, :, :, None], cr, 0)
        total = cr.sum(axis=2).astype(jnp.int32)
        nonzero = (total != 0).any(-1)
        safe = jnp.where(nonzero[..., None], total,
                         jnp.array([1, 0, 0], jnp.int32))
        oct = oct_transform_device(safe) + jnp.float32(1.0)
        quant = (oct * jnp.float32((1 << (bits - 1)) - 1)).astype(jnp.int32)
        pred = into_faithful_device(quant, bits)
        pred = jnp.where(nonzero[..., None], pred, 0)
        pred = jnp.where(flips[..., None], -pred, pred)

        # vectorized OctOrthogonal inverse (decode/attribute.py, on device)
        corr = symbols.astype(jnp.int32)
        p = pred - one
        flip = jnp.abs(p).sum(-1) > one
        p = jnp.where(flip[..., None], invert_diamond_device(p, one), p)
        rots = [p]
        for _ in range(3):
            q = rots[-1]
            rots.append(jnp.stack([-q[..., 1], q[..., 0]], axis=-1))
        rots = jnp.stack(rots)                      # (4, B, T, 2)
        in_q3 = (rots[..., 0] < 0) & (rots[..., 1] <= 0)
        r = jnp.where(p.any(-1), jnp.argmax(in_q3, axis=0), 0)
        p_rot = jnp.take_along_axis(
            rots, r[None, ..., None].astype(jnp.int32), axis=0)[0]
        o = ((p_rot + corr + one) % mx) - one
        outs = [o]
        for _ in range(3):
            q = outs[-1]
            outs.append(jnp.stack([q[..., 1], -q[..., 0]], axis=-1))
        o = jnp.take_along_axis(
            jnp.stack(outs), r[None, ..., None].astype(jnp.int32),
            axis=0)[0]
        # diamond inverse: 5 candidates, pick first that forward-maps back
        w0, w1 = o[..., 0], o[..., 1]
        cands = jnp.stack([
            invert_diamond_device(o, one),
            jnp.stack([one - w1, one - w0], axis=-1),
            jnp.stack([-w1 - one, -w0 - one], axis=-1),
            jnp.stack([w1 + one, w0 - one], axis=-1),
            jnp.stack([w1 - one, w0 + one], axis=-1),
        ])
        ok = (invert_diamond_device(cands, one) == o[None]).all(-1)
        first = jnp.argmax(ok, axis=0)
        o_inv = jnp.take_along_axis(
            cands, first[None, ..., None].astype(jnp.int32), axis=0)[0]
        o = jnp.where(flip[..., None], o_inv, o)
        return (o + one).astype(jnp.int16)

    rng = np.random.RandomState(3)
    q_pos_h = rng.randint(0, 1 << 11, size=(B, Vp, 3)).astype(np.int32)
    sym_h = rng.randint(0, mx, size=(B, T, 2)).astype(np.uint16)
    flip_h = rng.rand(B, T) < 0.5

    # compile + warm
    out = phased_decode_normals(jnp.asarray(q_pos_h),
                                jnp.asarray(sym_h), jnp.asarray(flip_h))
    np.asarray(out)

    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        qd = jax.device_put(q_pos_h)
        sd = jax.device_put(sym_h)
        fd = jax.device_put(flip_h)
        res = np.asarray(phased_decode_normals(qd, sd, fd))
        best = min(best, time.perf_counter() - t0)
    up_mb = (q_pos_h.nbytes + sym_h.nbytes + flip_h.nbytes) / 1e6
    down_mb = res.nbytes / 1e6
    return best, up_mb, down_mb


def main():
    import jax
    backend = jax.default_backend()
    t_pn, t_p, blobs = host_side()
    host_marginal = t_pn - t_p
    dev_s, up_mb, down_mb = device_side()
    out = {
        "experiment": "phased_decode_normals",
        "backend": backend,
        "blobs": B, "verts": N * N,
        "host_group_pos_nrm_s": round(t_pn, 3),
        "host_group_pos_s": round(t_p, 3),
        "host_normals_marginal_s": round(host_marginal, 3),
        "device_phased_s": round(dev_s, 3),
        "device_upload_mb": round(up_mb, 2),
        "device_readback_mb": round(down_mb, 2),
        "speedup_vs_host_marginal": round(host_marginal / dev_s, 2)
        if dev_s > 0 else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
