"""Pod-scale glTF transcoding: the device-batched counterpart of the
per-file DracoTranscoder.

The reference's transcoder is the natural batch driver (SURVEY.md §3.2:
the per-primitive encode() call inside GltfAsset::add_scene is the shard
axis). This driver collects every primitive sub-mesh across the corpus
(through the SAME iter_scene_primitives generator the writer encodes
from, so the two cannot drift), device-encodes the unique ones grouped
by topology (BatchEncoder, including the NORMAL/TEX_COORD device
chains), and then writes each GLB with the precomputed blobs injected
through the GlbWriter encoder hook. Output files are byte-identical to
per-file DracoTranscoder runs (pinned by tests); per-file error
isolation, resume, collision detection, and device-fallback counters
mirror encode_corpus.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np


def mesh_content_key(mesh) -> str:
    """Full content hash keying the precomputed-blob map across the
    writer's re-split meshes. Covers every wire-relevant attribute field
    (type/domain/components/dtype/ids/parents/shapes, delimited) — two
    meshes share a key iff encode() would emit identical bytes."""
    h = hashlib.sha256()
    h.update(repr(mesh.faces.shape).encode())
    h.update(np.ascontiguousarray(mesh.faces).tobytes())
    for a in mesh.attributes:
        h.update(repr((int(a.att_type), int(a.domain),
                       int(a.num_components), a.att_id, a.unique_id,
                       tuple(a.parents), a.values.dtype.str,
                       a.values.shape)).encode())
        h.update(np.ascontiguousarray(a.unique_indices()).tobytes())
        h.update(np.ascontiguousarray(a.values).tobytes())
    return h.hexdigest()


def transcode_corpus(inputs: list[str], out_dir: str,
                     use_device: bool = True, resume: bool = True,
                     khr_ids: str = "unique", cfg=None) -> dict:
    """Transcode a corpus of glTF/GLB files to draco-compressed GLBs with
    the primitive encodes batched on the accelerator across ALL files
    (topology groups span the corpus; duplicate assets encode once).
    ``cfg`` is an optional encoder Config applied to every primitive
    (the reference's DracoTranscodingOptions.geometry). Quantization-only
    configs (-qp/-qt/-qn overrides, everything else default) stay on the
    device batch — the device chains honor those depths bit-exactly; any
    other override routes every primitive through the host encoder with
    those options instead. Returns a report dict."""
    from ..io.gltf import (iter_scene_primitives, load_gltf_to_scene,
                           save_scene_glb)
    from .batch import (BatchEncoder, _device_quant_bits,
                        _drop_output_collisions)

    if _device_quant_bits(cfg) is None:
        use_device = False  # beyond the device batch's config space
        cfg_for_batch = None
    else:
        cfg_for_batch = cfg  # depths resolve inside encode_meshes_device

    os.makedirs(out_dir, exist_ok=True)
    report = {"transcoded": 0, "skipped": 0, "failed": [],
              "total_in_bytes": 0, "total_out_bytes": 0}
    t0 = time.perf_counter()

    def out_path_for(path):
        return os.path.join(
            out_dir, os.path.splitext(os.path.basename(path))[0] + ".glb")

    # drop exact duplicate inputs, then output-name collisions
    deduped = list(dict.fromkeys(inputs))
    inputs, collided = _drop_output_collisions(deduped, out_path_for)
    for path in collided:
        report["failed"].append(
            {"path": path, "error": "output name collision"})

    # phase 1: load scenes, collect unique primitive sub-meshes (the same
    # enumeration the writer will encode)
    scenes: dict[str, object] = {}
    unique_subs: dict[str, object] = {}
    for path in inputs:
        if resume and os.path.isfile(out_path_for(path)):
            continue
        try:
            scene = load_gltf_to_scene(path)
            scenes[path] = scene
            for _gi, inst, _mat, sub in iter_scene_primitives(scene):
                if inst.morph_targets:
                    # the writer stores morph-target primitives
                    # UNCOMPRESSED (io/gltf.py) and never consults the
                    # encoder hook — device-encoding them would be
                    # discarded work
                    continue
                unique_subs.setdefault(mesh_content_key(sub), sub)
        except Exception as e:
            report["failed"].append({"path": path, "error": repr(e)})

    # phase 2: device-batch encode the unique sub-meshes corpus-wide
    blob_map: dict[str, bytes] = {}
    be = BatchEncoder(use_device=use_device, cfg=cfg_for_batch)
    if use_device and unique_subs:
        keys = list(unique_subs)
        blobs = be.encode_meshes_device([unique_subs[k] for k in keys])
        for k, blob in zip(keys, blobs):
            if blob is not None:
                blob_map[k] = blob

    misses = 0

    def encoder(mesh):
        nonlocal misses
        blob = blob_map.get(mesh_content_key(mesh))
        if blob is None:
            misses += 1
        return blob

    # phase 3: write each scene with the precomputed blobs injected
    for path in inputs:
        out_path = out_path_for(path)
        if resume and os.path.isfile(out_path) and path not in scenes:
            report["skipped"] += 1
            continue
        if path not in scenes:
            continue  # already reported as failed
        try:
            tmp = out_path + f".tmp{os.getpid()}"
            save_scene_glb(scenes[path], tmp,
                           encoder=encoder if use_device else None,
                           khr_ids=khr_ids, cfg=cfg)
            os.replace(tmp, out_path)
            report["transcoded"] += 1
            report["total_in_bytes"] += os.path.getsize(path)
            report["total_out_bytes"] += os.path.getsize(out_path)
        except Exception as e:
            report["failed"].append({"path": path, "error": repr(e)})

    report["seconds"] = round(time.perf_counter() - t0, 3)
    if use_device:
        # surface silent degradations, mirroring encode_corpus: groups
        # that fell back to host inside encode_meshes_device, and writer
        # encoder-hook misses that re-encoded on host
        report["device_fallback_groups"] = be.fallback_groups
        report["device_fallback_meshes"] = be.fallback_meshes
        report["encoder_hook_misses"] = misses
    tmp_rep = os.path.join(out_dir, f"transcode_report.json.tmp{os.getpid()}")
    with open(tmp_rep, "w") as f:
        json.dump(report, f, indent=1)
    os.replace(tmp_rep, os.path.join(out_dir, "transcode_report.json"))
    return report
