"""Pod-scale glTF transcoding: the device-batched counterpart of the
per-file DracoTranscoder.

The reference's transcoder is the natural batch driver (SURVEY.md §3.2:
the per-primitive encode() call inside GltfAsset::add_scene is the shard
axis). This driver collects every primitive sub-mesh across the corpus
first, device-encodes them grouped by topology (BatchEncoder, including
the NORMAL/TEX_COORD device chains), and then writes each GLB with the
precomputed blobs injected through the GlbWriter encoder hook. Output
files are byte-identical to per-file DracoTranscoder runs (pinned by
tests); per-file error isolation and resume mirror encode_corpus.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np


def mesh_content_key(mesh) -> str:
    """Full content hash (topology + every attribute's values), keying
    the precomputed-blob map across the writer's re-split meshes."""
    h = hashlib.sha256()
    h.update(np.ascontiguousarray(mesh.faces).tobytes())
    for a in mesh.attributes:
        h.update(bytes([a.att_type, a.domain, a.num_components]))
        h.update(np.ascontiguousarray(a.unique_indices()).tobytes())
        h.update(np.ascontiguousarray(a.values).tobytes())
    return h.hexdigest()


def _scene_submeshes(scene):
    """The exact sub-mesh sequence GlbWriter.write_scene will encode
    (per-material primitive split, empty meshes skipped)."""
    from ..io.gltf import split_mesh_by_materials

    subs = []
    for group in scene.mesh_groups:
        for inst in group.instances:
            mesh = scene.meshes[inst.mesh_index]
            if mesh.num_faces == 0:
                continue
            for _mat_id, sub in split_mesh_by_materials(mesh):
                subs.append(sub)
    return subs


def transcode_corpus(inputs: list[str], out_dir: str,
                     use_device: bool = True, resume: bool = True,
                     khr_ids: str = "unique") -> dict:
    """Transcode a corpus of glTF/GLB files to draco-compressed GLBs with
    the primitive encodes batched on the accelerator across ALL files
    (topology groups span the corpus). Returns a report dict."""
    from ..io.gltf import load_gltf_to_scene, save_scene_glb
    from .batch import BatchEncoder

    os.makedirs(out_dir, exist_ok=True)
    report = {"transcoded": 0, "skipped": 0, "failed": [],
              "total_in_bytes": 0, "total_out_bytes": 0}
    t0 = time.perf_counter()

    def out_path_for(path):
        return os.path.join(
            out_dir, os.path.splitext(os.path.basename(path))[0] + ".glb")

    # phase 1: load scenes, collect every primitive sub-mesh
    scenes: dict[str, object] = {}
    all_subs: list = []
    for path in inputs:
        if resume and os.path.isfile(out_path_for(path)):
            continue
        try:
            scene = load_gltf_to_scene(path)
            scenes[path] = scene
            all_subs.extend(_scene_submeshes(scene))
        except Exception as e:
            report["failed"].append({"path": path, "error": repr(e)})

    # phase 2: device-batch encode across the whole corpus
    blob_map: dict[str, bytes] = {}
    if use_device and all_subs:
        be = BatchEncoder()
        blobs = be.encode_meshes_device(all_subs)
        for sub, blob in zip(all_subs, blobs):
            if blob is not None:
                blob_map[mesh_content_key(sub)] = blob

    def encoder(mesh):
        return blob_map.get(mesh_content_key(mesh))

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
                           khr_ids=khr_ids)
            os.replace(tmp, out_path)
            report["transcoded"] += 1
            report["total_in_bytes"] += os.path.getsize(path)
            report["total_out_bytes"] += os.path.getsize(out_path)
        except Exception as e:
            report["failed"].append({"path": path, "error": repr(e)})

    report["seconds"] = round(time.perf_counter() - t0, 3)
    with open(os.path.join(out_dir, "transcode_report.json"), "w") as f:
        json.dump(report, f, indent=1)
    return report
