"""Batch analysis: run the analyzer over every mesh file in a directory.

Equivalent of the reference's util/analyze_gltf_files.py (batch-run the
analyzer binary over a directory), with a corpus summary table written as
JSON for cross-run comparison.

Usage:
  python -m tpudraco.tools.batch_analyze -i corpus_dir -o report_dir
"""

from __future__ import annotations

import argparse
import json
import os

from .analyzer import analyze_mesh

MESH_EXTS = (".obj", ".gltf", ".glb")


def analyze_dir(in_dir: str, out_dir: str) -> list[dict]:
    results = []
    for root, _, files in os.walk(in_dir):
        for fname in sorted(files):
            ext = os.path.splitext(fname)[1].lower()
            if ext not in MESH_EXTS:
                continue
            path = os.path.join(root, fname)
            rel = os.path.relpath(path, in_dir)
            try:
                if ext == ".obj":
                    from ..io import load_obj
                    meshes = [(rel, load_obj(path))]
                else:
                    from ..io import load_gltf_to_scene
                    scene = load_gltf_to_scene(path)
                    meshes = [(f"{rel}#{i}", m)
                              for i, m in enumerate(scene.meshes)]
                for name, mesh in meshes:
                    sub = os.path.join(out_dir, name.replace(os.sep, "_")
                                       .replace("/", "_"))
                    stats = analyze_mesh(mesh, sub, name)
                    stats["file"] = rel
                    results.append(stats)
            except Exception as exc:  # per-file isolation: keep the batch alive
                results.append({"file": rel, "error": str(exc)})
    return results


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpudraco-batch-analyze")
    p.add_argument("-i", "--input", required=True, help="corpus directory")
    p.add_argument("-o", "--output", required=True, help="report directory")
    args = p.parse_args(argv)

    results = analyze_dir(args.input, args.output)
    os.makedirs(args.output, exist_ok=True)
    summary_path = os.path.join(args.output, "summary.json")
    with open(summary_path, "w") as f:
        json.dump(results, f, indent=2)

    ok = [r for r in results if "error" not in r]
    bad = [r for r in results if "error" in r]
    for r in ok:
        print(f"{r['name']}: {r['compressed_size_bytes']}B "
              f"({r['compression_ratio']}x)")
    for r in bad:
        print(f"{r['file']}: ERROR {r['error']}")
    print(f"{len(ok)} analyzed, {len(bad)} failed -> {summary_path}")
    return 0 if not bad else 1


if __name__ == "__main__":
    raise SystemExit(main())
