"""Analyzer: per-mesh compression report with stage metrics, round-trip
quality, and an HTML summary.

Mirrors the reference analyzer (analyzer/src/main.rs): encode with eval
recording, dump eval.json, write compressed.drc, decode (with our own
decoder instead of the external C++ draco_decoder the reference shells out
to), write output.obj, and render an HTML report.

Usage:
  python -m tpudraco.tools.analyzer -i mesh.obj -o report_dir
  python -m tpudraco.tools.analyzer -i scene.glb -o report_dir
"""

from __future__ import annotations

import argparse
import html
import json
import os
import time


def analyze_mesh(mesh, out_dir: str, name: str) -> dict:
    from ..decode import decode
    from ..encode import encode
    from ..eval import EvalRecorder

    os.makedirs(out_dir, exist_ok=True)
    rec = EvalRecorder()
    t0 = time.perf_counter()
    blob = encode(mesh, recorder=rec)
    encode_s = time.perf_counter() - t0
    with open(os.path.join(out_dir, "compressed.drc"), "wb") as f:
        f.write(blob)
    rec.dump(os.path.join(out_dir, "eval.json"))

    t0 = time.perf_counter()
    decoded = decode(blob)
    decode_s = time.perf_counter() - t0
    from ..io import save_obj
    save_obj(decoded, os.path.join(out_dir, "output.obj"))

    raw_size = sum(a.values_per_point().nbytes for a in mesh.attributes) \
        + mesh.faces.size * 4
    quality = mesh.diff_l2_norm(decoded)
    stats = {
        "name": name,
        "num_faces": int(mesh.num_faces),
        "num_points": int(mesh.attributes[0].num_points) if mesh.attributes else 0,
        "raw_size_bytes": int(raw_size),
        "compressed_size_bytes": len(blob),
        "compression_ratio": round(raw_size / len(blob), 3),
        "encode_seconds": round(encode_s, 4),
        "decode_seconds": round(decode_s, 4),
        "diff_l2_norm": quality,
        "eval": rec.to_json(),
    }
    with open(os.path.join(out_dir, "stats.json"), "w") as f:
        json.dump(stats, f, indent=1)
    _write_html(stats, os.path.join(out_dir, "report.html"))
    return stats


def _stage_rows(node, depth=0, rows=None):
    if rows is None:
        rows = []
    label = ("&nbsp;" * 4 * depth) + html.escape(node["name"])
    data = ", ".join(f"{k}={v}" for k, v in node["data"].items())
    rows.append(f"<tr><td>{label}</td><td>{html.escape(data)}</td></tr>")
    for c in node["children"]:
        _stage_rows(c, depth + 1, rows)
    return rows


def _write_html(stats: dict, path: str) -> None:
    rows = "\n".join(_stage_rows(stats["eval"]))
    doc = f"""<!doctype html><html><head><meta charset="utf-8">
<title>tpudraco report: {html.escape(stats['name'])}</title>
<style>body{{font-family:sans-serif;margin:2em}}table{{border-collapse:collapse}}
td,th{{border:1px solid #999;padding:4px 10px;text-align:left}}</style></head>
<body><h1>{html.escape(stats['name'])}</h1>
<table>
<tr><th>faces</th><td>{stats['num_faces']}</td></tr>
<tr><th>points</th><td>{stats['num_points']}</td></tr>
<tr><th>raw size</th><td>{stats['raw_size_bytes']} B</td></tr>
<tr><th>compressed</th><td>{stats['compressed_size_bytes']} B</td></tr>
<tr><th>ratio</th><td>{stats['compression_ratio']}x</td></tr>
<tr><th>encode</th><td>{stats['encode_seconds']} s</td></tr>
<tr><th>decode</th><td>{stats['decode_seconds']} s</td></tr>
<tr><th>diff_l2_norm</th><td>{stats['diff_l2_norm']:.3e}</td></tr>
</table>
<h2>Stages</h2><table><tr><th>stage</th><th>data</th></tr>{rows}</table>
</body></html>"""
    with open(path, "w", encoding="utf-8") as f:
        f.write(doc)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tpudraco-analyzer")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", required=True, help="report directory")
    args = p.parse_args(argv)

    ext = os.path.splitext(args.input)[1].lower()
    name = os.path.basename(args.input)
    if ext == ".obj":
        from ..io import load_obj
        meshes = [(name, load_obj(args.input))]
    elif ext in (".gltf", ".glb"):
        from ..io import load_gltf_to_scene
        scene = load_gltf_to_scene(args.input)
        meshes = [(f"{name}#{i}", m) for i, m in enumerate(scene.meshes)]
    else:
        print(f"unsupported input {ext}")
        return 2
    for mesh_name, mesh in meshes:
        sub = os.path.join(args.output, mesh_name.replace("/", "_"))
        stats = analyze_mesh(mesh, sub, mesh_name)
        print(f"{mesh_name}: {stats['compressed_size_bytes']}B "
              f"({stats['compression_ratio']}x), "
              f"quality {stats['diff_l2_norm']:.2e} -> {sub}/report.html")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
