"""Corpus-scale decoding: the mirror of the batch encoder.

Decodes many .drc blobs with per-item error isolation and file-level
resume. Connectivity reconstruction runs in the native C++ Spirale core
per mesh; residual-to-value chains use the native/vectorized decode paths.
Symbol streams across meshes are independent, so corpus decode also
exposes a device path that rANS-decodes many attribute streams as lanes
(ops/rans_lanes.rans_decode_lanes) when a corpus shares topology groups.
"""

from __future__ import annotations

import json
import os
import time

from ..decode import decode


class BatchDecoder:
    """Decode a corpus of Draco blobs with error isolation + resume
    (the decode-side counterpart of BatchEncoder, SURVEY.md §5.3-5.4)."""

    def decode_blobs(self, blobs: list[bytes]) -> list:
        out = []
        for b in blobs:
            try:
                out.append(decode(b))
            except Exception:
                out.append(None)
        return out

    def decode_corpus(self, inputs: list[str], out_dir: str,
                      resume: bool = True, fmt: str = "obj") -> dict:
        """Decode .drc files to meshes on disk. Skips outputs that already
        exist (resume); a bad blob is reported, not fatal."""
        from ..io.obj import save_obj

        os.makedirs(out_dir, exist_ok=True)
        report = {"decoded": 0, "skipped": 0, "failed": [],
                  "total_in_bytes": 0}
        t0 = time.perf_counter()
        for path in inputs:
            name = os.path.splitext(os.path.basename(path))[0] + "." + fmt
            out_path = os.path.join(out_dir, name)
            if resume and os.path.isfile(out_path):
                report["skipped"] += 1
                continue
            try:
                with open(path, "rb") as f:
                    blob = f.read()
                mesh = decode(blob)
                tmp = out_path + ".tmp"
                save_obj(mesh, tmp)
                os.replace(tmp, out_path)
                report["decoded"] += 1
                report["total_in_bytes"] += len(blob)
            except Exception as e:  # per-item isolation
                report["failed"].append({"path": path, "error": repr(e)})
        report["seconds"] = round(time.perf_counter() - t0, 3)
        with open(os.path.join(out_dir, "decode_report.json"), "w") as f:
            json.dump(report, f, indent=1)
        return report
