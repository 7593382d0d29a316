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

    def decode_blobs_shared_topology(self, blobs: list[bytes]) -> list:
        """Batch decode for blobs produced from one topology group (the
        output of BatchEncoder.encode_meshes_device): the connectivity
        section is parsed and Spirale-reconstructed ONCE and reused for
        every blob whose connectivity bytes match byte-for-byte; blobs that
        diverge (or fail) fall back to the full per-blob decoder. Output
        meshes are identical to per-blob decode() (pinned by tests)."""
        from ..decode import _assemble_mesh, decode_header
        from ..decode.attribute import decode_attributes
        from ..decode.connectivity import decode_connectivity
        from ..wire.byte_io import ByteReader

        if not blobs:
            return []
        out: list = [None] * len(blobs)
        try:
            r0 = ByteReader(blobs[0])
            header = decode_header(r0)
            if header["flags"] & 0x8000 or header["method"] != 1 \
                    or header["geometry_type"] != 1:
                raise ValueError("not a plain edgebreaker mesh stream")
            conn = decode_connectivity(r0)
            conn_end = r0.pos
            prefix = bytes(blobs[0][:conn_end])
        except Exception:
            return self.decode_blobs(blobs)

        for i, blob in enumerate(blobs):
            try:
                if bytes(blob[:conn_end]) != prefix:
                    out[i] = decode(blob)  # different topology: full path
                    continue
                r = ByteReader(blob, pos=conn_end)
                atts = decode_attributes(r, conn)
                out[i] = _assemble_mesh(conn, atts)
            except Exception:
                out[i] = None
        return out

    def decode_corpus(self, inputs: list[str], out_dir: str,
                      resume: bool = True, fmt: str = "obj",
                      workers: int = 1) -> dict:
        """Decode .drc files to meshes on disk. Skips outputs that already
        exist (resume); a bad blob is reported, not fatal. ``workers`` > 1
        decodes on a thread pool (the C++ chains release the GIL)."""
        from ..io.obj import save_obj

        os.makedirs(out_dir, exist_ok=True)
        report = {"decoded": 0, "skipped": 0, "failed": [],
                  "total_in_bytes": 0}
        t0 = time.perf_counter()

        def one(path):
            name = os.path.splitext(os.path.basename(path))[0] + "." + fmt
            out_path = os.path.join(out_dir, name)
            if resume and os.path.isfile(out_path):
                return ("skipped", path, 0)
            try:
                with open(path, "rb") as f:
                    blob = f.read()
                mesh = decode(blob)
                tmp = out_path + f".tmp{os.getpid()}"
                save_obj(mesh, tmp)
                os.replace(tmp, out_path)
                return ("decoded", path, len(blob))
            except Exception as e:  # per-item isolation
                return ("failed", path, repr(e))

        if workers > 1:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(max_workers=workers) as pool:
                results = list(pool.map(one, inputs))
        else:
            results = [one(p) for p in inputs]

        for status, path, x in results:
            if status == "decoded":
                report["decoded"] += 1
                report["total_in_bytes"] += x
            elif status == "skipped":
                report["skipped"] += 1
            else:
                report["failed"].append({"path": path, "error": x})
        report["seconds"] = round(time.perf_counter() - t0, 3)
        with open(os.path.join(out_dir, "decode_report.json"), "w") as f:
            json.dump(report, f, indent=1)
        return report
