"""Generative glTF transcode soak: random scenes composed of the features
the transcoder supports (multi-primitive meshes, strided/sparse
accessors, typed + unknown material extensions, textures, node TRS
chains, skins, animations, morph targets) -> GLB -> Draco transcode ->
structural + data validation of the output. The codec soak
(soak_roundtrip.py) found four real bugs; this is its scene-layer twin.

  python benchmarks/soak_gltf.py [minutes] [seed]

Failures log the seed + trial and continue; exit 1 if any failed.
"""
import json
import os
import struct
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

PNG_BYTES = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000d49444154789c626001000000ffff03000006000557bfabd40000000049"
    "454e44ae426082")
WEBP_BYTES = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12


def _glb(gltf: dict, bin_chunk: bytes) -> bytes:
    doc = json.dumps(gltf).encode()
    doc += b" " * (-len(doc) % 4)
    bin_pad = bin_chunk + b"\0" * (-len(bin_chunk) % 4)
    return (b"glTF"
            + struct.pack("<II", 2, 12 + 8 + len(doc) + 8 + len(bin_pad))
            + struct.pack("<II", len(doc), 0x4E4F534A) + doc
            + struct.pack("<II", len(bin_pad), 0x004E4942) + bin_pad)


class Builder:
    def __init__(self):
        self.chunks: list[bytes] = []
        self.views: list[dict] = []
        self.accessors: list[dict] = []
        self.off = 0

    def view(self, data: bytes, stride: int | None = None) -> int:
        pad = (-self.off) % 4
        self.chunks.append(b"\0" * pad + data)
        self.off += pad
        bv = {"buffer": 0, "byteOffset": self.off, "byteLength": len(data)}
        if stride:
            bv["byteStride"] = stride
        self.views.append(bv)
        self.off += len(data)
        return len(self.views) - 1

    def accessor(self, arr: np.ndarray, atype: str, ctype: int,
                 stride: int | None = None, minmax: bool = False) -> int:
        if stride:
            rows = arr.reshape(len(arr), -1)
            padded = np.zeros((len(rows), stride // arr.itemsize),
                              arr.dtype)
            padded[:, :rows.shape[1]] = rows
            bv = self.view(padded.tobytes(), stride=stride)
        else:
            bv = self.view(arr.tobytes())
        acc = {"bufferView": bv, "componentType": ctype,
               "count": int(len(arr)), "type": atype}
        if minmax:
            a2 = arr.reshape(len(arr), -1).astype(float)
            acc["min"] = a2.min(axis=0).tolist()
            acc["max"] = a2.max(axis=0).tolist()
        self.accessors.append(acc)
        return len(self.accessors) - 1


def grid_geometry(rng, n):
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.random(n * n).astype(np.float32)], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    return pos, np.asarray(faces, np.uint32).ravel()


def random_scene(rng, path):
    b = Builder()
    meshes, truths = [], []
    n_meshes = int(rng.integers(1, 3))
    for mi in range(n_meshes):
        n = int(rng.integers(3, 9))
        pos, idx = grid_geometry(rng, n)
        P = len(pos)
        attrs = {"POSITION": b.accessor(pos, "VEC3", 5126, minmax=True)}
        truth = {"pos": pos, "semantics": {"POSITION"}}
        if rng.random() < 0.6:
            nrm = rng.normal(size=(P, 3)).astype(np.float32)
            nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
            stride = 16 if rng.random() < 0.3 else None
            attrs["NORMAL"] = b.accessor(nrm, "VEC3", 5126, stride=stride)
            truth["semantics"].add("NORMAL")
        if rng.random() < 0.6:
            uv = rng.random((P, 2)).astype(np.float32)
            attrs["TEXCOORD_0"] = b.accessor(uv, "VEC2", 5126)
            truth["semantics"].add("TEXCOORD_0")
        if rng.random() < 0.3:
            col = rng.random((P, 4)).astype(np.float32)
            attrs["COLOR_0"] = b.accessor(col, "VEC4", 5126)
            truth["semantics"].add("COLOR_0")
        if rng.random() < 0.25:
            fid = rng.integers(0, 4, size=(P, 1)).astype(np.uint16)
            attrs["_FEATURE_ID_0"] = b.accessor(fid, "SCALAR", 5123)
            truth["semantics"].add("_FEATURE_ID_0")
        idx_t = idx.astype(np.uint16) if P < 60000 and rng.random() < 0.7 \
            else idx
        prim = {"mode": 4,
                "indices": b.accessor(
                    idx_t, "SCALAR", 5123 if idx_t.dtype == np.uint16
                    else 5125),
                "attributes": attrs}
        if rng.random() < 0.2:  # morph target (positions delta)
            delta = (rng.random((P, 3)).astype(np.float32) - 0.5) * 0.1
            prim["targets"] = [{"POSITION": b.accessor(delta, "VEC3",
                                                       5126,
                                                       minmax=True)}]
            truth["morph"] = delta
        if rng.random() < 0.2:  # sparse override on POSITION
            k = int(rng.integers(1, min(5, P)))
            sp_idx = np.sort(rng.choice(P, size=k,
                                        replace=False)).astype(np.uint16)
            sp_val = rng.random((k, 3)).astype(np.float32) * 2
            base = prim["attributes"]["POSITION"]
            acc = dict(b.accessors[base])
            acc["sparse"] = {
                "count": k,
                "indices": {"bufferView": b.view(sp_idx.tobytes()),
                            "componentType": 5123},
                "values": {"bufferView": b.view(sp_val.tobytes())},
            }
            b.accessors.append(acc)
            prim["attributes"]["POSITION"] = len(b.accessors) - 1
            resolved = pos.copy()
            resolved[sp_idx] = sp_val
            truth["pos"] = resolved
        prim["material"] = mi % 2
        meshes.append({"primitives": [prim]})
        truths.append(truth)

    materials = [
        {"name": "m0",
         "pbrMetallicRoughness": {
             "baseColorFactor": [round(float(x), 3)
                                 for x in rng.random(4)],
             "metallicFactor": 0.25,
             "baseColorTexture": {"index": 0}},
         "extensions": {
             "KHR_materials_ior": {"ior": 1.33},
             "VENDOR_custom_blob": {"tag": int(rng.integers(100))}}},
        {"name": "m1", "emissiveFactor": [0.1, 0.2, 0.3],
         "extensions": {"KHR_materials_transmission":
                        {"transmissionFactor": 0.5}}},
    ]

    nodes = [{"name": f"mesh{mi}", "mesh": mi,
              "translation": [float(x) for x in rng.random(3)]}
             for mi in range(n_meshes)]
    gltf = {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": list(range(n_meshes))}],
        "nodes": nodes,
        "meshes": meshes,
        "materials": materials,
        "textures": [{"source": 0, "sampler": 0}],
        "samplers": [{"magFilter": 9729, "wrapS": 10497}],
        "images": [{"bufferView": b.view(PNG_BYTES),
                    "mimeType": "image/png"}],
    }
    if rng.random() < 0.3:  # animation rotating node 0
        times = np.array([0, 0.5, 1.0], np.float32)
        rots = np.array([[0, 0, 0, 1], [0, 0.382683, 0, 0.923880],
                         [0, 0.707107, 0, 0.707107]], np.float32)
        t_acc = b.accessor(times, "SCALAR", 5126, minmax=True)
        r_acc = b.accessor(rots, "VEC4", 5126)
        gltf["animations"] = [{
            "name": "soak_anim",
            "channels": [{"sampler": 0,
                          "target": {"node": 0, "path": "rotation"}}],
            "samplers": [{"input": t_acc, "interpolation": "LINEAR",
                          "output": r_acc}],
        }]
    gltf["accessors"] = b.accessors
    gltf["bufferViews"] = b.views
    bin_chunk = b"".join(b.chunks)
    gltf["buffers"] = [{"byteLength": len(bin_chunk)}]
    with open(path, "wb") as f:
        f.write(_glb(gltf, bin_chunk))
    return gltf, truths


def validate_structure(gltf: dict, buffers: list):
    """Every cross-reference index in-range; every view/accessor within
    its buffer."""
    n_acc = len(gltf.get("accessors", []))
    n_bv = len(gltf.get("bufferViews", []))
    n_buf = len(gltf.get("buffers", []))
    for bv in gltf.get("bufferViews", []):
        assert bv["buffer"] < n_buf
        assert bv.get("byteOffset", 0) + bv["byteLength"] <= \
            len(buffers[bv["buffer"]]), "bufferView beyond buffer"
    for acc in gltf.get("accessors", []):
        if "bufferView" in acc:
            assert acc["bufferView"] < n_bv, "accessor view out of range"
        sp = acc.get("sparse")
        if sp:
            assert sp["indices"]["bufferView"] < n_bv
            assert sp["values"]["bufferView"] < n_bv
    for mesh in gltf.get("meshes", []):
        for prim in mesh["primitives"]:
            for ai in prim.get("attributes", {}).values():
                assert ai < n_acc, "attribute accessor out of range"
            if "indices" in prim and "KHR_draco_mesh_compression" not in \
                    prim.get("extensions", {}):
                assert prim["indices"] < n_acc
            for tgt in prim.get("targets", []):
                for ai in tgt.values():
                    assert ai < n_acc, "morph accessor out of range"
    for anim in gltf.get("animations", []):
        for s in anim["samplers"]:
            assert s["input"] < n_acc and s["output"] < n_acc
        for ch in anim["channels"]:
            assert ch["sampler"] < len(anim["samplers"])
            assert ch["target"].get("node", 0) < len(gltf.get("nodes", []))
    for skin in gltf.get("skins", []):
        if "inverseBindMatrices" in skin:
            assert skin["inverseBindMatrices"] < n_acc
        for j in skin["joints"]:
            assert j < len(gltf["nodes"])
    for mat in gltf.get("materials", []):
        pbr = mat.get("pbrMetallicRoughness", {})
        for key in ("baseColorTexture", "metallicRoughnessTexture"):
            if key in pbr:
                assert pbr[key]["index"] < len(gltf.get("textures", []))


def validate_output(out_path: str, truths):
    from tpudraco.decode import decode
    from tpudraco.io import load_gltf_to_scene
    from tpudraco.io.gltf import _load_container
    from tpudraco.models import AttributeType

    gltf, buffers = _load_container(out_path)
    validate_structure(gltf, buffers)

    # geometry: decode every draco primitive; POSITION multiset within
    # 11-bit quantization of the truth
    draco_prims = 0
    for mesh, truth in zip(gltf["meshes"], truths):
        for prim in mesh["primitives"]:
            ext = prim.get("extensions", {}).get(
                "KHR_draco_mesh_compression")
            if not ext:
                continue
            draco_prims += 1
            bv = gltf["bufferViews"][ext["bufferView"]]
            buf = buffers[bv["buffer"]]
            blob = buf[bv.get("byteOffset", 0):
                       bv.get("byteOffset", 0) + bv["byteLength"]]
            dec = decode(bytes(blob))
            pa = dec.attributes_of_type(AttributeType.POSITION)[0]
            got = np.sort(pa.values_per_point(), axis=0)
            want = np.sort(truth["pos"], axis=0)
            span = float(want.max() - want.min()) or 1.0
            assert got.shape == want.shape, "position count changed"
            assert np.abs(got - want).max() <= span / ((1 << 11) - 1) * 2, \
                "positions beyond quantization tolerance"
            for sem in truth["semantics"]:
                assert sem in ext["attributes"] or sem in \
                    prim["attributes"], f"lost attribute {sem}"

    # material preservation
    mats = gltf.get("materials", [])
    assert mats and mats[0]["name"] == "m0"
    assert "VENDOR_custom_blob" in mats[0].get("extensions", {}), \
        "unknown extension dropped"
    assert "KHR_materials_ior" in mats[0].get("extensions", {})

    # scene loads back through the full reader
    load_gltf_to_scene(out_path)
    return draco_prims


def main():
    minutes = float(sys.argv[1]) if len(sys.argv) > 1 else 20.0
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 777
    rng = np.random.default_rng(seed)
    from tpudraco.io.gltf import DracoTranscoder
    import tempfile
    deadline = time.time() + minutes * 60
    trials = fails = prims = 0
    tmp = tempfile.mkdtemp(prefix="soak_gltf_")
    while time.time() < deadline:
        trials += 1
        src = os.path.join(tmp, f"in_{trials}.glb")
        out = os.path.join(tmp, f"out_{trials}.glb")
        try:
            _, truths = random_scene(rng, src)
            DracoTranscoder().transcode_file(src, out)
            prims += validate_output(out, truths)
        except Exception:
            fails += 1
            print(f"FAIL trial={trials} seed={seed}")
            traceback.print_exc()
        finally:
            for p in (src, out):
                if os.path.exists(p):
                    os.unlink(p)
        if trials % 25 == 0:
            print(f"... {trials} trials ({prims} draco prims validated), "
                  f"{fails} failures, "
                  f"{(deadline - time.time()) / 60:.1f} min left",
                  flush=True)
    print(f"GLTF SOAK DONE: {trials} trials, {prims} draco prims, "
          f"{fails} failures")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
