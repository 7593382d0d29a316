"""Debug stream markers and GLB inspection tools."""

import os

import numpy as np
import pytest

from tpudraco.models import Attribute, AttributeDomain, AttributeType
from tpudraco.models.mesh import Mesh
from tpudraco.utils import debug as dbg
from tpudraco.wire import ByteReader, ByteWriter


def _tet_mesh():
    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    faces = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]], np.int64)
    att = Attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    return Mesh(faces=faces, attributes=[att])


def test_debug_markers_roundtrip():
    w = ByteWriter()
    dbg.set_debug_format(True)
    try:
        dbg.debug_write(w, "stage one")
        w.write_u32(42)
        dbg.debug_write(w, "stage two")
        r = ByteReader(w.getvalue())
        dbg.debug_expect(r, "stage one")
        assert r.read_u32() == 42
        dbg.debug_expect(r, "stage two")
    finally:
        dbg.set_debug_format(False)


def test_debug_markers_detect_misalignment():
    w = ByteWriter()
    dbg.set_debug_format(True)
    try:
        dbg.debug_write(w, "alpha")
        r = ByteReader(w.getvalue())
        with pytest.raises(dbg.StreamMarkerError):
            dbg.debug_expect(r, "beta")
    finally:
        dbg.set_debug_format(False)


def test_debug_markers_noop_when_disabled():
    w = ByteWriter()
    dbg.debug_write(w, "anything")
    assert w.getvalue() == b""


def test_encode_decode_with_debug_format():
    from tpudraco.decode import decode
    from tpudraco.encode import encode

    mesh = _tet_mesh()
    plain = encode(mesh)
    dbg.set_debug_format(True)
    try:
        marked = encode(mesh)
        assert len(marked) > len(plain)  # markers are in-band
        out = decode(marked)
    finally:
        dbg.set_debug_format(False)
    assert out.num_faces == mesh.num_faces
    # marked streams are NOT valid draco; plain streams still decode
    assert decode(plain).num_faces == mesh.num_faces


def test_glb_tools_roundtrip(tmp_path):
    from tpudraco.io.gltf import save_scene_glb
    from tpudraco.models.scene import Scene
    from tpudraco.tools.glb_tools import extract_draco_blobs, extract_glb_json
    from tpudraco.decode import decode

    mesh = _tet_mesh()
    scene = Scene()
    scene.add_mesh(mesh)
    glb = os.path.join(tmp_path, "t.glb")
    save_scene_glb(scene, glb, compress=True)

    gltf = extract_glb_json(glb)
    assert "KHR_draco_mesh_compression" in gltf.get("extensionsRequired", []) \
        or "KHR_draco_mesh_compression" in gltf.get("extensionsUsed", [])

    blobs = extract_draco_blobs(glb)
    assert len(blobs) == 1
    name, blob = blobs[0]
    assert blob[:5] == b"DRACO"
    assert decode(blob).num_faces == mesh.num_faces


def test_batch_analyze_dir(tmp_path):
    from tpudraco.io.obj import save_obj
    from tpudraco.tools.batch_analyze import analyze_dir

    corpus = os.path.join(tmp_path, "corpus")
    os.makedirs(corpus)
    save_obj(_tet_mesh(), os.path.join(corpus, "tet.obj"))
    with open(os.path.join(corpus, "broken.obj"), "w") as f:
        f.write("not a mesh\n")
    out = os.path.join(tmp_path, "report")
    results = analyze_dir(corpus, out)
    ok = [r for r in results if "error" not in r]
    assert len(ok) >= 1
    assert os.path.exists(os.path.join(
        out, ok[0]["name"].replace("/", "_"), "report.html"))
