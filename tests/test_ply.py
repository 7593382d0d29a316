"""PLY I/O tests: ascii + binary round-trips, attribute mapping, point
clouds, full codec loop, CLI. The reference lists Ply in its scene_io
format enum but dispatches to `unimplemented!` (io/gltf/scene_io.rs:84-97);
this is a real implementation."""

import os

import numpy as np
import pytest

from tpudraco.io import load_ply, save_ply
from tpudraco.io.ply import PlyError
from tpudraco.models import AttributeType


def _demo_mesh():
    from tpudraco.models import AttributeDomain, MeshBuilder
    n = 5
    rng = np.random.RandomState(0)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.rand(n * n).astype(np.float32)], 1)
    nrm = np.zeros_like(pos)
    nrm[:, 2] = 1.0
    col = rng.randint(0, 256, size=(n * n, 3)).astype(np.uint8)
    uv = pos[:, :2] / n
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    b = MeshBuilder()
    b.set_connectivity_attribute(np.asarray(faces))
    pid = b.add_attribute(pos, AttributeType.POSITION,
                          AttributeDomain.POSITION, name="POSITION")
    b.add_attribute(nrm, AttributeType.NORMAL, AttributeDomain.CORNER,
                    parents=[pid], name="NORMAL")
    b.add_attribute(uv, AttributeType.TEX_COORD, AttributeDomain.CORNER,
                    parents=[pid], name="TEXCOORD_0")
    b.add_attribute(col, AttributeType.COLOR, AttributeDomain.CORNER,
                    parents=[pid], name="COLOR_0")
    return b.build()


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    mesh = _demo_mesh()
    p = str(tmp_path / "m.ply")
    save_ply(mesh, p, binary=binary)
    back = load_ply(p)
    assert back.num_faces == mesh.num_faces
    assert {a.att_type for a in back.attributes} == {
        AttributeType.POSITION, AttributeType.NORMAL,
        AttributeType.TEX_COORD, AttributeType.COLOR}
    po = np.sort(mesh.position_attribute().values_per_point(), axis=0)
    pb = np.sort(back.position_attribute().values_per_point(), axis=0)
    assert np.allclose(po, pb)
    cb = next(a for a in back.attributes
              if a.att_type == AttributeType.COLOR)
    assert cb.values.dtype == np.uint8  # colors stay bytes


def test_ply_ascii_binary_agree(tmp_path):
    mesh = _demo_mesh()
    a, b = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    save_ply(mesh, a, binary=False)
    save_ply(mesh, b, binary=True)
    ma, mb = load_ply(a), load_ply(b)
    assert np.array_equal(ma.faces, mb.faces)
    for x, y in zip(ma.attributes, mb.attributes):
        assert np.allclose(np.asarray(x.values, np.float64),
                           np.asarray(y.values, np.float64))


def test_ply_quad_triangulation(tmp_path):
    p = str(tmp_path / "quad.ply")
    with open(p, "w") as f:
        f.write("""ply
format ascii 1.0
element vertex 4
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
end_header
0 0 0
1 0 0
1 1 0
0 1 0
4 0 1 2 3
""")
    m = load_ply(p)
    assert m.num_faces == 2  # fan-triangulated quad


def test_ply_point_cloud_codec(tmp_path):
    """Face-less PLY -> point cloud -> .drc (geometry type 0) -> PLY."""
    from tpudraco.decode import decode
    from tpudraco.encode import GEOMETRY_POINT_CLOUD, Config, encode

    rng = np.random.RandomState(1)
    pos = rng.rand(100, 3).astype(np.float32)
    col = rng.randint(0, 256, size=(100, 3)).astype(np.uint8)
    p = str(tmp_path / "pc.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 100\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\n"
                "element face 0\nproperty list uchar int vertex_indices\n"
                "end_header\n")
        for i in range(100):
            f.write(f"{float(pos[i,0])} {float(pos[i,1])} "
                    f"{float(pos[i,2])} "
                    f"{col[i,0]} {col[i,1]} {col[i,2]}\n")
    pc = load_ply(p)
    assert pc.num_faces == 0
    blob = encode(pc, cfg=Config(geometry_type=GEOMETRY_POINT_CLOUD))
    assert blob[7] == GEOMETRY_POINT_CLOUD
    back = decode(blob)
    assert back.num_faces == 0
    assert len(back.attributes[0].values) == 100
    out = str(tmp_path / "pc_back.ply")
    save_ply(back, out)
    again = load_ply(out)
    assert len(again.position_attribute().values) == 100


def test_ply_cli_roundtrip(tmp_path):
    from tpudraco.tools.cli import main as cli

    mesh = _demo_mesh()
    src = str(tmp_path / "m.ply")
    save_ply(mesh, src)
    drc = str(tmp_path / "m.drc")
    out = str(tmp_path / "m_back.ply")
    assert cli(["-i", src, "-o", drc, "-q"]) == 0
    assert cli(["-i", drc, "-o", out, "-q"]) == 0
    back = load_ply(out)
    assert back.num_faces == mesh.num_faces


def test_ply_binary_ragged_faces(tmp_path):
    """Mixed quad/tri binary face lists (ragged, widest row first) must
    take the scalar walk, not crash the bulk fast-path (self-review r2)."""
    import struct as _s

    pos = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
                    [2, 0, 0]], np.float32)
    header = ("ply\nformat binary_little_endian 1.0\n"
              "element vertex 5\n"
              "property float x\nproperty float y\nproperty float z\n"
              "element face 2\n"
              "property list uchar int vertex_indices\nend_header\n")
    body = pos.tobytes()
    body += _s.pack("<B4i", 4, 0, 1, 2, 3)   # quad first (widest)
    body += _s.pack("<B3i", 3, 1, 4, 2)      # then a triangle
    p = str(tmp_path / "ragged.ply")
    with open(p, "wb") as f:
        f.write(header.encode() + body)
    m = load_ply(p)
    assert m.num_faces == 3  # 2 (quad fan) + 1


def test_ply_ascii_second_list_rejected(tmp_path):
    """A second list property per element must raise PlyError instead of
    silently corrupting connectivity (self-review r2)."""
    p = str(tmp_path / "twolists.ply")
    with open(p, "w") as f:
        f.write("""ply
format ascii 1.0
element vertex 3
property float x
property float y
property float z
element face 1
property list uchar int vertex_indices
property list uchar float texcoord
end_header
0 0 0
1 0 0
0 1 0
3 0 1 2
6 0.0 0.0 1.0 0.0 0.0 1.0
""")
    with pytest.raises(PlyError):
        load_ply(p)


def test_ply_point_cloud_keeps_uv_alpha(tmp_path):
    """Face-less PLY keeps UVs and 4-channel color exactly like the mesh
    path (self-review r2: these were silently dropped)."""
    p = str(tmp_path / "pc2.ply")
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 3\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property float s\nproperty float t\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nproperty uchar alpha\n"
                "end_header\n"
                "0 0 0 0.1 0.2 10 20 30 40\n"
                "1 0 0 0.3 0.4 50 60 70 80\n"
                "0 1 0 0.5 0.6 90 100 110 120\n")
    pc = load_ply(p)
    assert pc.num_faces == 0
    types = {a.att_type: a for a in pc.attributes}
    assert AttributeType.TEX_COORD in types
    col = types[AttributeType.COLOR]
    assert col.num_components == 4
    assert col.values[1].tolist() == [50, 60, 70, 80]


def test_ply_errors(tmp_path):
    p = str(tmp_path / "bad.ply")
    with open(p, "w") as f:
        f.write("not a ply\n")
    with pytest.raises(PlyError):
        load_ply(p)
    with open(p, "w") as f:
        f.write("ply\nformat binary_big_endian 1.0\nend_header\n")
    with pytest.raises(PlyError):
        load_ply(p)
