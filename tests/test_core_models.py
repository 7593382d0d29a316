"""Core data-model tests. Oracle values transliterated from the reference's
unit tests (core/corner_table/mod.rs:532-674, builder.rs:400-438,
attribute_corner_table.rs:195-293)."""

import os

import numpy as np
import pytest

from tpudraco.models import (
    NONE, Attribute, AttributeCornerTable, AttributeDomain, AttributeType,
    ComponentType, CornerTable, Mesh, MeshBuilder,
)

REF_DATA = "/root/reference/draco-oxide/tests/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted")


def _pos_att(values, n=None):
    return Attribute(np.asarray(values, dtype=np.float32),
                     AttributeType.POSITION, AttributeDomain.POSITION)


def test_attribute_dedup():
    vals = np.array([[0, 0], [1, 0], [0, 0], [1, 1], [1, 0]], dtype=np.float32)
    att = _pos_att(vals)
    assert att.num_points == 5
    assert att.num_unique_values == 3
    assert att.point_map.tolist() == [0, 1, 0, 2, 1]
    assert np.array_equal(att.values, np.array(
        [[0, 0], [1, 0], [1, 1]], dtype=np.float32))


def test_attribute_no_dup():
    att = _pos_att([[0, 0], [1, 0], [2, 0]])
    assert att.point_map is None
    assert att.num_points == att.num_unique_values == 3


def test_component_type_ids():
    # Google Draco DataType wire ids
    assert ComponentType.I8 == 1
    assert ComponentType.U8 == 2
    assert ComponentType.F32 == 9
    assert ComponentType.F64 == 10
    assert ComponentType.F32.size == 4
    assert ComponentType.F32.is_float


def test_mesh_builder_tetrahedron():
    # builder.rs:400-438: 12 points collapse to 4 via position dedup
    faces = [[0, 1, 2], [3, 4, 5], [6, 7, 8], [9, 10, 11]]
    pos = np.array([
        [0.0, 0, 0], [1, 0, 0], [2, 0, 0],
        [0, 0, 0], [3, 0, 0], [1, 0, 0],
        [1, 0, 0], [3, 0, 0], [2, 0, 0],
        [0, 0, 0], [2, 0, 0], [3, 0, 0],
    ], dtype=np.float32)
    b = MeshBuilder()
    b.set_connectivity_attribute(faces)
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    mesh = b.build()
    assert mesh.num_faces == 4
    assert len(mesh.attributes) == 1
    assert mesh.attributes[0].num_points == 4


def test_mesh_builder_degenerate_and_unused():
    faces = [[0, 1, 2], [1, 1, 2], [3, 4, 5]]
    pos = np.arange(21, dtype=np.float32).reshape(7, 3)  # point 6 unused
    b = MeshBuilder()
    b.set_connectivity_attribute(faces)
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    mesh = b.build()
    assert mesh.num_faces == 2  # degenerate face removed
    assert mesh.attributes[0].num_points == 6  # unused point 6 removed


def test_corner_table_quad():
    # core/corner_table/mod.rs:538-579
    faces = np.array([[0, 1, 2], [2, 1, 3]])
    att = _pos_att([[0, 0], [1, 0], [0, 1], [1, 1]])
    ct = CornerTable(faces, att)
    assert ct.num_faces() == 2
    assert ct.num_corners == 6
    assert ct.num_vertices == 4
    assert ct.opp(0) == 5
    assert ct.opp(5) == 0
    for c in (1, 2, 3, 4):
        assert ct.opp(c) == NONE
    from tpudraco.models import next_corner, prev_corner
    assert prev_corner(0) == 2 and prev_corner(1) == 0 and prev_corner(2) == 1
    assert next_corner(0) == 1 and next_corner(1) == 2 and next_corner(2) == 0


def test_corner_table_strip():
    # mod.rs:582-609: 4 faces, no splits
    faces = np.array([[0, 1, 2], [1, 3, 2], [2, 3, 4], [2, 4, 5]])
    att = _pos_att([[0, 0, 0], [1, 0, 0], [0, 1, 0],
                    [1, 1, 0], [0, 0.5, 0], [1, 0.5, 0]])
    ct = CornerTable(faces, att)
    assert ct.num_faces() == 4
    assert ct.num_corners == 12
    assert ct.num_vertices == 6
    assert not ct.non_manifold_vertex_parents


def test_corner_table_triangle():
    faces = np.array([[0, 1, 2]])
    att = _pos_att([[0, 0], [1, 0], [0, 1]])
    ct = CornerTable(faces, att)
    assert ct.left_most.tolist() == [0, 1, 2]


def test_corner_table_non_manifold_vertex():
    # mod.rs:632-659: bow-tie at vertex 0 gets duplicated
    faces = np.array([[0, 1, 2], [0, 3, 4]])
    att = _pos_att([[0, 0], [1, 0], [0, 1], [-1, 1], [0, -1]])
    ct = CornerTable(faces, att)
    assert ct.num_vertices == 6
    assert ct.left_most.tolist() == [0, 1, 2, 4, 5, 3]
    assert ct.non_manifold_vertex_parents == [0]


def test_non_manifold_edge_detection():
    faces = np.array([[0, 1, 2], [1, 3, 2], [2, 1, 4]])
    att = _pos_att([[0, 0], [1, 0], [0, 1], [1, 1], [2, 2]])
    ct = CornerTable(faces, att)  # must not hang; edge (1,2) shared by 3 faces
    assert ct.num_corners == 9


def test_attribute_corner_table_no_seam():
    faces = np.array([[0, 1, 2], [2, 1, 3]])
    att = _pos_att([[0, 0], [1, 0], [0, 1], [1, 1]])
    ct = CornerTable(faces, att)
    # attribute identical to positions -> only boundary seams, no splits
    act = AttributeCornerTable(ct, att)
    assert act.num_vertices == ct.num_vertices
    assert len(act.corner_to_vertex) == ct.num_corners


@needs_ref
def test_attribute_corner_table_sphere_no_seam():
    from tpudraco.io import load_obj
    mesh = load_obj(os.path.join(REF_DATA, "sphere.obj"))
    pos = mesh.position_attribute()
    ct = CornerTable(mesh.faces, pos)
    normal = mesh.attributes_of_type(AttributeType.NORMAL)[0]
    act = AttributeCornerTable(ct, normal)
    assert act.num_vertices == ct.num_vertices
    assert not act.is_edge_on_seam.any()
    assert not act.is_vertex_on_seam.any()
    # vertices match the universal table everywhere
    assert np.array_equal(act.corner_to_vertex, ct.corner_to_vertex)


@needs_ref
def test_attribute_corner_table_tetrahedron_seams():
    # attribute_corner_table.rs:244-292 oracle values
    from tpudraco.io import load_obj
    mesh = load_obj(os.path.join(REF_DATA, "tetrahedron.obj"))
    pos = mesh.position_attribute()
    ct = CornerTable(mesh.faces, pos)
    tex = mesh.attributes_of_type(AttributeType.TEX_COORD)[0]
    act = AttributeCornerTable(ct, tex)
    assert act.num_vertices == ct.num_vertices + 2
    assert act.corner_to_vertex[0] == 0
    for c in (3, 5, 6, 7, 9, 11):
        assert act.is_edge_on_seam[c], f"corner {c} should be seam-opposite"
    expected_left_most = [6, 5, 11, 10, 8, 4]
    for v, lm in enumerate(expected_left_most):
        assert act.left_most[v] == lm
        assert act.swing_left(lm, ct) == NONE
    for c in (4, 8, 10):
        assert act.swing_left(c, ct) == NONE
        assert act.swing_right(c, ct) == NONE


@needs_ref
def test_load_obj_fixtures():
    from tpudraco.io import load_obj
    for name, natts in (("sphere.obj", 3), ("torus.obj", 3),
                        ("cube_quads.obj", 3), ("punctured_sphere.obj", 3),
                        ("tetrahedron.obj", 3)):
        mesh = load_obj(os.path.join(REF_DATA, name))
        assert mesh.num_faces > 0
        assert mesh.attributes[0].att_type == AttributeType.POSITION


def test_obj_vertex_colors_roundtrip(tmp_path):
    """``v x y z r g b`` vertex colors (the draco/MeshLab OBJ extension;
    the reference's tobj options drop them) round-trip through
    save_obj/load_obj as a float32 COLOR attribute, and survive a full
    encode->decode->save cycle."""
    from tpudraco.decode import decode
    from tpudraco.encode import encode
    from tpudraco.io.obj import load_obj, save_obj
    from tpudraco.models import AttributeDomain, MeshBuilder

    rng = np.random.RandomState(0)
    n = 5
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.rand(n * n).astype(np.float32)], 1)
    col = rng.rand(n * n, 3).astype(np.float32)
    faces = [[i * n + j, i * n + j + 1, i * n + j + n]
             for i in range(n - 1) for j in range(n - 1)]
    b = MeshBuilder()
    b.set_connectivity_attribute(np.asarray(faces))
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    b.add_attribute(col, AttributeType.COLOR, AttributeDomain.POSITION)
    mesh = b.build()

    p = str(tmp_path / "c.obj")
    save_obj(mesh, p)
    back = load_obj(p)
    cols = [a for a in back.attributes if a.att_type == AttributeType.COLOR]
    assert len(cols) == 1
    # per-point color values survive (point order may renumber vertices)
    got = cols[0].values_per_point()
    want = mesh.attributes[1].values_per_point()
    assert got.shape == want.shape
    assert np.allclose(np.sort(got, axis=0), np.sort(want, axis=0),
                       atol=1e-6)

    # encode -> decode -> save keeps a COLOR attribute in the obj text
    dec = decode(encode(back))
    p2 = str(tmp_path / "c2.obj")
    save_obj(dec, p2)
    line = open(p2).readline().split()
    assert line[0] == "v" and len(line) == 7

    # colors survive a save of the re-loaded colored mesh
    save_obj(load_obj(p2), str(tmp_path / "c3.obj"))
    m3 = load_obj(str(tmp_path / "c3.obj"))
    assert any(a.att_type == AttributeType.COLOR for a in m3.attributes)

    # and plain files (no colors) stay color-free end to end
    plain = MeshBuilder()
    plain.set_connectivity_attribute(np.asarray(faces))
    plain.add_attribute(pos, AttributeType.POSITION,
                        AttributeDomain.POSITION)
    p4 = str(tmp_path / "plain.obj")
    save_obj(plain.build(), p4)
    assert len(open(p4).readline().split()) == 4  # "v x y z"
    m4 = load_obj(p4)
    assert not any(a.att_type == AttributeType.COLOR
                   for a in m4.attributes)


def test_diff_l2_norm_zero_for_identical():
    faces = np.array([[0, 1, 2]])
    att = _pos_att([[0, 0, 0], [1, 0, 0], [0, 1, 0]])
    m = Mesh(faces=faces, attributes=[att])
    assert m.diff_l2_norm(m) < 1e-12


def test_weak_eq_by_laplacian():
    """Spectrum equality oracle (shared/connectivity/eq.rs:122-193):
    invariant under vertex permutation; distinguishes genus."""
    import numpy as np

    from tpudraco.shared.connectivity_eq import weak_eq_by_laplacian

    def torus_faces(n=6, m=6):
        faces = []
        for i in range(n):
            for j in range(m):
                a = i * m + j
                b = i * m + (j + 1) % m
                c = ((i + 1) % n) * m + j
                d = ((i + 1) % n) * m + (j + 1) % m
                faces.append([a, b, c])
                faces.append([b, d, c])
        return np.asarray(faces)

    t = torus_faces()
    rng = np.random.RandomState(0)
    perm = rng.permutation(t.max() + 1)
    t_perm = perm[t]
    assert weak_eq_by_laplacian(t, t_perm)
    assert weak_eq_by_laplacian(t, np.roll(t_perm, 7, axis=0))

    # octahedron (sphere, genus 0) differs from any same-size torus patch
    octa = np.asarray([[0, 1, 2], [0, 2, 3], [0, 3, 4], [0, 4, 1],
                       [5, 2, 1], [5, 3, 2], [5, 4, 3], [5, 1, 4]])
    small_t = torus_faces(2, 2)
    assert len(octa) == len(small_t)
    assert not weak_eq_by_laplacian(octa, small_t)

    # decoder output is weakly equal to the encoder input
    from tpudraco.decode import decode
    from tpudraco.encode import encode
    from tpudraco.models import AttributeDomain, AttributeType, MeshBuilder

    pos = rng.rand(t.max() + 1, 3).astype(np.float32)
    b = MeshBuilder()
    b.set_connectivity_attribute(t)
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    mesh = b.build()
    dec = decode(encode(mesh))
    assert weak_eq_by_laplacian(mesh.faces, dec.faces)
