"""Batch driver tests: topology caching, determinism vs sequential encode,
corpus resume, error isolation, device-batched group encoding."""

import os

import numpy as np
import pytest

from tpudraco.encode import encode
from tpudraco.models import AttributeDomain, AttributeType, MeshBuilder
from tpudraco.parallel import (
    BatchEncoder, PreparedTopology, encode_with_topology, topology_signature,
)

REF_DATA = "/root/reference/draco-oxide/tests/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted")


def _grid_mesh(n, seed):
    rng = np.random.RandomState(seed)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.rand(n * n).astype(np.float32)], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])
            faces.append([a + 1, a + n + 1, a + n])
    b = MeshBuilder()
    b.set_connectivity_attribute(np.asarray(faces))
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    return b.build()


def test_topology_cache_matches_sequential():
    """Batch output must be byte-identical to per-mesh encode()."""
    meshes = [_grid_mesh(10, s) for s in range(4)]
    be = BatchEncoder()
    batch = be.encode_meshes(meshes)
    for m, blob in zip(meshes, batch):
        assert blob == encode(m)
    assert len(be._topo_cache) == 1  # one shared topology


def test_signature_distinguishes_topologies():
    a = _grid_mesh(8, 0)
    b = _grid_mesh(9, 0)
    assert topology_signature(a) != topology_signature(b)
    assert topology_signature(a) == topology_signature(_grid_mesh(8, 5))


@needs_ref
def test_prepared_topology_on_fixture():
    from tpudraco.io import load_obj
    m = load_obj(os.path.join(REF_DATA, "tetrahedron.obj"))
    topo = PreparedTopology(m)
    assert encode_with_topology(m, topo) == encode(m)


@needs_ref
def test_corpus_driver_resume_and_errors(tmp_path):
    out = str(tmp_path / "corpus")
    inputs = [os.path.join(REF_DATA, n) for n in
              ("sphere.obj", "torus.obj", "cube_quads.obj")]
    bad = str(tmp_path / "broken.obj")
    open(bad, "w").write("v not a number\nf 1 2 x\n")
    be = BatchEncoder()
    report = be.encode_corpus(inputs + [bad], out)
    assert report["encoded"] == 3
    assert len(report["failed"]) == 1
    assert "broken" in report["failed"][0]["path"]
    # resume: all existing outputs skipped
    report2 = BatchEncoder().encode_corpus(inputs, out)
    assert report2["skipped"] == 3 and report2["encoded"] == 0
    # outputs decodable
    from tpudraco.decode import decode
    mesh = decode(open(os.path.join(out, "sphere.drc"), "rb").read())
    assert mesh.num_faces == 224


def test_device_group_matches_host_symbols():
    from tpudraco.parallel import device_encode_group
    meshes = [_grid_mesh(8, s) for s in range(3)]
    topo = PreparedTopology(meshes[0])
    pos_batch = np.stack([m.position_attribute().values.astype(np.float32)
                          for m in meshes])
    syms = device_encode_group(pos_batch, topo, meshes[0].position_attribute())
    assert syms.shape[0] == 3
    # per-mesh blobs must decode to the same geometry as sequential encode
    be = BatchEncoder()
    for m in meshes:
        assert be.encode_mesh(m) == encode(m)


def test_device_batch_encode_bit_exact(monkeypatch):
    """Full device chain (batched predict/residual + multi-lane rANS) must
    produce byte-identical .drc output to sequential host encode() — and
    must not silently pass via the host fallback."""
    meshes = [_grid_mesh(8, s) for s in range(4)] + [_grid_mesh(6, 9)]
    be = BatchEncoder()

    def no_fallback(self, mesh):
        raise AssertionError("device batch path fell back to host encode")
    monkeypatch.setattr(BatchEncoder, "encode_mesh", no_fallback)
    got = be.encode_meshes_device(meshes)
    for m, blob in zip(meshes, got):
        assert blob == encode(m)
