"""Decode robustness: corrupted streams must raise typed errors, never
crash, hang, or return silently-wrong data without an exception. Also a
randomized round-trip torture sweep across configs."""

import numpy as np
import pytest

from tpudraco.decode import decode
from tpudraco.encode import Config, encode
from tpudraco.models import Attribute, AttributeDomain, AttributeType
from tpudraco.models.mesh import Mesh
from tpudraco.shared.connectivity_eq import weak_eq_by_laplacian


def _random_mesh(rng, n=7):
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.random(n * n).astype(np.float32) * 3], axis=1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a, b, c, d = (i * n + j, i * n + j + 1,
                          (i + 1) * n + j, (i + 1) * n + j + 1)
            if rng.random() < 0.9:  # random holes
                faces += [[a, b, c]]
            if rng.random() < 0.9:
                faces += [[b, d, c]]
    # through MeshBuilder: random holes orphan vertices, and the builder's
    # unused-vertex removal (builder.rs:129-189) is part of what we fuzz
    from tpudraco.models import MeshBuilder
    b = MeshBuilder()
    b.set_connectivity_attribute(np.asarray(faces, dtype=np.int64))
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    return b.build()


@pytest.mark.parametrize("cfg", [Config(), Config(traversal=2),
                                 Config(encoder_method=0),
                                 Config(encoder_method=0,
                                        sequential_method="compressed"),
                                 Config.from_level(8),
                                 Config.from_level(10),
                                 # round-5 dialect surfaces
                                 Config(traversal=1),
                                 Config(attribute_traversal=
                                        "prediction-degree")])
def test_roundtrip_torture_random_holed_grids(cfg):
    """Random holes produce boundary loops and non-manifold (bowtie)
    vertices; the corner table legitimately splits the latter, so the
    oracle is geometric (per-face value multisets, vertex-split-invariant)
    rather than the Laplacian spectrum."""
    from tests.test_roundtrip import assert_roundtrip

    rng = np.random.default_rng(11)
    for trial in range(6):
        mesh = _random_mesh(rng)
        if mesh.num_faces == 0:
            continue
        assert_roundtrip(mesh, cfg=cfg)


@pytest.mark.parametrize("cfg", [Config(), Config(traversal=2),
                                 Config(encoder_method=0,
                                        sequential_method="compressed"),
                                 Config.from_level(10),
                                 Config(traversal=1)])
def test_decode_corruption_never_crashes(cfg):
    """Flip/zero bytes all over a valid stream: every corruption must
    either decode (harmless bit) or raise a typed error — including through
    the C++ fast paths."""
    rng = np.random.default_rng(3)
    mesh = _random_mesh(rng, n=6)
    blob = bytearray(encode(mesh, cfg=cfg))
    survived, rejected = 0, 0
    for k in range(0, len(blob), max(1, len(blob) // 120)):
        for val in (0x00, 0xFF, blob[k] ^ 0x55):
            mutated = bytearray(blob)
            mutated[k] = val
            try:
                decode(bytes(mutated))
                survived += 1
            except Exception:
                rejected += 1
    assert survived + rejected > 100  # the sweep actually ran


def test_decode_truncation_never_crashes():
    rng = np.random.default_rng(5)
    mesh = _random_mesh(rng, n=6)
    blob = encode(mesh)
    for cut in range(0, len(blob), max(1, len(blob) // 60)):
        try:
            decode(blob[:cut])
        except Exception:
            pass


def test_decode_garbage_never_crashes():
    rng = np.random.default_rng(7)
    for _ in range(20):
        junk = b"DRACO\x02\x02\x01\x01\x00\x00" + rng.bytes(200)
        try:
            decode(junk)
        except Exception:
            pass


@pytest.mark.parametrize("cfg", [Config(), Config(traversal=2),
                                 Config(quant_bits={AttributeType.NORMAL: 12,
                                                    AttributeType.TEX_COORD: 12}),
                                 Config(quant_bits={AttributeType.COLOR: 9}),
                                 Config(encoder_method=0),
                                 # round-5: D4 orthogonal normal transform
                                 # + prediction-degree sequencing together
                                 Config(transform={AttributeType.NORMAL: 4},
                                        attribute_traversal=
                                        "prediction-degree")])
def test_roundtrip_torture_textured(cfg):
    """Randomized textured meshes (positions + normals + seamed UVs +
    colors) across traversals; exercises the vectorized normal/UV
    predictions, -qg-style generic depths, and the attribute corner
    tables on irregular topology."""
    from tests.test_roundtrip import assert_roundtrip
    from tpudraco.models import MeshBuilder

    rng = np.random.default_rng(23)
    for trial in range(4):
        n = 6
        xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                             np.arange(n, dtype=np.float32))
        pos = np.stack([xs.ravel(), ys.ravel(),
                        rng.random(n * n).astype(np.float32) * 2], axis=1)
        faces = []
        for i in range(n - 1):
            for j in range(n - 1):
                a, b, c, d = (i * n + j, i * n + j + 1,
                              (i + 1) * n + j, (i + 1) * n + j + 1)
                if rng.random() < 0.92:
                    faces += [[a, b, c]]
                if rng.random() < 0.92:
                    faces += [[b, d, c]]
        if not faces:
            continue
        nrm = rng.normal(size=(n * n, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        # UVs with a seam: duplicate-looking values on a vertical cut
        uv = (pos[:, :2] / n).astype(np.float32)
        uv[rng.random(n * n) < 0.3] += 0.5  # value jumps create seams
        b = MeshBuilder()
        b.set_connectivity_attribute(np.asarray(faces, dtype=np.int64))
        pid = b.add_attribute(pos, AttributeType.POSITION,
                              AttributeDomain.POSITION)
        b.add_attribute(nrm, AttributeType.NORMAL, AttributeDomain.CORNER,
                        parents=[pid])
        b.add_attribute(uv, AttributeType.TEX_COORD, AttributeDomain.CORNER,
                        parents=[pid])
        b.add_attribute(rng.random((n * n, 3)).astype(np.float32),
                        AttributeType.COLOR, AttributeDomain.POSITION)
        assert_roundtrip(b.build(), cfg=cfg)


def test_corrupt_counts_never_bomb_allocator():
    """Corrupted leb128/u32 counts (a crafted stream can claim 2^60
    faces/symbols/points) must raise typed errors BEFORE any
    count-proportional allocation — never MemoryError or a multi-GB
    np.zeros."""
    from tpudraco.entropy.rans import parse_rans_table
    from tpudraco.wire import ByteReader

    with pytest.raises(ValueError, match="num_symbols"):
        parse_rans_table(ByteReader(b"\xff" * 7 + b"\x7f" + b"\x00" * 4))

    blob = bytearray(encode(_random_mesh(np.random.default_rng(3))))
    rng = np.random.default_rng(9)
    for _ in range(200):
        b2 = bytearray(blob)
        # maxed varint bytes in the header/connectivity region claim
        # astronomically large counts
        for _ in range(int(rng.integers(1, 5))):
            b2[int(rng.integers(8, 64))] = 0xFF
        try:
            decode(bytes(b2))
        except MemoryError:
            raise AssertionError("corrupt count bombed the allocator")
        except Exception:
            pass  # typed decode errors are the expected outcome
