"""CLI / analyzer / eval-recorder tests."""

import json
import os

import pytest

from tpudraco.tools.analyzer import main as analyzer_main
from tpudraco.tools.cli import main as cli_main

REF_DATA = "/root/reference/draco-oxide/tests/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted")


@needs_ref
def test_cli_encode_decode(tmp_path):
    drc = str(tmp_path / "s.drc")
    obj = str(tmp_path / "s.obj")
    ev = str(tmp_path / "eval.json")
    assert cli_main(["-i", os.path.join(REF_DATA, "sphere.obj"), "-o", drc,
                     "--eval", ev, "-q"]) == 0
    assert os.path.getsize(drc) > 0
    assert cli_main(["-i", drc, "-o", obj, "-q"]) == 0
    assert os.path.getsize(obj) > 0
    tree = json.load(open(ev))
    names = [c["name"] for c in tree["children"][0]["children"]]
    assert names == ["header", "connectivity info", "attributes"]
    conn = tree["children"][0]["children"][1]
    assert conn["data"]["num_faces"] == 224
    assert conn["data"]["bytes"] > 0


@needs_ref
def test_cli_transcode(tmp_path):
    out = str(tmp_path / "d.glb")
    assert cli_main(["--transcode", "-i",
                     os.path.join(REF_DATA, "Duck", "Duck.glb"),
                     "-o", out, "-q"]) == 0
    assert os.path.getsize(out) < os.path.getsize(
        os.path.join(REF_DATA, "Duck", "Duck.glb"))


def test_cli_bad_format(tmp_path, capsys):
    inp = str(tmp_path / "x.xyz")
    open(inp, "w").write("nope")
    assert cli_main(["-i", inp, "-o", str(tmp_path / "y.abc"), "-q"]) == 2


@needs_ref
def test_analyzer_report(tmp_path):
    out = str(tmp_path / "report")
    assert analyzer_main(["-i", os.path.join(REF_DATA, "tetrahedron.obj"),
                          "-o", out]) == 0
    sub = os.path.join(out, "tetrahedron.obj")
    assert os.path.isfile(os.path.join(sub, "report.html"))
    assert os.path.isfile(os.path.join(sub, "compressed.drc"))
    assert os.path.isfile(os.path.join(sub, "output.obj"))
    stats = json.load(open(os.path.join(sub, "stats.json")))
    assert stats["num_faces"] == 4
    assert stats["diff_l2_norm"] < 1e-2


def test_corpus_cli(tmp_path):
    """tpudraco.tools.corpus drives encode/decode/transcode over
    directories with resume."""
    import json
    import shutil

    import numpy as np

    from tpudraco.io.obj import save_obj
    from tpudraco.models import (AttributeDomain, AttributeType,
                                 MeshBuilder)
    from tpudraco.tools.corpus import main as corpus_main

    n = 6
    rng = np.random.RandomState(0)
    xs, ys = np.meshgrid(np.arange(n, dtype=np.float32),
                         np.arange(n, dtype=np.float32))
    pos = np.stack([xs.ravel(), ys.ravel(),
                    rng.rand(n * n).astype(np.float32)], 1)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces += [[a, a + 1, a + n], [a + 1, a + n + 1, a + n]]
    b = MeshBuilder()
    b.set_connectivity_attribute(np.asarray(faces))
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    mesh = b.build()

    src = tmp_path / "in"
    src.mkdir()
    for i in range(3):
        save_obj(mesh, str(src / f"m{i}.obj"))

    enc_out = str(tmp_path / "enc")
    assert corpus_main(["encode", "-i", str(src), "-o", enc_out]) == 0
    assert sorted(os.listdir(enc_out))[:3] == ["corpus_report.json",
                                               "m0.drc", "m1.drc"]

    dec_out = str(tmp_path / "dec")
    assert corpus_main(["decode", "-i", enc_out, "-o", dec_out,
                        "--fmt", "ply"]) == 0
    from tpudraco.io import load_ply
    back = load_ply(os.path.join(dec_out, "m0.ply"))
    assert back.num_faces == mesh.num_faces

    duck = "/root/reference/draco-oxide/tests/data/Duck/Duck.glb"
    if os.path.isfile(duck):
        gsrc = tmp_path / "glbs"
        gsrc.mkdir()
        shutil.copy(duck, str(gsrc / "duck.glb"))
        t_out = str(tmp_path / "t")
        assert corpus_main(["transcode", "-i", str(gsrc), "-o", t_out,
                            "--host-only"]) == 0
        with open(os.path.join(t_out, "transcode_report.json")) as f:
            assert json.load(f)["transcoded"] == 1

    # -qp applies to the encode command too, host and device planes
    # producing identical non-default-depth streams
    from tpudraco.encode import Config, encode
    want = encode(mesh, cfg=Config(
        quant_bits={AttributeType.POSITION: 13}))
    for extra in ([], ["--device"]):
        qp_out = str(tmp_path / ("qp" + str(len(extra))))
        assert corpus_main(["encode", "-i", str(src), "-o", qp_out,
                            "-qp", "13"] + extra) == 0
        assert open(os.path.join(qp_out, "m0.drc"), "rb").read() == want


def test_corpus_cli_ply_and_collisions(tmp_path):
    """Self-review r3 regressions: .ply inputs encode via the dispatched
    loader; duplicate output names are reported, not silently clobbered."""
    import numpy as np

    from tpudraco.io import save_ply
    from tpudraco.models import (AttributeDomain, AttributeType,
                                 MeshBuilder)
    from tpudraco.parallel import BatchEncoder
    from tpudraco.tools.corpus import main as corpus_main

    pos = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]],
                   np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int64)
    b = MeshBuilder()
    b.set_connectivity_attribute(faces)
    b.add_attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    mesh = b.build()

    src = tmp_path / "in"
    src.mkdir()
    save_ply(mesh, str(src / "quad.ply"))
    out = str(tmp_path / "enc")
    assert corpus_main(["encode", "-i", str(src), "-o", out]) == 0
    assert os.path.isfile(os.path.join(out, "quad.drc"))

    # same basename in two dirs -> second reported as collision
    d2 = tmp_path / "in2"
    d2.mkdir()
    save_ply(mesh, str(d2 / "quad.ply"))
    rep = BatchEncoder().encode_corpus(
        [str(src / "quad.ply"), str(d2 / "quad.ply")],
        str(tmp_path / "enc2"))
    assert rep["encoded"] == 1
    assert rep["failed"][0]["error"] == "output name collision"


def test_cli_compression_levels_and_glb_out(tmp_path):
    """-cl presets are monotone-ish in size and all round-trip; .drc
    decodes to .glb too."""
    from tpudraco.decode import decode
    from tpudraco.io import load_gltf
    from tpudraco.tools.cli import main as cli

    src = "/root/reference/draco-oxide/tests/data/torus.obj"
    if not os.path.isfile(src):
        import pytest
        pytest.skip("fixtures not mounted")

    sizes = {}
    for cl in (0, 5, 8, 10):
        out = str(tmp_path / f"cl{cl}.drc")
        assert cli(["-i", src, "-o", out, "-cl", str(cl), "-q"]) == 0
        sizes[cl] = os.path.getsize(out)
        m = decode(open(out, "rb").read())
        assert m.num_faces == 4095
    # higher levels never larger on this regular mesh; 10 strictly wins
    assert sizes[5] <= sizes[0]
    assert sizes[8] <= sizes[5]
    assert sizes[10] < sizes[8]

    # decode to GLB container
    glb = str(tmp_path / "torus.glb")
    assert cli(["-i", str(tmp_path / "cl5.drc"), "-o", glb, "-q"]) == 0
    back = load_gltf(glb)
    assert back.num_faces == 4095


def test_cli_explicit_flags_override_cl_preset(tmp_path):
    """Self-review r4: explicit flags must override the -cl preset in
    BOTH directions (e.g. -cl 1 --method edgebreaker must NOT stay
    sequential; -cl 10 --traversal standard must leave the dialect)."""
    src = "/root/reference/draco-oxide/tests/data/tetrahedron.obj"
    if not os.path.isfile(src):
        import pytest
        pytest.skip("fixtures not mounted")
    from tpudraco.tools.cli import main as cli

    out = str(tmp_path / "a.drc")
    assert cli(["-i", src, "-o", out, "-cl", "1",
                "--method", "edgebreaker", "-q"]) == 0
    blob = open(out, "rb").read()
    assert blob[8] == 1  # method byte: edgebreaker, not sequential

    out2 = str(tmp_path / "b.drc")
    assert cli(["-i", src, "-o", out2, "-cl", "10",
                "--traversal", "standard", "--prediction", "default",
                "--transform", "default", "-q"]) == 0
    out3 = str(tmp_path / "c.drc")
    assert cli(["-i", src, "-o", out3, "-cl", "8", "-q"]) == 0
    # standard traversal + default prediction/transform + auto == -cl 8
    assert open(out2, "rb").read() == open(out3, "rb").read()


def test_cli_point_cloud_with_corner_attributes(tmp_path):
    """--point-cloud expands corner-domain attributes to per-point rows
    before dropping connectivity (mispaired unique-value rows would emit
    structurally valid but wrong point clouds) and honors -qp."""
    import numpy as np

    from tpudraco.io import load_obj, load_ply
    from tpudraco.models import AttributeType
    from tpudraco.tools.cli import main as cli_main

    src_path = os.path.join(REF_DATA, "sphere.obj")
    if not os.path.isfile(src_path):
        import pytest
        pytest.skip("fixtures not mounted")
    drc = str(tmp_path / "pc.drc")
    ply = str(tmp_path / "pc.ply")
    assert cli_main(["-i", src_path, "-o", drc, "--point-cloud",
                     "-qp", "9", "-q"]) == 0
    assert cli_main(["-i", drc, "-o", ply, "-q"]) == 0
    src = load_obj(src_path)
    out = load_ply(ply)
    assert out.num_faces == 0
    want = np.asarray(src.position_attribute().values_per_point(),
                      np.float32)
    got = np.asarray(out.position_attribute().values, np.float32)
    assert want.shape == got.shape
    extent = float(want.max() - want.min())
    assert np.abs(want - got).max() < extent / 256  # rows pair up, 9-bit
    wn = np.asarray(next(a for a in src.attributes
                         if a.att_type == AttributeType.NORMAL)
                    .values_per_point(), np.float32)
    gn = np.asarray(next(a for a in out.attributes
                         if a.att_type == AttributeType.NORMAL).values,
                    np.float32)
    assert float(np.median(np.abs((wn * gn).sum(axis=1)))) > 0.99

    # -qp honored: 9-bit stream smaller than the 14-bit one
    drc14 = str(tmp_path / "pc14.drc")
    assert cli_main(["-i", src_path, "-o", drc14, "--point-cloud",
                     "-qp", "14", "-q"]) == 0
    assert os.path.getsize(drc) < os.path.getsize(drc14)
