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
