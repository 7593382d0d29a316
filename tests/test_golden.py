"""Golden-bytes regression pins: encoder output for the reference fixtures
must stay byte-identical across refactors (the format contract). Goldens
are content-addressed by SHA-256 in-tree; regenerate deliberately with
`python tests/test_golden.py --regen` after an intentional format change
and explain the change in the commit message."""

import hashlib
import json
import os
import sys

import pytest

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_hashes.json")
REF_DATA = "/root/reference/draco-oxide/tests/data"
needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted")

FIXTURES = ["tetrahedron.obj", "sphere.obj", "torus.obj", "cube_quads.obj",
            "punctured_sphere.obj"]
CONFIGS = {"standard": {}, "valence": {"traversal": 2},
           "sequential": {"encoder_method": 0},
           # round-2 modes: table-aware auto symbol coding, and the full
           # -cl 10 preset (round 5: valence + auto + multi-parallelogram
           # positions + derivative UVs + D4 orthogonal normals;
           # AttributeType POSITION==0 / NORMAL==1 / TEX_COORD==3 and
           # prediction wire ids 2/7 as plain dict keys/values)
           "auto": {"symbol_coding": "auto"},
           "cl10": {"traversal": 2, "symbol_coding": "auto",
                    "prediction": {0: 2, 3: 7}, "transform": {1: 4}},
           # round-3 mode: delta-coded sequential indices (method id 0)
           "seq_compressed": {"encoder_method": 0,
                              "sequential_method": "compressed"},
           # round-5 modes: exact D4 orthogonal normal transform (wire id
           # 4; AttributeType.NORMAL == 1 as a plain dict key) and the
           # prediction-degree traversal (wire TraversalType=1)
           "orthogonal": {"transform": {1: 4}},
           "preddeg": {"attribute_traversal": "prediction-degree"},
           # round-5 mode: predictive edgebreaker (EdgebreakerKind=1,
           # order-1 previous-symbol context rANS)
           "predictive": {"traversal": 1}}


def _digest(name: str, cfg_kwargs: dict) -> tuple[str, int]:
    from tpudraco.encode import Config, encode
    from tpudraco.io import load_obj

    mesh = load_obj(os.path.join(REF_DATA, name))
    blob = encode(mesh, cfg=Config(**cfg_kwargs))
    return hashlib.sha256(blob).hexdigest(), len(blob)


def _all_digests() -> dict:
    out = {}
    for name in FIXTURES:
        for cfg_name, kwargs in CONFIGS.items():
            digest, size = _digest(name, kwargs)
            out[f"{name}:{cfg_name}"] = {"sha256": digest, "bytes": size}
    return out


@needs_ref
@pytest.mark.parametrize("name", FIXTURES)
@pytest.mark.parametrize("cfg_name", list(CONFIGS))
def test_golden_bytes(name, cfg_name):
    if not os.path.isfile(GOLDEN_PATH):
        pytest.skip("no golden hashes recorded yet")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    key = f"{name}:{cfg_name}"
    digest, size = _digest(name, CONFIGS[cfg_name])
    assert key in golden, f"missing golden for {key} — run --regen"
    assert golden[key]["sha256"] == digest, (
        f"{key}: encoder bytes changed ({golden[key]['bytes']}B -> {size}B)."
        " If intentional, regenerate goldens and justify in the commit.")


if __name__ == "__main__":
    if "--regen" in sys.argv:
        digests = _all_digests()
        with open(GOLDEN_PATH, "w") as f:
            json.dump(digests, f, indent=1, sort_keys=True)
        print(f"wrote {len(digests)} golden hashes to {GOLDEN_PATH}")
    else:
        print("usage: python tests/test_golden.py --regen")
