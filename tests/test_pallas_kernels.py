"""Pallas MXU kernels must match the jnp/scatter reference exactly.

On the CPU test backend the kernels run in Pallas interpret mode — the same
kernel code paths the TPU compiles."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from tpudraco.ops import (
    bincount_kernel, build_combined_matrix, build_parallelogram_gathers,
    build_prediction_matrix, encode_step, encode_step_pallas,
    histogram_pallas, parallelogram_predict_kernel, predict_matmul_pallas,
    predict_matmul_viable, quantize_kernel,
)


def test_histogram_pallas_matches_scatter():
    rng = np.random.default_rng(0)
    sym = jnp.asarray(rng.integers(0, 500, size=(4, 1000), dtype=np.int32))
    ref = bincount_kernel(sym, 512)
    got = histogram_pallas(sym, 512)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_histogram_pallas_drops_out_of_range():
    sym = jnp.asarray([[-3, 0, 0, 5, 700, 511, 511, 512]], dtype=jnp.int32)
    got = np.asarray(histogram_pallas(sym, 512))[0]
    assert got[0] == 2 and got[5] == 1 and got[511] == 2
    assert got.sum() == 5  # -3, 700, 512 dropped


def test_histogram_pallas_row_chunking():
    rng = np.random.default_rng(1)
    sym = jnp.asarray(rng.integers(0, 128, size=(2, 900), dtype=np.int32))
    ref = np.asarray(bincount_kernel(sym, 128))
    got = np.asarray(histogram_pallas(sym, 128, max_chunk=256))
    assert np.array_equal(ref, got)


def _mesh_case(n=8, seed=3):
    from tests.test_device_ops import _grid_mesh
    from tpudraco.encode.connectivity import EdgebreakerEncoder
    from tpudraco.models import (Attribute, AttributeDomain, AttributeType,
                                 TableView)
    from tpudraco.shared.sequencer import compute_sequence
    from tpudraco.wire import ByteWriter

    pos, faces = _grid_mesh(n, seed)
    att = Attribute(pos, AttributeType.POSITION, AttributeDomain.POSITION)
    eb = EdgebreakerEncoder(faces, [att])
    out = eb.encode(ByteWriter())
    view = TableView(out.corner_table.corner_table)
    seq = compute_sequence(view, list(out.corners_of_edgebreaker))
    gathers = build_parallelogram_gathers(view, seq, att.unique_indices())
    return att, gathers


def test_predict_matmul_matches_gather():
    att, gn = _mesh_case()
    gathers = {k: jnp.asarray(v) for k, v in gn.items()}
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.integers(0, 2048, size=(3, int(att.values.shape[0]), 3),
                                 dtype=np.int32))
    ref = parallelogram_predict_kernel(
        q, gathers["next"], gathers["prev"], gathers["opp"],
        gathers["fallback"], gathers["can_para"], gathers["has_fallback"])
    M = jnp.asarray(build_prediction_matrix(
        gn["next"], gn["prev"], gn["opp"], gn["fallback"],
        gn["can_para"], gn["has_fallback"], q.shape[1]))
    got = predict_matmul_pallas(M, q)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_encode_step_pallas_matches_encode_step():
    att, gn = _mesh_case(n=10, seed=7)
    gathers = {k: jnp.asarray(v) for k, v in gn.items()}
    M = jnp.asarray(build_prediction_matrix(
        gn["next"], gn["prev"], gn["opp"], gn["fallback"],
        gn["can_para"], gn["has_fallback"], int(att.values.shape[0])))
    pos = jnp.asarray(att.values, dtype=jnp.float32)[None]
    ref = encode_step(pos, gathers, bits=11)
    got = encode_step_pallas(pos, gathers, M, bits=11)
    for k in ("symbols", "counts", "mins", "delta_max", "vmin", "vmax"):
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


def test_encode_step_pallas_combined_matrix():
    att, gn = _mesh_case(n=9, seed=11)
    gathers = {k: jnp.asarray(v) for k, v in gn.items()}
    M2 = jnp.asarray(build_combined_matrix(gn, int(att.values.shape[0])))
    pos = jnp.asarray(att.values, dtype=jnp.float32)[None]
    ref = encode_step(pos, gathers, bits=11)
    got = encode_step_pallas(pos, gathers, M2, bits=11)
    for k in ("symbols", "counts", "mins", "delta_max", "vmin", "vmax"):
        assert np.array_equal(np.asarray(ref[k]), np.asarray(got[k])), k


def test_predict_matmul_viable_heuristic():
    assert predict_matmul_viable(T=10000, V=4096, B=64, C=3)
    assert not predict_matmul_viable(T=600000, V=200000, B=1, C=3)
    # two 7-bit int8 planes are exact to 14 bits only: deep -qp must take
    # the gather step (hardware-caught divergence at -qp 15/16)
    assert predict_matmul_viable(T=10000, V=4096, B=64, C=3, bits=14)
    assert not predict_matmul_viable(T=10000, V=4096, B=64, C=3, bits=15)


def test_rans_scan_pallas_matches_scan():
    """The Pallas rANS kernel must be bit-identical to the lax.scan path:
    same emitted bytes (in order), same masks, same final states — across
    per-lane tables, inactive lanes, and T not a multiple of the chunk."""
    from tpudraco.entropy.rans import normalize_freq_counts
    from tpudraco.ops.pallas_kernels import rans_scan_pallas

    rng = np.random.default_rng(5)
    L, T, prec = 7, 700, 12  # forces lane padding to 1024 and T padding
    streams = [rng.integers(0, 30 + 11 * i, size=T, dtype=np.int64)
               for i in range(L)]
    S = max(int(s.max()) + 1 for s in streams)
    freqs = np.zeros((L, S), np.uint32)
    cums = np.zeros((L, S), np.uint32)
    sym = np.zeros((L, T), np.int32)
    lengths = np.zeros(L, np.int32)
    for i, s in enumerate(streams):
        d = normalize_freq_counts(np.bincount(s), prec)
        freqs[i, :len(d)] = d
        cums[i, 1:len(d)] = np.cumsum(d)[:-1]
        sym[i] = s
        lengths[i] = T if i != 3 else T // 2  # one short lane
    lengths[5] = 0  # one fully inactive lane

    idx = np.clip(sym, 0, S - 1)
    fs = np.take_along_axis(freqs, idx, axis=1).astype(np.uint32)
    cs = np.take_along_axis(cums, idx, axis=1).astype(np.uint32)
    fs[fs == 0] = 1  # inactive steps never divide by zero in interpret mode

    # oracle: the plain python recurrence
    l_base = (1 << prec) << 2
    exp_bytes = [[] for _ in range(L)]
    exp_states = np.zeros(L, np.uint32)
    for i in range(L):
        state = l_base
        for t in range(int(lengths[i])):
            f, c = int(fs[i, t]), int(cs[i, t])
            while state >= ((l_base >> prec) * f) << 8:
                exp_bytes[i].append(state & 0xFF)
                state >>= 8
            state = ((state // f) << prec) + state % f + c
        exp_states[i] = state

    emitted, is_byte, states = rans_scan_pallas(
        jnp.asarray(fs), jnp.asarray(cs), jnp.asarray(lengths),
        precision=prec)
    emitted = np.asarray(emitted)
    is_byte = np.asarray(is_byte)
    states = np.asarray(states)
    for i in range(L):
        got = emitted[i][is_byte[i]].tolist()
        assert got == exp_bytes[i], f"lane {i}"
        assert int(states[i]) == int(exp_states[i]), f"lane {i} state"
