"""Entropy-stack round-trip tests, mirroring the reference's own coverage
(decode/entropy/rans.rs:210-281, decode/entropy/symbol_coding.rs:119-211)."""

import numpy as np

from tpudraco.entropy import (
    DIRECT_CODED, LENGTH_CODED,
    RabsDecoder, RabsEncoder, RansDecoder, RansEncoder,
    RansSymbolDecoder, RansSymbolEncoder,
    bit_length_u64, decode_symbols, encode_symbols,
    normalize_freq_counts, parse_rans_table, serialize_rans_table,
)
from tpudraco.wire import ByteReader, ByteWriter


def test_rans_roundtrip_reference_pattern():
    # decode/entropy/rans.rs:218-246: 43 symbols, x = (x+37)%43 over 2^12 draws
    num_symbols = 43
    data = []
    freq_counts = [0] * num_symbols
    x = 3
    for _ in range(1 << 12):
        x = (x + 37) % num_symbols
        data.append(x)
        freq_counts[x] += 1
    enc = RansEncoder(freq_counts)
    enc.write_all(data)
    blob = enc.flush()
    r = ByteReader(blob)
    dec = RansDecoder(r, len(blob), freq_counts)
    for sym in reversed(data):
        assert dec.read() == sym
    assert dec.rev.remaining() == 0


def test_rabs_roundtrip_reference_pattern():
    # decode/entropy/rans.rs:248-280
    num_zeros = 100
    n = 1 << 8
    sorted_bits = [0] * num_zeros + [1] * (n - num_zeros)
    data = [0] * n
    for i in range(n):
        data[(67 * i) % n] = sorted_bits[i]
    enc = RabsEncoder(num_zeros)
    enc.write_all(data)
    blob = enc.flush()
    dec = RabsDecoder(ByteReader(blob), len(blob), num_zeros)
    for bit in reversed(data):
        assert dec.read() == bit


def test_rabs_extreme_probabilities():
    for freq0 in (1, 10, 128, 200, 255):
        bits = (np.arange(500) % 7 == 0).astype(int)
        enc = RabsEncoder(freq0)
        enc.write_all(bits)
        blob = enc.flush()
        dec = RabsDecoder(ByteReader(blob), len(blob), freq0)
        assert np.array_equal(dec.read_all(len(bits)), bits[::-1])


def test_normalize_freq_counts_sums():
    rng = np.random.RandomState(1)
    for p in (12, 15, 18, 20):
        for trial in range(5):
            counts = rng.randint(0, 1000, size=rng.randint(2, 300))
            counts[-1] = max(1, counts[-1])
            dist = normalize_freq_counts(counts, p)
            assert int(dist.sum()) == 1 << p
            assert np.all((dist > 0) == (counts[:len(dist)] > 0))


def test_table_serialization_roundtrip():
    rng = np.random.RandomState(2)
    for trial in range(10):
        counts = rng.randint(0, 50, size=rng.randint(2, 200))
        counts[rng.randint(len(counts))] = 10000  # force extra bytes
        counts[-1] = max(1, counts[-1])
        dist = normalize_freq_counts(counts, 14)
        w = ByteWriter()
        serialize_rans_table(dist, w)
        parsed = parse_rans_table(ByteReader(w.getvalue()))
        assert np.array_equal(parsed, dist)


def test_symbol_encoder_roundtrip():
    rng = np.random.RandomState(3)
    data = rng.zipf(1.5, size=2000)
    data = np.clip(data, 1, 100) - 1
    counts = np.bincount(data)
    w = ByteWriter()
    enc = RansSymbolEncoder(w, counts, precision=12)
    enc.write_all(data[::-1])
    enc.flush()
    r = ByteReader(w.getvalue())
    dec = RansSymbolDecoder(r, precision=12)
    assert np.array_equal(dec.decode_all(len(data)), data)
    assert r.remaining() == 0


def test_bit_length_u64():
    vals = np.array([0, 1, 2, 3, 4, 255, 256, 2**32 - 1, 2**32, 2**63],
                    dtype=np.uint64)
    expect = [0, 1, 2, 2, 3, 8, 9, 32, 33, 64]
    assert bit_length_u64(vals).tolist() == expect


def _symbols_cubic(n):
    return np.array([(x * x * x) % 23 for x in range(n)], dtype=np.uint64)


def test_encode_decode_symbols_length_coded():
    for n, nc in ((100, 1), (300, 3)):
        symbols = _symbols_cubic(n)
        w = ByteWriter()
        encode_symbols(symbols, nc, LENGTH_CODED, w)
        r = ByteReader(w.getvalue())
        out = decode_symbols(n, nc, r)
        assert np.array_equal(out, symbols)
        assert r.remaining() == 0


def test_encode_decode_symbols_direct_coded():
    for n, nc in ((100, 1), (300, 3)):
        symbols = _symbols_cubic(n)
        w = ByteWriter()
        encode_symbols(symbols, nc, DIRECT_CODED, w)
        r = ByteReader(w.getvalue())
        out = decode_symbols(n, nc, r)
        assert np.array_equal(out, symbols)
        assert r.remaining() == 0


def test_encode_decode_symbols_large_alphabet():
    rng = np.random.RandomState(4)
    symbols = rng.randint(0, 5000, size=4096).astype(np.uint64)
    for method in (LENGTH_CODED, DIRECT_CODED):
        w = ByteWriter()
        encode_symbols(symbols, 1, method, w)
        r = ByteReader(w.getvalue())
        out = decode_symbols(len(symbols), 1, r)
        assert np.array_equal(out, symbols)
        assert r.remaining() == 0


def test_encode_symbols_with_zeros_and_runs():
    # sparse alphabet -> zero runs in the frequency table
    symbols = np.zeros(500, dtype=np.uint64)
    symbols[::50] = 90
    symbols[25::50] = 17
    for method in (LENGTH_CODED, DIRECT_CODED):
        w = ByteWriter()
        encode_symbols(symbols, 1, method, w)
        out = decode_symbols(len(symbols), 1, ByteReader(w.getvalue()))
        assert np.array_equal(out, symbols)


def test_normalize_freq_counts_batch_matches_scalar():
    """Vectorized multi-lane table normalization is bit-identical to the
    per-lane reference loop across precisions, alphabet widths, and the
    sum-fixup branches (both under- and over-shoot)."""
    import numpy as np

    from tpudraco.entropy.rans import (normalize_freq_counts,
                                       normalize_freq_counts_batch)

    rng = np.random.RandomState(9)
    B, S = 64, 300
    counts = np.zeros((B, S), np.int64)
    precisions = np.zeros(B, np.int64)
    for b in range(B):
        width = rng.randint(1, S)
        kind = b % 4
        if kind == 0:   # smooth
            counts[b, :width] = rng.poisson(40, width)
        elif kind == 1:  # spiky (forces many 0->1 bumps -> overshoot)
            counts[b, :width] = rng.randint(0, 2, width)
            counts[b, rng.randint(width)] = 100000
        elif kind == 2:  # tiny alphabet
            counts[b, :min(width, 3)] = rng.randint(1, 50, min(width, 3))
        else:            # undershoot-prone: equal heavy bins
            counts[b, :width] = 1000
        counts[b, width - 1] = max(counts[b, width - 1], 1)  # end nonzero
        precisions[b] = rng.choice([12, 14, 15, 18, 20])
    dist, num_symbols = normalize_freq_counts_batch(counts, precisions)
    for b in range(B):
        ref = normalize_freq_counts(counts[b], int(precisions[b]))
        assert num_symbols[b] == len(ref), b
        assert np.array_equal(dist[b, :len(ref)], ref), b
        assert not dist[b, len(ref):].any(), b


def test_serialize_rans_tables_batch_matches_scalar():
    """Batched table serialization is byte-identical to the per-row
    serializer across gap runs (incl. the >=65-zero degradation quirk),
    multi-byte frequencies, and empty tables."""
    import numpy as np

    from tpudraco.entropy.rans import (serialize_rans_table,
                                       serialize_rans_tables_batch)
    from tpudraco.wire.byte_io import ByteWriter

    rng = np.random.RandomState(3)
    B, S = 40, 400
    dist = np.zeros((B, S), np.int64)
    ns = np.zeros(B, np.int64)
    for b in range(B):
        kind = b % 5
        if kind == 0:    # dense small freqs
            n = rng.randint(1, 60)
            dist[b, :n] = rng.randint(1, 63, n)
        elif kind == 1:  # long zero runs (> 64, the truncation quirk)
            dist[b, 0] = 5
            dist[b, 200] = 7
            dist[b, 399] = 1
        elif kind == 2:  # multi-byte freqs (2- and 3-byte tokens)
            dist[b, 0] = 1 << 10
            dist[b, 3] = 1 << 15
            dist[b, 70] = (1 << 21) - 1
        elif kind == 3:  # empty table
            pass
        else:            # random sparse
            idxs = np.sort(rng.choice(S, rng.randint(1, 30), replace=False))
            dist[b, idxs] = rng.randint(1, 1 << 16, len(idxs))
        nz = np.flatnonzero(dist[b])
        ns[b] = (nz[-1] + 1) if len(nz) else 0
    got = serialize_rans_tables_batch(dist, ns)
    for b in range(B):
        w = ByteWriter()
        serialize_rans_table(dist[b, :ns[b]], w)
        assert got[b] == w.getvalue(), b


def test_table_serialization_wide_alphabet_leb128():
    """Regression (round-3 soak): num_symbols >= 2^21 needs a 4-byte
    leb128 prefix in the batched table serializer (deep -qp direct-coded
    residual alphabets); parse back and compare."""
    from tpudraco.entropy.rans import parse_rans_table, serialize_rans_table
    from tpudraco.wire import ByteReader, ByteWriter

    rng = np.random.default_rng(3)
    ns = (1 << 21) + 17
    dist = np.zeros(ns, dtype=np.int64)
    occupied = rng.choice(ns - 1, size=200, replace=False)
    dist[occupied] = rng.integers(1, 1 << 19, size=200)
    dist[ns - 1] = 7  # table must end nonzero
    w = ByteWriter()
    serialize_rans_table(dist, w)
    back = parse_rans_table(ByteReader(w.getvalue()))
    assert len(back) == ns
    assert np.array_equal(back, dist)


def test_native_encode_direct_matches_python_twin(monkeypatch):
    """tpud_encode_direct (bincount -> normalize -> table tokens -> rANS
    -> flush, one native call) must emit bytes identical to the Python
    DirectCoded path across alphabet shapes: dense, geometric, wide
    sparse (>=65 zero-run quirk), all-zero, single-symbol."""
    import numpy as np

    import tpudraco.native as native
    from tpudraco.entropy import symbol_coding as sc
    from tpudraco.wire.byte_io import ByteWriter

    if native.load_library() is None:
        pytest.skip("native library unavailable")

    def py_bytes(symbols):
        w = ByteWriter()
        monkeypatch.setattr(native, "encode_direct", lambda s: None)
        try:
            sc._encode_direct_coded(symbols, w)
        finally:
            monkeypatch.undo()
        return bytes(w.getvalue())

    rng = np.random.RandomState(11)
    cases = [rng.randint(0, 8, 700), rng.geometric(0.08, 2500) - 1,
             rng.randint(0, 70000, 900), np.zeros(50, np.int64),
             np.full(300, 77)]
    for s in cases:
        s = s.astype(np.uint64)
        assert native.encode_direct(s) == py_bytes(s)
