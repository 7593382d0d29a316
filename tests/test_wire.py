"""Wire-layer tests. Oracle byte patterns transliterated from the reference's
unit tests (core/bit_coder.rs:507-663, utils/bit_coder.rs:36-68)."""

import numpy as np
import pytest

from tpudraco.wire import (
    BitReader, BitWriter, ByteReader, ByteWriter, NotEnoughData,
    leb128_read, leb128_size, leb128_write, unzigzag, zigzag,
)


def test_byte_writer_le():
    w = ByteWriter()
    w.write_u8(200)
    w.write_u16(201)
    w.write_u24(202)
    w.write_u32(203)
    assert len(w) == 10
    r = ByteReader(w.getvalue())
    assert r.read_u8() == 200
    assert r.read_u16() == 201
    assert r.read_u24() == 202
    assert r.read_u32() == 203


def test_reverse_reader():
    r = ByteReader(bytes([1, 2, 3, 4, 5]))
    rev = r.spawn_reverse_reader(2)
    assert rev.read_u8_back() == 2
    assert rev.read_u8_back() == 1
    with pytest.raises(NotEnoughData):
        rev.read_u8_back()
    assert r.read_u8() == 3
    assert r.read_u8() == 4
    assert r.read_u8() == 5


def test_reverse_reader_multibyte():
    w = ByteWriter()
    w.write_u8(200)
    w.write_u16(201)
    w.write_u24(202)
    w.write_u32(203)
    r = ByteReader(w.getvalue())
    rev = r.spawn_reverse_reader(10)
    assert rev.read_u32_back() == 203
    assert rev.read_u24_back() == 202
    assert rev.read_u16_back() == 201
    assert rev.read_u8_back() == 200


def test_bit_writer_msb_oracle():
    # core/bit_coder.rs:555-569
    w = ByteWriter()
    bw = BitWriter(w, msb_first=True)
    bw.write_bits(9, 0b101010100)
    bw.write_bits(8, 0b10101110)
    bw.write_bits(7, 0b0101010)
    bw.write_bits(6, 0b111100)
    bw.write_bits(5, 0b00001)
    bw.write_bits(4, 0b1100)
    bw.close()
    assert list(w.getvalue()) == [
        0b10101010, 0b01010111, 0b00101010, 0b11110000, 0b00111000]

    w2 = ByteWriter()
    bw2 = BitWriter(w2, msb_first=True)
    bw2.write_bits(9, 0b110111011)
    bw2.close()
    assert list(w2.getvalue()) == [0b11011101, 0b10000000]


def test_bit_roundtrip_both_orders():
    rng = np.random.RandomState(0)
    for msb in (True, False):
        sizes = rng.randint(1, 64, size=200).tolist()
        vals = [int(rng.randint(0, 2 ** s)) for s in sizes]
        w = ByteWriter()
        bw = BitWriter(w, msb_first=msb)
        for s, v in zip(sizes, vals):
            bw.write_bits(s, v)
        bw.close()
        br = BitReader(ByteReader(w.getvalue()), msb_first=msb)
        for s, v in zip(sizes, vals):
            assert br.read_bits(s) == v


def test_bit_lsb_oracle():
    # core/bit_coder.rs:616-627: ten alternating bits read back as 0b10 pairs
    w = ByteWriter()
    bw = BitWriter(w, msb_first=False)
    bw.write_bits(10, 0b1010101010)
    bw.close()
    assert len(w) == 2
    br = BitReader(ByteReader(w.getvalue()), msb_first=False)
    for _ in range(5):
        assert br.read_bits(2) == 0b10


def test_leb128_oracle():
    w = ByteWriter()
    leb128_write(300, w)
    assert list(w.getvalue()) == [172, 2]
    assert leb128_read(ByteReader(w.getvalue())) == 300


def test_leb128_roundtrip():
    data = [0, 1, 127, 128, 255, 256, 1234567890, 0xFFFFFFFFFFFFFFFF]
    w = ByteWriter()
    for v in data:
        leb128_write(v, w)
    assert len(w) == sum(leb128_size(v) for v in data)
    r = ByteReader(w.getvalue())
    for v in data:
        assert leb128_read(r) == v
    assert r.remaining() == 0


def test_zigzag():
    vals = np.array([0, -1, 1, -2, 2, 12345, -12345, 2**30, -(2**30)])
    z = zigzag(vals)
    assert list(z[:5]) == [0, 1, 2, 3, 4]
    assert np.array_equal(unzigzag(z), vals)
    for v in vals.tolist():
        assert zigzag(v) == z[list(vals).index(v)]
        assert unzigzag(zigzag(v)) == v


def test_functional_byte_writer_reader():
    from tpudraco.wire.byte_io import FunctionalByteReader, FunctionalByteWriter

    sink = bytearray()
    w = FunctionalByteWriter(sink.append)
    w.write_u8(7)
    w.write_u16(0xABCD)
    w.write_u32(0xDEADBEEF)
    w.write_bytes(b"hi")
    it = iter(sink)
    r = FunctionalByteReader(lambda: next(it))
    assert r.read_u8() == 7
    assert r.read_u16() == 0xABCD
    assert r.read_u32() == 0xDEADBEEF
    assert r.read_bytes(2) == b"hi"
