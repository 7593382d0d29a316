"""Edgebreaker connectivity decoding (Spirale Reversi over the reversed
CLERS stream) + attribute seam decoding.

The decoder rebuilds a corner table face by face while reading symbols in
reverse emission order. Algorithm structure follows Google Draco's
mesh_edgebreaker_decoder_impl (studied via the annotated transliteration in
draco-oxide/src/decode/connectivity/spirale_reversi.rs:200-660).
"""

from __future__ import annotations

import numpy as np

from ..entropy.rans import RabsDecoder
from ..models.corner_table import NONE, next_corner, prev_corner
from ..shared.clers import C, E, EB_STANDARD, L, ORIENTATION_RIGHT, R, S, crlight_decode
from ..wire.bit_io import BitReader
from ..wire.byte_io import ByteReader
from ..wire.varint import leb128_read


class DecodeError(Exception):
    pass


class DecodedCornerTable:
    """Growable corner table built during Spirale Reversi. Provides the same
    navigation interface as models.corner_table.CornerTable, with
    ``point(c) == c`` (decoder points are corners until final assembly)."""

    def __init__(self, num_faces: int) -> None:
        self.opposite = np.full(3 * num_faces, NONE, dtype=np.int64)
        self.corner_to_vertex = np.full(3 * num_faces, NONE, dtype=np.int64)
        self.left_most: list[int] = []
        self.num_corners = 3 * num_faces
        self.num_vertices = 0

    def add_vertex(self) -> int:
        self.left_most.append(NONE)
        self.num_vertices += 1
        return self.num_vertices - 1

    def num_faces(self) -> int:
        return self.num_corners // 3

    def vertex(self, c: int) -> int:
        return int(self.corner_to_vertex[c])

    def point(self, c: int) -> int:
        return c

    def opp(self, c: int) -> int:
        return int(self.opposite[c])

    def set_opposite(self, a: int, b: int) -> None:
        self.opposite[a] = b
        self.opposite[b] = a

    def swing_right(self, c: int) -> int:
        o = self.opposite[prev_corner(c)]
        return prev_corner(o) if o != NONE else NONE

    def swing_left(self, c: int) -> int:
        o = self.opposite[next_corner(c)]
        return next_corner(o) if o != NONE else NONE

    def get_right_corner(self, c: int) -> int:
        return int(self.opposite[next_corner(c)])

    def get_left_corner(self, c: int) -> int:
        return int(self.opposite[prev_corner(c)])

    def left_most_corner(self, v: int) -> int:
        return self.left_most[v]

    def is_on_boundary(self, v: int) -> bool:
        return self.swing_left(self.left_most[v]) == NONE

    def vertex_corners(self, v: int):
        """All corners on vertex v, starting at the left-most corner and
        swinging right."""
        start = self.left_most[v]
        out = []
        c = start
        while c != NONE:
            out.append(c)
            c = self.swing_right(c)
            if c == start:
                break
        return out


class ConnectivityDecodeResult:
    def __init__(self, ct: DecodedCornerTable, seed_corners: list[int],
                 att_seams: list[np.ndarray], num_att_data: int) -> None:
        self.corner_table = ct
        self.seed_corners = seed_corners  # attribute sequencer seed stack
        self.att_seams = att_seams        # per attribute: is_edge_on_seam[C]
        self.num_att_data = num_att_data


def decode_connectivity(reader: ByteReader) -> ConnectivityDecodeResult:
    traversal_kind = reader.read_u8()
    if traversal_kind != EB_STANDARD:
        raise DecodeError(f"unsupported edgebreaker kind {traversal_kind}")
    num_vertices = leb128_read(reader)
    num_faces = leb128_read(reader)
    num_att_data = reader.read_u8()
    num_symbols = leb128_read(reader)
    num_split_symbols = leb128_read(reader)

    # topology splits (spirale_reversi.rs:136-162)
    splits: list[list[int]] = []
    n_splits = leb128_read(reader)
    last = 0
    for _ in range(n_splits):
        source = leb128_read(reader) + last
        split = source - leb128_read(reader)
        splits.append([source, split, ORIENTATION_RIGHT])
        last = source
    if n_splits:
        br = BitReader(reader, msb_first=False)
        for s in splits:
            s[2] = br.read_bits(1)  # 0 = left, 1 = right

    # traversal buffers (symbol bits, start-face flags)
    sym_size = leb128_read(reader)
    sym_bytes = reader.read_bytes(sym_size)
    start_face_prob_zero = reader.read_u8()
    sf_size = leb128_read(reader)
    sf_bytes = reader.read_bytes(sf_size)

    # per-attribute seam streams
    seam_streams = []
    for _ in range(num_att_data):
        prob_zero = reader.read_u8()
        size = leb128_read(reader)
        blob = reader.read_bytes(size)
        seam_streams.append((prob_zero, blob))

    ct = DecodedCornerTable(num_faces)
    sym_reader = BitReader(ByteReader(sym_bytes), msb_first=False)

    active_stack: list[int] = []
    split_active_corners: dict[int, int] = {}
    invalid_vertices: list[int] = []
    max_num_vertices = num_vertices + num_split_symbols

    num_decoded_faces = 0
    for symbol_id in range(num_symbols):
        face = num_decoded_faces
        num_decoded_faces += 1
        corner = 3 * face
        symbol = crlight_decode(sym_reader)
        check_split = False
        if symbol == C:
            if not active_stack:
                raise DecodeError("C with empty active stack")
            corner_a = active_stack[-1]
            vertex_x = ct.vertex(next_corner(corner_a))
            corner_b = next_corner(ct.left_most_corner(vertex_x))
            if corner_a == corner_b:
                raise DecodeError("C matched corners equal")
            ct.set_opposite(corner_a, corner + 1)
            ct.set_opposite(corner_b, corner + 2)
            vert_a_prev = ct.vertex(prev_corner(corner_a))
            vert_b_next = ct.vertex(next_corner(corner_b))
            if vertex_x in (vert_a_prev, vert_b_next):
                raise DecodeError("degenerate C face")
            ct.corner_to_vertex[corner] = vertex_x
            ct.corner_to_vertex[corner + 1] = vert_b_next
            ct.corner_to_vertex[corner + 2] = vert_a_prev
            ct.left_most[vert_a_prev] = corner + 2
            active_stack[-1] = corner
        elif symbol in (R, L):
            if not active_stack:
                raise DecodeError("R/L with empty active stack")
            corner_a = active_stack[-1]
            if symbol == R:
                opp_corner, corner_l, corner_r = corner + 2, corner + 1, corner
            else:
                opp_corner, corner_l, corner_r = corner + 1, corner, corner + 2
            ct.set_opposite(opp_corner, corner_a)
            new_vert = ct.add_vertex()
            if ct.num_vertices > max_num_vertices:
                raise DecodeError("too many decoded vertices")
            ct.corner_to_vertex[opp_corner] = new_vert
            ct.left_most[new_vert] = opp_corner
            vertex_r = ct.vertex(prev_corner(corner_a))
            ct.corner_to_vertex[corner_r] = vertex_r
            ct.left_most[vertex_r] = corner_r
            ct.corner_to_vertex[corner_l] = ct.vertex(next_corner(corner_a))
            active_stack[-1] = corner
            check_split = True
        elif symbol == S:
            if not active_stack:
                raise DecodeError("S with empty active stack")
            corner_b = active_stack.pop()
            stored = split_active_corners.pop(symbol_id, None)
            if stored is not None:
                active_stack.append(stored)
            if not active_stack:
                raise DecodeError("S with no second active corner")
            corner_a = active_stack[-1]
            if corner_a == corner_b:
                raise DecodeError("S matched corners equal")
            ct.set_opposite(corner_a, corner + 2)
            ct.set_opposite(corner_b, corner + 1)
            vertex_p = ct.vertex(prev_corner(corner_a))
            ct.corner_to_vertex[corner] = vertex_p
            ct.corner_to_vertex[corner + 1] = ct.vertex(next_corner(corner_a))
            vert_b_prev = ct.vertex(prev_corner(corner_b))
            ct.corner_to_vertex[corner + 2] = vert_b_prev
            ct.left_most[vert_b_prev] = corner + 2
            corner_n = next_corner(corner_b)
            vertex_n = ct.vertex(corner_n)
            ct.left_most[vertex_p] = ct.left_most_corner(vertex_n)
            # remap all corners on vertex_n (CCW swing-left walk)
            first_c = corner_n
            while corner_n != NONE:
                ct.corner_to_vertex[corner_n] = vertex_p
                corner_n = ct.swing_left(corner_n)
                if corner_n == first_c:
                    raise DecodeError("S vertex walk looped")
            ct.left_most[vertex_n] = NONE  # isolated
            invalid_vertices.append(vertex_n)
            active_stack[-1] = corner
        elif symbol == E:
            v0 = ct.add_vertex()
            v1 = ct.add_vertex()
            v2 = ct.add_vertex()
            if ct.num_vertices > max_num_vertices:
                raise DecodeError("too many decoded vertices")
            ct.corner_to_vertex[corner] = v0
            ct.corner_to_vertex[corner + 1] = v1
            ct.corner_to_vertex[corner + 2] = v2
            ct.left_most[v0] = corner
            ct.left_most[v1] = corner + 1
            ct.left_most[v2] = corner + 2
            active_stack.append(corner)
            check_split = True
        else:
            raise DecodeError(f"invalid symbol {symbol}")

        if check_split:
            encoder_symbol_id = num_symbols - symbol_id - 1
            while splits and splits[-1][0] == encoder_symbol_id:
                _, enc_split_id, orientation = splits.pop()
                act_top = active_stack[-1]
                if orientation == ORIENTATION_RIGHT:
                    new_active = next_corner(act_top)
                else:
                    new_active = prev_corner(act_top)
                dec_split_id = num_symbols - enc_split_id - 1
                split_active_corners[dec_split_id] = new_active

    # start faces (interior flags drained in component-encode order)
    sf_rabs = RabsDecoder(ByteReader(sf_bytes), len(sf_bytes),
                          start_face_prob_zero) if sf_bytes else None
    init_corners: list[int] = []  # interior components only (encoder parity)
    while active_stack:
        corner = active_stack.pop()
        interior = sf_rabs.read() if sf_rabs else 0
        if interior:
            if num_decoded_faces >= num_faces:
                raise DecodeError("too many faces")
            corner_a = corner
            vert_n = ct.vertex(next_corner(corner_a))
            corner_b = next_corner(ct.left_most_corner(vert_n))
            vert_x = ct.vertex(next_corner(corner_b))
            corner_c = next_corner(ct.left_most_corner(vert_x))
            if corner in (corner_b, corner_c) or corner_b == corner_c:
                raise DecodeError("start face corners not distinct")
            vert_p = ct.vertex(next_corner(corner_c))
            face = num_decoded_faces
            num_decoded_faces += 1
            new_corner = 3 * face
            ct.set_opposite(new_corner, corner)
            ct.set_opposite(new_corner + 1, corner_b)
            ct.set_opposite(new_corner + 2, corner_c)
            ct.corner_to_vertex[new_corner] = vert_x
            ct.corner_to_vertex[new_corner + 1] = vert_p
            ct.corner_to_vertex[new_corner + 2] = vert_n
            init_corners.append(new_corner)

    if num_decoded_faces != num_faces:
        raise DecodeError(
            f"decoded {num_decoded_faces} faces, expected {num_faces}")

    _remove_invalid_vertices(ct, invalid_vertices)

    # attribute sequencer seed: mirrors the encoder's
    # rev(init_face_corners) ++ processed_corners (edgebreaker.rs:516-524).
    # Encoder processed corner at step i corresponds to decoder face
    # (num_symbols - 1 - i)'s first corner.
    processed = [3 * (num_symbols - 1 - i) for i in range(num_symbols)]
    seed = list(reversed(init_corners)) + processed

    att_seams = _decode_att_seams(ct, num_symbols, seam_streams)
    return ConnectivityDecodeResult(ct, seed, att_seams, num_att_data)


def _remove_invalid_vertices(ct: DecodedCornerTable,
                             invalid_vertices: list[int]) -> None:
    """Compact isolated vertices by swapping with the last valid vertex
    (spirale_reversi.rs:590-625 / draco)."""
    num_vertices = ct.num_vertices
    for invalid in invalid_vertices:
        src = num_vertices - 1
        while ct.left_most[src] == NONE:
            num_vertices -= 1
            src = num_vertices - 1
        if src < invalid:
            continue
        for c in ct.vertex_corners(src):
            if ct.vertex(c) != src:
                raise DecodeError("corrupted vertex mapping")
            ct.corner_to_vertex[c] = invalid
        ct.left_most[invalid] = ct.left_most[src]
        ct.left_most[src] = NONE
        num_vertices -= 1
    ct.num_vertices = num_vertices
    ct.left_most = ct.left_most[:num_vertices]


def _decode_att_seams(ct: DecodedCornerTable, num_symbols: int,
                      seam_streams) -> list[np.ndarray]:
    """Replay symbol faces in decode order, reading one seam bit per
    attribute for every interior edge seen first from this side (mirrors
    the encoder's seam collection, edgebreaker.rs:610-653). Boundary edges
    are implicit seams."""
    out = []
    for _ in seam_streams:
        seam = np.zeros(ct.num_corners, dtype=bool)
        seam[np.asarray(ct.opposite) == NONE] = True
        out.append(seam)
    if not seam_streams:
        return out
    # first pass: collect the edge replay order, then bulk-decode each
    # attribute's RAbS stream (native fast path) and scatter the marks
    visited = np.zeros(ct.num_faces(), dtype=bool)
    edges: list[tuple[int, int]] = []
    for f in range(num_symbols):
        c = 3 * f
        visited[f] = True
        for ci in (c, c + 1, c + 2):
            opp = ct.opp(ci)
            if opp == NONE or visited[opp // 3]:
                continue
            edges.append((ci, opp))
    if edges:
        earr = np.asarray(edges, dtype=np.int64)
        for j, (prob, blob) in enumerate(seam_streams):
            dec = RabsDecoder(ByteReader(blob), len(blob), prob)
            bits = dec.read_all(len(edges)).astype(bool)
            out[j][earr[bits, 0]] = True
            out[j][earr[bits, 1]] = True
    return out
