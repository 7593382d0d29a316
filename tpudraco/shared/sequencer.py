"""Depth-first attribute traversal sequencer: replays the edgebreaker decode
order to produce the vertex-visit sequence consumed by the attribute
prediction pipeline (both encoder and decoder).

Reference behavior: draco-oxide/src/shared/attribute/sequence.rs. The
reference prunes handle entries with an O(stack) scan per face
(sequence.rs:98-131); we keep identical semantics with O(1) amortized lazy
deletion (entries are tagged and tombstoned per face).
"""

from __future__ import annotations

from ..models.corner_table import NONE, TableView


def compute_sequence(view: TableView, init_stack: list[int]) -> list[int]:
    """Returns the corner-visit sequence (one corner per newly visited
    vertex), seeded with the edgebreaker's component corners
    (sequence.rs:48-152). ``init_stack`` is consumed (popped from the end)."""
    if hasattr(view, "as_arrays"):
        from ..native import topo
        arrays = view.as_arrays()
        out = topo.sequence(arrays[0], arrays[1], arrays[2], init_stack)
        if out is not None:
            return out.tolist()
    visited_vertices = [False] * view.num_vertices
    visited_faces = [False] * view.num_faces()
    out: list[int] = []

    # stack entries are (corner, serial); prune marks serials dead
    stack: list[tuple[int, int]] = [(c, i) for i, c in enumerate(init_stack)]
    serial = len(init_stack)
    dead: set[int] = set()
    face_entries: dict[int, list[int]] = {}
    for c, s in stack:
        face_entries.setdefault(c // 3, []).append(s)

    def push(c: int) -> None:
        nonlocal serial
        stack.append((c, serial))
        face_entries.setdefault(c // 3, []).append(serial)
        serial += 1

    def prune(face_idx: int) -> None:
        ids = face_entries.get(face_idx)
        if ids:
            dead.update(ids)
            ids.clear()

    def visit(v: int, c: int) -> None:
        if not visited_vertices[v]:
            out.append(c)
        visited_vertices[v] = True

    while stack:
        curr, sid = stack.pop()
        if sid in dead:
            dead.discard(sid)
            continue
        # keep face_entries consistent: this entry is consumed
        ids = face_entries.get(curr // 3)
        if ids and sid in ids:
            ids.remove(sid)
        if visited_faces[curr // 3]:
            continue
        v = view.vertex(curr)
        next_c = curr - 2 if curr % 3 == 2 else curr + 1
        prev_c = curr + 2 if curr % 3 == 0 else curr - 1
        next_v = view.vertex(next_c)
        prev_v = view.vertex(prev_c)
        if not visited_vertices[next_v] or not visited_vertices[prev_v]:
            # draco order: next corner first, then previous, then current
            visit(next_v, next_c)
            visit(prev_v, prev_c)
            push(curr)
            continue

        face_idx = curr // 3
        visited_faces[face_idx] = True

        if not visited_vertices[v]:
            visit(v, curr)
            if not view.is_on_boundary(v):
                push(view.get_right_corner(curr))
                continue

        visit(v, curr)

        right_c = view.get_right_corner(curr)
        left_c = view.get_left_corner(curr)
        right_visited = right_c != NONE and visited_faces[right_c // 3]
        left_visited = left_c != NONE and visited_faces[left_c // 3]

        if right_visited:
            prune(face_idx)
            if not left_visited and left_c != NONE:
                push(left_c)
        else:
            if left_visited:
                prune(face_idx)
                if right_c != NONE:
                    push(right_c)
            else:
                if left_c != NONE:
                    push(left_c)
                if right_c != NONE:
                    push(right_c)
    return out
