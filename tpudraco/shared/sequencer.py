"""Depth-first attribute traversal sequencer: replays the edgebreaker decode
order to produce the vertex-visit sequence consumed by the attribute
prediction pipeline (both encoder and decoder).

Reference behavior: draco-oxide/src/shared/attribute/sequence.rs.
"""

from __future__ import annotations

from ..models.corner_table import NONE, TableView


def compute_sequence(view: TableView, init_stack: list[int]) -> list[int]:
    """Returns the corner-visit sequence (one corner per newly visited
    vertex), seeded with the edgebreaker's component corners
    (sequence.rs:48-152). ``init_stack`` is consumed (popped from the end)."""
    visited_vertices = [False] * view.num_vertices
    visited_faces = [False] * view.num_faces()
    stack = list(init_stack)
    out: list[int] = []

    def visit(v: int, c: int) -> None:
        if not visited_vertices[v]:
            out.append(c)
        visited_vertices[v] = True

    while stack:
        curr = stack.pop()
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
            stack.append(curr)
            continue

        face_idx = curr // 3
        visited_faces[face_idx] = True

        if not visited_vertices[v]:
            visit(v, curr)
            if not view.is_on_boundary(v):
                stack.append(view.get_right_corner(curr))
                continue

        visit(v, curr)

        right_c = view.get_right_corner(curr)
        left_c = view.get_left_corner(curr)
        right_visited = right_c != NONE and visited_faces[right_c // 3]
        left_visited = left_c != NONE and visited_faces[left_c // 3]

        def prune_handles() -> None:
            # remove stale stack entries pointing into this face
            # (sequence.rs:98-131 handle-aware pruning)
            for i in range(len(stack) - 1, -1, -1):
                if stack[i] // 3 == face_idx:
                    del stack[i]

        if right_visited:
            if left_visited:
                prune_handles()
            else:
                prune_handles()
                if left_c != NONE:
                    stack.append(left_c)
        else:
            if left_visited:
                prune_handles()
                if right_c != NONE:
                    stack.append(right_c)
            else:
                if left_c != NONE:
                    stack.append(left_c)
                if right_c != NONE:
                    stack.append(right_c)
    return out
