// Native topology passes — bit-exact with the Python reference
// implementations in tpudraco/models/corner_table.py,
// tpudraco/shared/sequencer.py, tpudraco/encode/connectivity.py and
// tpudraco/ops/gathers.py (which mirror draco-oxide; see those files for
// reference citations). Every function has a Python fallback.

#include <cstdint>
#include <cstring>
#include <unordered_map>
#include <unordered_set>
#include <vector>

namespace {
constexpr int64_t NONE = -1;

inline int64_t next_c(int64_t c) { return c % 3 == 2 ? c - 2 : c + 1; }
inline int64_t prev_c(int64_t c) { return c % 3 == 0 ? c + 2 : c - 1; }

struct Nav {
    const int64_t* opp;
    inline int64_t swing_left(int64_t c) const {
        int64_t o = opp[next_c(c)];
        return o != NONE ? next_c(o) : NONE;
    }
    inline int64_t swing_right(int64_t c) const {
        int64_t o = opp[prev_c(c)];
        return o != NONE ? prev_c(o) : NONE;
    }
};
}  // namespace

extern "C" {

// Half-edge matching (corner_table.py _compute_table). opposite must be
// pre-filled with NONE.
void tpud_compute_table(const int64_t* ctv, int64_t C, int64_t V,
                        int64_t* opposite) {
    std::vector<int64_t> counts(V, 0);
    for (int64_t c = 0; c < C; ++c) counts[ctv[c]]++;
    std::vector<int64_t> offsets(V, 0);
    int64_t acc = 0;
    for (int64_t v = 0; v < V; ++v) { offsets[v] = acc; acc += counts[v]; }

    std::vector<int64_t> edge_sink(C, NONE), edge_corner(C, NONE);
    for (int64_t c = 0; c < C; ++c) {
        const int64_t tip_v = ctv[c];
        const int64_t source_v = ctv[next_c(c)];
        const int64_t sink_v = ctv[prev_c(c)];
        if (c % 3 == 0 && (tip_v == source_v || tip_v == sink_v ||
                           source_v == sink_v))
            continue;
        int64_t opposite_c = NONE;
        const int64_t n_on_sink = counts[sink_v];
        int64_t off = offsets[sink_v];
        for (int64_t i = 0; i < n_on_sink; ++i) {
            const int64_t other_v = edge_sink[off];
            if (other_v == NONE) break;
            if (other_v == source_v) {
                if (tip_v == ctv[edge_corner[off]]) break;  // quirk
                opposite_c = edge_corner[off];
                const int64_t base = offsets[sink_v];
                for (int64_t k = 1; k < n_on_sink - (off - base); ++k) {
                    edge_sink[off] = edge_sink[off + 1];
                    edge_corner[off] = edge_corner[off + 1];
                    if (edge_sink[off] == NONE) break;
                    ++off;
                }
                edge_sink[off] = NONE;
                break;
            }
            ++off;
        }
        if (opposite_c == NONE) {
            const int64_t first = offsets[source_v];
            for (int64_t slot = first; slot < first + counts[source_v]; ++slot) {
                if (edge_sink[slot] == NONE) {
                    edge_sink[slot] = sink_v;
                    edge_corner[slot] = c;
                    break;
                }
            }
        } else {
            opposite[c] = opposite_c;
            opposite[opposite_c] = c;
        }
    }
}

// Returns 1 when an edge is shared by more than 2 faces.
int32_t tpud_has_non_manifold_edges(const int64_t* ctv, int64_t C) {
    std::unordered_map<uint64_t, int> counts;
    counts.reserve(C);
    for (int64_t f = 0; f < C / 3; ++f) {
        for (int k = 0; k < 3; ++k) {
            int64_t a = ctv[3 * f + k], b = ctv[3 * f + (k + 1) % 3];
            if (a > b) std::swap(a, b);
            uint64_t key = ((uint64_t)a << 32) | (uint64_t)b;
            if (++counts[key] > 2) return 1;
        }
    }
    return 0;
}

// Break connectivity at non-manifold edges (corner_table.py
// _handle_non_manifold_edges).
void tpud_break_non_manifold_edges(int64_t* opposite, const int64_t* ctv,
                                   int64_t C) {
    Nav nav{opposite};
    std::vector<uint8_t> visited(C, 0);
    std::vector<int64_t> sink_v_list, sink_c_list;
    for (;;) {
        bool connectivity_updated = false;
        for (int64_t c = 0; c < C; ++c) {
            if (visited[c]) continue;
            sink_v_list.clear();
            sink_c_list.clear();
            int64_t first_c = c, curr_c = c;
            int64_t nxt = nav.swing_left(curr_c);
            while (nxt != NONE && nxt != first_c && !visited[nxt]) {
                curr_c = nxt;
                nxt = nav.swing_left(curr_c);
            }
            first_c = curr_c;
            for (;;) {
                visited[curr_c] = 1;
                const int64_t sink_c = next_c(curr_c);
                const int64_t sink_v = ctv[sink_c];
                const int64_t edge_c = prev_c(curr_c);
                bool updated = false;
                for (size_t i = 0; i < sink_v_list.size(); ++i) {
                    if (sink_v_list[i] != sink_v) continue;
                    const int64_t other_edge_c = sink_c_list[i];
                    const int64_t opp_edge_c = opposite[edge_c];
                    if (opp_edge_c != NONE && opp_edge_c == other_edge_c)
                        continue;
                    const int64_t opp_other = opposite[other_edge_c];
                    if (opp_edge_c != NONE) opposite[opp_edge_c] = NONE;
                    if (opp_other != NONE) opposite[opp_other] = NONE;
                    opposite[edge_c] = NONE;
                    opposite[other_edge_c] = NONE;
                    updated = true;
                    break;
                }
                if (updated) { connectivity_updated = true; break; }
                sink_v_list.push_back(ctv[prev_c(curr_c)]);
                sink_c_list.push_back(sink_c);
                curr_c = nav.swing_right(curr_c);
                if (curr_c == NONE || curr_c == first_c) break;
            }
        }
        if (!connectivity_updated) break;
    }
}

// Left-most corners + non-manifold vertex duplication (corner_table.py
// _compute_left_most_corners). ctv is mutated for split vertices;
// left_most must have capacity V + C; parents capacity C.
// Returns the new vertex count.
int64_t tpud_left_most(int64_t* ctv, const int64_t* opposite, int64_t C,
                       int64_t V, int64_t* left_most, int64_t* parents,
                       int64_t* num_parents) {
    Nav nav{opposite};
    std::vector<uint8_t> visited_vertices(V + C, 0);
    std::vector<uint8_t> visited_corners(C, 0);
    int64_t num_vertices = V;
    int64_t n_par = 0;
    for (int64_t i = 0; i < V; ++i) left_most[i] = NONE;
    for (int64_t c = 0; c < C; ++c) {
        if (visited_corners[c]) continue;
        int64_t v = ctv[c];
        bool is_nm = false;
        if (visited_vertices[v]) {
            left_most[num_vertices] = NONE;
            parents[n_par++] = v;
            v = num_vertices++;
            is_nm = true;
        }
        visited_vertices[v] = 1;
        visited_corners[c] = 1;
        left_most[v] = c;
        if (is_nm) ctv[c] = v;
        int64_t act = nav.swing_left(c);
        bool hit_start = false;
        while (act != NONE) {
            if (act == c) { hit_start = true; break; }
            visited_corners[act] = 1;
            left_most[v] = act;
            if (is_nm) ctv[act] = v;
            act = nav.swing_left(act);
        }
        if (!hit_start) {
            act = c;
            while (act != NONE) {
                visited_corners[act] = 1;
                if (is_nm) ctv[act] = v;
                act = nav.swing_right(act);
            }
        }
    }
    *num_parents = n_par;
    return num_vertices;
}

// Attribute traversal sequencer (shared/sequencer.py compute_sequence).
// opposite is the *effective* opposite (seam-masked for attribute tables).
// Returns the sequence length written to out_corners (capacity num_vertices).
int64_t tpud_sequence(const int64_t* opposite, const int64_t* ctv,
                      const int64_t* left_most, int64_t C, int64_t V,
                      const int64_t* init_stack, int64_t init_len,
                      int64_t* out_corners) {
    Nav nav{opposite};
    std::vector<uint8_t> visited_vertices(V, 0);
    std::vector<uint8_t> visited_faces(C / 3, 0);
    int64_t out_n = 0;

    struct Entry { int64_t corner; int64_t serial; };
    std::vector<Entry> stack;
    stack.reserve(init_len + 64);
    std::unordered_set<int64_t> dead;
    std::unordered_map<int64_t, std::vector<int64_t>> face_entries;
    int64_t serial = 0;
    for (int64_t i = 0; i < init_len; ++i) {
        stack.push_back({init_stack[i], serial});
        face_entries[init_stack[i] / 3].push_back(serial);
        ++serial;
    }
    auto push = [&](int64_t c) {
        stack.push_back({c, serial});
        face_entries[c / 3].push_back(serial);
        ++serial;
    };
    auto prune = [&](int64_t face_idx) {
        auto it = face_entries.find(face_idx);
        if (it != face_entries.end()) {
            for (int64_t s : it->second) dead.insert(s);
            it->second.clear();
        }
    };
    auto visit = [&](int64_t v, int64_t c) {
        if (!visited_vertices[v]) out_corners[out_n++] = c;
        visited_vertices[v] = 1;
    };

    while (!stack.empty()) {
        Entry e = stack.back();
        stack.pop_back();
        if (dead.erase(e.serial)) continue;
        auto it = face_entries.find(e.corner / 3);
        if (it != face_entries.end()) {
            auto& ids = it->second;
            for (size_t i = 0; i < ids.size(); ++i) {
                if (ids[i] == e.serial) { ids.erase(ids.begin() + i); break; }
            }
        }
        const int64_t curr = e.corner;
        if (visited_faces[curr / 3]) continue;
        const int64_t v = ctv[curr];
        const int64_t nc = next_c(curr), pc = prev_c(curr);
        const int64_t nv = ctv[nc], pv = ctv[pc];
        if (!visited_vertices[nv] || !visited_vertices[pv]) {
            visit(nv, nc);
            visit(pv, pc);
            push(curr);
            continue;
        }
        const int64_t face_idx = curr / 3;
        visited_faces[face_idx] = 1;
        if (!visited_vertices[v]) {
            visit(v, curr);
            // is_on_boundary(v): seam-aware swing-left from left-most
            const int64_t lm = left_most[v];
            if (nav.swing_left(lm) != NONE) {
                push(opposite[next_c(curr)]);  // get_right_corner
                continue;
            }
        }
        visit(v, curr);
        const int64_t right_cn = opposite[next_c(curr)];
        const int64_t left_cn = opposite[prev_c(curr)];
        const bool right_vis = right_cn != NONE && visited_faces[right_cn / 3];
        const bool left_vis = left_cn != NONE && visited_faces[left_cn / 3];
        if (right_vis) {
            prune(face_idx);
            if (!left_vis && left_cn != NONE) push(left_cn);
        } else if (left_vis) {
            prune(face_idx);
            if (right_cn != NONE) push(right_cn);
        } else {
            if (left_cn != NONE) push(left_cn);
            if (right_cn != NONE) push(right_cn);
        }
    }
    return out_n;
}

// Parallelogram prediction gathers (ops/gathers.py). val_of_corner maps a
// corner to its attribute-value index.
void tpud_parallelogram_gathers(
        const int64_t* opposite, const int64_t* ctv, const int64_t* left_most,
        const int64_t* val_of_corner, const int64_t* seq, int64_t T,
        int64_t V, int32_t* order, int32_t* g_next, int32_t* g_prev,
        int32_t* g_opp, int32_t* g_fb, uint8_t* can_para, uint8_t* has_fb) {
    std::vector<uint8_t> visited(V, 0);
    int64_t last_v = -1;
    for (int64_t k = 0; k < T; ++k) {
        const int64_t c = seq[k];
        order[k] = (int32_t)val_of_corner[c];
        g_next[k] = g_prev[k] = g_opp[k] = g_fb[k] = 0;
        can_para[k] = 0;
        has_fb[k] = 0;
        const int64_t opp = opposite[c];
        if (opp != NONE) {
            const int64_t nc = next_c(c), pc = prev_c(c);
            if (visited[ctv[opp]] && visited[ctv[nc]] && visited[ctv[pc]]) {
                can_para[k] = 1;
                g_next[k] = (int32_t)val_of_corner[nc];
                g_prev[k] = (int32_t)val_of_corner[pc];
                g_opp[k] = (int32_t)val_of_corner[opp];
            }
        }
        if (!can_para[k] && last_v >= 0) {
            has_fb[k] = 1;
            g_fb[k] = (int32_t)val_of_corner[left_most[last_v]];
        }
        const int64_t v = ctv[c];
        visited[v] = 1;
        last_v = v;
    }
}

// Sequential decode chain: parallelogram/delta prediction + difference or
// wrapped-difference inverse transform (decode/attribute.py). corr holds
// zigzagged residuals (T x N); values_by_vertex (V x N) is filled along the
// traversal. scheme: 0 = delta, 1 = parallelogram; xform: 0 = difference,
// 1 = wrapped difference.
int32_t tpud_decode_pred_transform(
        const int64_t* opposite, const int64_t* ctv, const int64_t* left_most,
        const int64_t* seq, int64_t T, const uint64_t* corr, int32_t N,
        int32_t scheme, int32_t xform, int64_t vmin, int64_t vmax,
        int64_t V, int64_t* values_by_vertex) {
    std::vector<uint8_t> visited(V, 0);
    int64_t last_v = -1;
    const int64_t max_diff = 1 + vmax - vmin;
    int64_t pred[8];
    for (int64_t k = 0; k < T; ++k) {
        const int64_t c = seq[k];
        bool have_pred = false;
        if (scheme == 1) {
            const int64_t opp = opposite[c];
            if (opp != NONE) {
                const int64_t nv = ctv[next_c(c)], pv = ctv[prev_c(c)];
                const int64_t ov = ctv[opp];
                if (visited[ov] && visited[nv] && visited[pv]) {
                    for (int32_t i = 0; i < N; ++i)
                        pred[i] = values_by_vertex[nv * N + i]
                                  + values_by_vertex[pv * N + i]
                                  - values_by_vertex[ov * N + i];
                    have_pred = true;
                }
            }
        }
        if (!have_pred) {
            if (last_v >= 0) {
                const int64_t fv = ctv[left_most[last_v]];
                for (int32_t i = 0; i < N; ++i)
                    pred[i] = values_by_vertex[fv * N + i];
            } else {
                for (int32_t i = 0; i < N; ++i) pred[i] = 0;
            }
        }
        const int64_t v = ctv[c];
        for (int32_t i = 0; i < N; ++i) {
            const uint64_t u = corr[k * N + i];
            const int64_t delta = (u & 1) ? -(int64_t)(u >> 1) - 1
                                          : (int64_t)(u >> 1);
            int64_t p = pred[i];
            if (xform == 1) {
                if (p < vmin) p = vmin;
                if (p > vmax) p = vmax;
                int64_t t = p + delta;
                if (t > vmax) t -= max_diff;
                else if (t < vmin) t += max_diff;
                values_by_vertex[v * N + i] = t;
            } else {
                values_by_vertex[v * N + i] = p + delta;
            }
        }
        visited[v] = 1;
        last_v = v;
    }
    return 0;
}

// Edgebreaker DFS (encode/connectivity.py EdgebreakerEncoder).
// Outputs (capacities): symbols[F], processed[F], interior_cfg[F],
// init_face_corners[F], splits 3*F (merge, split, orient triples),
// vertex_hole_id[V].  Returns 0 on success.
int32_t tpud_edgebreaker(const int64_t* opposite, const int64_t* ctv,
                         int64_t C, int64_t V,
                         uint8_t* symbols, int64_t* num_symbols,
                         int64_t* processed,
                         uint8_t* interior_cfg, int64_t* num_components,
                         int64_t* init_face_corners, int64_t* num_init,
                         int64_t* splits, int64_t* num_splits_out,
                         int64_t* num_split_symbols_out,
                         int64_t* vertex_hole_id) {
    Nav nav{opposite};
    const int64_t F = C / 3;
    std::vector<uint8_t> visited_vertices(V, 0);
    std::vector<uint8_t> visited_faces(F, 0);
    std::vector<uint8_t> visited_holes;
    for (int64_t v = 0; v < V; ++v) vertex_hole_id[v] = NONE;

    // compute boundaries
    for (int64_t c = 0; c < C; ++c) {
        if (opposite[c] != NONE) continue;
        int64_t v = ctv[next_c(c)];
        if (vertex_hole_id[v] != NONE) continue;
        const int64_t boundary_idx = (int64_t)visited_holes.size();
        visited_holes.push_back(0);
        int64_t cc = c;
        while (vertex_hole_id[v] == NONE) {
            vertex_hole_id[v] = boundary_idx;
            cc = next_c(cc);
            while (opposite[cc] != NONE) cc = next_c(opposite[cc]);
            v = ctv[next_c(cc)];
        }
    }

    auto process_boundary = [&](int64_t start_corner, bool encode_first) {
        int64_t corner = prev_c(start_corner);
        while (opposite[corner] != NONE) corner = next_c(opposite[corner]);
        const int64_t start_v = ctv[start_corner];
        if (encode_first) visited_vertices[start_v] = 1;
        visited_holes[vertex_hole_id[start_v]] = 1;
        int64_t curr_v = ctv[prev_c(corner)];
        while (curr_v != start_v) {
            visited_vertices[curr_v] = 1;
            corner = next_c(corner);
            while (opposite[corner] != NONE) corner = next_c(opposite[corner]);
            curr_v = ctv[prev_c(corner)];
        }
    };

    std::unordered_map<int64_t, int64_t> face_to_split;
    std::vector<int64_t> corner_stack;
    int64_t n_sym = 0, n_comp = 0, n_init = 0, n_splits = 0;
    int64_t n_split_symbols = 0;
    int64_t last_symbol_idx = -1;

    auto check_split = [&](int64_t merge_idx, int64_t orient, int64_t face) {
        auto it = face_to_split.find(face);
        if (it != face_to_split.end()) {
            splits[3 * n_splits] = merge_idx;
            splits[3 * n_splits + 1] = it->second;
            splits[3 * n_splits + 2] = orient;
            ++n_splits;
        }
    };

    // symbol ids: C=0 S=1 L=2 R=3 E=4 (shared/clers.py)
    auto edgebreaker_from = [&](int64_t c0) {
        corner_stack.clear();
        corner_stack.push_back(c0);
        while (!corner_stack.empty()) {
            int64_t c = corner_stack.back();
            if (visited_faces[c / 3]) { corner_stack.pop_back(); continue; }
            int64_t guard = 0;
            while (guard++ < F) {
                ++last_symbol_idx;
                const int64_t face_idx = c / 3;
                visited_faces[face_idx] = 1;
                processed[n_sym] = c;
                const int64_t v = ctv[c];
                if (!visited_vertices[v]) {
                    visited_vertices[v] = 1;
                    if (vertex_hole_id[v] == NONE) {
                        symbols[n_sym++] = 0;  // C
                        c = opposite[next_c(c)];  // get_right_corner
                        continue;
                    }
                }
                const int64_t right_c = opposite[next_c(c)];
                const int64_t left_c = opposite[prev_c(c)];
                const bool right_vis =
                    right_c == NONE || visited_faces[right_c / 3];
                const bool left_vis =
                    left_c == NONE || visited_faces[left_c / 3];
                if (right_vis) {
                    if (right_c != NONE)
                        check_split(last_symbol_idx, 1, right_c / 3);
                    if (left_vis) {
                        if (left_c != NONE)
                            check_split(last_symbol_idx, 0, left_c / 3);
                        symbols[n_sym++] = 4;  // E
                        corner_stack.pop_back();
                        break;
                    }
                    symbols[n_sym++] = 3;  // R
                    c = left_c;
                } else if (left_vis) {
                    if (left_c != NONE)
                        check_split(last_symbol_idx, 0, left_c / 3);
                    symbols[n_sym++] = 2;  // L
                    c = right_c;
                } else {
                    symbols[n_sym++] = 1;  // S
                    ++n_split_symbols;
                    const int64_t hole = vertex_hole_id[v];
                    if (hole != NONE && !visited_holes[hole])
                        process_boundary(c, false);
                    face_to_split[face_idx] = last_symbol_idx;
                    corner_stack.back() = left_c;
                    corner_stack.push_back(right_c);
                    break;
                }
            }
        }
    };

    for (int64_t c = 0; c < C; ++c) {
        const int64_t face_idx = c / 3;
        if (visited_faces[face_idx]) continue;
        // begin_from
        int64_t corner = 3 * face_idx;
        bool is_interior = true;
        int64_t start_corner = corner;
        for (int k = 0; k < 3; ++k) {
            if (opposite[corner] == NONE) {
                is_interior = false;
                start_corner = corner;
                break;
            }
            if (vertex_hole_id[ctv[corner]] != NONE) {
                int64_t right = corner;
                while (right != NONE) {
                    corner = right;
                    right = nav.swing_right(right);
                }
                is_interior = false;
                start_corner = prev_c(corner);
                break;
            }
            corner = next_c(corner);
        }
        if (is_interior) start_corner = corner;
        interior_cfg[n_comp++] = is_interior ? 1 : 0;
        if (is_interior) {
            visited_vertices[ctv[start_corner]] = 1;
            visited_vertices[ctv[next_c(start_corner)]] = 1;
            visited_vertices[ctv[prev_c(start_corner)]] = 1;
            visited_faces[face_idx] = 1;
            init_face_corners[n_init++] = next_c(start_corner);
            edgebreaker_from(opposite[next_c(start_corner)]);
        } else {
            process_boundary(next_c(start_corner), true);
            edgebreaker_from(start_corner);
        }
    }
    *num_symbols = n_sym;
    *num_components = n_comp;
    *num_init = n_init;
    *num_splits_out = n_splits;
    *num_split_symbols_out = n_split_symbols;
    return 0;
}

}  // extern "C"
