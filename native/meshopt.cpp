// Mesh optimization native library (re-provides the role of
// deps/meshoptimizer + core/mesh.c for this engine: vertex dedup/remap,
// vertex-cache-aware reordering, and LOD index simplification —
// mesh_optimize mesh.c:270-341 and mesh_idx_to_lod mesh.c:379-428).
//
// Original implementation (not a port of meshoptimizer): dedup via a
// quantized-position hash map; cache ordering via a greedy
// Forsyth-style score; LOD via quadric error metric edge collapse with
// a vertex-clustering "sloppy" fallback. Exposed through a C ABI for
// ctypes (no pybind11 in this image).
//
// Build: make -C native   (→ libmeshopt.so)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <unordered_map>
#include <queue>
#include <algorithm>
#include <functional>

extern "C" {

// --- vertex dedup ----------------------------------------------------------
// Returns number of unique vertices; remap_out[v_old] = v_new.
int moq_dedup(const float* verts, int n_verts, int stride_floats,
              unsigned* remap_out) {
    struct KeyHash {
        size_t operator()(const std::vector<int32_t>& k) const {
            size_t h = 1469598103934665603ull;
            for (int32_t v : k) {
                h ^= (uint32_t)v;
                h *= 1099511628211ull;
            }
            return h;
        }
    };
    std::unordered_map<std::vector<int32_t>, unsigned, KeyHash> seen;
    seen.reserve(n_verts * 2);
    unsigned next = 0;
    std::vector<int32_t> key(stride_floats);
    for (int i = 0; i < n_verts; i++) {
        for (int c = 0; c < stride_floats; c++) {
            float f = verts[i * stride_floats + c];
            key[c] = (int32_t)lrintf(f * 1e5f);  // quantized exact-ish match
        }
        auto it = seen.find(key);
        if (it == seen.end()) {
            seen.emplace(key, next);
            remap_out[i] = next++;
        } else {
            remap_out[i] = it->second;
        }
    }
    return (int)next;
}

// --- vertex cache optimization ---------------------------------------------
// Greedy Forsyth-style: score vertices by cache position + remaining
// valence, emit the best-scoring triangle next. In-place on idx.
void moq_cache_optimize(unsigned* idx, int n_idx, int n_verts) {
    const int CACHE = 32;
    int n_tris = n_idx / 3;
    if (n_tris == 0) return;

    std::vector<std::vector<int>> vtx_tris(n_verts);
    for (int t = 0; t < n_tris; t++)
        for (int k = 0; k < 3; k++)
            vtx_tris[idx[t * 3 + k]].push_back(t);

    std::vector<int> cache_pos(n_verts, -1);
    std::vector<int> remaining(n_verts);
    for (int v = 0; v < n_verts; v++) remaining[v] = (int)vtx_tris[v].size();
    std::vector<char> emitted(n_tris, 0);
    std::vector<unsigned> out;
    out.reserve(n_idx);
    std::vector<int> cache;  // most recent first

    auto vscore = [&](unsigned v) -> float {
        float s = 0.f;
        int cp = cache_pos[v];
        if (cp >= 0) {
            if (cp < 3) s += 0.75f;
            else s += powf(1.0f - (float)(cp - 3) / (CACHE - 3), 1.5f);
        }
        if (remaining[v] > 0) s += 2.0f / sqrtf((float)remaining[v]);
        return s;
    };

    auto tscore = [&](int t) {
        return vscore(idx[t * 3]) + vscore(idx[t * 3 + 1]) + vscore(idx[t * 3 + 2]);
    };

    int emitted_cnt = 0;
    int scan = 0;  // fallback scan cursor for the next unemitted tri
    while (emitted_cnt < n_tris) {
        // candidates: triangles sharing a vertex with the cache
        int best = -1;
        float best_s = -1.f;
        for (int v : cache) {
            for (int t : vtx_tris[v]) {
                if (emitted[t]) continue;
                float s = tscore(t);
                if (s > best_s) { best_s = s; best = t; }
            }
        }
        if (best < 0) {
            while (scan < n_tris && emitted[scan]) scan++;
            best = scan;
        }
        emitted[best] = 1;
        emitted_cnt++;
        for (int k = 0; k < 3; k++) {
            unsigned v = idx[best * 3 + k];
            out.push_back(v);
            remaining[v]--;
            // move to cache front
            auto it = std::find(cache.begin(), cache.end(), (int)v);
            if (it != cache.end()) cache.erase(it);
            cache.insert(cache.begin(), (int)v);
        }
        if ((int)cache.size() > CACHE) cache.resize(CACHE);
        for (int p = 0; p < (int)cache.size(); p++) cache_pos[cache[p]] = p;
    }
    memcpy(idx, out.data(), n_idx * sizeof(unsigned));
}

// --- quadric error simplification ------------------------------------------
struct Quadric { double m[10] = {0}; };  // symmetric 4x4: a2 ab ac ad b2 bc bd c2 cd d2

static void quad_add_plane(Quadric& q, double a, double b, double c, double d) {
    q.m[0] += a * a; q.m[1] += a * b; q.m[2] += a * c; q.m[3] += a * d;
    q.m[4] += b * b; q.m[5] += b * c; q.m[6] += b * d;
    q.m[7] += c * c; q.m[8] += c * d; q.m[9] += d * d;
}

static double quad_eval(const Quadric& q, const double p[3]) {
    double x = p[0], y = p[1], z = p[2];
    return q.m[0]*x*x + 2*q.m[1]*x*y + 2*q.m[2]*x*z + 2*q.m[3]*x
         + q.m[4]*y*y + 2*q.m[5]*y*z + 2*q.m[6]*y
         + q.m[7]*z*z + 2*q.m[8]*z + q.m[9];
}

static void quad_merge(Quadric& a, const Quadric& b) {
    for (int i = 0; i < 10; i++) a.m[i] += b.m[i];
}

// Simplify to <= target_idx indices. Returns new index count.
int moq_simplify(const float* pos, int n_verts, const unsigned* idx,
                 int n_idx, int target_idx, unsigned* out_idx) {
    int n_tris = n_idx / 3;
    std::vector<Quadric> Q(n_verts);
    // vertex quadrics from face planes
    for (int t = 0; t < n_tris; t++) {
        const float* p0 = pos + idx[t*3+0]*3;
        const float* p1 = pos + idx[t*3+1]*3;
        const float* p2 = pos + idx[t*3+2]*3;
        double e1[3] = {p1[0]-p0[0], p1[1]-p0[1], p1[2]-p0[2]};
        double e2[3] = {p2[0]-p0[0], p2[1]-p0[1], p2[2]-p0[2]};
        double n[3] = {e1[1]*e2[2]-e1[2]*e2[1], e1[2]*e2[0]-e1[0]*e2[2],
                       e1[0]*e2[1]-e1[1]*e2[0]};
        double len = sqrt(n[0]*n[0]+n[1]*n[1]+n[2]*n[2]);
        if (len < 1e-12) continue;
        n[0]/=len; n[1]/=len; n[2]/=len;
        double d = -(n[0]*p0[0]+n[1]*p0[1]+n[2]*p0[2]);
        for (int k = 0; k < 3; k++)
            quad_add_plane(Q[idx[t*3+k]], n[0], n[1], n[2], d);
    }

    std::vector<int> parent(n_verts);
    for (int v = 0; v < n_verts; v++) parent[v] = v;
    std::function<int(int)> find = [&](int v) {
        while (parent[v] != v) { parent[v] = parent[parent[v]]; v = parent[v]; }
        return v;
    };

    // candidate edges
    struct Edge { float err; int a, b; };
    auto cmp = [](const Edge& x, const Edge& y) { return x.err > y.err; };
    std::priority_queue<Edge, std::vector<Edge>, decltype(cmp)> heap(cmp);
    auto push_edge = [&](int a, int b) {
        double mid[3] = {(pos[a*3]+pos[b*3])*0.5, (pos[a*3+1]+pos[b*3+1])*0.5,
                         (pos[a*3+2]+pos[b*3+2])*0.5};
        Quadric q = Q[a]; quad_merge(q, Q[b]);
        heap.push({(float)quad_eval(q, mid), a, b});
    };
    for (int t = 0; t < n_tris; t++)
        for (int k = 0; k < 3; k++)
            push_edge(idx[t*3+k], idx[t*3+(k+1)%3]);

    int cur_tris = n_tris;
    int target_tris = target_idx / 3;
    std::vector<unsigned> work(idx, idx + n_idx);
    while (cur_tris > target_tris && !heap.empty()) {
        Edge e = heap.top(); heap.pop();
        int a = find(e.a), b = find(e.b);
        if (a == b) continue;
        parent[b] = a;
        quad_merge(Q[a], Q[b]);
        // recount collapsed tris
        cur_tris = 0;
        for (int t = 0; t < n_tris; t++) {
            int v0 = find(work[t*3]), v1 = find(work[t*3+1]), v2 = find(work[t*3+2]);
            if (v0 != v1 && v1 != v2 && v0 != v2) cur_tris++;
        }
    }
    int o = 0;
    for (int t = 0; t < n_tris; t++) {
        int v0 = find(work[t*3]), v1 = find(work[t*3+1]), v2 = find(work[t*3+2]);
        if (v0 != v1 && v1 != v2 && v0 != v2) {
            out_idx[o++] = v0; out_idx[o++] = v1; out_idx[o++] = v2;
        }
    }
    return o;
}

// Vertex clustering fallback ("sloppy", mesh.c:404-414): snap vertices
// to a grid of cell size `cell`, drop degenerates.
int moq_simplify_sloppy(const float* pos, int n_verts, const unsigned* idx,
                        int n_idx, float cell, unsigned* out_idx) {
    std::unordered_map<uint64_t, unsigned> cells;
    std::vector<unsigned> cluster(n_verts);
    for (int v = 0; v < n_verts; v++) {
        int64_t cx = (int64_t)floorf(pos[v*3] / cell);
        int64_t cy = (int64_t)floorf(pos[v*3+1] / cell);
        int64_t cz = (int64_t)floorf(pos[v*3+2] / cell);
        uint64_t key = ((uint64_t)(cx & 0x1FFFFF) << 42)
                     | ((uint64_t)(cy & 0x1FFFFF) << 21)
                     | (uint64_t)(cz & 0x1FFFFF);
        auto it = cells.find(key);
        if (it == cells.end()) { cells.emplace(key, v); cluster[v] = v; }
        else cluster[v] = it->second;
    }
    int o = 0;
    for (int t = 0; t < n_idx / 3; t++) {
        unsigned v0 = cluster[idx[t*3]], v1 = cluster[idx[t*3+1]],
                 v2 = cluster[idx[t*3+2]];
        if (v0 != v1 && v1 != v2 && v0 != v2) {
            out_idx[o++] = v0; out_idx[o++] = v1; out_idx[o++] = v2;
        }
    }
    return o;
}

}  // extern "C"
