// Native asset pipeline: OBJ import + binned-SAH mesh BVH build.
//
// TPU-native equivalent of the reference's host-side asset components:
//   - OBJ importer           (src/importer/obj.cpp, 599 LoC)
//   - MeshBVHBuilder         (src/common/mesh_bvh_builder.cpp, 743 LoC,
//                             embree-backed SAH build)
// The reference runs these on the host before upload; same here — the
// outputs are packed arrays the Python layer hands to JAX. C ABI via
// ctypes (no pybind11 in the image).
//
// Build: see madrona_tpu/native/build.py (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <algorithm>
#include <string>
#include <vector>

extern "C" {

struct ObjMesh {
    float *positions;   // [num_verts * 3]
    float *normals;     // [num_verts * 3] (zero if absent)
    int32_t *indices;   // [num_tris * 3]
    int64_t num_verts;
    int64_t num_tris;
    char error[256];
};

// ---------------------------------------------------------------- OBJ

static int64_t fix_index(int64_t idx, int64_t count) {
    // OBJ: 1-based; negative = relative to end
    if (idx > 0) return idx - 1;
    if (idx < 0) return count + idx;
    return -1;
}

ObjMesh *obj_import(const char *path) {
    auto *out = static_cast<ObjMesh *>(calloc(1, sizeof(ObjMesh)));
    FILE *f = fopen(path, "rb");
    if (!f) {
        snprintf(out->error, sizeof(out->error), "cannot open %s", path);
        return out;
    }

    std::vector<float> pos, nrm;
    std::vector<int64_t> tri_v, tri_n;

    char line[4096];
    while (fgets(line, sizeof(line), f)) {
        if (line[0] == 'v' && line[1] == ' ') {
            float x, y, z;
            if (sscanf(line + 2, "%f %f %f", &x, &y, &z) == 3) {
                pos.push_back(x); pos.push_back(y); pos.push_back(z);
            }
        } else if (line[0] == 'v' && line[1] == 'n' && line[2] == ' ') {
            float x, y, z;
            if (sscanf(line + 3, "%f %f %f", &x, &y, &z) == 3) {
                nrm.push_back(x); nrm.push_back(y); nrm.push_back(z);
            }
        } else if (line[0] == 'f' && line[1] == ' ') {
            // collect face vertex refs (v, v/t, v//n, v/t/n)
            std::vector<int64_t> fv, fn;
            char *p = line + 2;
            while (*p) {
                while (*p == ' ' || *p == '\t') p++;
                if (*p == '\0' || *p == '\n' || *p == '\r') break;
                char *end;
                int64_t vi = strtoll(p, &end, 10);
                if (end == p) break;
                p = end;
                int64_t ni = 0;
                if (*p == '/') {
                    p++;
                    if (*p != '/') strtoll(p, &end, 10), p = end;
                    if (*p == '/') {
                        p++;
                        ni = strtoll(p, &end, 10);
                        p = end;
                    }
                }
                fv.push_back(fix_index(vi, (int64_t)pos.size() / 3));
                fn.push_back(ni ? fix_index(ni, (int64_t)nrm.size() / 3)
                               : -1);
            }
            // fan-triangulate
            for (size_t k = 1; k + 1 < fv.size(); k++) {
                tri_v.push_back(fv[0]);
                tri_v.push_back(fv[k]);
                tri_v.push_back(fv[k + 1]);
                tri_n.push_back(fn[0]);
                tri_n.push_back(fn[k]);
                tri_n.push_back(fn[k + 1]);
            }
        }
    }
    fclose(f);

    int64_t nv = (int64_t)pos.size() / 3;
    int64_t nt = (int64_t)tri_v.size() / 3;
    if (nv == 0 || nt == 0) {
        snprintf(out->error, sizeof(out->error),
                 "no geometry in %s (verts=%lld tris=%lld)", path,
                 (long long)nv, (long long)nt);
        return out;
    }
    for (int64_t i = 0; i < nt * 3; i++) {
        if (tri_v[i] < 0 || tri_v[i] >= nv) {
            snprintf(out->error, sizeof(out->error),
                     "face index out of range: %lld", (long long)tri_v[i]);
            return out;
        }
    }

    out->num_verts = nv;
    out->num_tris = nt;
    out->positions = static_cast<float *>(malloc(nv * 3 * sizeof(float)));
    memcpy(out->positions, pos.data(), nv * 3 * sizeof(float));
    out->normals = static_cast<float *>(calloc(nv * 3, sizeof(float)));
    out->indices = static_cast<int32_t *>(malloc(nt * 3 * sizeof(int32_t)));
    for (int64_t i = 0; i < nt * 3; i++)
        out->indices[i] = (int32_t)tri_v[i];
    // average per-vertex normals from the referenced vn entries
    if (!nrm.empty()) {
        for (int64_t i = 0; i < nt * 3; i++) {
            int64_t ni = tri_n[i];
            if (ni >= 0 && ni < (int64_t)nrm.size() / 3) {
                for (int c = 0; c < 3; c++)
                    out->normals[tri_v[i] * 3 + c] += nrm[ni * 3 + c];
            }
        }
        for (int64_t v = 0; v < nv; v++) {
            float *n = out->normals + v * 3;
            float len = sqrtf(n[0] * n[0] + n[1] * n[1] + n[2] * n[2]);
            if (len > 1e-12f)
                for (int c = 0; c < 3; c++) n[c] /= len;
        }
    }
    return out;
}

void obj_free(ObjMesh *m) {
    if (!m) return;
    free(m->positions);
    free(m->normals);
    free(m->indices);
    free(m);
}

// ------------------------------------------------------------- mesh BVH
//
// Binned SAH binary BVH (MeshBVHBuilder equivalent). Output layout:
// per node: bounds_min[3], bounds_max[3], left, right (negative right =
// leaf: left = first tri index into tri_order, -right = count).

struct BVHOut {
    float *node_min;     // [num_nodes * 3]
    float *node_max;     // [num_nodes * 3]
    int32_t *node_left;  // [num_nodes]
    int32_t *node_right; // [num_nodes]  (right < 0 -> leaf of -right tris)
    int32_t *tri_order;  // [num_tris]
    int64_t num_nodes;
};

struct BuildTri {
    float bmin[3], bmax[3], centroid[3];
    int32_t idx;
};

static void node_bounds(const std::vector<BuildTri> &tris,
                        const std::vector<int32_t> &order, int64_t lo,
                        int64_t hi, float *bmin, float *bmax) {
    for (int c = 0; c < 3; c++) { bmin[c] = 3e38f; bmax[c] = -3e38f; }
    for (int64_t i = lo; i < hi; i++) {
        const BuildTri &t = tris[order[i]];
        for (int c = 0; c < 3; c++) {
            bmin[c] = std::min(bmin[c], t.bmin[c]);
            bmax[c] = std::max(bmax[c], t.bmax[c]);
        }
    }
}

static int64_t build_node(const std::vector<BuildTri> &tris,
                          std::vector<int32_t> &order, int64_t lo,
                          int64_t hi, BVHOut *out, int64_t leaf_size,
                          std::vector<int64_t> &nodes_left,
                          std::vector<int64_t> &nodes_right,
                          std::vector<float> &nmin,
                          std::vector<float> &nmax) {
    int64_t node = (int64_t)nodes_left.size();
    nodes_left.push_back(0);
    nodes_right.push_back(0);
    float bmin[3], bmax[3];
    node_bounds(tris, order, lo, hi, bmin, bmax);
    for (int c = 0; c < 3; c++) { nmin.push_back(bmin[c]); nmax.push_back(bmax[c]); }

    int64_t n = hi - lo;
    if (n <= leaf_size) {
        nodes_left[node] = lo;
        nodes_right[node] = -(int64_t)n;
        return node;
    }

    // binned SAH over the widest centroid axis
    float cmin[3] = {3e38f, 3e38f, 3e38f};
    float cmax[3] = {-3e38f, -3e38f, -3e38f};
    for (int64_t i = lo; i < hi; i++) {
        const BuildTri &t = tris[order[i]];
        for (int c = 0; c < 3; c++) {
            cmin[c] = std::min(cmin[c], t.centroid[c]);
            cmax[c] = std::max(cmax[c], t.centroid[c]);
        }
    }
    int axis = 0;
    float ext = -1;
    for (int c = 0; c < 3; c++) {
        float e = cmax[c] - cmin[c];
        if (e > ext) { ext = e; axis = c; }
    }
    int64_t mid;
    if (ext <= 1e-12f) {
        mid = lo + n / 2;   // degenerate: median split
    } else {
        constexpr int NBINS = 16;
        int64_t counts[NBINS] = {};
        float bbmin[NBINS][3], bbmax[NBINS][3];
        for (int b = 0; b < NBINS; b++)
            for (int c = 0; c < 3; c++) { bbmin[b][c] = 3e38f; bbmax[b][c] = -3e38f; }
        auto bin_of = [&](const BuildTri &t) {
            int b = (int)((t.centroid[axis] - cmin[axis]) / ext * NBINS);
            return std::min(b, NBINS - 1);
        };
        for (int64_t i = lo; i < hi; i++) {
            const BuildTri &t = tris[order[i]];
            int b = bin_of(t);
            counts[b]++;
            for (int c = 0; c < 3; c++) {
                bbmin[b][c] = std::min(bbmin[b][c], t.bmin[c]);
                bbmax[b][c] = std::max(bbmax[b][c], t.bmax[c]);
            }
        }
        auto area = [](const float *mn, const float *mx) {
            float d[3] = {std::max(mx[0] - mn[0], 0.f),
                          std::max(mx[1] - mn[1], 0.f),
                          std::max(mx[2] - mn[2], 0.f)};
            return 2.f * (d[0] * d[1] + d[1] * d[2] + d[0] * d[2]);
        };
        float best_cost = 3e38f;
        int best_split = -1;
        for (int s = 1; s < NBINS; s++) {
            float lmin[3] = {3e38f, 3e38f, 3e38f},
                  lmax[3] = {-3e38f, -3e38f, -3e38f};
            float rmin[3] = {3e38f, 3e38f, 3e38f},
                  rmax[3] = {-3e38f, -3e38f, -3e38f};
            int64_t ln = 0, rn = 0;
            for (int b = 0; b < s; b++) {
                if (!counts[b]) continue;
                ln += counts[b];
                for (int c = 0; c < 3; c++) {
                    lmin[c] = std::min(lmin[c], bbmin[b][c]);
                    lmax[c] = std::max(lmax[c], bbmax[b][c]);
                }
            }
            for (int b = s; b < NBINS; b++) {
                if (!counts[b]) continue;
                rn += counts[b];
                for (int c = 0; c < 3; c++) {
                    rmin[c] = std::min(rmin[c], bbmin[b][c]);
                    rmax[c] = std::max(rmax[c], bbmax[b][c]);
                }
            }
            if (!ln || !rn) continue;
            float cost = area(lmin, lmax) * ln + area(rmin, rmax) * rn;
            if (cost < best_cost) { best_cost = cost; best_split = s; }
        }
        if (best_split < 0) {
            mid = lo + n / 2;
        } else {
            auto it = std::partition(
                order.begin() + lo, order.begin() + hi,
                [&](int32_t ti) { return bin_of(tris[ti]) < best_split; });
            mid = it - order.begin();
            if (mid == lo || mid == hi) mid = lo + n / 2;
        }
    }
    if (mid == lo || mid == hi) {
        std::nth_element(
            order.begin() + lo, order.begin() + lo + n / 2,
            order.begin() + hi, [&](int32_t a, int32_t b) {
                return tris[a].centroid[axis] < tris[b].centroid[axis];
            });
        mid = lo + n / 2;
    }
    int64_t l = build_node(tris, order, lo, mid, out, leaf_size,
                           nodes_left, nodes_right, nmin, nmax);
    int64_t r = build_node(tris, order, mid, hi, out, leaf_size,
                           nodes_left, nodes_right, nmin, nmax);
    nodes_left[node] = l;
    nodes_right[node] = r;
    return node;
}

BVHOut *bvh_build(const float *positions, int64_t num_verts,
                  const int32_t *indices, int64_t num_tris,
                  int64_t leaf_size) {
    (void)num_verts;
    auto *out = static_cast<BVHOut *>(calloc(1, sizeof(BVHOut)));
    if (num_tris <= 0) return out;
    if (leaf_size <= 0) leaf_size = 4;

    std::vector<BuildTri> tris(num_tris);
    for (int64_t i = 0; i < num_tris; i++) {
        BuildTri &t = tris[i];
        t.idx = (int32_t)i;
        for (int c = 0; c < 3; c++) { t.bmin[c] = 3e38f; t.bmax[c] = -3e38f; }
        for (int k = 0; k < 3; k++) {
            const float *p = positions + indices[i * 3 + k] * 3;
            for (int c = 0; c < 3; c++) {
                t.bmin[c] = std::min(t.bmin[c], p[c]);
                t.bmax[c] = std::max(t.bmax[c], p[c]);
            }
        }
        for (int c = 0; c < 3; c++)
            t.centroid[c] = 0.5f * (t.bmin[c] + t.bmax[c]);
    }
    std::vector<int32_t> order(num_tris);
    for (int64_t i = 0; i < num_tris; i++) order[i] = (int32_t)i;

    std::vector<int64_t> nl, nr;
    std::vector<float> nmin, nmax;
    build_node(tris, order, 0, num_tris, out, leaf_size, nl, nr, nmin, nmax);

    int64_t nn = (int64_t)nl.size();
    out->num_nodes = nn;
    out->node_min = static_cast<float *>(malloc(nn * 3 * sizeof(float)));
    out->node_max = static_cast<float *>(malloc(nn * 3 * sizeof(float)));
    out->node_left = static_cast<int32_t *>(malloc(nn * sizeof(int32_t)));
    out->node_right = static_cast<int32_t *>(malloc(nn * sizeof(int32_t)));
    out->tri_order = static_cast<int32_t *>(
        malloc(num_tris * sizeof(int32_t)));
    memcpy(out->node_min, nmin.data(), nn * 3 * sizeof(float));
    memcpy(out->node_max, nmax.data(), nn * 3 * sizeof(float));
    for (int64_t i = 0; i < nn; i++) {
        out->node_left[i] = (int32_t)nl[i];
        out->node_right[i] = (int32_t)nr[i];
    }
    memcpy(out->tri_order, order.data(), num_tris * sizeof(int32_t));
    return out;
}

void bvh_free(BVHOut *b) {
    if (!b) return;
    free(b->node_min);
    free(b->node_max);
    free(b->node_left);
    free(b->node_right);
    free(b->tri_order);
    free(b);
}

}  // extern "C"
