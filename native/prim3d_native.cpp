// Native host-side runtime for primitive3d_tpu.
//
// TPU-native framework counterpart of the reference's C++ host components
// (reference: src/prim3d/Geometry/bvh.cu:209-300 CPU BVH build;
// src/prim3d/Utility/marching_cubes.cu:307-352 PLY writer) — built fresh for
// this framework's data layouts:
//   * LBVH builder (Morton sort + Karras radix tree + preorder escape links)
//     emitting exactly the struct-of-arrays layout bvh/lbvh.py produces, so
//     the same JAX/Pallas traversals consume either build. Threaded with
//     std::thread; intended for huge meshes where host build + device upload
//     beats on-device argsort.
//   * Threaded BVH ray caster (closest hit, same double-sided Möller-Trumbore
//     and miss semantics) — a fast CPU oracle for parity tests and golden
//     generation.
//   * Binary little-endian PLY write/read, byte-identical to io/ply.py.
//
// C ABI only (ctypes-friendly): plain pointers + int32/float32 buffers.

#include <algorithm>
#include <atomic>
#include <cfloat>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <numeric>
#include <thread>
#include <vector>

namespace {

struct V3 {
    float x, y, z;
};

inline V3 vsub(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline V3 vcross(V3 a, V3 b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}
inline float vdot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline V3 vmin(V3 a, V3 b) {
    return {std::min(a.x, b.x), std::min(a.y, b.y), std::min(a.z, b.z)};
}
inline V3 vmax(V3 a, V3 b) {
    return {std::max(a.x, b.x), std::max(a.y, b.y), std::max(a.z, b.z)};
}

inline uint32_t expand_bits(uint32_t v) {
    v = (v * 0x00010001u) & 0xFF0000FFu;
    v = (v * 0x00000101u) & 0x0F00F00Fu;
    v = (v * 0x00000011u) & 0xC30C30C3u;
    v = (v * 0x00000005u) & 0x49249249u;
    return v;
}

inline uint32_t morton3d(V3 p, V3 lo, V3 ext) {
    auto q = [](float t) {
        t = std::min(std::max(t * 1023.0f, 0.0f), 1023.0f);
        return (uint32_t)t;
    };
    float ex = ext.x > 1e-30f ? ext.x : 1e-30f;
    float ey = ext.y > 1e-30f ? ext.y : 1e-30f;
    float ez = ext.z > 1e-30f ? ext.z : 1e-30f;
    return (expand_bits(q((p.x - lo.x) / ex)) << 2) |
           (expand_bits(q((p.y - lo.y) / ey)) << 1) |
           expand_bits(q((p.z - lo.z) / ez));
}

inline int clz32(uint32_t x) { return x == 0 ? 32 : __builtin_clz(x); }

constexpr int32_t kDone = 1 << 30;

void parallel_for(int64_t n, const std::function<void(int64_t, int64_t)>& fn) {
    unsigned hw = std::max(1u, std::thread::hardware_concurrency());
    int64_t nt = std::min<int64_t>(hw, std::max<int64_t>(1, n / 4096));
    if (nt <= 1) {
        fn(0, n);
        return;
    }
    std::vector<std::thread> th;
    int64_t chunk = (n + nt - 1) / nt;
    for (int64_t t = 0; t < nt; ++t) {
        int64_t b = t * chunk, e = std::min(n, b + chunk);
        if (b >= e) break;
        th.emplace_back(fn, b, e);
    }
    for (auto& t : th) t.join();
}

}  // namespace

extern "C" {

// Build an LBVH over T triangles (tris: T*9 floats, [a b c] per triangle).
// Outputs (caller-allocated):
//   left, right         : (T-1) int32  (leaf encoded as ~leaf_index)
//   box_lo, box_hi      : (T-1)*3 float
//   escape              : (T-1) int32  (preorder skip link; 1<<30 = done)
//   escape_leaf         : T int32
//   prim_order          : T int32      (leaf k -> original triangle)
//   tris_sorted         : T*9 float    (triangles in Morton order)
// Returns 0 on success.
int p3d_build_lbvh(const float* tris, int32_t T, int32_t* left, int32_t* right,
                   float* box_lo, float* box_hi, int32_t* escape,
                   int32_t* escape_leaf, int32_t* prim_order,
                   float* tris_sorted) {
    if (T < 2) return -1;
    const V3* tv = reinterpret_cast<const V3*>(tris);

    V3 lo = tv[0], hi = tv[0];
    for (int64_t i = 0; i < (int64_t)T * 3; ++i) {
        lo = vmin(lo, tv[i]);
        hi = vmax(hi, tv[i]);
    }
    V3 ext = vsub(hi, lo);

    std::vector<uint32_t> codes(T);
    std::vector<int32_t> order(T);
    parallel_for(T, [&](int64_t b, int64_t e) {
        for (int64_t i = b; i < e; ++i) {
            V3 a = tv[i * 3], bb = tv[i * 3 + 1], c = tv[i * 3 + 2];
            V3 cent = {(a.x + bb.x + c.x) / 3.0f, (a.y + bb.y + c.y) / 3.0f,
                       (a.z + bb.z + c.z) / 3.0f};
            codes[i] = morton3d(cent, lo, ext);
            order[i] = (int32_t)i;
        }
    });
    std::stable_sort(order.begin(), order.end(),
                     [&](int32_t a, int32_t b) { return codes[a] < codes[b]; });

    std::vector<uint32_t> sc(T);
    for (int32_t i = 0; i < T; ++i) {
        sc[i] = codes[order[i]];
        prim_order[i] = order[i];
        std::memcpy(tris_sorted + (int64_t)i * 9, tris + (int64_t)order[i] * 9,
                    9 * sizeof(float));
    }

    // delta with index tie-break (unique keys), -1 out of range
    auto delta = [&](int32_t i, int32_t j) -> int32_t {
        if (j < 0 || j > T - 1) return -1;
        uint32_t ci = sc[i], cj = sc[j];
        if (ci != cj) return clz32(ci ^ cj);
        return 32 + clz32((uint32_t)(i ^ j));
    };

    int32_t I = T - 1;
    std::vector<int32_t> parent(I, 0);
    std::vector<uint8_t> isleft(I, 0);
    std::vector<int32_t> parent_leaf(T, 0);
    std::vector<uint8_t> isleft_leaf(T, 0);

    parallel_for(I, [&](int64_t bgn, int64_t end) {
        for (int64_t ii = bgn; ii < end; ++ii) {
            int32_t i = (int32_t)ii;
            int d = delta(i, i + 1) > delta(i, i - 1) ? 1 : -1;
            int32_t dmin = delta(i, i - d);
            int64_t lmax = 2;
            while (delta(i, i + (int32_t)(lmax * d)) > dmin) lmax *= 2;
            int64_t l = 0;
            for (int64_t t = lmax / 2; t >= 1; t /= 2)
                if (delta(i, i + (int32_t)((l + t) * d)) > dmin) l += t;
            int32_t j = i + (int32_t)(l * d);
            int32_t dnode = delta(i, j);
            int64_t s = 0, t = l;
            do {
                t = (t + 1) >> 1;
                if (delta(i, i + (int32_t)((s + t) * d)) > dnode) s += t;
            } while (t > 1);
            int32_t gamma = i + (int32_t)(s * d) + std::min(d, 0);
            int32_t rl = std::min(i, j), rh = std::max(i, j);
            int32_t lc = (rl == gamma) ? ~gamma : gamma;
            int32_t rc = (rh == gamma + 1) ? ~(gamma + 1) : gamma + 1;
            left[i] = lc;
            right[i] = rc;

            // subtree AABB over sorted leaf range [rl, rh]
            V3 blo = tv[0], bhi = tv[0];
            bool first = true;
            for (int32_t k = rl; k <= rh; ++k) {
                const V3* p = reinterpret_cast<const V3*>(tris_sorted + (int64_t)k * 9);
                for (int c = 0; c < 3; ++c) {
                    if (first) {
                        blo = bhi = p[c];
                        first = false;
                    } else {
                        blo = vmin(blo, p[c]);
                        bhi = vmax(bhi, p[c]);
                    }
                }
            }
            box_lo[i * 3] = blo.x;
            box_lo[i * 3 + 1] = blo.y;
            box_lo[i * 3 + 2] = blo.z;
            box_hi[i * 3] = bhi.x;
            box_hi[i * 3 + 1] = bhi.y;
            box_hi[i * 3 + 2] = bhi.z;
        }
    });

    for (int32_t i = 0; i < I; ++i) {
        for (int side = 0; side < 2; ++side) {
            int32_t c = side == 0 ? left[i] : right[i];
            if (c < 0) {
                parent_leaf[~c] = i;
                isleft_leaf[~c] = side == 0;
            } else {
                parent[c] = i;
                isleft[c] = side == 0;
            }
        }
    }

    // escape links: esc(left child) = right sibling; esc(right) = esc(parent)
    std::vector<int32_t> esc(I, kDone);
    // resolve top-down: nodes are not ordered by depth, so iterate to fixpoint
    // (depth passes; bounded by tree depth)
    bool changed = true;
    int guard = 0;
    std::vector<int32_t> esc_next(I);
    while (changed && guard++ < 4096) {
        changed = false;
        for (int32_t i = 0; i < I; ++i) {
            int32_t v = i == 0 ? kDone
                        : (isleft[i] ? right[parent[i]] : esc[parent[i]]);
            esc_next[i] = v;
        }
        for (int32_t i = 0; i < I; ++i) {
            if (esc[i] != esc_next[i]) {
                esc[i] = esc_next[i];
                changed = true;
            }
        }
    }
    std::memcpy(escape, esc.data(), I * sizeof(int32_t));
    for (int32_t k = 0; k < T; ++k)
        escape_leaf[k] = isleft_leaf[k] ? right[parent_leaf[k]] : esc[parent_leaf[k]];
    return 0;
}

// Threaded closest-hit BVH ray cast over the structure from p3d_build_lbvh.
// origins/dirs: R*3 floats. Outputs depth (R), normals (R*3), face_id (R)
// with the framework's miss semantics (depth=max_dist, normal=0, id=-1).
void p3d_raycast(const int32_t* left, const int32_t* right, const float* box_lo,
                 const float* box_hi, const int32_t* escape,
                 const int32_t* escape_leaf, const int32_t* prim_order,
                 const float* tris_sorted, int32_t T, const float* origins,
                 const float* dirs, int32_t R, float max_dist, float* depth,
                 float* normals, int32_t* face_id) {
    parallel_for(R, [&](int64_t bgn, int64_t end) {
        for (int64_t r = bgn; r < end; ++r) {
            V3 ro = {origins[r * 3], origins[r * 3 + 1], origins[r * 3 + 2]};
            V3 rd = {dirs[r * 3], dirs[r * 3 + 1], dirs[r * 3 + 2]};
            V3 inv = {1.0f / rd.x, 1.0f / rd.y, 1.0f / rd.z};
            float best = max_dist;
            int32_t bi = -1;
            int32_t node = 0;
            while (node != kDone) {
                if (node < 0) {
                    int32_t k = ~node;
                    const V3* p =
                        reinterpret_cast<const V3*>(tris_sorted + (int64_t)k * 9);
                    V3 e1 = vsub(p[1], p[0]), e2 = vsub(p[2], p[0]);
                    V3 n = vcross(e1, e2);
                    V3 q = vcross(vsub(ro, p[0]), rd);
                    float den = vdot(rd, n);
                    if (den != 0.0f) {
                        float f = 1.0f / den;
                        float u = f * -vdot(q, e2);
                        float v = f * vdot(q, e1);
                        float t = f * -vdot(n, vsub(ro, p[0]));
                        if (u >= 0 && u <= 1 && v >= 0 && u + v <= 1 && t >= 0 &&
                            t < best) {
                            best = t;
                            bi = k;
                        }
                    }
                    node = escape_leaf[k];
                } else {
                    const float* lo = box_lo + (int64_t)node * 3;
                    const float* hi = box_hi + (int64_t)node * 3;
                    float t0x = (lo[0] - ro.x) * inv.x, t1x = (hi[0] - ro.x) * inv.x;
                    float t0y = (lo[1] - ro.y) * inv.y, t1y = (hi[1] - ro.y) * inv.y;
                    float t0z = (lo[2] - ro.z) * inv.z, t1z = (hi[2] - ro.z) * inv.z;
                    float tmin = std::max(std::max(std::min(t0x, t1x), std::min(t0y, t1y)),
                                          std::min(t0z, t1z));
                    float tmax = std::min(std::min(std::max(t0x, t1x), std::max(t0y, t1y)),
                                          std::max(t0z, t1z));
                    bool hit = tmin <= tmax && tmax >= 0 && tmin < best;
                    node = hit ? left[node] : escape[node];
                }
            }
            depth[r] = best;
            if (bi >= 0) {
                const V3* p =
                    reinterpret_cast<const V3*>(tris_sorted + (int64_t)bi * 9);
                V3 n = vcross(vsub(p[1], p[0]), vsub(p[2], p[0]));
                float nl = std::sqrt(vdot(n, n));
                nl = nl > 1e-30f ? nl : 1e-30f;
                normals[r * 3] = n.x / nl;
                normals[r * 3 + 1] = n.y / nl;
                normals[r * 3 + 2] = n.z / nl;
                face_id[r] = prim_order[bi];
            } else {
                normals[r * 3] = normals[r * 3 + 1] = normals[r * 3 + 2] = 0.0f;
                face_id[r] = -1;
            }
        }
    });
}

// Binary little-endian PLY writer; identical wire format to io/ply.py and the
// reference's save_mesh_as_ply.
int p3d_save_ply(const char* filename, const float* vertices,
                 const uint8_t* colors, int32_t num_vertices,
                 const int32_t* faces, int32_t num_faces) {
    FILE* f = fopen(filename, "wb");
    if (!f) return -1;
    fprintf(f,
            "ply\nformat binary_little_endian 1.0\nelement vertex %d\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "element face %d\nproperty list int int vertex_index\nend_header\n",
            num_vertices, num_faces);
    std::vector<uint8_t> rec((size_t)num_vertices * 15);
    for (int32_t i = 0; i < num_vertices; ++i) {
        std::memcpy(rec.data() + (size_t)i * 15, vertices + (size_t)i * 3, 12);
        std::memcpy(rec.data() + (size_t)i * 15 + 12, colors + (size_t)i * 3, 3);
    }
    fwrite(rec.data(), 1, rec.size(), f);
    std::vector<int32_t> frec((size_t)num_faces * 4);
    for (int32_t i = 0; i < num_faces; ++i) {
        frec[(size_t)i * 4] = 3;
        std::memcpy(frec.data() + (size_t)i * 4 + 1, faces + (size_t)i * 3, 12);
    }
    fwrite(frec.data(), 4, frec.size(), f);
    fclose(f);
    return 0;
}

}  // extern "C"
