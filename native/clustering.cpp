#include <functional>
#include <algorithm>
// Native clustering ops (host-side, eval-time) for pointcept_tpu.
//
// TPU-native replacement for the CUDA `libs/pointgroup_ops` package
// (reference `libs/pointgroup_ops/src/bfs_cluster.cpp:21-145` +
// `ballquery_batch_p`): fixed-radius neighbor graph over shifted coordinates
// via a grid hash, then BFS connected components restricted to equal semantic
// labels. Runs on the host CPU exactly like the reference's clustering (which
// is also CPU BFS) — it sits outside the jit compute path.
//
// Build: g++ -O3 -shared -fPIC -o libclustering.so clustering.cpp
// Loaded through ctypes (pointcept_tpu/ops/clustering.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <queue>
#include <unordered_map>
#include <vector>

namespace {

struct CellKey {
    int64_t v;
    bool operator==(const CellKey& o) const { return v == o.v; }
};

struct CellHash {
    size_t operator()(const CellKey& k) const {
        return std::hash<int64_t>()(k.v * 0x9E3779B97F4A7C15ULL);
    }
};

inline int64_t cell_of(float x, float y, float z, int b, float inv_r) {
    // 16 bits per axis + batch in high bits
    int64_t cx = (int64_t)std::floor(x * inv_r) & 0xFFFF;
    int64_t cy = (int64_t)std::floor(y * inv_r) & 0xFFFF;
    int64_t cz = (int64_t)std::floor(z * inv_r) & 0xFFFF;
    return ((int64_t)b << 48) | (cx << 32) | (cy << 16) | cz;
}

}  // namespace

extern "C" {

// BFS connected-component clustering.
//   coords  [n*3] float  (already shifted by predicted offsets, voxel units)
//   batch   [n]   int32  scene id
//   labels  [n]   int32  predicted semantic class (clusters never cross labels)
//   radius         float  neighbor radius (reference cluster_thresh)
//   min_points     int    discard clusters smaller than this (cluster_min_points)
//   max_neighbors  int    cap on neighbors per point (cluster_closed_points)
//   cluster_out [n] int32 -> cluster id per point, -1 = unclustered
// Returns number of clusters.
int bfs_cluster(const float* coords, const int32_t* batch, const int32_t* labels,
                int64_t n, float radius, int32_t min_points, int32_t max_neighbors,
                int32_t* cluster_out) {
    const float r2 = radius * radius;
    const float inv_r = 1.0f / radius;

    std::unordered_map<CellKey, std::vector<int32_t>, CellHash> grid;
    grid.reserve(n * 2);
    for (int64_t i = 0; i < n; ++i) {
        CellKey k{cell_of(coords[i * 3], coords[i * 3 + 1], coords[i * 3 + 2], batch[i], inv_r)};
        grid[k].push_back((int32_t)i);
    }

    std::fill(cluster_out, cluster_out + n, -1);
    std::vector<int32_t> component;
    component.reserve(1024);
    int32_t num_clusters = 0;

    std::vector<int32_t> stack;
    for (int64_t seed = 0; seed < n; ++seed) {
        if (cluster_out[seed] != -1) continue;
        component.clear();
        stack.clear();
        stack.push_back((int32_t)seed);
        cluster_out[seed] = -2;  // visiting
        const int32_t lbl = labels[seed];
        const int32_t bat = batch[seed];
        while (!stack.empty()) {
            int32_t i = stack.back();
            stack.pop_back();
            component.push_back(i);
            const float xi = coords[i * 3], yi = coords[i * 3 + 1], zi = coords[i * 3 + 2];
            int found = 0;
            int64_t cx = (int64_t)std::floor(xi * inv_r);
            int64_t cy = (int64_t)std::floor(yi * inv_r);
            int64_t cz = (int64_t)std::floor(zi * inv_r);
            for (int dx = -1; dx <= 1 && found < max_neighbors; ++dx)
                for (int dy = -1; dy <= 1 && found < max_neighbors; ++dy)
                    for (int dz = -1; dz <= 1 && found < max_neighbors; ++dz) {
                        CellKey k{((int64_t)bat << 48) | (((cx + dx) & 0xFFFF) << 32) |
                                  (((cy + dy) & 0xFFFF) << 16) | ((cz + dz) & 0xFFFF)};
                        auto it = grid.find(k);
                        if (it == grid.end()) continue;
                        for (int32_t j : it->second) {
                            if (cluster_out[j] != -1 || labels[j] != lbl || batch[j] != bat) continue;
                            const float dx2 = coords[j * 3] - xi;
                            const float dy2 = coords[j * 3 + 1] - yi;
                            const float dz2 = coords[j * 3 + 2] - zi;
                            if (dx2 * dx2 + dy2 * dy2 + dz2 * dz2 <= r2) {
                                cluster_out[j] = -2;
                                stack.push_back(j);
                                if (++found >= max_neighbors) break;
                            }
                        }
                    }
        }
        if ((int32_t)component.size() >= min_points) {
            for (int32_t i : component) cluster_out[i] = num_clusters;
            ++num_clusters;
        } else {
            for (int32_t i : component) cluster_out[i] = -1 - 1000000;  // rejected
        }
    }
    // normalize rejected markers back to -1
    for (int64_t i = 0; i < n; ++i)
        if (cluster_out[i] < -1) cluster_out[i] = -1;
    return num_clusters;
}

// Felzenszwalb-style graph segmentation into superpoints.
// TPU-native replacement for `libs/pointseg` (`src/segmentor.cpp`, used by
// ScanNet++ preprocessing, `preprocess_scannetpp.py:60`).
//   vertices [n*3] float, edges [m*2] int32 (mesh or kNN edges),
//   weights  [m]   float  (edge dissimilarity, e.g. 1 - |n_i . n_j|)
//   k_thresh float, seg_min int -> out [n] int32 segment ids
int segment_graph(const float* vertices, int64_t n, const int32_t* edges,
                  const float* weights, int64_t m, float k_thresh, int32_t seg_min,
                  int32_t* out) {
    std::vector<int32_t> parent(n), rank_(n, 0), size(n, 1);
    std::vector<float> thresh(n, k_thresh);
    for (int64_t i = 0; i < n; ++i) parent[i] = (int32_t)i;

    std::function<int32_t(int32_t)> find = [&](int32_t x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    };
    auto unite = [&](int32_t a, int32_t b) {
        if (rank_[a] < rank_[b]) std::swap(a, b);
        parent[b] = a;
        size[a] += size[b];
        if (rank_[a] == rank_[b]) ++rank_[a];
        return a;
    };

    std::vector<int64_t> order(m);
    for (int64_t i = 0; i < m; ++i) order[i] = i;
    std::sort(order.begin(), order.end(), [&](int64_t a, int64_t b) { return weights[a] < weights[b]; });

    for (int64_t oi = 0; oi < m; ++oi) {
        int64_t e = order[oi];
        int32_t a = find(edges[e * 2]);
        int32_t b = find(edges[e * 2 + 1]);
        if (a == b) continue;
        float w = weights[e];
        if (w <= thresh[a] && w <= thresh[b]) {
            int32_t r = unite(a, b);
            thresh[r] = w + k_thresh / size[r];
        }
    }
    // enforce min size
    for (int64_t oi = 0; oi < m; ++oi) {
        int64_t e = order[oi];
        int32_t a = find(edges[e * 2]);
        int32_t b = find(edges[e * 2 + 1]);
        if (a != b && (size[a] < seg_min || size[b] < seg_min)) unite(a, b);
    }
    // compact ids
    std::unordered_map<int32_t, int32_t> remap;
    int32_t next = 0;
    for (int64_t i = 0; i < n; ++i) {
        int32_t r = find((int32_t)i);
        auto it = remap.find(r);
        if (it == remap.end()) {
            remap[r] = next;
            out[i] = next++;
        } else {
            out[i] = it->second;
        }
    }
    return next;
}

}  // extern "C"
