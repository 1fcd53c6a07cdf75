// Host-side geometry precompute for serialized point-transformer models.
//
// TPU-native counterpart of the index-building work the reference does on GPU
// inside the forward pass: spconv hash-table rule maps (`Point.sparsify()`,
// reference models/utils/structure.py:112-148), curve serialization argsorts
// (`Point.serialization`, structure.py:53-110), PTv3 patch padding
// (`get_padding_and_inverse`, point_transformer_v3m1_base.py:115-170) and grid
// pooling clusters (`SerializedPooling`, :341-444).
//
// On TPU these are irregular int ops that fight the vector units; the profile
// (docs/PERFORMANCE.md) shows them dominating the PTv3 forward (~250 of 343
// ms). Like spconv — whose rule maps are built by the host library, not the
// model — we compute them on the host CPU, in the data-loader workers,
// overlapped with device compute, and feed the model pure gather/GEMM work.
//
// Semantics replicate pointcept_tpu/ops/{serialization,sparse_conv}.py and
// PointBatch.{serialize,patch_partition} exactly (tests/test_host_geometry.py
// checks element-wise equality against the in-graph builders).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread
//        -o libgeometry.so geometry.cpp
// Loaded through ctypes (pointcept_tpu/ops/host_geometry.py).

#include <algorithm>
#include <array>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------- threading
inline int hw_threads() {
    unsigned n = std::thread::hardware_concurrency();
    return n ? (int)n : 4;
}

template <class F>
void parallel_for(int64_t n, F f, int min_grain = 4096) {
    int nt = hw_threads();
    if (n < min_grain * 2 || nt <= 1) {
        f((int64_t)0, n);
        return;
    }
    nt = (int)std::min<int64_t>(nt, (n + min_grain - 1) / min_grain);
    std::vector<std::thread> ts;
    int64_t chunk = (n + nt - 1) / nt;
    for (int t = 0; t < nt; t++) {
        int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
        if (lo >= hi) break;
        ts.emplace_back([=] { f(lo, hi); });
    }
    for (auto& t : ts) t.join();
}

// ------------------------------------------------------------- curve codes
// Morton spread: bit i of the low 16 bits lands at position 3*i (canonical
// 21-bit sequence restricted to 16 bits).
inline uint64_t spread3(uint64_t x) {
    x &= 0x1FFFFFull;
    x = (x | (x << 32)) & 0x1F00000000FFFFull;
    x = (x | (x << 16)) & 0x1F0000FF0000FFull;
    x = (x | (x << 8)) & 0x100F00F00F00F00Full;
    x = (x | (x << 4)) & 0x10C30C30C30C30C3ull;
    x = (x | (x << 2)) & 0x1249249249249249ull;
    return x;
}

// 3D Morton code, x most significant (reference z_order.py:40 layout).
inline uint64_t morton3(uint32_t x, uint32_t y, uint32_t z) {
    return (spread3(x) << 2) | (spread3(y) << 1) | spread3(z);
}

// Skilling AxesToTranspose: after this, morton3 of (x,y,z) = Hilbert index.
// Mirrors ops/serialization.py:hilbert_transform (word-level, verified
// bit-exact against the reference's hilbert.py encoder).
inline void hilbert_transform(uint32_t& x, uint32_t& y, uint32_t& z, int depth) {
    uint32_t c[3] = {x, y, z};
    for (uint32_t q = 1u << (depth - 1); q > 1; q >>= 1) {
        uint32_t p = q - 1;
        for (int i = 0; i < 3; i++) {
            if (c[i] & q) {
                c[0] ^= p;  // invert low bits of dim 0
            } else {
                uint32_t t = (c[0] ^ c[i]) & p;  // swap low bits of dims 0,i
                c[0] ^= t;
                c[i] ^= t;
            }
        }
    }
    // Gray decode
    c[1] ^= c[0];
    c[2] ^= c[1];
    uint32_t t = 0;
    for (uint32_t q = 1u << (depth - 1); q > 1; q >>= 1)
        if (c[2] & q) t ^= q - 1;
    x = c[0] ^ t;
    y = c[1] ^ t;
    z = c[2] ^ t;
}

// order_id: 0=z 1=z-trans 2=hilbert 3=hilbert-trans ("-trans" swaps x,y —
// reference serialization/default.py:9).
inline uint64_t curve_code(int32_t gx, int32_t gy, int32_t gz, int depth, int order_id) {
    uint32_t x = (uint32_t)gx, y = (uint32_t)gy, z = (uint32_t)gz;
    if (order_id & 1) std::swap(x, y);
    if (order_id & 2) hilbert_transform(x, y, z, depth);
    return morton3(x, y, z);
}

// Full sort key: batch in the high bits (padding = sentinel that sorts last),
// matching ops/serialization.py key triples (batch, hi, lo).
inline uint64_t sort_key(int32_t b, uint64_t code, int depth) {
    uint64_t bb = b < 0 ? 0x7FFFull : (uint64_t)b;  // BATCH_SENTINEL analogue
    return (bb << (3 * depth)) | code;
}

// ------------------------------------------------------------- voxel hash
// Open-addressing hash of packed voxel keys -> point index.
struct VoxelHash {
    std::vector<uint64_t> keys;
    std::vector<int32_t> vals;
    uint64_t mask;

    static inline uint64_t pack(int32_t b, int32_t x, int32_t y, int32_t z) {
        return ((uint64_t)(uint32_t)b << 48) | ((uint64_t)(uint32_t)(x & 0xFFFF) << 32) |
               ((uint64_t)(uint32_t)(y & 0xFFFF) << 16) | (uint64_t)(uint32_t)(z & 0xFFFF);
    }
    static inline uint64_t hash(uint64_t k) {
        k *= 0x9E3779B97F4A7C15ull;
        return k ^ (k >> 29);
    }

    void build(const int32_t* grid, const int32_t* batch, int64_t n) {
        uint64_t cap = 1;
        while (cap < (uint64_t)(n * 2)) cap <<= 1;
        mask = cap - 1;
        keys.assign(cap, ~0ull);
        vals.assign(cap, -1);
        for (int64_t i = 0; i < n; i++) {
            if (batch[i] < 0) continue;
            uint64_t k = pack(batch[i], grid[i * 3], grid[i * 3 + 1], grid[i * 3 + 2]);
            uint64_t h = hash(k) & mask;
            while (keys[h] != ~0ull) {
                if (keys[h] == k) break;  // duplicate voxel: keep first (unspecified, see header)
                h = (h + 1) & mask;
            }
            if (keys[h] == ~0ull) {
                keys[h] = k;
                vals[h] = (int32_t)i;
            }
        }
    }

    inline int32_t find(int32_t b, int32_t x, int32_t y, int32_t z) const {
        uint64_t k = pack(b, x, y, z);
        uint64_t h = hash(k) & mask;
        while (true) {
            if (keys[h] == k) return vals[h];
            if (keys[h] == ~0ull) return -1;
            h = (h + 1) & mask;
        }
    }
};

// kernel offset enumeration — C-order over (d0,d1,d2), centered
// (ops/sparse_conv.py:kernel_offsets).
inline void kernel_offsets(int k, std::vector<std::array<int32_t, 3>>& offs) {
    offs.clear();
    int lo = -((k - 1) / 2);
    for (int a = 0; a < k; a++)
        for (int b = 0; b < k; b++)
            for (int c = 0; c < k; c++)
                offs.push_back(std::array<int32_t, 3>{(int32_t)(a + lo), (int32_t)(b + lo), (int32_t)(c + lo)});
}

// SubM neighbor map: nbr[i*K + j] = point index at offset j from point i
// (-1 = empty / out of range / padding row). Parity:
// ops/sparse_conv.py:build_subm_neighbor_map.
void subm_neighbor_map(const int32_t* grid, const int32_t* batch, int64_t n, int depth,
                       int kernel, const VoxelHash& hash, int32_t* out) {
    std::vector<std::array<int32_t, 3>> offs;
    kernel_offsets(kernel, offs);
    const int K = (int)offs.size();
    const int32_t lim = (1 << depth) - 1;
    parallel_for(n, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            int32_t b = batch[i];
            int32_t* row = out + i * K;
            if (b < 0) {
                for (int j = 0; j < K; j++) row[j] = -1;
                continue;
            }
            int32_t gx = grid[i * 3], gy = grid[i * 3 + 1], gz = grid[i * 3 + 2];
            for (int j = 0; j < K; j++) {
                int32_t x = gx + offs[j][0], y = gy + offs[j][1], z = gz + offs[j][2];
                if ((uint32_t)x > (uint32_t)lim || (uint32_t)y > (uint32_t)lim ||
                    (uint32_t)z > (uint32_t)lim) {
                    row[j] = -1;
                } else {
                    row[j] = hash.find(b, x, y, z);
                }
            }
        }
    });
}

// splitmix64 — host shuffle RNG (independent of device streams by design; when
// host geometry is used the host's order shuffle is authoritative).
inline uint64_t splitmix64(uint64_t& s) {
    uint64_t z = (s += 0x9E3779B97F4A7C15ull);
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ull;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBull;
    return z ^ (z >> 31);
}

struct StageState {
    int64_t cap;                       // static capacity
    std::vector<int32_t> grid;         // [cap*3]
    std::vector<int32_t> batch;        // [cap] (-1 pad)
    std::vector<int32_t> segment;      // [cap] (-1 none)
    std::vector<float> coord;          // [cap*3]
    std::vector<std::vector<uint64_t>> codes;  // per order: [cap] curve codes
    std::vector<std::vector<int32_t>> order;   // per order: sorted point ids
    std::vector<std::vector<int32_t>> inverse; // per order
    int depth;
};

// argsort by (batch-with-sentinel, code); ties (padding rows) broken by index
// so results are deterministic.
void sort_orders(StageState& st, int num_orders) {
    st.order.assign(num_orders, {});
    st.inverse.assign(num_orders, {});
    std::vector<std::thread> ts;
    for (int oi = 0; oi < num_orders; oi++) {
        ts.emplace_back([&st, oi] {
            int64_t n = st.cap;
            auto& ord = st.order[oi];
            auto& inv = st.inverse[oi];
            ord.resize(n);
            inv.resize(n);
            std::vector<std::pair<uint64_t, int32_t>> kv(n);
            for (int64_t i = 0; i < n; i++)
                kv[i] = {sort_key(st.batch[i], st.codes[oi][i], st.depth), (int32_t)i};
            std::sort(kv.begin(), kv.end());
            for (int64_t i = 0; i < n; i++) {
                ord[i] = kv[i].second;
                inv[kv[i].second] = (int32_t)i;
            }
        });
    }
    for (auto& t : ts) t.join();
}

void compute_codes(StageState& st, int num_orders, const int32_t* order_ids) {
    st.codes.assign(num_orders, std::vector<uint64_t>(st.cap));
    parallel_for(st.cap, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            int32_t gx = st.grid[i * 3], gy = st.grid[i * 3 + 1], gz = st.grid[i * 3 + 2];
            for (int oi = 0; oi < num_orders; oi++)
                st.codes[oi][i] = curve_code(gx, gy, gz, st.depth, order_ids[oi]);
        }
    });
}

// Patch partition — exact replica of PointBatch.patch_partition
// (models/utils/structure.py:146-196).
void patch_partition(const StageState& st, int oi, int K, int B, int64_t P,
                     int32_t* slot_to_point, int32_t* point_to_slot) {
    int64_t cap = st.cap;
    std::vector<int64_t> n(B, 0);
    for (int64_t i = 0; i < cap; i++)
        if (st.batch[i] >= 0 && st.batch[i] < B) n[st.batch[i]]++;
    std::vector<int64_t> p(B), s_excl(B), q_incl(B), q_excl(B);
    int64_t sacc = 0, qacc = 0;
    for (int b = 0; b < B; b++) {
        p[b] = (n[b] + K - 1) / K * K;
        s_excl[b] = sacc;
        sacc += n[b];
        q_excl[b] = qacc;
        qacc += p[b];
        q_incl[b] = qacc;
    }
    const auto& ord = st.order[oi];
    const auto& inv = st.inverse[oi];
    parallel_for(P, [&](int64_t lo, int64_t hi) {
        int scene = 0;
        // restart scene scan per chunk
        for (int64_t t = lo; t < hi; t++) {
            if (t == lo) {
                scene = 0;
                while (scene < B && q_incl[scene] <= t) scene++;
            } else {
                while (scene < B && q_incl[scene] <= t) scene++;
            }
            bool live = scene < B;
            int sc = live ? scene : B - 1;
            int64_t o = t - q_excl[sc];
            int64_t ns = n[sc];
            int64_t idx;
            if (o < ns) idx = o;
            else if (o >= K) idx = o - K;
            else idx = ns > 0 ? o % ns : 0;
            if (idx > ns - 1) idx = ns - 1;
            if (idx < 0) idx = 0;
            int64_t g = s_excl[sc] + idx;
            if (g < 0) g = 0;
            if (g > cap - 1) g = cap - 1;
            slot_to_point[t] = (live && ns > 0) ? ord[g] : 0;
        }
    });
    parallel_for(cap, [&](int64_t lo, int64_t hi) {
        for (int64_t i = lo; i < hi; i++) {
            if (st.batch[i] < 0) {
                point_to_slot[i] = 0;
                continue;
            }
            int b = st.batch[i] < B ? st.batch[i] : B - 1;
            int64_t slot = q_excl[b] + ((int64_t)inv[i] - s_excl[b]);
            if (slot < 0) slot = 0;
            if (slot > P - 1) slot = P - 1;
            point_to_slot[i] = (int32_t)slot;
        }
    });
}

// Grid pooling — exact replica of SerializedPooling's cluster construction
// (models/point_transformer_v3/point_transformer_v3.py:273-362).
void pool_stage(const StageState& fine, int pdepth, int64_t m, StageState& coarse,
                int32_t* cluster_out, int num_orders) {
    int bits = 3 * pdepth;
    int64_t n = fine.cap;
    const auto& order0 = fine.order[0];

    coarse.cap = m;
    coarse.depth = fine.depth - pdepth;
    coarse.grid.assign(m * 3, 0);
    coarse.batch.assign(m, -1);
    coarse.segment.assign(m, -1);
    coarse.coord.assign(m * 3, 0.f);
    coarse.codes.assign(num_orders, std::vector<uint64_t>(m));
    // pooled codes default: padding rows keep code 0 (batch sentinel dominates the sort)
    for (int oi = 0; oi < num_orders; oi++) std::fill(coarse.codes[oi].begin(), coarse.codes[oi].end(), 0);

    std::vector<double> csum(m * 3, 0.0);
    std::vector<int64_t> ccnt(m, 0);

    int64_t cluster = -1;
    uint64_t prev = ~0ull;
    bool have_prev = false;
    for (int64_t j = 0; j < n; j++) {
        int32_t i = order0[j];
        if (fine.batch[i] < 0) {
            cluster_out[i] = (int32_t)m;
            continue;
        }
        uint64_t sk = sort_key(fine.batch[i], fine.codes[0][i] >> bits, coarse.depth);
        if (!have_prev || sk != prev) {
            cluster++;
            have_prev = true;
            prev = sk;
            if (cluster < m) {
                // head attributes
                coarse.grid[cluster * 3] = fine.grid[i * 3] >> pdepth;
                coarse.grid[cluster * 3 + 1] = fine.grid[i * 3 + 1] >> pdepth;
                coarse.grid[cluster * 3 + 2] = fine.grid[i * 3 + 2] >> pdepth;
                coarse.batch[cluster] = fine.batch[i];
                if (!fine.segment.empty()) coarse.segment[cluster] = fine.segment[i];
                for (int oi = 0; oi < num_orders; oi++)
                    coarse.codes[oi][cluster] = fine.codes[oi][i] >> bits;
            }
        }
        int64_t cl = cluster < m ? cluster : m;
        cluster_out[i] = (int32_t)cl;
        if (cl < m && !fine.coord.empty()) {
            csum[cl * 3] += fine.coord[i * 3];
            csum[cl * 3 + 1] += fine.coord[i * 3 + 1];
            csum[cl * 3 + 2] += fine.coord[i * 3 + 2];
            ccnt[cl]++;
        }
    }
    for (int64_t c = 0; c < m; c++) {
        int64_t k = ccnt[c] ? ccnt[c] : 1;
        coarse.coord[c * 3] = (float)(csum[c * 3] / k);
        coarse.coord[c * 3 + 1] = (float)(csum[c * 3 + 1] / k);
        coarse.coord[c * 3 + 2] = (float)(csum[c * 3 + 2] / k);
    }
}

}  // namespace

extern "C" {

// Full PTv3 geometry plan for one fixed-capacity batch shard.
//
// Inputs:
//   grid_coord [n0*3] int32 (already clipped to [0, 2^depth-1])
//   batch      [n0]   int32 scene id, -1 padding
//   coord      [n0*3] float or NULL
//   segment    [n0]   int32 or NULL
//   num_scenes B, depth, num_stages S (<=8), num_orders O (<=4)
//   order_ids  [O] int32 (0=z 1=z-trans 2=hilbert 3=hilbert-trans)
//   stage_caps [S], patch_sizes [S], patch_caps [S] (P_s, python-computed)
//   strides    [S-1] (must be 2 — pdepth 1 per stage)
//   stem_kernel 5 to emit nbr_stem, 0 to skip
//   shuffle_seed: 0 = no order shuffle; else per-stage Fisher-Yates of orders
//
// Outputs (all preallocated by the caller):
//   nbr_stem   [n0*125] or NULL
//   nbr3       array of S pointers, nbr3[s] = [caps[s]*27]
//   slot2pt    array of S*O pointers, slot2pt[s*O+oi] = [patch_caps[s]]
//   pt2slot    array of S*O pointers, pt2slot[s*O+oi] = [caps[s]]
//   pool_cluster array of S-1 pointers, [caps[s-1]] (values in [0, caps[s]])
//   pool_grid    array of S-1 pointers, [caps[s]*3]
//   pool_batch   array of S-1 pointers, [caps[s]]
//   pool_segment array of S-1 pointers, [caps[s]] (or NULLs)
//   pool_coord   array of S-1 pointers, [caps[s]*3] float (or NULLs)
// Returns 0 on success.
int ptv3_geometry(const int32_t* grid_coord, const int32_t* batch, const float* coord,
                  const int32_t* segment, int64_t n0, int32_t num_scenes, int32_t depth,
                  int32_t num_stages, int32_t num_orders, const int32_t* order_ids,
                  const int64_t* stage_caps, const int32_t* patch_sizes,
                  const int64_t* patch_caps, const int32_t* strides, int32_t stem_kernel,
                  uint64_t shuffle_seed, int32_t* nbr_stem, int32_t** nbr3,
                  int32_t** slot2pt, int32_t** pt2slot, int32_t** pool_cluster,
                  int32_t** pool_grid, int32_t** pool_batch, int32_t** pool_segment,
                  float** pool_coord) {
    if (num_stages > 8 || num_orders > 4) return 1;
    for (int s = 0; s + 1 < num_stages; s++)
        if (strides[s] != 2) return 2;

    StageState st;
    st.cap = n0;
    st.depth = depth;
    st.grid.assign(grid_coord, grid_coord + n0 * 3);
    st.batch.assign(batch, batch + n0);
    if (segment) st.segment.assign(segment, segment + n0);
    if (coord) st.coord.assign(coord, coord + n0 * 3);

    uint64_t rng = shuffle_seed;
    std::vector<int> perm(num_orders);

    auto shuffle_orders = [&](StageState& s) {
        if (!shuffle_seed) return;
        for (int i = 0; i < num_orders; i++) perm[i] = i;
        for (int i = num_orders - 1; i > 0; i--) {
            int j = (int)(splitmix64(rng) % (uint64_t)(i + 1));
            std::swap(perm[i], perm[j]);
        }
        std::vector<std::vector<uint64_t>> c(num_orders);
        std::vector<std::vector<int32_t>> o(num_orders), v(num_orders);
        for (int i = 0; i < num_orders; i++) {
            c[i] = std::move(s.codes[perm[i]]);
            if (!s.order.empty()) {
                o[i] = std::move(s.order[perm[i]]);
                v[i] = std::move(s.inverse[perm[i]]);
            }
        }
        s.codes = std::move(c);
        if (!o[0].empty()) {
            s.order = std::move(o);
            s.inverse = std::move(v);
        }
    };

    compute_codes(st, num_orders, order_ids);
    sort_orders(st, num_orders);
    shuffle_orders(st);

    for (int s = 0; s < num_stages; s++) {
        if ((int64_t)st.cap != stage_caps[s]) return 3;
        // neighbor maps (stem k5 shares the stage-0 hash)
        VoxelHash hash;
        hash.build(st.grid.data(), st.batch.data(), st.cap);
        if (s == 0 && stem_kernel == 5 && nbr_stem) {
            // build k5; the k3 map is a column subset (k3_columns_of_k5) but we
            // emit both for simplicity — probes are cheap on the host
            subm_neighbor_map(st.grid.data(), st.batch.data(), st.cap, st.depth, 5, hash,
                              nbr_stem);
        }
        subm_neighbor_map(st.grid.data(), st.batch.data(), st.cap, st.depth, 3, hash, nbr3[s]);
        // patch partitions per order
        for (int oi = 0; oi < num_orders; oi++) {
            patch_partition(st, oi, patch_sizes[s], num_scenes, patch_caps[s],
                            slot2pt[s * num_orders + oi], pt2slot[s * num_orders + oi]);
        }
        if (s + 1 < num_stages) {
            StageState coarse;
            pool_stage(st, /*pdepth=*/1, stage_caps[s + 1], coarse, pool_cluster[s],
                       num_orders);
            sort_orders(coarse, num_orders);
            shuffle_orders(coarse);
            std::memcpy(pool_grid[s], coarse.grid.data(), sizeof(int32_t) * coarse.cap * 3);
            std::memcpy(pool_batch[s], coarse.batch.data(), sizeof(int32_t) * coarse.cap);
            if (pool_segment && pool_segment[s])
                std::memcpy(pool_segment[s], coarse.segment.data(), sizeof(int32_t) * coarse.cap);
            if (pool_coord && pool_coord[s])
                std::memcpy(pool_coord[s], coarse.coord.data(), sizeof(float) * coarse.cap * 3);
            st = std::move(coarse);
        }
    }
    return 0;
}

// Standalone SubM neighbor map (SpUNet stages / tests).
int subm_map(const int32_t* grid_coord, const int32_t* batch, int64_t n, int32_t depth,
             int32_t kernel, int32_t* out) {
    VoxelHash hash;
    hash.build(grid_coord, batch, n);
    subm_neighbor_map(grid_coord, batch, n, depth, kernel, hash, out);
    return 0;
}

// Standalone serialization (orders + inverses) for tests / other models.
int serialize_orders(const int32_t* grid_coord, const int32_t* batch, int64_t n,
                     int32_t depth, int32_t num_orders, const int32_t* order_ids,
                     int32_t* order_out, int32_t* inverse_out) {
    StageState st;
    st.cap = n;
    st.depth = depth;
    st.grid.assign(grid_coord, grid_coord + n * 3);
    st.batch.assign(batch, batch + n);
    compute_codes(st, num_orders, order_ids);
    sort_orders(st, num_orders);
    for (int oi = 0; oi < num_orders; oi++) {
        std::memcpy(order_out + oi * n, st.order[oi].data(), sizeof(int32_t) * n);
        std::memcpy(inverse_out + oi * n, st.inverse[oi].data(), sizeof(int32_t) * n);
    }
    return 0;
}

}  // extern "C"
