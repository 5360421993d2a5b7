// Native host runtime for orb_slam2_map_tpu.
//
// The TPU handles the numeric hot path (extraction, matching, BA); this
// library covers the host-side stages that are C++ in the reference and
// list/loop-heavy in Python: batched Bresenham ray rasterization for 2D
// occupancy grids (reference: Examples/ROS/ORB_SLAM2/src/ros_mono_sub.cc
// processMapPts), distinctive-descriptor selection (min-median Hamming,
// reference: src/MapPoint.cc:242-307), and observer-list extraction for
// BA assembly. Exposed via a plain C ABI for ctypes.
//
// Build: native/build.sh (g++ -O3 -shared -fPIC).

#include <cstdint>
#include <cstring>
#include <algorithm>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------
// Batched Bresenham: for each endpoint, walk origin->endpoint counting
// `visited`; endpoint counts `occupied` (visited counted once by walk).
// ---------------------------------------------------------------------
void bresenham_rays(int32_t* visited, int32_t* occupied,
                    int32_t h, int32_t w,
                    int32_t ox, int32_t oz,
                    const int64_t* px, const int64_t* pz, int64_t n) {
    for (int64_t i = 0; i < n; ++i) {
        int32_t x1 = (int32_t)px[i], z1 = (int32_t)pz[i];
        int32_t x = ox, z = oz;
        int32_t dx = std::abs(x1 - x), dz = std::abs(z1 - z);
        int32_t sx = x < x1 ? 1 : -1, sz = z < z1 ? 1 : -1;
        int32_t err = dx - dz;
        while (true) {
            if (x >= 0 && x < w && z >= 0 && z < h) visited[z * w + x] += 1;
            if (x == x1 && z == z1) break;
            int32_t e2 = 2 * err;
            if (e2 > -dz) { err -= dz; x += sx; }
            if (e2 <  dx) { err += dx; z += sz; }
        }
        if (x1 >= 0 && x1 < w && z1 >= 0 && z1 < h)
            occupied[z1 * w + x1] += 1;
    }
}

// ---------------------------------------------------------------------
// Hamming distance helpers
// ---------------------------------------------------------------------
static inline int popcount256(const uint32_t* a, const uint32_t* b) {
    int d = 0;
    for (int k = 0; k < 8; ++k) d += __builtin_popcount(a[k] ^ b[k]);
    return d;
}

// Distinctive descriptor: index of the descriptor whose median Hamming
// distance to all others is minimal (FORB/MapPoint semantics).
int32_t min_median_hamming(const uint32_t* descs, int32_t n) {
    if (n <= 0) return -1;
    if (n == 1) return 0;
    std::vector<int> row(n);
    int best = 0;
    int best_med = 1 << 30;
    for (int i = 0; i < n; ++i) {
        for (int j = 0; j < n; ++j)
            row[j] = popcount256(descs + 8 * i, descs + 8 * j);
        std::nth_element(row.begin(), row.begin() + n / 2, row.end());
        int med = row[n / 2];
        if (med < best_med) { best_med = med; best = i; }
    }
    return best;
}

// Batched variant: for each of P points with obs descriptors packed in
// a CSR layout (offsets [P+1], descs [sum,8]), write the chosen
// descriptor into out [P,8].
void min_median_hamming_batch(const uint32_t* descs,
                              const int64_t* offsets, int64_t P,
                              uint32_t* out) {
    for (int64_t p = 0; p < P; ++p) {
        int64_t a = offsets[p], b = offsets[p + 1];
        int32_t n = (int32_t)(b - a);
        if (n <= 0) continue;
        int32_t best = min_median_hamming(descs + 8 * a, n);
        std::memcpy(out + 8 * p, descs + 8 * (a + best),
                    8 * sizeof(uint32_t));
    }
}

// ---------------------------------------------------------------------
// Observer-list extraction: given kf_obs [K, N] (mp id per keypoint,
// -1 = none) and a target point-id -> slot map, produce CSR lists of
// (kf, kp) observations per point slot. Used for BA problem assembly
// and point-stat updates without Python loops.
//
// obs_out must be sized >= total observations; counts sized P.
// Returns total observation count.
// ---------------------------------------------------------------------
int64_t build_observers(const int64_t* kf_obs, const uint8_t* kf_exists,
                        int64_t K, int64_t N,
                        const int64_t* slot_of_mp, int64_t M,
                        int64_t P,
                        int32_t* counts,
                        int32_t* obs_kf, int32_t* obs_kp,
                        int64_t cap) {
    std::memset(counts, 0, P * sizeof(int32_t));
    // first pass: count
    for (int64_t k = 0; k < K; ++k) {
        if (!kf_exists[k]) continue;
        const int64_t* row = kf_obs + k * N;
        for (int64_t i = 0; i < N; ++i) {
            int64_t mp = row[i];
            if (mp < 0 || mp >= M) continue;
            int64_t s = slot_of_mp[mp];
            if (s >= 0 && s < P) counts[s]++;
        }
    }
    // prefix sums into scratch offsets
    std::vector<int64_t> off(P + 1, 0);
    for (int64_t p = 0; p < P; ++p) off[p + 1] = off[p] + counts[p];
    int64_t total = off[P];
    if (total > cap) return -total;  // caller re-allocates
    std::vector<int64_t> cur(off.begin(), off.end() - 1);
    for (int64_t k = 0; k < K; ++k) {
        if (!kf_exists[k]) continue;
        const int64_t* row = kf_obs + k * N;
        for (int64_t i = 0; i < N; ++i) {
            int64_t mp = row[i];
            if (mp < 0 || mp >= M) continue;
            int64_t s = slot_of_mp[mp];
            if (s < 0 || s >= P) continue;
            int64_t o = cur[s]++;
            obs_kf[o] = (int32_t)k;
            obs_kp[o] = (int32_t)i;
        }
    }
    return total;
}

}  // extern "C"
