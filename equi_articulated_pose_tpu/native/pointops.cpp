// Native data-engine kernels (CPU).
//
// The reference implements its point ops as CUDA extensions
// (vgtk/vgtk/cuda/*); on TPU the device-side equivalents are XLA/Pallas, but
// the HOST data pipeline (SURVEY.md §3.4: mesh sampling + FPS per sample) is
// the throughput bottleneck of the input pipeline.  This translation unit
// provides the hot host ops as a small C library consumed via ctypes
// (pointops.py), with a pure-numpy fallback when the .so is unavailable.
//
// Build: make -C equi_articulated_pose_tpu/native
#include <cstdint>
#include <cmath>
#include <cstring>
#include <random>

extern "C" {

// Greedy farthest point sampling.
//   pts:  [n, 3] float32
//   out:  [m] int32 (first index = start)
// Points with squared norm <= 1e-3 are never selected (shadow guard,
// matching the reference CUDA kernel grouping_cuda_kernel.cu:369-371).
void eap_fps(const float* pts, int64_t n, int64_t m, int32_t start,
             int32_t skip_shadow, int32_t* out) {
    if (n <= 0 || m <= 0) return;
    float* dist = new float[n];
    bool* valid = new bool[n];
    for (int64_t i = 0; i < n; ++i) {
        const float* p = pts + 3 * i;
        valid[i] = !skip_shadow ||
                   (p[0] * p[0] + p[1] * p[1] + p[2] * p[2]) > 1e-3f;
        dist[i] = 1e30f;
    }
    int32_t cur = start;
    out[0] = cur;
    for (int64_t k = 1; k < m; ++k) {
        const float cx = pts[3 * cur], cy = pts[3 * cur + 1],
                    cz = pts[3 * cur + 2];
        float best = -1e30f;
        int32_t best_i = 0;
        for (int64_t i = 0; i < n; ++i) {
            const float dx = pts[3 * i] - cx;
            const float dy = pts[3 * i + 1] - cy;
            const float dz = pts[3 * i + 2] - cz;
            const float d = dx * dx + dy * dy + dz * dz;
            if (d < dist[i]) dist[i] = d;
            const float score = valid[i] ? dist[i] : -1e30f;
            if (score > best) {
                best = score;
                best_i = (int32_t)i;
            }
        }
        cur = best_i;
        out[k] = cur;
    }
    delete[] dist;
    delete[] valid;
}

// Batched FPS: pts [b, n, 3] -> out [b, m]
void eap_fps_batch(const float* pts, int64_t b, int64_t n, int64_t m,
                   int32_t* out) {
    for (int64_t i = 0; i < b; ++i) {
        eap_fps(pts + i * n * 3, n, m, 0, 0, out + i * m);
    }
}

// Area-weighted barycentric surface sampling.
//   verts [nv,3] f64, tris [nt,3] i64, tri_seg [nt] i64
//   counts[nt] precomputed samples per triangle (sum = total)
//   out_pts [total,3] f64, out_seg [total] i64
void eap_sample_mesh(const double* verts, const int64_t* tris,
                     const int64_t* tri_seg, const int64_t* counts,
                     int64_t nt, uint64_t seed, double* out_pts,
                     int64_t* out_seg) {
    std::mt19937_64 gen(seed);
    std::uniform_real_distribution<double> uni(0.0, 1.0);
    int64_t w = 0;
    for (int64_t t = 0; t < nt; ++t) {
        const double* a = verts + 3 * tris[3 * t];
        const double* b = verts + 3 * tris[3 * t + 1];
        const double* c = verts + 3 * tris[3 * t + 2];
        const int64_t seg = tri_seg[t];
        for (int64_t s = 0; s < counts[t]; ++s) {
            const double su = std::sqrt(uni(gen));
            const double v = uni(gen);
            const double w0 = 1.0 - su, w1 = su * (1.0 - v), w2 = su * v;
            out_pts[3 * w] = a[0] * w0 + b[0] * w1 + c[0] * w2;
            out_pts[3 * w + 1] = a[1] * w0 + b[1] * w1 + c[1] * w2;
            out_pts[3 * w + 2] = a[2] * w0 + b[2] * w1 + c[2] * w2;
            out_seg[w] = seg;
            ++w;
        }
    }
}

// Brute-force ball query with reference pad-by-repeat semantics.
//   query [m,3], support [n,3] f32 -> idx [m, k] i32
void eap_ball_query(const float* query, const float* support, int64_t m,
                    int64_t n, float radius, int64_t k, int32_t* idx) {
    const float r2 = radius * radius;
    for (int64_t i = 0; i < m; ++i) {
        const float qx = query[3 * i], qy = query[3 * i + 1],
                    qz = query[3 * i + 2];
        int64_t cnt = 0;
        int32_t* row = idx + i * k;
        for (int64_t j = 0; j < n && cnt < k; ++j) {
            const float dx = support[3 * j] - qx;
            const float dy = support[3 * j + 1] - qy;
            const float dz = support[3 * j + 2] - qz;
            if (dx * dx + dy * dy + dz * dz < r2) {
                if (cnt == 0)
                    for (int64_t l = 0; l < k; ++l) row[l] = (int32_t)j;
                row[cnt++] = (int32_t)j;
            }
        }
        if (cnt == 0)
            for (int64_t l = 0; l < k; ++l) row[l] = 0;
    }
}

}  // extern "C"
