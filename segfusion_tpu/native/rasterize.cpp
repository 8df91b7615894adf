// Headless software depth rasterizer: z-buffered triangle rasterization
// producing a depth map from (vertices, faces, intrinsics, view matrix).
//
// Native replacement for the reference's OpenGL offscreen renderer
// (reference deps/mesh-fusion/librender/offscreen.cpp:7-60,125+ --
// GL/GLUT/GLEW are unavailable on TPU hosts). Used by the offline
// watertight-mesh preprocessing pipeline to render the ~100 synthetic
// views per mesh (reference deps/mesh-fusion/2_fusion.py:99-152).
//
// Build: g++ -O3 -shared -fPIC -std=c++17 rasterize.cpp -o librasterize.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>

extern "C" {

// vertices: (n_verts, 3) float32 world coords
// faces: (n_faces, 3) int32
// view: (4, 4) row-major world->camera matrix
// K: (3, 3) row-major intrinsics (u = col, v = row; z forward, y down)
// depth_out: (h, w) float32, 0 where nothing was hit
void rasterize_depth(const float* vertices, int64_t n_verts,
                     const int32_t* faces, int64_t n_faces,
                     const float* view, const float* K,
                     int32_t h, int32_t w,
                     float znear, float zfar,
                     float* depth_out) {
    for (int64_t i = 0; i < (int64_t)h * w; ++i)
        depth_out[i] = 0.0f;

    const float fx = K[0], cx = K[2], fy = K[4], cy = K[5];

    auto cam = [&](int32_t vi, float* out) {
        const float* p = vertices + 3 * vi;
        for (int r = 0; r < 3; ++r)
            out[r] = view[4 * r] * p[0] + view[4 * r + 1] * p[1]
                   + view[4 * r + 2] * p[2] + view[4 * r + 3];
    };

    float a[3], b[3], c[3];
    for (int64_t f = 0; f < n_faces; ++f) {
        cam(faces[3 * f], a);
        cam(faces[3 * f + 1], b);
        cam(faces[3 * f + 2], c);
        if (a[2] < znear || b[2] < znear || c[2] < znear) continue;
        if (a[2] > zfar && b[2] > zfar && c[2] > zfar) continue;

        // project to pixel space
        float ua = fx * a[0] / a[2] + cx, va = fy * a[1] / a[2] + cy;
        float ub = fx * b[0] / b[2] + cx, vb = fy * b[1] / b[2] + cy;
        float uc = fx * c[0] / c[2] + cx, vc = fy * c[1] / c[2] + cy;

        int x0 = std::max(0, (int)std::floor(std::min({ua, ub, uc})));
        int x1 = std::min(w - 1, (int)std::ceil(std::max({ua, ub, uc})));
        int y0 = std::max(0, (int)std::floor(std::min({va, vb, vc})));
        int y1 = std::min(h - 1, (int)std::ceil(std::max({va, vb, vc})));
        if (x0 > x1 || y0 > y1) continue;

        // edge functions in pixel space; perspective-correct z via 1/z
        float area = (ub - ua) * (vc - va) - (uc - ua) * (vb - va);
        if (std::fabs(area) < 1e-12f) continue;
        float inv_area = 1.0f / area;
        float za = 1.0f / a[2], zb = 1.0f / b[2], zc = 1.0f / c[2];

        for (int y = y0; y <= y1; ++y) {
            for (int x = x0; x <= x1; ++x) {
                float px = x + 0.5f, py = y + 0.5f;
                float w0 = ((ub - px) * (vc - py) - (uc - px) * (vb - py))
                           * inv_area;
                float w1 = ((uc - px) * (va - py) - (ua - px) * (vc - py))
                           * inv_area;
                float w2 = 1.0f - w0 - w1;
                if (w0 < 0 || w1 < 0 || w2 < 0) continue;
                float inv_z = w0 * za + w1 * zb + w2 * zc;
                if (inv_z <= 0) continue;
                float z = 1.0f / inv_z;
                if (z < znear || z > zfar) continue;
                float& d = depth_out[(int64_t)y * w + x];
                if (d == 0.0f || z < d) d = z;
            }
        }
    }
}

}  // extern "C"
