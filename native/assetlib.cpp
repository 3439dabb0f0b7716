// Native asset/runtime library for vulkan_renderer_tpu.
//
// The reference implements its runtime layer in C (vulkan_basics.c,
// scene.c, textures.c); the TPU rebuild keeps the compute path in
// JAX/XLA but implements the host-side hot loops natively too:
//   - BC1/BC5 block decoding (texture load, textures.c equivalent)
//   - Morton codes + BVH leaf/level AABB reductions (scene load,
//     the CPU half of create_acceleration_structure, scene.c:142-406)
//   - .vks mesh dequantization (scene.c:176-187)
//
// Built as a plain shared library; Python binds via ctypes
// (native/build.sh). Every entry point has a numpy fallback in the
// Python packages, so the framework works without the library, just
// with slower scene loads.

#include <cstdint>
#include <cstring>
#include <cmath>
#include <algorithm>

extern "C" {

// ---------------------------------------------------------------------------
// BC1 decode: blocks -> RGB float32. width/height in texels.
// ---------------------------------------------------------------------------
void decode_bc1(const uint8_t* blocks, int width, int height, float* out_rgb) {
    const int bw = (width + 3) / 4, bh = (height + 3) / 4;
    for (int by = 0; by < bh; ++by) {
        for (int bx = 0; bx < bw; ++bx) {
            const uint8_t* b = blocks + (by * bw + bx) * 8;
            const uint16_t c0 = (uint16_t)(b[0] | (b[1] << 8));
            const uint16_t c1 = (uint16_t)(b[2] | (b[3] << 8));
            const uint32_t indices =
                (uint32_t)b[4] | ((uint32_t)b[5] << 8) |
                ((uint32_t)b[6] << 16) | ((uint32_t)b[7] << 24);
            float pal[4][3];
            const float r0 = ((c0 >> 11) & 31) / 31.0f;
            const float g0 = ((c0 >> 5) & 63) / 63.0f;
            const float b0 = (c0 & 31) / 31.0f;
            const float r1 = ((c1 >> 11) & 31) / 31.0f;
            const float g1 = ((c1 >> 5) & 63) / 63.0f;
            const float b1 = (c1 & 31) / 31.0f;
            pal[0][0] = r0; pal[0][1] = g0; pal[0][2] = b0;
            pal[1][0] = r1; pal[1][1] = g1; pal[1][2] = b1;
            if (c0 > c1) {
                for (int c = 0; c < 3; ++c) {
                    pal[2][c] = (2.0f * pal[0][c] + pal[1][c]) / 3.0f;
                    pal[3][c] = (pal[0][c] + 2.0f * pal[1][c]) / 3.0f;
                }
            } else {
                for (int c = 0; c < 3; ++c) {
                    pal[2][c] = 0.5f * (pal[0][c] + pal[1][c]);
                    pal[3][c] = 0.0f;
                }
            }
            for (int t = 0; t < 16; ++t) {
                const int x = bx * 4 + (t & 3);
                const int y = by * 4 + (t >> 2);
                if (x >= width || y >= height) continue;
                const int idx = (indices >> (2 * t)) & 3;
                float* dst = out_rgb + (y * (size_t)width + x) * 3;
                dst[0] = pal[idx][0];
                dst[1] = pal[idx][1];
                dst[2] = pal[idx][2];
            }
        }
    }
}

// ---------------------------------------------------------------------------
// BC5 decode: blocks -> RG float32.
// ---------------------------------------------------------------------------
static inline void decode_bc4_channel(const uint8_t* sub, float* out,
                                      int stride) {
    const float lo = sub[0] / 255.0f, hi = sub[1] / 255.0f;
    uint64_t bits = 0;
    for (int i = 0; i < 6; ++i) bits |= (uint64_t)sub[2 + i] << (8 * i);
    float pal[8];
    pal[0] = lo; pal[1] = hi;
    if (sub[0] > sub[1]) {
        for (int i = 2; i < 8; ++i)
            pal[i] = ((8 - i) * lo + (i - 1) * hi) / 7.0f;
    } else {
        for (int i = 2; i < 6; ++i)
            pal[i] = ((6 - i) * lo + (i - 1) * hi) / 5.0f;
        pal[6] = 0.0f; pal[7] = 1.0f;
    }
    for (int t = 0; t < 16; ++t)
        out[t * stride] = pal[(bits >> (3 * t)) & 7];
}

void decode_bc5(const uint8_t* blocks, int width, int height, float* out_rg) {
    const int bw = (width + 3) / 4, bh = (height + 3) / 4;
    float texels[16 * 2];
    for (int by = 0; by < bh; ++by) {
        for (int bx = 0; bx < bw; ++bx) {
            const uint8_t* b = blocks + (by * bw + bx) * 16;
            decode_bc4_channel(b, texels, 2);
            decode_bc4_channel(b + 8, texels + 1, 2);
            for (int t = 0; t < 16; ++t) {
                const int x = bx * 4 + (t & 3);
                const int y = by * 4 + (t >> 2);
                if (x >= width || y >= height) continue;
                float* dst = out_rg + (y * (size_t)width + x) * 2;
                dst[0] = texels[t * 2];
                dst[1] = texels[t * 2 + 1];
            }
        }
    }
}

// ---------------------------------------------------------------------------
// 21-bit packed position dequantization (mesh_quantization.glsl:38-45).
// positions: count * 2 uint32; out: count * 3 float32.
// ---------------------------------------------------------------------------
void dequantize_positions(const uint32_t* packed, int64_t count,
                          const float* factor, const float* summand,
                          float* out) {
    for (int64_t i = 0; i < count; ++i) {
        const uint64_t combined =
            (uint64_t)packed[2 * i] | ((uint64_t)packed[2 * i + 1] << 32);
        const float x = (float)(combined & 0x1FFFFF);
        const float y = (float)((combined >> 21) & 0x1FFFFF);
        const float z = (float)((combined >> 42) & 0x1FFFFF);
        out[3 * i + 0] = x * factor[0] + summand[0];
        out[3 * i + 1] = y * factor[1] + summand[1];
        out[3 * i + 2] = z * factor[2] + summand[2];
    }
}

// ---------------------------------------------------------------------------
// Morton codes of triangle centroids (exporter :459-469 semantics).
// tris: count * 9 float32 (three vertices); out: count uint64.
// ---------------------------------------------------------------------------
static inline uint64_t spread21(uint64_t v) {
    v &= 0x1FFFFF;
    v = (v | (v << 32)) & 0x1F00000000FFFFull;
    v = (v | (v << 16)) & 0x1F0000FF0000FFull;
    v = (v | (v << 8)) & 0x100F00F00F00F00Full;
    v = (v | (v << 4)) & 0x10C30C30C30C30C3ull;
    v = (v | (v << 2)) & 0x1249249249249249ull;
    return v;
}

void morton_codes(const float* tris, int64_t count, const float* box_min,
                  const float* box_max, uint64_t* out) {
    float ext[3];
    for (int c = 0; c < 3; ++c) {
        ext[c] = box_max[c] - box_min[c];
        if (ext[c] < 1e-30f) ext[c] = 1e-30f;
    }
    const float max_code = (float)((1 << 21) - 1);
    for (int64_t i = 0; i < count; ++i) {
        const float* t = tris + 9 * i;
        uint64_t q[3];
        for (int c = 0; c < 3; ++c) {
            const float centroid = (t[c] + t[3 + c] + t[6 + c]) / 3.0f;
            float u = (centroid - box_min[c]) / ext[c] * max_code;
            if (u < 0.0f) u = 0.0f;
            if (u > max_code) u = max_code;
            q[c] = (uint64_t)u;
        }
        out[i] = spread21(q[0]) | (spread21(q[1]) << 1) | (spread21(q[2]) << 2);
    }
}

// ---------------------------------------------------------------------------
// BVH leaf AABBs + bottom-up level reduction (the numpy build's hot loops).
// tri_lo/tri_hi: t_count * 3. leaf AABBs for padded_leaves chunks of
// leaf_size triangles; padding gets +inf/-inf boxes.
// ---------------------------------------------------------------------------
void bvh_leaf_aabbs(const float* tri_lo, const float* tri_hi, int64_t t_count,
                    int64_t padded_leaves, int leaf_size,
                    float* leaf_lo, float* leaf_hi) {
    for (int64_t l = 0; l < padded_leaves; ++l) {
        float lo[3] = {INFINITY, INFINITY, INFINITY};
        float hi[3] = {-INFINITY, -INFINITY, -INFINITY};
        const int64_t start = l * leaf_size;
        const int64_t end = std::min<int64_t>(start + leaf_size, t_count);
        for (int64_t i = start; i < end; ++i) {
            for (int c = 0; c < 3; ++c) {
                lo[c] = std::min(lo[c], tri_lo[3 * i + c]);
                hi[c] = std::max(hi[c], tri_hi[3 * i + c]);
            }
        }
        for (int c = 0; c < 3; ++c) {
            leaf_lo[3 * l + c] = lo[c];
            leaf_hi[3 * l + c] = hi[c];
        }
    }
}

void bvh_reduce_level(const float* child_lo, const float* child_hi,
                      int64_t parent_count, float* out_lo, float* out_hi) {
    for (int64_t p = 0; p < parent_count; ++p) {
        for (int c = 0; c < 3; ++c) {
            out_lo[3 * p + c] = std::min(child_lo[6 * p + c],
                                         child_lo[6 * p + 3 + c]);
            out_hi[3 * p + c] = std::max(child_hi[6 * p + c],
                                         child_hi[6 * p + 3 + c]);
        }
    }
}

}  // extern "C"
