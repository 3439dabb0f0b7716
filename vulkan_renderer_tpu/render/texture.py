"""Texture sampling without texture units.

TPU has no samplers, so all textures in a scene are decoded to float at
load time, flattened into one big texel array ("atlas"), and filtered by
explicit gathers:

- trilinear mip filtering with the LOD picked from the analytic
  screen-space derivatives that the shading pass computes
  (shading_pass.frag.glsl:754-766 feeds textureGrad; we reproduce
  the footprint-based LOD of the Vulkan spec's isotropic path),
- wrap (repeat) addressing like the reference's material sampler
  (scene.c:546-557), or clamp for LTC tables.

All arrays live in HBM; gathers are XLA dynamic-gathers. A Pallas
DMA-based path can replace this later if profiling demands it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class TextureAtlas(NamedTuple):
    texels: jnp.ndarray      # (N, C) float32/uint16, all mips of all textures
    mip_offset: jnp.ndarray  # (T, L) int32 start index of mip l of texture t
    mip_width: jnp.ndarray   # (T, L) int32
    mip_height: jnp.ndarray  # (T, L) int32
    mip_count: jnp.ndarray   # (T,) int32
    # Optional (N, 4C) corner-quad view: texel (y, x) holds the four
    # bilinear corners [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] with REPEAT
    # wrapping precomputed per mip. One row gather then serves a whole
    # bilinear fetch — gathers pay per ROW on TPU (~37 ms per 518k rows
    # on v5e regardless of row bytes), so this turns trilinear from 8
    # gathers into 2.
    quad: jnp.ndarray | None = None

    @property
    def max_levels(self) -> int:
        return self.mip_offset.shape[-1]


def build_texture_atlas(textures: "list[list[np.ndarray]]",
                        channels: int = 4,
                        dtype=np.float32) -> TextureAtlas:
    """textures: per texture, list of (H, W, C) float32 mips.

    dtype=np.uint16 stores texels as UNORM16 (dequantized after the
    per-pixel gather): HALF the HBM gather traffic, and lossless for
    material data — the reference's material textures are 8-bit BC
    blocks (textures.c formats), so their decoded values fit u16
    exactly. Keep float32 for HDR content (light probes)."""
    texel_list = []
    offsets, widths, heights, counts = [], [], [], []
    max_levels = max(len(mips) for mips in textures)
    cursor = 0
    for mips in textures:
        off, ws, hs = [], [], []
        for m in mips:
            h, w = m.shape[:2]
            flat = np.zeros((h * w, channels), np.float32)
            c = min(channels, m.shape[-1])
            flat[:, :c] = m.reshape(h * w, -1)[:, :c]
            if channels == 4 and m.shape[-1] < 4:
                flat[:, 3] = 1.0
            texel_list.append(flat)
            off.append(cursor)
            ws.append(w)
            hs.append(h)
            cursor += h * w
        # Pad level tables by repeating the last mip.
        while len(off) < max_levels:
            off.append(off[-1])
            ws.append(ws[-1])
            hs.append(hs[-1])
        offsets.append(off)
        widths.append(ws)
        heights.append(hs)
        counts.append(len(mips))
    all_texels = np.concatenate(texel_list, axis=0)
    if np.issubdtype(dtype, np.integer):
        all_texels = np.round(np.clip(all_texels, 0.0, 1.0)
                              * 65535.0).astype(dtype)
    # Corner-quad view (see TextureAtlas.quad): built per mip with REPEAT
    # wrapping, flattened in the same order as texels. 4x the atlas memory
    # — skipped for very large atlases where HBM matters more than the
    # extra gather rows.
    quad_arr = None
    if all_texels.shape[0] <= 32 * 1024 * 1024:
        quads = []
        cursor = 0
        for mips in textures:
            for m in mips:
                h, w = m.shape[:2]
                block = all_texels[cursor:cursor + h * w].reshape(h, w, -1)
                qx = np.roll(block, -1, axis=1)
                qy = np.roll(block, -1, axis=0)
                qxy = np.roll(qy, -1, axis=1)
                quads.append(np.concatenate([block, qx, qy, qxy], axis=-1)
                             .reshape(h * w, -1))
                cursor += h * w
        quad_arr = jnp.asarray(np.concatenate(quads, axis=0))
    return TextureAtlas(
        texels=jnp.asarray(all_texels),
        mip_offset=jnp.asarray(np.array(offsets, np.int32)),
        mip_width=jnp.asarray(np.array(widths, np.int32)),
        mip_height=jnp.asarray(np.array(heights, np.int32)),
        mip_count=jnp.asarray(np.array(counts, np.int32)),
        quad=quad_arr,
    )


def _bilinear_wrap(atlas: TextureAtlas, tex_index, level, uv):
    """Bilinear fetch with repeat addressing at a given mip level: one
    quad-row gather when the atlas carries the precomputed corner view,
    otherwise four texel gathers."""
    w = atlas.mip_width[tex_index, level]
    h = atlas.mip_height[tex_index, level]
    offset = atlas.mip_offset[tex_index, level]
    wf = w.astype(jnp.float32)
    hf = h.astype(jnp.float32)
    x = uv[..., 0] * wf - 0.5
    y = uv[..., 1] * hf - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def norm(t):
        if jnp.issubdtype(t.dtype, jnp.integer):
            t = t.astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
        return t

    if atlas.quad is not None:
        c = atlas.texels.shape[-1]
        q = norm(atlas.quad[offset + jnp.mod(y0i, h) * w + jnp.mod(x0i, w)])
        t00, t10 = q[..., 0:c], q[..., c:2 * c]
        t01, t11 = q[..., 2 * c:3 * c], q[..., 3 * c:4 * c]
    else:
        def fetch(xi, yi):
            xi = jnp.mod(xi, w)
            yi = jnp.mod(yi, h)
            return norm(atlas.texels[offset + yi * w + xi])

        t00 = fetch(x0i, y0i)
        t10 = fetch(x0i + 1, y0i)
        t01 = fetch(x0i, y0i + 1)
        t11 = fetch(x0i + 1, y0i + 1)
    top = t00 + fx[..., None] * (t10 - t00)
    bottom = t01 + fx[..., None] * (t11 - t01)
    return top + fy[..., None] * (bottom - top)


def _trilinear(atlas: TextureAtlas, tex_index, uv, lod):
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, atlas.mip_count[tex_index] - 1)
    frac = lod - l0.astype(jnp.float32)
    c0 = _bilinear_wrap(atlas, tex_index, l0, uv)
    c1 = _bilinear_wrap(atlas, tex_index, l1, uv)
    return c0 + frac[..., None] * (c1 - c0)


def sample_texture_grad(atlas: TextureAtlas, tex_index, uv, duv_dx, duv_dy,
                        max_anisotropy: int = 1):
    """textureGrad equivalent.

    max_anisotropy=1: trilinear with the isotropic footprint LOD (Vulkan
    spec rho = max of scaled derivative norms). max_anisotropy>1: the
    Vulkan anisotropic model the reference's material sampler enables
    (scene.c:546-557, maxAnisotropy=16): N = clamp(rho_max/rho_min, 1, A)
    taps spaced along the MAJOR footprint axis, each a trilinear fetch at
    lod = log2(rho_max/N) — sharper at grazing angles than the isotropic
    blur. N is static (unrolled); taps beyond the per-pixel ratio merge
    onto the footprint center via offset scaling, matching the spec's
    "implementation may round N" latitude."""
    w0 = atlas.mip_width[tex_index, 0].astype(jnp.float32)
    h0 = atlas.mip_height[tex_index, 0].astype(jnp.float32)
    scale = jnp.stack([w0, h0], axis=-1)
    dx = duv_dx[..., :2] * scale
    dy = duv_dy[..., :2] * scale
    rho_x = jnp.sqrt(jnp.sum(dx * dx, axis=-1))
    rho_y = jnp.sqrt(jnp.sum(dy * dy, axis=-1))
    rho_max = jnp.maximum(jnp.maximum(rho_x, rho_y), 1e-12)
    max_level = (atlas.mip_count[tex_index] - 1).astype(jnp.float32)
    if max_anisotropy <= 1:
        lod = jnp.clip(jnp.log2(rho_max), 0.0, max_level)
        return _trilinear(atlas, tex_index, uv, lod)
    rho_min = jnp.maximum(jnp.minimum(rho_x, rho_y), 1e-12)
    eta = jnp.minimum(rho_max / rho_min, float(max_anisotropy))
    lod = jnp.clip(jnp.log2(rho_max / eta), 0.0, max_level)
    # Major axis in UV space (unscaled derivatives).
    major_is_x = rho_x >= rho_y
    major = jnp.where(major_is_x[..., None], duv_dx[..., :2],
                      duv_dy[..., :2])
    taps = int(max_anisotropy)
    # Tap centers at (i+0.5)/eta' - 0.5 of the major axis with eta' = eta;
    # compress the fixed tap ladder into the actual [−1/2, 1/2]·(1−1/eta)
    # span so eta < taps degrades smoothly toward the footprint center.
    out = None
    for i in range(taps):
        t = (i + 0.5) / taps - 0.5
        offs = major * (t * (1.0 - 1.0 / eta) * 2.0)[..., None]
        c = _trilinear(atlas, tex_index, uv + offs, lod)
        out = c if out is None else out + c
    return out / taps


def sample_texture_lod0(atlas: TextureAtlas, tex_index, uv):
    """textureLod(.., 0) equivalent (used for light textures)."""
    return _bilinear_wrap(atlas, tex_index, jnp.int32(0), uv)
