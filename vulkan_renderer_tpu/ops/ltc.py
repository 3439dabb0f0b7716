"""Linearly transformed cosines: coefficient fetch + density evaluation.

TPU-native re-implementation of src/shaders/ltc_utility.glsl:15-119. The
reference fetches two bilinearly-filtered texture arrays; TPU has no texture
units, so the fetch is an explicit bilinear gather over (fresnel, incl,
rough, channel) arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .math_utils import F32, M_HALF_PI, normalize


class LtcConstants(NamedTuple):
    """Texture-coordinate transform constants (reference: ltc_table.c:184-192)."""
    fresnel_index_factor: jnp.ndarray
    fresnel_index_summand: jnp.ndarray
    roughness_factor: jnp.ndarray
    roughness_summand: jnp.ndarray
    inclination_factor: jnp.ndarray
    inclination_summand: jnp.ndarray


class LtcTable(NamedTuple):
    """Dequantized LTC fit tables, merged for a single bilinear fetch.

    table: (F, I, R, 6) float32 — (m00, m02_neg, m11, m20, m22, albedo):
        channels 0-3 are the reference's RGBA16 texture, channels 4-5 its
        RG16 texture (ltc_table.c:86-116); merging halves the gather count
        on TPU where both were always fetched together.
    constants: LtcConstants.
    """
    table: jnp.ndarray
    constants: LtcConstants
    # Optional precomputed corner-quad view (L, H, W, 24): channels are
    # the four bilinear corners [(y,x), (y,x+1), (y+1,x), (y+1,x+1)] with
    # clamp-to-edge, so the per-pixel fetch is ONE row gather instead of
    # four (gathers pay per row on TPU). Built by make_quad_table at scene
    # load; None falls back to the 4-gather path.
    quad: jnp.ndarray | None = None


def make_quad_table(table: jnp.ndarray) -> jnp.ndarray:
    """(L, H, W, C) -> (L, H, W, 4C) clamp-to-edge corner quads."""
    tx = jnp.concatenate([table[:, :, 1:], table[:, :, -1:]], axis=2)
    ty = jnp.concatenate([table[:, 1:], table[:, -1:]], axis=1)
    txy = jnp.concatenate([ty[:, :, 1:], ty[:, :, -1:]], axis=2)
    return jnp.concatenate([table, tx, ty, txy], axis=-1)


class LtcCoefficients(NamedTuple):
    """Per-pixel LTC frame + transform (reference: ltc_utility.glsl:28-50)."""
    world_to_shading_space: jnp.ndarray  # (3, 4) rotation|translation
    shading_to_cosine_space: jnp.ndarray  # (3, 3)
    world_to_cosine_space: jnp.ndarray    # (3, 4)
    cosine_to_shading_space: jnp.ndarray  # (3, 3)
    albedo: jnp.ndarray                   # ()
    shading_to_cosine_space_determinant: jnp.ndarray  # ()


def _bilinear_fetch(table, texcoord_x, texcoord_y, layer, quad=None):
    """Bilinear clamp-to-edge lookup in a (L, H, W, C) array; texcoords in
    [0,1] address texel centers at (i+0.5)/N like Vulkan samplers; the layer
    is rounded to nearest (the reference picks the layer via integer-valued
    texcoord on an array texture). With `quad` (see make_quad_table) all
    four corners come from a single row gather."""
    layers, height, width = table.shape[0], table.shape[1], table.shape[2]
    c = table.shape[-1]
    x = jnp.clip(texcoord_x * width - 0.5, 0.0, width - 1.0)
    y = jnp.clip(texcoord_y * height - 0.5, 0.0, height - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(F32)
    fy = y - y0.astype(F32)
    li = jnp.clip(jnp.round(layer).astype(jnp.int32), 0, layers - 1)
    if quad is not None:
        q = quad[li, y0, x0]
        t00, t01 = q[..., 0:c], q[..., c:2 * c]
        t10, t11 = q[..., 2 * c:3 * c], q[..., 3 * c:4 * c]
    else:
        x1 = jnp.minimum(x0 + 1, width - 1)
        y1 = jnp.minimum(y0 + 1, height - 1)
        t00 = table[li, y0, x0]
        t01 = table[li, y0, x1]
        t10 = table[li, y1, x0]
        t11 = table[li, y1, x1]
    top = t00 + fx[..., None] * (t01 - t00)
    bottom = t10 + fx[..., None] * (t11 - t10)
    return top + fy[..., None] * (bottom - top)


def get_ltc_coefficients(table: LtcTable, fresnel_0, roughness,
                         world_position, world_normal, world_outgoing):
    """Fetch and assemble LTC coefficients (ltc_utility.glsl:58-91)."""
    c = table.constants
    normal_dot_outgoing = jnp.sum(world_normal * world_outgoing, axis=-1)
    inclination = jnp.arccos(jnp.clip(normal_dot_outgoing, 0.0, 1.0))
    tex_x = jnp.sqrt(jnp.clip(roughness, 0.0, 1.0)) * c.roughness_factor \
        + c.roughness_summand
    tex_y = inclination * c.inclination_factor + c.inclination_summand
    layer = jnp.clip(fresnel_0, 0.0, 1.0) * c.fresnel_index_factor \
        + c.fresnel_index_summand

    data = _bilinear_fetch(table.table, tex_x, tex_y, layer,
                           quad=table.quad)
    data_0 = data[..., 0:4]
    data_1 = data[..., 4:6]

    # shading_to_cosine_space (column-major in GLSL):
    #   [ d0x  0  d0w ]
    #   [  0  d0z  0  ]
    #   [-d0y  0  d1x ]
    m = jnp.stack([
        jnp.stack([data_0[..., 0], jnp.zeros_like(data_0[..., 0]), data_0[..., 3]], axis=-1),
        jnp.stack([jnp.zeros_like(data_0[..., 0]), data_0[..., 2], jnp.zeros_like(data_0[..., 0])], axis=-1),
        jnp.stack([-data_0[..., 1], jnp.zeros_like(data_0[..., 0]), data_1[..., 0]], axis=-1),
    ], axis=-2)
    albedo = data_1[..., 1]
    det_2x2 = data_0[..., 0] * data_1[..., 0] + data_0[..., 1] * data_0[..., 3]
    determinant = data_0[..., 2] * det_2x2
    inv_det_2x2 = 1.0 / det_2x2
    m_inv = jnp.stack([
        jnp.stack([data_1[..., 0] * inv_det_2x2, jnp.zeros_like(det_2x2), -data_0[..., 3] * inv_det_2x2], axis=-1),
        jnp.stack([jnp.zeros_like(det_2x2), 1.0 / data_0[..., 2], jnp.zeros_like(det_2x2)], axis=-1),
        jnp.stack([data_0[..., 1] * inv_det_2x2, jnp.zeros_like(det_2x2), data_0[..., 0] * inv_det_2x2], axis=-1),
    ], axis=-2)

    # Shading frame: x-axis in the plane of normal and outgoing.
    x_axis = normalize(-normal_dot_outgoing[..., None] * world_normal + world_outgoing)
    y_axis = jnp.cross(world_normal, x_axis)
    rotation = jnp.stack([x_axis, y_axis, world_normal], axis=-2)  # rows
    # Elementwise instead of einsum: per-pixel 3x3 "matmuls" lower to
    # batched tiny dot_generals that waste the MXU; written out they are
    # a handful of fully lane-parallel VPU mul-adds.
    translation = -jnp.stack(
        [jnp.sum(x_axis * world_position, axis=-1),
         jnp.sum(y_axis * world_position, axis=-1),
         jnp.sum(world_normal * world_position, axis=-1)], axis=-1)
    world_to_shading = jnp.concatenate([rotation, translation[..., None]], axis=-1)
    # world_to_cosine = m @ world_to_shading, exploiting m's sparsity
    # (rows: [a 0 b], [0 c 0], [-d 0 e]).
    a = data_0[..., 0:1, None]
    b = data_0[..., 3:4, None]
    cdiag = data_0[..., 2:3, None]
    dneg = data_0[..., 1:2, None]
    e = data_1[..., 0:1, None]
    ws0 = world_to_shading[..., 0:1, :]
    ws1 = world_to_shading[..., 1:2, :]
    ws2 = world_to_shading[..., 2:3, :]
    world_to_cosine = jnp.concatenate(
        [a * ws0 + b * ws2, cdiag * ws1, -dneg * ws0 + e * ws2], axis=-2)

    return LtcCoefficients(
        world_to_shading_space=world_to_shading,
        shading_to_cosine_space=m,
        world_to_cosine_space=world_to_cosine,
        cosine_to_shading_space=m_inv,
        albedo=albedo,
        shading_to_cosine_space_determinant=determinant,
    )


def evaluate_ltc_density(ltc: LtcCoefficients, dir_shading_space,
                         rcp_projected_solid_angle):
    """LTC density w.r.t. solid angle (ltc_utility.glsl:103-108)."""
    dir_cos = jnp.sum(ltc.shading_to_cosine_space
                      * dir_shading_space[..., None, :], axis=-1)
    len_sq = jnp.sum(dir_cos * dir_cos, axis=-1)
    density = jnp.maximum(0.0, dir_cos[..., 2]) \
        * ltc.shading_to_cosine_space_determinant / (len_sq * len_sq)
    return density * rcp_projected_solid_angle


def evaluate_ltc_density_inv(ltc: LtcCoefficients, dir_cosine_space,
                             rcp_projected_solid_angle):
    """Inverse-transform LTC density (ltc_utility.glsl:114-119)."""
    dir_shading = jnp.einsum("...ij,...j->...i", ltc.cosine_to_shading_space,
                             dir_cosine_space)
    len_sq = jnp.sum(dir_shading * dir_shading, axis=-1)
    density = jnp.maximum(0.0, dir_shading[..., 2]) / \
        (ltc.shading_to_cosine_space_determinant * len_sq * len_sq)
    return density * rcp_projected_solid_angle


def make_ltc_constants(fresnel_count: int, roughness_count: int,
                       inclination_count: int) -> LtcConstants:
    """Constants exactly as computed in ltc_table.c:184-192."""
    return LtcConstants(
        fresnel_index_factor=F32(fresnel_count - 1),
        fresnel_index_summand=F32(0.0),
        roughness_factor=F32((roughness_count - 1) / roughness_count),
        roughness_summand=F32(0.5 / roughness_count),
        inclination_factor=F32((inclination_count - 1)
                               / (M_HALF_PI * inclination_count)),
        inclination_summand=F32(0.5 / inclination_count),
    )
