"""Noise access inside the shading kernel.

Re-implementation of src/shaders/noise_utility.glsl:21-117. The GLSL keeps a
stateful 4-value buffer per pixel and drips out 1-2 values per call; under
jit that state threading is pointless — the sample schedule is static, so we
precompute which (pixel, fetch_index) each random pair comes from and gather
them all at once.

get_noise_sample reproduces the exact scrambling of the reference so that
renders with the same noise tables match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32


def get_noise_sample(table, pixel, sample_index, resolution_mask,
                     texture_index_mask, noise_random_numbers):
    """Fetch 4 noise values for a pixel (noise_utility.glsl:62-73).

    table: (layers, H, W, 4) uint16 (UNORM16, normalized after the gather
    — storing the raw u16 quarters the table's HBM footprint and gather
    traffic vs f32) or float32 already in [0, 1]; pixel: (..., 2) int32
    (x, y); sample_index: scalar or (...,) uint32; noise_random_numbers:
    (4,) uint32. Returns (..., 4) float32 in [0, 1].
    """
    sample_index = jnp.asarray(sample_index, U32)
    rn = jnp.asarray(noise_random_numbers, U32)
    swap_zw = (sample_index & U32(2)) != 0
    # random_numbers = swap ? zwxy : xyzw
    r = jnp.where(swap_zw[..., None], rn[jnp.array([2, 3, 0, 1])], rn)
    shift_xyz = (sample_index & U32(1)) != 0
    # xyz = shift ? yzw : xyz
    rx = jnp.where(shift_xyz, r[..., 1], r[..., 0])
    ry = jnp.where(shift_xyz, r[..., 2], r[..., 1])
    rz = jnp.where(shift_xyz, r[..., 3], r[..., 2])
    shift = (sample_index & U32(124)) >> U32(2)
    off_x = rx >> shift
    off_y = ry >> shift
    texture_index = (rz + sample_index) & jnp.asarray(texture_index_mask, U32)
    res_mask = jnp.asarray(resolution_mask, U32)
    loc_x = (pixel[..., 0].astype(U32) + off_x) & res_mask[0]
    loc_y = (pixel[..., 1].astype(U32) + off_y) & res_mask[1]
    vals = table[texture_index.astype(jnp.int32),
                 loc_y.astype(jnp.int32),
                 loc_x.astype(jnp.int32)]
    if jnp.issubdtype(vals.dtype, jnp.integer):
        vals = vals.astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
    return vals


def get_noise_pairs(table, pixel, pair_count: int, resolution_mask,
                    texture_index_mask, noise_random_numbers):
    """All random pairs a pixel will consume, in the reference's order.

    The GLSL accessor consumes pairs (xy, zw) of consecutive 4-value
    fetches with increasing sample_index. Returns (..., pair_count, 2).
    """
    fetch_count = (pair_count + 1) // 2
    fetches = []
    for i in range(fetch_count):
        fetches.append(get_noise_sample(table, pixel, np.uint32(i),
                                        resolution_mask, texture_index_mask,
                                        noise_random_numbers))
    stacked = jnp.stack(fetches, axis=-2)  # (..., fetch_count, 4)
    pairs = stacked.reshape(stacked.shape[:-2] + (fetch_count * 2, 2))
    return pairs[..., :pair_count, :]


def _fetch_scalars(sample_index: int, texture_index_mask,
                   noise_random_numbers):
    """The per-FRAME part of get_noise_sample for a STATIC sample index:
    (off_x, off_y, texture_index) as traced uint32 scalars. The fetch
    location is (pixel + off) & resolution_mask — pixel-independent up to
    that final add, which is what makes the image-form fetch possible."""
    rn = jnp.asarray(noise_random_numbers, U32)
    if sample_index & 2:
        rn = rn[jnp.array([2, 3, 0, 1])]
    if sample_index & 1:
        rx, ry, rz = rn[1], rn[2], rn[3]
    else:
        rx, ry, rz = rn[0], rn[1], rn[2]
    shift = U32((sample_index & 124) >> 2)
    off_x = rx >> shift
    off_y = ry >> shift
    texture_index = (rz + U32(sample_index)) \
        & jnp.asarray(texture_index_mask, U32)
    return off_x, off_y, texture_index


def get_noise_image(table, width: int, height: int, pair_count: int,
                    texture_index_mask, noise_random_numbers,
                    row_offset=None):
    """The whole frame's noise pairs as ONE dense image, bit-identical to
    get_noise_pairs over the row-major pixel grid.

    The reference's scrambling (noise_utility.glsl:62-73) offsets and
    wraps the table per FRAME, not per pixel: location = (pixel + offset)
    & mask with offset/layer shared by every pixel. On TPU that makes the
    per-pixel table gather (~37 ms/frame measured round 2; the dominant
    noise cost) replaceable by a roll + tile of each fetched layer —
    dense, bandwidth-bound ops. Callers needing a non-row-major pixel
    order (the Morton frame path) apply their ONE existing reorder gather
    to the flattened result.

    Returns (height * width, pair_count, 2) float32 in [0, 1].
    """
    fetch_count = (pair_count + 1) // 2
    layers, th, tw = table.shape[0], table.shape[1], table.shape[2]
    reps_y = -(-height // th)
    reps_x = -(-width // tw)
    images = []
    for i in range(fetch_count):
        off_x, off_y, texture_index = _fetch_scalars(
            i, texture_index_mask, noise_random_numbers)
        layer = jax.lax.dynamic_index_in_dim(
            table, texture_index.astype(jnp.int32), axis=0, keepdims=False)
        # value[p] = layer[(p + off) & mask]  ==  roll(layer, -off)[p]
        # (wrap via tiling requires the table dims to be powers of two,
        # which resolution_mask == size - 1 already guarantees).
        # row_offset: global row of the first image row (sharded bands).
        if row_offset is not None:
            off_y = off_y + jnp.asarray(row_offset, U32)
        shift_y = -(off_y & U32(th - 1)).astype(jnp.int32)
        shift_x = -(off_x & U32(tw - 1)).astype(jnp.int32)
        rolled = jnp.roll(layer, (shift_y, shift_x), axis=(0, 1))
        tiled = jnp.tile(rolled, (reps_y, reps_x, 1))[:height, :width]
        images.append(tiled)
    img = jnp.concatenate(images, axis=-1)  # (H, W, 4 * fetch_count)
    if jnp.issubdtype(img.dtype, jnp.integer):
        img = img.astype(jnp.float32) * jnp.float32(1.0 / 65535.0)
    return img.reshape(height * width, fetch_count * 2, 2)[:, :pair_count]
