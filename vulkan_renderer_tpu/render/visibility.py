"""Visibility pass: primary rays -> primitive indices.

The reference rasterizes a visibility buffer (visibility_pass.*.glsl,
primitive index per pixel, clear value 0xFFFFFFFF). On TPU the natural
formulation is a batched ray cast: the shading pass re-intersects the view
ray with the found triangle anyway, so visibility only has to agree with
the rasterizer's argmin-depth semantics.

This module provides the brute-force path (every ray against every
triangle, chunked so XLA keeps the working set in VMEM). The BVH path in
render/bvh.py replaces it for large scenes; both produce the same
(primitive_index, t) contract.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID = jnp.uint32(0xFFFFFFFF)


def trace_primary_bruteforce(triangle_positions, ray_origin, ray_dirs,
                             t_min=1.0e-3, chunk: int = 128):
    """triangle_positions: (T, 3, 3); ray_origin: (3,); ray_dirs: (P, 3).

    Returns (primitive_index (P,) uint32 with INVALID for misses, t (P,)).
    Uses Moller-Trumbore with backface culling OFF and first-hit = min-t,
    matching the depth-tested rasterizer (closest surface wins).
    """
    tri_count = triangle_positions.shape[0]
    pad = (-tri_count) % chunk
    if pad:
        degenerate = jnp.zeros((pad, 3, 3), triangle_positions.dtype)
        triangle_positions = jnp.concatenate([triangle_positions, degenerate])
    chunks = triangle_positions.reshape(-1, chunk, 3, 3)

    p = ray_dirs.shape[0]
    init_t = jnp.full((p,), jnp.inf, jnp.float32)
    init_idx = jnp.full((p,), INVALID)

    def body(carry, args):
        best_t, best_idx = carry
        chunk_tris, chunk_base = args
        v0 = chunk_tris[:, 0]
        e1 = chunk_tris[:, 1] - v0
        e2 = chunk_tris[:, 2] - v0
        # (P, C) broadcast intersection.
        pvec = jnp.cross(ray_dirs[:, None, :], e2[None, :, :])
        det = jnp.sum(e1[None] * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = ray_origin[None, :] - v0  # (C, 3)
        u = jnp.sum(tvec[None] * pvec, axis=-1) * inv_det
        qvec = jnp.cross(jnp.broadcast_to(tvec[None], pvec.shape), e1[None])
        v = jnp.sum(ray_dirs[:, None, :] * qvec, axis=-1) * inv_det
        t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
        hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) \
            & (u + v <= 1.0) & (t >= t_min)
        t = jnp.where(hit, t, jnp.inf)
        chunk_best = jnp.argmin(t, axis=-1)
        chunk_t = jnp.take_along_axis(t, chunk_best[:, None], axis=-1)[:, 0]
        better = chunk_t < best_t
        best_t = jnp.where(better, chunk_t, best_t)
        best_idx = jnp.where(
            better, (chunk_base + chunk_best).astype(jnp.uint32), best_idx)
        return (best_t, best_idx), None

    bases = jnp.arange(chunks.shape[0]) * chunk
    (best_t, best_idx), _ = jax.lax.scan(body, (init_t, init_idx),
                                         (chunks, bases))
    return best_idx, best_t


def make_bruteforce_occlusion(triangle_positions, chunk: int = 128):
    """Any-hit occlusion test factory for shadow rays (reference semantics:
    terminate on first hit, t range [1e-3, max_t - 1e-3ish], opaque).
    Returns occlusion(origin (3,), dir (3,), max_t ()) -> bool, unbatched
    (vmap-friendly)."""
    tri_count = triangle_positions.shape[0]
    pad = (-tri_count) % chunk
    tris = triangle_positions
    if pad:
        tris = jnp.concatenate([tris, jnp.zeros((pad, 3, 3), tris.dtype)])
    v0 = tris[:, 0]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0

    def occlusion(origin, direction, max_t):
        pvec = jnp.cross(direction[None, :], e2)
        det = jnp.sum(e1 * pvec, axis=-1)
        inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        tvec = origin[None, :] - v0
        u = jnp.sum(tvec * pvec, axis=-1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(direction[None, :] * qvec, axis=-1) * inv_det
        t = jnp.sum(e2 * qvec, axis=-1) * inv_det
        hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) \
            & (u + v <= 1.0) & (t >= 1.0e-3) & (t <= max_t)
        return jnp.any(hit)

    return occlusion
