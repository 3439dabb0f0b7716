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


def trace_anyhit_bruteforce(triangle_positions, origins, dirs, t_max,
                            t_min: float = 1.0e-3, tri_chunk: int = 512,
                            ray_chunk: int = 8192):
    """Batched any-hit occlusion: every ray against every triangle
    (reference semantics: opaque, t range [t_min, max_t]).

    origins/dirs: (R, 3); t_max: (R,). Returns occluded bool (R,).
    Doubly chunked (rays x triangles) so the working set stays bounded at
    any megabatch size; the math is written componentwise on (rays, tris)
    planes so every op is fully lane-tiled."""
    tris = jnp.asarray(triangle_positions, jnp.float32)
    pad_t = (-tris.shape[0]) % tri_chunk
    if pad_t:
        tris = jnp.concatenate([tris, jnp.zeros((pad_t, 3, 3), tris.dtype)])
    comp = []
    for arr in (tris[:, 0], tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]):
        for c in range(3):
            comp.append(arr[:, c].reshape(-1, tri_chunk))
    planes = jnp.stack(comp, axis=1)  # (n_tri_chunks, 9, tri_chunk)

    r = dirs.shape[0]
    pad_r = (-r) % ray_chunk
    if pad_r:
        z3 = jnp.zeros((pad_r, 3), jnp.float32)
        origins = jnp.concatenate([origins, z3])
        dirs = jnp.concatenate([dirs, z3])
        t_max = jnp.concatenate([t_max, jnp.full((pad_r,), -1.0)])
    o_c = origins.reshape(-1, ray_chunk, 3)
    d_c = dirs.reshape(-1, ray_chunk, 3)
    tm_c = t_max.reshape(-1, ray_chunk)

    def ray_body(_, args):
        o, d, tm = args
        ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]
        dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]

        def tri_body(occ, p):
            v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = (
                p[i][None, :] for i in range(9))
            px = dy * e2z - dz * e2y
            py = dz * e2x - dx * e2z
            pz = dx * e2y - dy * e2x
            det = e1x * px + e1y * py + e1z * pz
            ok = jnp.abs(det) > 1e-12
            inv = jnp.where(ok, 1.0 / jnp.where(ok, det, 1.0), 0.0)
            tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
            u = (tx * px + ty * py + tz * pz) * inv
            qx = ty * e1z - tz * e1y
            qy = tz * e1x - tx * e1z
            qz = tx * e1y - ty * e1x
            v = (dx * qx + dy * qy + dz * qz) * inv
            t = (e2x * qx + e2y * qy + e2z * qz) * inv
            hit = ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
                & (t >= t_min) & (t <= tm[:, None])
            return occ | jnp.any(hit, axis=1), None

        occ, _ = jax.lax.scan(tri_body,
                              jnp.zeros(o.shape[0], jnp.bool_), planes)
        return None, occ

    _, occluded = jax.lax.scan(ray_body, None, (o_c, d_c, tm_c))
    return occluded.reshape(-1)[:r]
