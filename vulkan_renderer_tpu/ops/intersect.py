"""Ray/segment intersection primitives.

- ray-triangle with screen-space barycentric derivatives (reference:
  shading_pass.frag.glsl:738-766),
- segment-vs-polygonal-light test (reference:
  polygonal_light_utility.glsl:93-112).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import MAX_POLYGONAL_LIGHT_VERTEX_COUNT


def ray_triangle_barycentrics(ray_origin, ray_direction, positions,
                              ray_direction_derivs=None):
    """Barycentrics of the ray/triangle-plane intersection and optionally
    their screen-space derivatives.

    positions: (3, 3) triangle vertices. ray_direction_derivs: (2, 3) — the
    d(ray_direction)/d(pixel_x|y) rows of the pixel->ray matrix.
    Returns (barycentrics (3,), derivs (2, 3) or None).
    """
    edge0 = positions[1] - positions[0]
    edge1 = positions[2] - positions[0]
    ray_cross_e1 = jnp.cross(ray_direction, edge1)
    rcp_det = 1.0 / jnp.sum(edge0 * ray_cross_e1, axis=-1)
    ray_to_0 = ray_origin - positions[0]
    det_0 = jnp.sum(ray_to_0 * ray_cross_e1, axis=-1)
    b1 = rcp_det * det_0
    e0_cross_0 = jnp.cross(edge0, ray_to_0)
    det_1 = jnp.sum(ray_direction * e0_cross_0, axis=-1)
    b2 = -rcp_det * det_1
    b0 = 1.0 - (b1 + b2)
    barycentrics = jnp.stack([b0, b1, b2], axis=-1)

    if ray_direction_derivs is None:
        return barycentrics, None

    derivs = []
    for i in range(2):
        dd = ray_direction_derivs[i]
        ray_cross_e1_d = jnp.cross(dd, edge1)
        rcp_det_d = -jnp.sum(edge0 * ray_cross_e1_d, axis=-1) * rcp_det * rcp_det
        det_0_d = jnp.sum(ray_to_0 * ray_cross_e1_d, axis=-1)
        db1 = rcp_det_d * det_0 + rcp_det * det_0_d
        det_1_d = jnp.sum(dd * e0_cross_0, axis=-1)
        db2 = -rcp_det_d * det_1 - rcp_det * det_1_d
        db0 = -(db1 + db2)
        derivs.append(jnp.stack([db0, db1, db2], axis=-1))
    return barycentrics, jnp.stack(derivs, axis=0)


def ray_triangle_hit(ray_origin, ray_direction, v0, v1, v2,
                     t_min=1.0e-3, t_max=jnp.inf):
    """Watertight-enough Moller-Trumbore hit test returning (hit, t).

    Used by the brute-force visibility pass and BVH leaf tests. Backface
    culling is OFF (shadow rays in the reference are force-opaque and
    disable facing culls, scene.c:313-328)."""
    edge0 = v1 - v0
    edge1 = v2 - v0
    pvec = jnp.cross(ray_direction, edge1)
    det = jnp.sum(edge0 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = ray_origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, edge0)
    v = jnp.sum(ray_direction * qvec, axis=-1) * inv_det
    t = jnp.sum(edge1 * qvec, axis=-1) * inv_det
    hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t >= t_min) & (t <= t_max)
    return hit, jnp.where(hit, t, jnp.inf)


def polygonal_light_ray_intersection(plane, vertices_world, vertex_count,
                                     ray_origin, ray_end_homogeneous):
    """Segment/semi-infinite-ray vs convex polygon test
    (polygonal_light_utility.glsl:93-112).

    plane: (4,); vertices_world: (MAXL, 3) padded; ray_end_homogeneous: (4,)
    with w=1 for a point, w=0 for a direction.
    """
    maxl = vertices_world.shape[0]
    o_dot = jnp.sum(plane[:3] * ray_origin) + plane[3]
    e_dot = jnp.sum(plane[:3] * ray_end_homogeneous[:3]) \
        + plane[3] * ray_end_homogeneous[3]
    opposite = o_dot * e_dot <= 0.0

    ray_dir = ray_end_homogeneous[:3] - ray_end_homogeneous[3] * ray_origin
    rel = vertices_world - ray_origin[None, :]
    rel_next = jnp.roll(rel, -1, axis=0)
    signs = jnp.sum(ray_dir[None, :] * jnp.cross(rel, rel_next), axis=-1)
    lanes = jnp.arange(maxl)
    prev_signs = jnp.concatenate([jnp.zeros((1,), signs.dtype), signs[:-1]])
    ok = (prev_signs * signs >= 0.0) | ((lanes >= 3) & (lanes >= vertex_count))
    return opposite & jnp.all(ok)
