"""From-scratch two-level BVH: host-side build + TPU stackless traversal.

Replaces VK_KHR_ray_query / vkCmdBuildAccelerationStructuresKHR
(scene.c:142-406). The reference builds one BLAS over all triangles plus a
single-instance TLAS; here the equivalent is one BVH over the whole
triangle soup (the exporter Morton-orders triangles by centroid,
io_export_vulkan_blender28.py:459-469, which we exploit directly).

Design (TPU-first):
- Build: binary tree over contiguous ranges of the Morton-ordered triangle
  array (LBVH-style median splits). Runs in numpy at load time, like the
  reference's CPU-side AS prep.
- Layout: preorder arrays with *skip links* (threaded BVH). Traversal
  keeps one node pointer per ray and no stack: hit -> next preorder node,
  miss -> skip link. This keeps the per-ray state tiny so a vmapped
  lax.while_loop maps onto the VPU without scatter/gather stacks.
- Leaves hold up to `leaf_size` triangles tested vectorized.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INVALID = np.uint32(0xFFFFFFFF)


class Bvh(NamedTuple):
    aabb_min: jnp.ndarray    # (N, 3) f32
    aabb_max: jnp.ndarray    # (N, 3) f32
    skip: jnp.ndarray        # (N,) i32 preorder index if missed (or N = done)
    leaf_start: jnp.ndarray  # (N,) i32 first triangle (-1 for internal nodes)
    leaf_count: jnp.ndarray  # (N,) i32
    # Triangles in traversal order (v0, e1, e2 precomputed for Moller-
    # Trumbore without per-step subtractions).
    tri_v0: jnp.ndarray      # (T, 3)
    tri_e1: jnp.ndarray      # (T, 3)
    tri_e2: jnp.ndarray      # (T, 3)


def build_bvh(triangle_positions: np.ndarray, leaf_size: int = 4) -> Bvh:
    """triangle_positions: (T, 3, 3) float (Morton-ordered for quality).

    Vectorized perfect-tree build: leaves are fixed chunks of the ordered
    triangle array; levels are built bottom-up with numpy pair reductions
    (O(T) work, ~log2(T/leaf_size) numpy calls), then scattered into
    preorder with analytically computed skip links.
    """
    tris = np.asarray(triangle_positions, np.float32)
    t_count = tris.shape[0]
    lo = tris.min(axis=1)
    hi = tris.max(axis=1)

    chunk_count = max(1, -(-t_count // leaf_size))
    depth = max(0, int(np.ceil(np.log2(chunk_count))))
    padded_leaves = 1 << depth

    # Leaf AABBs (padded chunks get empty boxes that never pass the slab
    # test: min=+inf, max=-inf).
    pad_tris = padded_leaves * leaf_size - t_count
    lo_p = np.concatenate([lo, np.full((pad_tris, 3), np.inf, np.float32)])
    hi_p = np.concatenate([hi, np.full((pad_tris, 3), -np.inf, np.float32)])
    leaf_lo = lo_p.reshape(padded_leaves, leaf_size, 3).min(axis=1)
    leaf_hi = hi_p.reshape(padded_leaves, leaf_size, 3).max(axis=1)

    # Bottom-up internal levels.
    level_lo = [leaf_lo]
    level_hi = [leaf_hi]
    while level_lo[-1].shape[0] > 1:
        cur_lo, cur_hi = level_lo[-1], level_hi[-1]
        level_lo.append(cur_lo.reshape(-1, 2, 3).min(axis=1))
        level_hi.append(cur_hi.reshape(-1, 2, 3).max(axis=1))
    level_lo.reverse()  # level 0 = root
    level_hi.reverse()

    n_levels = len(level_lo)
    node_total = 2 * padded_leaves - 1
    aabb_min = np.empty((node_total, 3), np.float32)
    aabb_max = np.empty((node_total, 3), np.float32)
    skip = np.empty(node_total, np.int32)
    leaf_start = np.full(node_total, -1, np.int32)
    leaf_count = np.zeros(node_total, np.int32)

    # Preorder index per (level, position): child = parent_pre + 1 for the
    # left child, parent_pre + 1 + subtree_size for the right child.
    pre = np.zeros(1, np.int64)  # root
    for level in range(n_levels):
        nodes = level_lo[level].shape[0]
        subtree = (1 << (n_levels - level)) - 1  # nodes in a subtree here
        idx = pre
        aabb_min[idx] = level_lo[level]
        aabb_max[idx] = level_hi[level]
        skip[idx] = idx + subtree
        if level == n_levels - 1:
            starts = np.arange(nodes, dtype=np.int64) * leaf_size
            counts = np.clip(t_count - starts, 0, leaf_size)
            leaf_start[idx] = np.minimum(starts, max(t_count - 1, 0))
            leaf_count[idx] = counts
        else:
            child_subtree = (1 << (n_levels - level - 1)) - 1
            left = pre + 1
            right = pre + 1 + child_subtree
            pre = np.stack([left, right], axis=1).reshape(-1)

    # Pad triangle arrays so a leaf's fixed-width lane read never runs
    # off the end (padding triangles are degenerate -> never hit).
    pad = leaf_size
    tris = np.concatenate([tris, np.zeros((pad, 3, 3), np.float32)], axis=0)
    v0 = tris[:, 0]
    return Bvh(
        aabb_min=jnp.asarray(np.array(aabb_min, np.float32)),
        aabb_max=jnp.asarray(np.array(aabb_max, np.float32)),
        skip=jnp.asarray(np.array(skip, np.int32)),
        leaf_start=jnp.asarray(np.array(leaf_start, np.int32)),
        leaf_count=jnp.asarray(np.array(leaf_count, np.int32)),
        tri_v0=jnp.asarray(v0),
        tri_e1=jnp.asarray(tris[:, 1] - v0),
        tri_e2=jnp.asarray(tris[:, 2] - v0),
    )


def _slab_test(aabb_min, aabb_max, origin, inv_dir, t_max):
    """Ray/AABB slab test; robust to inf inv_dir via min/max ordering."""
    t0 = (aabb_min - origin) * inv_dir
    t1 = (aabb_max - origin) * inv_dir
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    return (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_max)


def _leaf_intersect(bvh: Bvh, leaf_size: int, start, origin, direction,
                    t_min, t_best, prim_best, any_hit: bool):
    """Test up to leaf_size triangles starting at `start` (static count)."""
    idx = start + jnp.arange(leaf_size)
    valid_lane = jnp.arange(leaf_size) < leaf_size  # refined below by count
    v0 = bvh.tri_v0[idx]
    e1 = bvh.tri_e1[idx]
    e2 = bvh.tri_e2[idx]
    pvec = jnp.cross(direction[None, :], e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = origin[None, :] - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(direction[None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t >= t_min) & (t < t_best)
    return hit, t, idx


def make_bvh_closest_hit(bvh: Bvh, leaf_size: int = 4, t_min: float = 1.0e-3,
                         max_steps: int = 16384):
    """Returns closest(origin (3,), direction (3,)) -> (prim uint32, t).
    Unbatched; vmap over rays. max_steps bounds the traversal so a
    pathological tree cannot fault the device watchdog."""
    node_count = bvh.skip.shape[0]
    lanes = jnp.arange(leaf_size)

    def closest(origin, direction):
        inv_dir = jnp.where(jnp.abs(direction) > 1e-20,
                            1.0 / jnp.where(jnp.abs(direction) > 1e-20,
                                            direction, 1.0), 1e30)

        def cond(state):
            node, _, _, steps = state
            return (node < node_count) & (steps < max_steps)

        def body(state):
            node, t_best, prim_best, steps = state
            hit_box = _slab_test(bvh.aabb_min[node], bvh.aabb_max[node],
                                 origin, inv_dir, t_best)
            start = bvh.leaf_start[node]
            count = bvh.leaf_count[node]
            is_leaf = start >= 0

            # Leaf test (computed always, masked; cheap for small leaves).
            safe_start = jnp.maximum(start, 0)
            hit, t, idx = _leaf_intersect(bvh, leaf_size, safe_start, origin,
                                          direction, t_min, t_best, prim_best,
                                          False)
            lane_ok = hit & (lanes < count) & hit_box & is_leaf
            t = jnp.where(lane_ok, t, jnp.inf)
            best_lane = jnp.argmin(t)
            lane_t = t[best_lane]
            better = lane_t < t_best
            t_best = jnp.where(better, lane_t, t_best)
            prim_best = jnp.where(better, idx[best_lane].astype(jnp.uint32),
                                  prim_best)

            # Advance: into the subtree when an internal box hit, else skip.
            descend = hit_box & (~is_leaf)
            node = jnp.where(descend, node + 1, bvh.skip[node])
            return node, t_best, prim_best, steps + 1

        node0 = jnp.int32(0)
        t0 = jnp.float32(jnp.inf)
        p0 = jnp.uint32(INVALID)
        _, t_best, prim_best, _ = jax.lax.while_loop(
            cond, body, (node0, t0, p0, jnp.int32(0)))
        return prim_best, t_best

    return closest


def make_bvh_occlusion(bvh: Bvh, leaf_size: int = 4, t_min: float = 1.0e-3,
                       max_steps: int = 16384):
    """Returns occluded(origin, direction, max_t) -> bool (any-hit with
    terminate-on-first-hit, matching the reference's shadow-ray flags,
    shading_pass.frag.glsl:129-131)."""
    node_count = bvh.skip.shape[0]
    lanes = jnp.arange(leaf_size)

    def occluded(origin, direction, max_t):
        inv_dir = jnp.where(jnp.abs(direction) > 1e-20,
                            1.0 / jnp.where(jnp.abs(direction) > 1e-20,
                                            direction, 1.0), 1e30)

        def cond(state):
            node, found, steps = state
            return (node < node_count) & (~found) & (steps < max_steps)

        def body(state):
            node, found, steps = state
            hit_box = _slab_test(bvh.aabb_min[node], bvh.aabb_max[node],
                                 origin, inv_dir, max_t)
            start = bvh.leaf_start[node]
            count = bvh.leaf_count[node]
            is_leaf = start >= 0
            safe_start = jnp.maximum(start, 0)
            hit, t, _ = _leaf_intersect(bvh, leaf_size, safe_start, origin,
                                        direction, t_min, max_t, None, True)
            lane_ok = hit & (lanes < count) & hit_box & is_leaf
            found = found | jnp.any(lane_ok & (t <= max_t))
            descend = hit_box & (~is_leaf)
            node = jnp.where(descend, node + 1, bvh.skip[node])
            return node, found, steps + 1

        _, found, _ = jax.lax.while_loop(
            cond, body, (jnp.int32(0), jnp.bool_(False), jnp.int32(0)))
        return found

    return occluded
