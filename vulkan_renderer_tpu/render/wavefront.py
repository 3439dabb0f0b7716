"""Sorted wavefront ray tracing over cluster megabatches.

This is the BASELINE.json north-star traversal design: instead of per-ray
pointer chasing (render/bvh.py — correct but gather-bound on TPU), rays
are traced in bulk dense phases:

  Phase 1 (cull):    all rays x all cluster AABBs, one dense slab test
                     (pure VPU arithmetic, zero gathers).
  Compaction:        per-ray top_k over the hit mask yields each ray's
                     first `pairs_per_ray` hit clusters in ray-major
                     layout. top_k is ~50x cheaper on TPU than a global
                     nonzero/sort compaction and removes every scatter
                     from the resolve step (plain row reductions).
  Phase 2 (intersect): each (ray, cluster) pair tests its cluster's
                     triangles. Triangle data is CONTIGUOUS per cluster
                     (Morton order), so the per-pair "gather" is a block
                     row read, not a random scatter of lanes. Pairs are
                     processed in fixed row chunks to bound memory.

Clusters are fixed-size chunks of the Morton-ordered triangle array — the
dense cull replaces a tree walk. Budget overflow (a ray intersecting more
clusters than pairs_per_ray) drops the farthest-index clusters and is
reported so callers can size budgets.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INVALID = jnp.uint32(0xFFFFFFFF)

# Rows (rays) processed per scan step; bounds the working set
# (rows * pairs_per_ray * cluster_size) regardless of total ray count.
_ROW_CHUNK = 16384


class Clusters(NamedTuple):
    """Triangle data is stored structure-of-arrays: ONE (K, 9*C) matrix
    holding the [v0.x v0.y v0.z e1.x .. e2.z] component planes of each
    cluster's C triangles side by side.

    Two TPU constraints shape this layout:
    - the intersect math must run on fully lane-tiled 2-D planes (an
      (..., 3) vector layout wastes 125/128 lanes, ~20x slower);
    - per-(ray, cluster) triangle fetches must NOT be XLA gathers: gather
      row throughput on TPU is so low it dominates the tracer. A one-hot
      (rows, K) @ (K, 9C) matmul does the same selection on the MXU at
      full rate and is bit-exact (exactly one nonzero product per output,
      scaled by 1.0)."""
    aabb_lo: jnp.ndarray  # (K, 3)
    aabb_hi: jnp.ndarray  # (K, 3)
    planes: jnp.ndarray   # (K, 9*C) triangle component planes (f32)
    # Optional shading-attribute planes, same component-major layout:
    # [n0.xyz n1.xyz n2.xyz uv0.xy uv1.xy uv2.xy material] = 16 components.
    # Consumed by the deferred attribute-fetch kernel
    # (trace_kernel.trace_closest_attrs), which replaces the per-pixel
    # shading_rows gather (~37 ms / 518k rows) with per-cluster DMA.
    attrs: jnp.ndarray | None = None
    # Per-cluster sub-box AABBs: G = C/8 boxes of 8 consecutive triangles,
    # laid out (K, G*6) as [lo.xyz hi.xyz] per box (NaN for boxes with no
    # valid triangle — NaN comparisons fail every slab test). The Pallas
    # kernels gate each 8-triangle block on its sub-box slab test, cutting
    # the dominant triangle-loop FLOPs by the sub-box hit fraction (a
    # mini-BVH level held in VMEM).
    subboxes: jnp.ndarray | None = None

    @property
    def cluster_count(self) -> int:
        return self.aabb_lo.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.planes.shape[1] // 9


def build_clusters(triangle_positions: np.ndarray,
                   cluster_size: int = 64,
                   triangle_normals: np.ndarray | None = None,
                   triangle_tex_coords: np.ndarray | None = None,
                   material_indices: np.ndarray | None = None) -> Clusters:
    """triangle_positions: (T, 3, 3), Morton-ordered. Padding triangles are
    degenerate (never hit). When normals/uvs/materials are given, the
    16-component attrs table for the deferred attribute-fetch kernel is
    built alongside."""
    tris = np.asarray(triangle_positions, np.float32)
    t_count = tris.shape[0]
    k = max(1, -(-t_count // cluster_size))
    pad = k * cluster_size - t_count
    if pad:
        tris = np.concatenate([tris, np.zeros((pad, 3, 3), np.float32)])
    lo = tris.min(axis=1).reshape(k, cluster_size, 3)
    hi = tris.max(axis=1).reshape(k, cluster_size, 3)
    # Padded lanes must not pollute cluster AABBs.
    lane_valid = (np.arange(k * cluster_size) < t_count) \
        .reshape(k, cluster_size, 1)
    aabb_lo = np.where(lane_valid, lo, np.inf).min(axis=1)
    aabb_hi = np.where(lane_valid, hi, -np.inf).max(axis=1)
    v0 = tris[:, 0].reshape(k, cluster_size, 3)
    e1 = (tris[:, 1] - tris[:, 0]).reshape(k, cluster_size, 3)
    e2 = (tris[:, 2] - tris[:, 0]).reshape(k, cluster_size, 3)
    # (K, 9*C): [v0x v0y v0z e1x e1y e1z e2x e2y e2z] planes side by side.
    planes = np.concatenate(
        [v0[:, :, 0], v0[:, :, 1], v0[:, :, 2],
         e1[:, :, 0], e1[:, :, 1], e1[:, :, 2],
         e2[:, :, 0], e2[:, :, 1], e2[:, :, 2]], axis=1)
    # Sub-box AABBs over groups of 8 consecutive triangles (see Clusters).
    sub = max(1, min(8, cluster_size))
    g = -(-cluster_size // sub)
    s_lo = np.where(lane_valid, lo, np.inf) \
        .reshape(k, g, sub, 3).min(axis=2)
    s_hi = np.where(lane_valid, hi, -np.inf) \
        .reshape(k, g, sub, 3).max(axis=2)
    s_any = lane_valid.reshape(k, g, sub, 1).any(axis=2)
    s_lo = np.where(s_any, s_lo, np.nan)
    s_hi = np.where(s_any, s_hi, np.nan)
    subboxes = np.concatenate([s_lo, s_hi], axis=-1).reshape(k, g * 6) \
        .astype(np.float32)
    attrs = None
    if triangle_normals is not None:
        nrm = np.asarray(triangle_normals, np.float32)
        uvs = np.asarray(triangle_tex_coords, np.float32)
        mat = np.asarray(material_indices, np.float32)
        if pad:
            nrm = np.concatenate([nrm, np.zeros((pad, 3, 3), np.float32)])
            uvs = np.concatenate([uvs, np.zeros((pad, 3, 2), np.float32)])
            mat = np.concatenate([mat, np.zeros((pad,), np.float32)])
        cols = []
        for vtx in range(3):
            for c in range(3):
                cols.append(nrm[:, vtx, c].reshape(k, cluster_size))
        for vtx in range(3):
            for c in range(2):
                cols.append(uvs[:, vtx, c].reshape(k, cluster_size))
        cols.append(mat.reshape(k, cluster_size))
        attrs = jnp.asarray(np.ascontiguousarray(
            np.concatenate(cols, axis=1)))
    return Clusters(jnp.asarray(aabb_lo), jnp.asarray(aabb_hi),
                    jnp.asarray(np.ascontiguousarray(planes)), attrs,
                    jnp.asarray(subboxes))


def _slab_mask(lo, hi, origins, dirs, t_max):
    """(R, K) ray/AABB test. origins/dirs: (R, 3); t_max: (R,) or scalar.
    Returns (mask, t_near).

    Written as an axis loop over (R, K) tensors: the vectorized
    (R, K, 3) form materialized ~6 such intermediates per call, and at
    megabatch cull sizes (2048 rays x 512 cluster pool per chunk) the HBM
    round-trips of those tensors dominated the whole cull."""
    inv = jnp.where(jnp.abs(dirs) > 1e-20,
                    1.0 / jnp.where(jnp.abs(dirs) > 1e-20, dirs, 1.0), 1e30)
    t_near = None
    t_far = None
    for a in range(3):
        t0 = (lo[None, :, a] - origins[:, None, a]) * inv[:, None, a]
        t1 = (hi[None, :, a] - origins[:, None, a]) * inv[:, None, a]
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        t_near = near if t_near is None else jnp.maximum(t_near, near)
        t_far = far if t_far is None else jnp.minimum(t_far, far)
    t_cap = jnp.broadcast_to(jnp.asarray(t_max), origins.shape[:1])
    # t_cap < 0 marks dead rays (padding / already-proven rays in a
    # re-trace pass): they must never mark a cluster, even when their
    # origin sits deep inside its AABB (where t_near can be <= -1).
    mask = (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_cap[:, None]) \
        & (t_cap[:, None] >= 0.0)
    return mask, t_near


def _cull_topk(mask, pairs_per_ray: int):
    """Per-ray list of up to pairs_per_ray hit clusters, ascending index
    order. Used for any-hit where order does not matter."""
    k = mask.shape[1]
    score = jnp.where(mask, k - jnp.arange(k, dtype=jnp.int32)[None, :], 0)
    vals, cols = jax.lax.top_k(score, pairs_per_ray)
    valid = vals > 0
    hits = jnp.sum(mask, dtype=jnp.int32)
    overflow = hits - jnp.sum(valid, dtype=jnp.int32)
    return cols.astype(jnp.int32), valid, overflow


def _cull_topk_nearest(mask, t_near, pairs_per_ray: int):
    """Per-ray nearest pairs_per_ray hit clusters, front to back.

    Returns (cluster_idx, valid, t_near_bound) where t_near_bound is the
    entry of the NEXT (dropped) cluster: a closest hit with
    t_best <= t_near_bound is provably exact."""
    score = jnp.where(mask, -t_near, -jnp.inf)
    vals, cols = jax.lax.top_k(score, pairs_per_ray + 1)
    valid = jnp.isfinite(vals[:, :pairs_per_ray])
    t_near_bound = jnp.where(jnp.isfinite(vals[:, pairs_per_ray]),
                             -vals[:, pairs_per_ray], jnp.inf)
    return cols[:, :pairs_per_ray].astype(jnp.int32), valid, t_near_bound


def _chunk_rows(arrays, row_chunk: int):
    """Pad leading dim to a multiple of row_chunk and reshape to chunks."""
    r = arrays[0].shape[0]
    pad = (-r) % row_chunk
    out = []
    for a in arrays:
        if pad:
            pad_block = jnp.zeros((pad,) + a.shape[1:], a.dtype)
            a = jnp.concatenate([a, pad_block])
        out.append(a.reshape(-1, row_chunk, *a.shape[1:]))
    return out, r


def _compact_clusters(clusters: Clusters, mask, budget: int):
    """Union of hit clusters across the chunk's rays, compacted to at most
    `budget` planes rows. Returns (planes_m (M, 9C), m_ids (M,)). The tiny
    M-row gather replaces a per-pair gather over the full cluster table."""
    k = clusters.cluster_count
    union = jnp.any(mask, axis=0)
    score = jnp.where(union, k - jnp.arange(k, dtype=jnp.int32), 0)
    _, m_ids = jax.lax.top_k(score, min(budget, k))
    return clusters.planes[m_ids], m_ids.astype(jnp.int32)


def _localize(cluster_idx, valid, m_ids):
    """Map global cluster ids onto compacted rows. Pairs whose cluster was
    dropped by the budget become invalid; the caller accounts them."""
    eq = cluster_idx[:, :, None] == m_ids[None, None, :]
    found = jnp.any(eq, axis=-1)
    local = jnp.argmax(eq, axis=-1).astype(jnp.int32)
    return local, valid & found, valid & ~found


def _pair_intersect(planes_m, cluster_size: int, o, d,
                    local_idx, global_idx, valid, t_min):
    """Rows: o/d (N, 3); local/global_idx/valid (N, ppr); planes_m (M, 9C).

    Returns (t, hit, prim), each (N, ppr*C). Moeller-Trumbore written out
    componentwise over (N, ppr*C) planes: every op is elementwise on a
    fully lane-tiled 2-D array (the (..., 3)-vector form wastes 125/128
    lanes and is ~20x slower on TPU)."""
    n, ppr = local_idx.shape
    c = cluster_size
    m = planes_m.shape[0]

    if jax.default_backend() == "cpu":
        # CPU: a plain row gather IS the fast path (memcpy-speed); the
        # one-hot matmul below costs O(M) flops per output element and
        # measured ~100x slower per bistro-class frame on one core.
        rows = planes_m[local_idx.reshape(-1)]  # (n*ppr, 9*C)
    else:
        # One-hot matmul instead of a gather: selects each pair's cluster
        # row of all 9 component planes in one MXU pass (exact: one
        # nonzero 1.0 * x product per output). precision=HIGHEST is
        # REQUIRED: the TPU default runs f32 matmuls in bf16 passes,
        # which would round the selected coordinates (phantom
        # self-intersections at t ~ coord * 2^-8).
        onehot = (local_idx.reshape(-1)[:, None]
                  == jnp.arange(m, dtype=local_idx.dtype)[None, :]) \
            .astype(planes_m.dtype)
        rows = jnp.matmul(onehot, planes_m,
                          precision=jax.lax.Precision.HIGHEST)
    rows = rows.reshape(n, ppr, 9, c)

    def g(i):
        return rows[:, :, i, :].reshape(n, ppr * c)

    v0x, v0y, v0z = g(0), g(1), g(2)
    e1x, e1y, e1z = g(3), g(4), g(5)
    e2x, e2y, e2z = g(6), g(7), g(8)
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]          # (N, 1) broadcast
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det_ok = jnp.abs(det) > 1e-12
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
    u = (tx * px + ty * py + tz * pz) * inv_det
    qx = ty * e1z - tz * e1y
    qy = tz * e1x - tx * e1z
    qz = tx * e1y - ty * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    valid_flat = jnp.repeat(valid, c, axis=1)
    hit = det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0) \
        & (t >= t_min) & valid_flat
    prim = (global_idx[:, :, None] * c
            + jnp.arange(c)[None, None, :]).reshape(n, ppr * c)
    return t, hit, prim


def trace_closest(clusters: Clusters, origins, dirs, pairs_per_ray: int = 16,
                  t_min: float = 1.0e-3, chunk_cluster_budget: int = 384):
    """Closest hit for R rays. origins: (R,3) or (3,); dirs: (R,3).

    Returns (prim uint32 (R,), t (R,), overflow ()) — overflow counts
    ray/cluster pairs dropped because pairs_per_ray was too small (0 in
    healthy runs)."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    ppr = min(pairs_per_ray, clusters.cluster_count)
    exhaustive = ppr >= clusters.cluster_count

    # The cull runs INSIDE the row-chunk scan: a frame-wide (R, K) slab +
    # top_k materializes multi-GB intermediates at megabatch sizes; per
    # chunk the whole cull+intersect working set stays in the low MBs.
    row_chunk = min(_ROW_CHUNK, dirs.shape[0])
    rows_live = jnp.ones(dirs.shape[:1], jnp.bool_)
    (o_c, d_c, live_c), r = _chunk_rows([origins, dirs, rows_live], row_chunk)

    def body(_, args):
        o, d, live = args
        mask, t_near = _slab_mask(clusters.aabb_lo, clusters.aabb_hi, o, d,
                                  jnp.inf)
        if exhaustive:
            ci, va, _ = _cull_topk(mask, ppr)
            t_bound = jnp.full(o.shape[:1], jnp.inf)
        else:
            ci, va, t_bound = _cull_topk_nearest(mask, t_near, ppr)
        planes_m, m_ids = _compact_clusters(clusters, mask,
                                            chunk_cluster_budget)
        local, va, lost = _localize(ci, va, m_ids)
        t, hit, prim = _pair_intersect(planes_m, clusters.cluster_size,
                                       o, d, local, ci, va, t_min)
        t = jnp.where(hit, t, jnp.inf)
        best = jnp.argmin(t, axis=1)
        t_best = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        prim_best = jnp.take_along_axis(prim, best[:, None], axis=1)[:, 0]
        prim_best = jnp.where(jnp.isfinite(t_best),
                              prim_best.astype(jnp.uint32), INVALID)
        # A result is provably exact when the winning t precedes the first
        # dropped cluster AND no candidate pair was lost to the chunk's
        # compaction budget; "uncertain" counts rays without that guarantee
        # (padded rows excluded).
        uncertain = live & ((jnp.isfinite(t_bound) & (t_best > t_bound))
                            | jnp.any(lost, axis=1))
        return None, (t_best, prim_best, jnp.sum(uncertain, dtype=jnp.int32))

    _, (t_out, prim_out, unc) = jax.lax.scan(body, None, (o_c, d_c, live_c))
    t_out = t_out.reshape(-1)[:r]
    prim_out = prim_out.reshape(-1)[:r]
    return prim_out, t_out, jnp.sum(unc)


def trace_anyhit(clusters: Clusters, origins, dirs, t_max,
                 pairs_per_ray: int = 8, t_min: float = 1.0e-3,
                 chunk_cluster_budget: int = 384):
    """Any-hit (shadow) test for R rays with per-ray t ranges.

    Returns (occluded bool (R,), overflow ())."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max), dirs.shape[:1])
    ppr = min(pairs_per_ray, clusters.cluster_count)

    # Cull inside the chunk scan (see trace_closest): keeps the (rows, K)
    # slab/top_k working set at chunk size instead of megabatch size.
    row_chunk = min(_ROW_CHUNK, dirs.shape[0])
    (o_c, d_c, tm_c), r = _chunk_rows([origins, dirs, t_max], row_chunk)

    def body(_, args):
        o, d, tm = args
        mask, _ = _slab_mask(clusters.aabb_lo, clusters.aabb_hi, o, d, tm)
        ci, va, overflow = _cull_topk(mask, ppr)
        planes_m, m_ids = _compact_clusters(clusters, mask,
                                            chunk_cluster_budget)
        local, va, lost = _localize(ci, va, m_ids)
        overflow = overflow + jnp.sum(lost, dtype=jnp.int32)
        t, hit, _ = _pair_intersect(planes_m, clusters.cluster_size,
                                    o, d, local, ci, va, t_min)
        hit = hit & (t <= tm[:, None])
        return None, (jnp.any(hit, axis=1), overflow)

    _, (occluded, ovf) = jax.lax.scan(body, None, (o_c, d_c, tm_c))
    return occluded.reshape(-1)[:r], jnp.sum(ovf)
