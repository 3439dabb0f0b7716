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
    aabb_lo: jnp.ndarray  # (K, 3)
    aabb_hi: jnp.ndarray  # (K, 3)
    tri_v0: jnp.ndarray   # (K, C, 3)
    tri_e1: jnp.ndarray   # (K, C, 3)
    tri_e2: jnp.ndarray   # (K, C, 3)

    @property
    def cluster_count(self) -> int:
        return self.aabb_lo.shape[0]

    @property
    def cluster_size(self) -> int:
        return self.tri_v0.shape[1]


def build_clusters(triangle_positions: np.ndarray,
                   cluster_size: int = 64) -> Clusters:
    """triangle_positions: (T, 3, 3), Morton-ordered. Padding triangles are
    degenerate (never hit)."""
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
    return Clusters(jnp.asarray(aabb_lo), jnp.asarray(aabb_hi),
                    jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2))


def _slab_mask(lo, hi, origins, dirs, t_max):
    """(R, K) ray/AABB test. origins/dirs: (R, 3); t_max: (R,) or scalar.
    Returns (mask, t_near)."""
    inv = jnp.where(jnp.abs(dirs) > 1e-20,
                    1.0 / jnp.where(jnp.abs(dirs) > 1e-20, dirs, 1.0), 1e30)
    t0 = (lo[None, :, :] - origins[:, None, :]) * inv[:, None, :]
    t1 = (hi[None, :, :] - origins[:, None, :]) * inv[:, None, :]
    t_near = jnp.max(jnp.minimum(t0, t1), axis=-1)
    t_far = jnp.min(jnp.maximum(t0, t1), axis=-1)
    t_cap = jnp.broadcast_to(jnp.asarray(t_max), origins.shape[:1])
    mask = (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_cap[:, None])
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


def _pair_intersect(clusters: Clusters, o, d, cluster_idx, valid, t_min):
    """Rows: o/d (N, 3); cluster_idx/valid (N, ppr).
    Returns per-row (t (N, ppr, C), hit (N, ppr, C), prim (N, ppr, C))."""
    v0 = clusters.tri_v0[cluster_idx]  # (N, ppr, C, 3) block row reads
    e1 = clusters.tri_e1[cluster_idx]
    e2 = clusters.tri_e2[cluster_idx]
    d_b = d[:, None, None, :]
    o_b = o[:, None, None, :]
    pvec = jnp.cross(d_b, e2)
    det = jnp.sum(e1 * pvec, axis=-1)
    inv_det = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
    tvec = o_b - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(d_b * qvec, axis=-1) * inv_det
    t = jnp.sum(e2 * qvec, axis=-1) * inv_det
    hit = (jnp.abs(det) > 1e-12) & (u >= 0.0) & (v >= 0.0) \
        & (u + v <= 1.0) & (t >= t_min) & valid[:, :, None]
    c = clusters.cluster_size
    prim = cluster_idx[:, :, None] * c + jnp.arange(c)[None, None, :]
    return t, hit, prim


def trace_closest(clusters: Clusters, origins, dirs, pairs_per_ray: int = 16,
                  t_min: float = 1.0e-3):
    """Closest hit for R rays. origins: (R,3) or (3,); dirs: (R,3).

    Returns (prim uint32 (R,), t (R,), overflow ()) — overflow counts
    ray/cluster pairs dropped because pairs_per_ray was too small (0 in
    healthy runs)."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    mask, t_near = _slab_mask(clusters.aabb_lo, clusters.aabb_hi, origins,
                              dirs, jnp.inf)
    ppr = min(pairs_per_ray, clusters.cluster_count)
    if ppr < clusters.cluster_count:
        cluster_idx, valid, t_bound = _cull_topk_nearest(mask, t_near, ppr)
    else:
        cluster_idx, valid, _ = _cull_topk(mask, ppr)
        t_bound = jnp.full(dirs.shape[:1], jnp.inf)

    row_chunk = min(_ROW_CHUNK, dirs.shape[0])
    (o_c, d_c, ci_c, va_c), r = _chunk_rows(
        [origins, dirs, cluster_idx, valid], row_chunk)

    def body(_, args):
        o, d, ci, va = args
        t, hit, prim = _pair_intersect(clusters, o, d, ci, va, t_min)
        t = jnp.where(hit, t, jnp.inf).reshape(t.shape[0], -1)
        prim = prim.reshape(t.shape[0], -1)
        best = jnp.argmin(t, axis=1)
        t_best = jnp.take_along_axis(t, best[:, None], axis=1)[:, 0]
        prim_best = jnp.take_along_axis(prim, best[:, None], axis=1)[:, 0]
        prim_best = jnp.where(jnp.isfinite(t_best),
                              prim_best.astype(jnp.uint32), INVALID)
        return None, (t_best, prim_best)

    _, (t_out, prim_out) = jax.lax.scan(body, None, (o_c, d_c, ci_c, va_c))
    t_out = t_out.reshape(-1)[:r]
    prim_out = prim_out.reshape(-1)[:r]
    # A result is provably exact when the winning t precedes the first
    # dropped cluster; "overflow" counts rays without that guarantee.
    uncertain = jnp.isfinite(t_bound) & (t_out > t_bound)
    return prim_out, t_out, jnp.sum(uncertain, dtype=jnp.int32)


def trace_anyhit(clusters: Clusters, origins, dirs, t_max,
                 pairs_per_ray: int = 8, t_min: float = 1.0e-3):
    """Any-hit (shadow) test for R rays with per-ray t ranges.

    Returns (occluded bool (R,), overflow ())."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max), dirs.shape[:1])
    mask, _ = _slab_mask(clusters.aabb_lo, clusters.aabb_hi, origins, dirs,
                         t_max)
    cluster_idx, valid, overflow = _cull_topk(
        mask, min(pairs_per_ray, clusters.cluster_count))

    row_chunk = min(_ROW_CHUNK, dirs.shape[0])
    (o_c, d_c, tm_c, ci_c, va_c), r = _chunk_rows(
        [origins, dirs, t_max, cluster_idx, valid], row_chunk)

    def body(_, args):
        o, d, tm, ci, va = args
        t, hit, _ = _pair_intersect(clusters, o, d, ci, va, t_min)
        hit = hit & (t <= tm[:, None, None])
        return None, jnp.any(hit, axis=(1, 2))

    _, occluded = jax.lax.scan(body, None, (o_c, d_c, tm_c, ci_c, va_c))
    return occluded.reshape(-1)[:r], overflow
