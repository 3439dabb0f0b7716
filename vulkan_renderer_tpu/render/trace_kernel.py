"""Pallas traversal kernels: per-chunk union cull + in-VMEM intersection.

Replaces the XLA wavefront tracer's per-(ray, cluster) one-hot MXU
selection (render/wavefront.py _pair_intersect) on TPU: profiling shows
that matmul is ~85% of the trace cost (~3.6 TFLOP of pure data movement
per megabatch). Here:

  Phase 1 (XLA, cheap): rays are processed in chunks of `chunk_rows`*128;
    one dense slab test per chunk yields the UNION of hit clusters,
    compacted to `m_budget` ids (top_k over K per chunk — thousands of
    times cheaper than per-ray top_k over K).
  Phase 2 (Pallas): grid (chunk, m). A scalar-prefetched index map DMAs
    exactly cluster m's triangle planes (one (1,1,W) block) into VMEM;
    the kernel intersects the chunk's rays against its `cluster_size`
    triangles entirely in VMEM/registers, accumulating any-hit occlusion
    or running closest-hit (t, prim) across the m dimension. A per-step
    AABB test skips the triangle loop when no live ray can hit.

Same hit semantics as the reference's ray queries: t in [t_min, t_max],
no backface culling, force-opaque (shading_pass.frag.glsl:120-138).
Exactness: results are exact whenever the chunk's cluster union fits
m_budget; dropped clusters are counted in the returned overflow (any-hit)
/ uncertain (closest-hit) counters, same contract as render/wavefront.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .wavefront import Clusters, _chunk_rows, _slab_mask

_LANE = 128
INVALID = jnp.uint32(0xFFFFFFFF)


# Above this cluster count the per-chunk cull goes two-level: clusters are
# grouped into superclusters of _SC_GROUP whose AABBs are culled densely
# first, and only the members of the best _SC_BUDGET superclusters get the
# exact per-cluster slab test. Keeps the cull cost O(rays * K/G + rays *
# G*S) instead of O(rays * K) — the reference gets the same effect from its
# two-level acceleration structure (scene.c:142-406).
_TWO_LEVEL_MIN_CLUSTERS = 1024
_SC_GROUP = 32
_SC_BUDGET = 16
# Chunks culled together per lax.map step (vmapped): amortizes per-step
# dispatch overhead without letting the (CB, members, rays) slab-test
# intermediates outgrow HBM-friendly sizes.
_CULL_BLOCK = 8


@functools.lru_cache(maxsize=8)
def morton_pixel_permutation(width: int, height: int) -> tuple:
    """(perm, inv_perm) int32 arrays reordering row-major pixel indices
    along a Morton curve. Scan-order ray chunks are ~2-row strips whose
    frustums cross many clusters; Morton chunks are compact ~45x45 tiles
    with far tighter per-chunk cluster unions (the budget/exactness
    driver for the union-cull tracer)."""
    bits = max(int(np.ceil(np.log2(max(width, height)))), 1)
    n = 1 << bits
    xs = np.arange(n, dtype=np.uint64)
    spread = np.zeros(n, np.uint64)
    for b in range(bits):
        spread |= ((xs >> np.uint64(b)) & np.uint64(1)) << np.uint64(2 * b)
    code = (spread[None, :] | (spread[:, None] << np.uint64(1)))  # (y, x)
    code = code[:height, :width].reshape(-1)
    perm = np.argsort(code, kind="stable").astype(np.int32)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(perm.size, dtype=np.int32)
    return perm, inv


def _supercluster_aabbs(clusters: Clusters):
    """Grouped AABBs, padded so every supercluster has _SC_GROUP members.

    Padding members use NaN AABBs: every slab comparison on NaN is False,
    so they can never test as hit. (+/-inf "empty" boxes do NOT work here:
    (lo-o)*inv = -inf and +inf per axis make t_near=-inf <= t_far=+inf
    pass the slab test — a phantom hit.)

    Returns (member_rows (KS, _SC_GROUP*6), sc_lo, sc_hi): member AABBs
    grouped per supercluster into ONE row [all lo | all hi] — a
    supercluster's members are contiguous clusters, so the cull fetches
    sc_budget rows per chunk instead of sc_budget*_SC_GROUP (gathers pay
    per row: this was ~half the shadow cull cost)."""
    k = clusters.cluster_count
    ks = -(-k // _SC_GROUP)
    pad = ks * _SC_GROUP - k
    lo = jnp.concatenate(
        [clusters.aabb_lo, jnp.full((pad, 3), jnp.nan)]) if pad \
        else clusters.aabb_lo
    hi = jnp.concatenate(
        [clusters.aabb_hi, jnp.full((pad, 3), jnp.nan)]) if pad \
        else clusters.aabb_hi
    valid_lo = jnp.where(jnp.isnan(lo), jnp.inf, lo)
    valid_hi = jnp.where(jnp.isnan(hi), -jnp.inf, hi)
    sc_lo = valid_lo.reshape(ks, _SC_GROUP, 3).min(axis=1)
    sc_hi = valid_hi.reshape(ks, _SC_GROUP, 3).max(axis=1)
    member_rows = jnp.concatenate(
        [lo.reshape(ks, _SC_GROUP * 3), hi.reshape(ks, _SC_GROUP * 3)],
        axis=1)
    return member_rows, sc_lo, sc_hi


def _nearest_k(t_sel, ids, budget: int):
    """Select the `budget` entries with smallest t (finite first) plus the
    t of the FIRST DROPPED entry (inf when nothing was dropped).

    Returns (sel_ids, valid, t_bound). INVALID slots repeat the last valid
    id: the t-sort puts them in a contiguous tail, so the kernel's
    per-step DMA block index stays constant through the tail and Pallas
    skips the fetch entirely (compute is gated by `valid` anyway).

    top_k-free: ranks come from a pairwise compare matrix (index ties
    broken toward lower index, i.e. a stable ascending sort) and the
    compaction is a one-hot where-sum. Unlike lax.top_k's per-call sort
    this vectorizes cleanly when the caller vmaps whole blocks of chunks
    (the sequential-scan cull was ~35 ms of a 73 ms trace; see
    _union_cull)."""
    n = t_sel.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    lt = t_sel[None, :] < t_sel[:, None]
    tie = (t_sel[None, :] == t_sel[:, None]) & (idx[None, :] < idx[:, None])
    rank = jnp.sum(lt | tie, axis=1).astype(jnp.int32)
    keep = jnp.isfinite(t_sel) & (rank < budget)
    # onehot[i, r]: element i occupies output slot r (each slot <=1 owner).
    onehot = (rank[:, None] == jnp.arange(budget, dtype=jnp.int32)[None, :]) \
        & keep[:, None]
    sel_ids = jnp.sum(jnp.where(onehot, ids[:, None], 0), axis=0)
    valid = jnp.any(onehot, axis=0)
    # Dropped = potentially hit but beyond the budget (callers derive
    # per-ray exactness bounds from it).
    dropped_sel = jnp.isfinite(t_sel) & (rank >= budget)
    n_valid = jnp.sum(keep, dtype=jnp.int32)
    last_valid = sel_ids[jnp.maximum(n_valid - 1, 0)]
    sel_ids = jnp.where(valid, sel_ids, last_valid)
    return sel_ids.astype(jnp.int32), valid, dropped_sel


def _union_cull(clusters: Clusters, origins, dirs, t_max, chunk: int,
                m_budget: int, sc_budget: int = _SC_BUDGET):
    """Per-chunk union of slab-hit clusters, compacted FRONT-TO-BACK to
    the m_budget nearest (by chunk-min slab entry t) — deep chunks keep
    their near geometry and push drops far away, mirroring the XLA
    tracer's nearest-first cull (wavefront.py _cull_topk_nearest).

    Returns (ids (NC*M,) i32, valid (NC*M,) i32, t_bound (NC, chunk) f32,
    dropped (), NC). t_bound is PER RAY: the smallest slab entry among
    dropped clusters whose slab test hits that ray (inf when none — then
    the ray's result is provably exact up to any t <= t_bound). The
    per-ray form matters: a chunk-level bound flags every ray in a chunk
    for one far dropped cluster, inflating the unproven set ~50x at the
    flagship config. `dropped` counts potentially-hit dropped clusters."""
    k = clusters.cluster_count
    (o_c, d_c, t_c), r = _chunk_rows([origins, dirs, t_max], chunk)
    two_level = k > _TWO_LEVEL_MIN_CLUSTERS
    if two_level and sc_budget * _SC_GROUP < m_budget:
        # The per-chunk member pool is sc_budget*_SC_GROUP ids; a smaller
        # pool than m_budget would misalign every chunk's fixed-m fetches.
        raise ValueError(
            f"sc_budget*{_SC_GROUP} = {sc_budget * _SC_GROUP} must cover "
            f"m_budget = {m_budget}")
    if two_level:
        member_rows, sc_lo, sc_hi = _supercluster_aabbs(clusters)
        ks = sc_lo.shape[0]
        member_offsets = jnp.arange(_SC_GROUP, dtype=jnp.int32)
    all_ids = jnp.arange(k, dtype=jnp.int32)

    def body(args):
        o, d, t = args
        if two_level:
            sc_mask, sc_near = _slab_mask(sc_lo, sc_hi, o, d, t)
            sc_t = jnp.min(jnp.where(sc_mask, sc_near, jnp.inf), axis=0)
            sc_ids, sc_valid, sc_dropped_sel = _nearest_k(
                sc_t, jnp.arange(ks, dtype=jnp.int32), min(sc_budget, ks))
            # Per-ray bound from dropped superclusters: the sc AABB entry
            # lower-bounds every member's entry.
            sc_bound = jnp.min(jnp.where(sc_mask & sc_dropped_sel[None, :],
                                         sc_near, jnp.inf), axis=1)
            sc_dropped = jnp.sum(sc_dropped_sel, dtype=jnp.int32)
            member_ids = (sc_ids[:, None] * _SC_GROUP
                          + member_offsets[None, :]).reshape(-1)
            # ONE grouped row per selected supercluster (members are
            # contiguous); padded/dropped superclusters contribute NaN
            # AABBs (never hit; see _supercluster_aabbs on why not
            # +/-inf).
            rows_sel = member_rows[sc_ids]  # (sc_budget, G*6)
            g3 = _SC_GROUP * 3
            sel_lo = jnp.where(sc_valid[:, None, None],
                               rows_sel[:, :g3].reshape(
                                   -1, _SC_GROUP, 3), jnp.nan).reshape(-1, 3)
            sel_hi = jnp.where(sc_valid[:, None, None],
                               rows_sel[:, g3:].reshape(
                                   -1, _SC_GROUP, 3), jnp.nan).reshape(-1, 3)
            mask, t_near = _slab_mask(sel_lo, sel_hi, o, d, t)
            t_sel = jnp.min(jnp.where(mask, t_near, jnp.inf), axis=0)
            ids, valid, dropped_sel = _nearest_k(
                t_sel, member_ids, min(m_budget, member_ids.shape[0]))
            m_bound = jnp.min(jnp.where(mask & dropped_sel[None, :],
                                        t_near, jnp.inf), axis=1)
            t_bound = jnp.minimum(m_bound, sc_bound)
            dropped = sc_dropped * jnp.int32(_SC_GROUP) \
                + jnp.sum(dropped_sel, dtype=jnp.int32)
        else:
            mask, t_near = _slab_mask(clusters.aabb_lo, clusters.aabb_hi,
                                      o, d, t)
            t_sel = jnp.min(jnp.where(mask, t_near, jnp.inf), axis=0)
            ids, valid, dropped_sel = _nearest_k(t_sel, all_ids,
                                                 min(m_budget, k))
            t_bound = jnp.min(jnp.where(mask & dropped_sel[None, :],
                                        t_near, jnp.inf), axis=1)
            dropped = jnp.sum(dropped_sel, dtype=jnp.int32)
        return (ids, valid.astype(jnp.int32), t_bound, dropped)

    # Blocks of _CULL_BLOCK chunks, vmapped inside a lax.map step: the
    # former per-chunk lax.scan serialized ~0.1 ms of dense work per chunk
    # and was ~half the trace cost (35 of 73 ms at 254 chunks); batching
    # amortizes the per-step overhead and feeds the VPU full tiles while
    # keeping the slab-test intermediates (CB, members, rays) bounded.
    nc = o_c.shape[0]
    cb = min(_CULL_BLOCK, nc)
    pad_c = (-nc) % cb
    if pad_c:
        # Dead chunks: rays with t_max = -1 fail every slab test; their
        # outputs are sliced off below (before the dropped-counter sum).
        o_c = jnp.concatenate(
            [o_c, jnp.zeros((pad_c,) + o_c.shape[1:], o_c.dtype)])
        d_c = jnp.concatenate(
            [d_c, jnp.ones((pad_c,) + d_c.shape[1:], d_c.dtype)])
        t_c = jnp.concatenate(
            [t_c, jnp.full((pad_c,) + t_c.shape[1:], -1.0, t_c.dtype)])
    ns = (nc + pad_c) // cb
    blocked = tuple(a.reshape((ns, cb) + a.shape[1:])
                    for a in (o_c, d_c, t_c))
    ids, valid, t_bound, dropped = jax.lax.map(jax.vmap(body), blocked)
    ids = ids.reshape((ns * cb,) + ids.shape[2:])[:nc]
    valid = valid.reshape((ns * cb,) + valid.shape[2:])[:nc]
    t_bound = t_bound.reshape(ns * cb, chunk)[:nc]
    dropped = jnp.sum(dropped.reshape(-1)[:nc])
    # Invalid slots may carry padding member ids >= K; clamp so the
    # kernel's scalar-prefetched DMA index map stays in bounds (valid
    # gates all compute on those slots).
    ids = jnp.clip(ids.reshape(-1), 0, k - 1)
    return ids, valid.reshape(-1), t_bound, dropped, nc


def _pack_rays(origins, dirs, t_max, chunk: int):
    """(R,3)x2 + (R,) -> (7, NR, 128) with dead padding (t_max = -1)."""
    r = dirs.shape[0]
    pad = (-r) % chunk
    if pad:
        z3 = jnp.zeros((pad, 3), jnp.float32)
        origins = jnp.concatenate([origins, z3])
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (pad, 3))])
        t_max = jnp.concatenate([t_max, jnp.full((pad,), -1.0, jnp.float32)])
    planes = jnp.stack([origins[:, 0], origins[:, 1], origins[:, 2],
                        dirs[:, 0], dirs[:, 1], dirs[:, 2], t_max])
    return planes.reshape(7, -1, _LANE), r


def _padded_tables(clusters: Clusters):
    """(K, 1, W) triangle planes (W = 9C padded to a lane multiple),
    (K, 1, 8) AABB rows and (K, 1, G*6) sub-box rows for per-step DMA
    blocks."""
    k, w9 = clusters.planes.shape
    w = -(-w9 // _LANE) * _LANE
    tab = clusters.planes
    if w != w9:
        tab = jnp.concatenate(
            [tab, jnp.zeros((k, w - w9), tab.dtype)], axis=1)
    tab = tab.reshape(k, 1, w)
    aabb = jnp.concatenate(
        [clusters.aabb_lo, clusters.aabb_hi,
         jnp.zeros((k, 2), jnp.float32)], axis=1).reshape(k, 1, 8)
    if clusters.subboxes is not None:
        sub = clusters.subboxes.reshape(k, 1, -1)
    else:
        # Degenerate single sub-box = the cluster AABB (old pytrees).
        sub = jnp.concatenate([clusters.aabb_lo, clusters.aabb_hi],
                              axis=1).reshape(k, 1, 6)
    return tab, aabb, sub


def _ray_slab(aabb_ref, ox, oy, oz, dx, dy, dz, t_cap):
    lo = [aabb_ref[0, 0, c] for c in range(3)]
    hi = [aabb_ref[0, 0, 3 + c] for c in range(3)]
    return _ray_slab_scalars(lo, hi, ox, oy, oz, dx, dy, dz, t_cap)


def _ray_slab_scalars(lo, hi, ox, oy, oz, dx, dy, dz, t_cap):
    """Slab test of ray planes against one box given as 3+3 scalars.
    NaN box coordinates fail every comparison (used for empty padding)."""
    t_near = None
    t_far = None
    for o, d, l, h in ((ox, dx, lo[0], hi[0]), (oy, dy, lo[1], hi[1]),
                       (oz, dz, lo[2], hi[2])):
        ad = jnp.abs(d)
        inv = jnp.where(ad > 1e-20, 1.0 / jnp.where(ad > 1e-20, d, 1.0),
                        np.float32(1e30))
        t0 = (l - o) * inv
        t1 = (h - o) * inv
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        t_near = near if t_near is None else jnp.maximum(t_near, near)
        t_far = far if t_far is None else jnp.minimum(t_far, far)
    return (t_near <= t_far) & (t_far >= 0.0) & (t_near <= t_cap) \
        & (t_cap >= 0.0), t_near


def _tri_scalars(tab_ref, t: int, c: int):
    """Clusters.planes is COMPONENT-major: component k of triangle t sits
    at column k*C + t (render/wavefront.py build_clusters)."""
    return [tab_ref[0, 0, k * c + t] for k in range(9)]


# SMEM budget for the scalar-prefetched (ids, valid) pair. Measured on
# v5e/axon: ~0.78 MB compiles and runs, ~1.5 MB crashes the TPU compiler —
# so megabatches are sliced to keep each pallas_call's prefetch under this.
_MAX_PREFETCH_BYTES = 384 * 1024
_MIN_SLICE_CHUNKS = 64


def _dead_ray_rows(nrows: int, n_planes: int = 7):
    z = jnp.zeros((n_planes, nrows, _LANE), jnp.float32)
    z = z.at[5].set(1.0)    # dz = 1 (unit direction)
    z = z.at[6].set(-1.0)   # t_max = -1: fails every slab test
    return z


def _sliced_call(call_one, nc: int, m: int, chunk_rows: int,
                 ids, valid, rays):
    """Run call_one(ids, valid, rays, nc_slice) over chunk slices bounded
    by the SMEM prefetch budget, concatenating outputs along rows. Output
    rows beyond the real ray count are padding (callers trim). rays may
    carry extra planes beyond the 7 ray components (e.g. primitive ids for
    the attribute pass)."""
    n_planes = rays.shape[0]
    max_chunks = max(_MIN_SLICE_CHUNKS, _MAX_PREFETCH_BYTES // (m * 8))
    if nc <= max_chunks:
        return call_one(ids, valid, rays, nc)
    ns = -(-nc // max_chunks)
    pad = ns * max_chunks - nc
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad * m,), ids.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad * m,), valid.dtype)])
        rays = jnp.concatenate(
            [rays, _dead_ray_rows(pad * chunk_rows, n_planes)], axis=1)
    ids = ids.reshape(ns, max_chunks * m)
    valid = valid.reshape(ns, max_chunks * m)
    rays = rays.reshape(n_planes, ns, max_chunks * chunk_rows, _LANE) \
        .transpose(1, 0, 2, 3)
    outs = jax.lax.map(
        lambda args: call_one(args[0], args[1], args[2], max_chunks),
        (ids, valid, rays))
    return jax.tree.map(
        lambda o: o.reshape((-1,) + o.shape[2:]), outs)


def _anyhit_pass(clusters: Clusters, origins, dirs, t_max,
                 chunk_rows: int, m_budget: int,
                 t_min: float, interpret: bool, sc_budget: int):
    """One any-hit pass. Returns (occluded bool (R,), unproven bool (R,)):
    unproven marks live rays whose un-occluded result lacks the exactness
    guarantee (a budget-dropped cluster could still intersect their
    segment); found occlusions are always definite."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max), dirs.shape[:1])
    chunk = chunk_rows * _LANE
    m = min(m_budget, clusters.cluster_count)
    c = clusters.cluster_size

    ids, valid, t_bound, _, nc = _union_cull(clusters, origins, dirs,
                                             t_max, chunk, m,
                                             sc_budget=sc_budget)
    rays, r = _pack_rays(origins, dirs, t_max, chunk)
    tab, aabb, _ = _padded_tables(clusters)
    nr = rays.shape[1]

    def kernel(ids_ref, valid_ref, rays_ref, tab_ref, aabb_ref, out_ref):
        i = pl.program_id(0)
        mm = pl.program_id(1)

        @pl.when(mm == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
        tmax = rays_ref[6]
        mask, _ = _ray_slab(aabb_ref, ox, oy, oz, dx, dy, dz, tmax)
        work = mask & (out_ref[...] < 0.5)
        is_valid = valid_ref[i * m + mm] > 0

        @pl.when(is_valid & jnp.any(work))
        def _():
            # Flat triangle loop: sub-box gating was MEASURED SLOWER here
            # (+21 ms at the flagship shadow megabatch) — any-hit rays
            # terminate early via the work mask, so the extra slab tests
            # and branches outweigh the skipped triangle math.
            occ = jnp.zeros_like(ox, dtype=jnp.bool_)
            for t in range(c):
                v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = \
                    _tri_scalars(tab_ref, t, c)
                # Division-free Moeller-Trumbore (scalars x ray planes).
                px = dy * e2z - dz * e2y
                py = dz * e2x - dx * e2z
                pz = dx * e2y - dy * e2x
                det = e1x * px + e1y * py + e1z * pz
                su = jnp.where(det >= 0.0, 1.0, -1.0)
                adet = det * su
                tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                u = (tx * px + ty * py + tz * pz) * su
                qx = ty * e1z - tz * e1y
                qy = tz * e1x - tx * e1z
                qz = tx * e1y - ty * e1x
                v = (dx * qx + dy * qy + dz * qz) * su
                tt = (e2x * qx + e2y * qy + e2z * qz) * su
                hit = (adet > 1e-12) & (u >= 0.0) & (v >= 0.0) \
                    & (u + v <= adet) & (tt >= np.float32(t_min) * adet) \
                    & (tt <= tmax * adet)
                occ = occ | hit
            out_ref[...] = jnp.where(work & occ, 1.0, out_ref[...])

    def call_one(ids_s, valid_s, rays_s, nc_s):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nc_s, m),
            in_specs=[
                pl.BlockSpec((7, chunk_rows, _LANE),
                             lambda i, mm, ids, valid: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tab.shape[2]),
                             lambda i, mm, ids, valid:
                             (ids[i * m + mm], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8),
                             lambda i, mm, ids, valid:
                             (ids[i * m + mm], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((chunk_rows, _LANE),
                                   lambda i, mm, ids, valid: (i, 0),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((nc_s * chunk_rows, _LANE),
                                           jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(ids_s, valid_s, rays_s, tab, aabb)

    out = _sliced_call(call_one, nc, m, chunk_rows, ids, valid, rays)
    occluded = out.reshape(-1)[:nc * chunk] > 0.5
    # A found occlusion is definite; an UN-occluded ray is only guaranteed
    # when no dropped cluster could intersect its [t_min, t_max] segment.
    tmax_flat = rays.reshape(7, -1)[6]
    live = (jnp.arange(nc * chunk) < r) & (tmax_flat >= 0.0)
    bound = t_bound.reshape(-1)
    unproven = live & ~occluded & (bound < tmax_flat)
    return occluded[:r], unproven[:r]


# Re-trace pass geometry: the re-trace gathers WHOLE first-pass chunks
# (the nc // _RETRACE_CHUNK_FRACTION chunks with the most unproven rays,
# proven rays deadened in place via t_max = -1) and re-traces them split
# into _RETRACE_CHUNK_DIV x smaller sub-chunks with _RETRACE_BUDGET_SCALE x
# budgets. Chunk-granular gathering preserves the spatial coherence the
# union cull depends on — compacting unproven RAYS instead packs rays from
# different tiles/lights into one chunk and its union is WORSE than pass
# 1's (measured: residuals barely moved). Scaling only the budgets without
# shrinking chunks costs quadratically in the rank-select pool (measured
# 3x frame time at the flagship config).
_RETRACE_CHUNK_FRACTION = 4
_RETRACE_CHUNK_DIV = 4
_RETRACE_BUDGET_SCALE = 2


def _compact_indices(mask, capacity: int):
    """Indices of the first `capacity` set lanes of mask, in order.
    Returns (idx (capacity,) i32, count ()): slots >= count hold 0 and
    must be gated by the caller."""
    rank = jnp.cumsum(mask.astype(jnp.int32)) - 1
    pos = jnp.where(mask, rank, capacity)  # out-of-range scatters drop
    idx = jnp.zeros((capacity,), jnp.int32).at[pos].set(
        jnp.arange(mask.shape[0], dtype=jnp.int32), mode="drop")
    count = jnp.minimum(jnp.sum(mask, dtype=jnp.int32),
                        jnp.int32(capacity))
    return idx, count


def _retrace_chunk_gather(unproven, r: int, chunk: int):
    """Pick the chunks with the most unproven rays (fixed count =
    ceil(nc / _RETRACE_CHUNK_FRACTION)) and return their rays' indices in
    chunk-preserving order.

    Returns (ray_idx (nc2*chunk,) i32 clamped to [0, r-1], sel_unproven
    bool same shape, covered () = unproven rays inside selected chunks)."""
    nc = -(-r // chunk)
    pad = nc * chunk - r
    unp_p = jnp.concatenate(
        [unproven, jnp.zeros((pad,), bool)]) if pad else unproven
    counts = jnp.sum(unp_p.reshape(nc, chunk), axis=1, dtype=jnp.int32)
    nc2 = max(1, -(-nc // _RETRACE_CHUNK_FRACTION))
    vals, cids = jax.lax.top_k(counts, min(nc2, nc))
    ray_idx = (cids[:, None] * chunk
               + jnp.arange(chunk, dtype=jnp.int32)[None, :]).reshape(-1)
    sel_unp = unp_p[ray_idx]
    ray_idx = jnp.minimum(ray_idx, r - 1)  # padded tail rays (sel_unp=False)
    return ray_idx, sel_unp, jnp.sum(vals, dtype=jnp.int32)


def trace_anyhit_fused(clusters: Clusters, origins, dirs, t_max,
                       chunk_rows: int = 16, m_budget: int = 32,
                       t_min: float = 1.0e-3, interpret: bool = False,
                       sc_budget: int = _SC_BUDGET,
                       retrace_factor: int = _RETRACE_BUDGET_SCALE):
    """Any-hit (shadow) test. Returns (occluded bool (R,), overflow ()).

    Exactness re-trace (the reference's ray queries are exact, period —
    shading_pass.frag.glsl:120-138): when pass 1 leaves unproven rays
    (cluster budget overflow), they are compacted and re-traced with
    smaller chunks and `retrace_factor`x budgets, under lax.cond so exact
    frames pay nothing. overflow counts rays still unproven after the
    re-trace (capacity-truncated rays included)."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    occluded, unproven = _anyhit_pass(clusters, origins, dirs, t_max,
                                      chunk_rows, m_budget, t_min,
                                      interpret, sc_budget)
    if retrace_factor <= 1:
        return occluded, jnp.sum(unproven, dtype=jnp.int32)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max), dirs.shape[:1])
    r = dirs.shape[0]
    chunk = chunk_rows * _LANE
    # Mosaic needs the ray-block sublane dim divisible by 8; tiny chunks
    # (interpret-mode tests) are exempt because the block equals the array.
    rows2 = chunk_rows if chunk_rows <= 8 \
        else max(8, chunk_rows // _RETRACE_CHUNK_DIV)

    def do_retrace(_):
        idx, sel_unp, covered = _retrace_chunk_gather(unproven, r, chunk)
        t2 = jnp.where(sel_unp, t_max_b[idx], -1.0)
        occ2, unp2 = _anyhit_pass(
            clusters, origins[idx], dirs[idx], t2, rows2,
            m_budget * retrace_factor, t_min, interpret,
            sc_budget * retrace_factor)
        hit2 = (occ2 & sel_unp).astype(jnp.int32)
        merged = occluded | (jnp.zeros((r,), jnp.int32)
                             .at[idx].add(hit2, mode="drop") > 0)
        residual = jnp.sum(unproven, dtype=jnp.int32) - covered \
            + jnp.sum(unp2 & sel_unp, dtype=jnp.int32)
        return merged, residual

    def skip(_):
        return occluded, jnp.int32(0)

    return jax.lax.cond(jnp.any(unproven), do_retrace, skip, None)


def _closest_pass(clusters: Clusters, origins, dirs, t_max,
                  chunk_rows: int, m_budget: int,
                  t_min: float, interpret: bool, sc_budget: int):
    """One closest-hit pass. t_max: (R,) with -1 marking dead rays (the
    re-trace pass deadens already-proven rays this way). Returns
    (prim uint32 (R,), t (R,), unproven bool (R,)): unproven marks live
    rays whose best t exceeds the chunk's first-dropped-cluster entry
    bound — only those could be wrong when budgets overflow
    (front-to-back selection makes near hits provably exact)."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    chunk = chunk_rows * _LANE
    m = min(m_budget, clusters.cluster_count)
    c = clusters.cluster_size

    ids, valid, t_bound, _, nc = _union_cull(clusters, origins, dirs,
                                             t_max, chunk, m,
                                             sc_budget=sc_budget)
    rays, r = _pack_rays(origins, dirs, t_max, chunk)
    tab, aabb, sub = _padded_tables(clusters)
    n_sub = sub.shape[2] // 6
    g_sub = -(-c // n_sub)
    nr = rays.shape[1]

    def kernel(ids_ref, valid_ref, rays_ref, tab_ref, aabb_ref, sub_ref,
               t_ref, prim_ref):
        i = pl.program_id(0)
        mm = pl.program_id(1)

        @pl.when(mm == 0)
        def _():
            t_ref[...] = jnp.full_like(t_ref, jnp.inf)
            prim_ref[...] = jnp.full_like(prim_ref, -1)

        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
        best_t = t_ref[...]
        mask, t_near = _ray_slab(aabb_ref, ox, oy, oz, dx, dy, dz,
                                 rays_ref[6])
        work = mask & (t_near <= best_t)
        is_valid = valid_ref[i * m + mm] > 0
        cluster_id = ids_ref[i * m + mm]

        @pl.when(is_valid & jnp.any(work))
        def _():
            for gg in range(n_sub):
                slo = [sub_ref[0, 0, gg * 6 + cc] for cc in range(3)]
                shi = [sub_ref[0, 0, gg * 6 + 3 + cc] for cc in range(3)]
                # Prune by the CURRENT best t (refreshed per sub-block:
                # earlier blocks of this step may have improved it).
                bt0 = t_ref[...]
                smask, _ = _ray_slab_scalars(slo, shi, ox, oy, oz,
                                             dx, dy, dz, bt0)
                sw = smask & mask

                @pl.when(jnp.any(sw))
                def _(gg=gg, sw=sw):
                    bt = t_ref[...]
                    bp = prim_ref[...]
                    for t in range(gg * g_sub, min((gg + 1) * g_sub, c)):
                        v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = \
                            _tri_scalars(tab_ref, t, c)
                        px = dy * e2z - dz * e2y
                        py = dz * e2x - dx * e2z
                        pz = dx * e2y - dy * e2x
                        det = e1x * px + e1y * py + e1z * pz
                        det_ok = jnp.abs(det) > 1e-12
                        inv_det = 1.0 / jnp.where(det_ok, det, 1.0)
                        tx, ty, tz = ox - v0x, oy - v0y, oz - v0z
                        u = (tx * px + ty * py + tz * pz) * inv_det
                        qx = ty * e1z - tz * e1y
                        qy = tz * e1x - tx * e1z
                        qz = tx * e1y - ty * e1x
                        v = (dx * qx + dy * qy + dz * qz) * inv_det
                        tt = (e2x * qx + e2y * qy + e2z * qz) * inv_det
                        hit = det_ok & (u >= 0.0) & (v >= 0.0) \
                            & (u + v <= 1.0) & (tt >= np.float32(t_min)) \
                            & (tt < bt) & sw
                        bp = jnp.where(hit, cluster_id * c + t, bp)
                        bt = jnp.where(hit, tt, bt)
                    t_ref[...] = bt
                    prim_ref[...] = bp

    def call_one(ids_s, valid_s, rays_s, nc_s):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nc_s, m),
            in_specs=[
                pl.BlockSpec((7, chunk_rows, _LANE),
                             lambda i, mm, ids, valid: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, tab.shape[2]),
                             lambda i, mm, ids, valid:
                             (ids[i * m + mm], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, 8),
                             lambda i, mm, ids, valid:
                             (ids[i * m + mm], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, sub.shape[2]),
                             lambda i, mm, ids, valid:
                             (ids[i * m + mm], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((chunk_rows, _LANE),
                             lambda i, mm, ids, valid: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((chunk_rows, _LANE),
                             lambda i, mm, ids, valid: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
        )
        return pl.pallas_call(
            kernel,
            out_shape=[jax.ShapeDtypeStruct((nc_s * chunk_rows, _LANE),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((nc_s * chunk_rows, _LANE),
                                            jnp.int32)],
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(ids_s, valid_s, rays_s, tab, aabb, sub)

    t_out, prim_out = _sliced_call(call_one, nc, m, chunk_rows,
                                   ids, valid, rays)
    t_flat = t_out.reshape(-1)[:nc * chunk]
    tmax_flat = rays.reshape(7, -1)[6]
    live = (jnp.arange(nc * chunk) < r) & (tmax_flat >= 0.0)
    bound = jnp.where(live, t_bound.reshape(-1), jnp.inf)
    unproven = live & (t_flat > bound)
    t_out = t_flat[:r]
    prim_out = prim_out.reshape(-1)[:r]
    prim_out = jnp.where(jnp.isfinite(t_out), prim_out.astype(jnp.uint32),
                         INVALID)
    # cull artifacts let the attribute-fetch pass reuse this pass's
    # chunking/union instead of re-culling.
    cull = (ids, valid, rays, nc)
    return prim_out, t_out, unproven[:r], bound[:r], cull


def trace_closest_fused(clusters: Clusters, origins, dirs,
                        chunk_rows: int = 16, m_budget: int = 48,
                        t_min: float = 1.0e-3, interpret: bool = False,
                        sc_budget: int = 32,
                        retrace_factor: int = _RETRACE_BUDGET_SCALE):
    """Closest hit. Returns (prim uint32 (R,), t (R,), uncertain ()).

    Exactness re-trace: rays whose pass-1 best t exceeds the first-
    dropped-cluster bound are compacted and re-traced with smaller chunks
    (tighter unions) and `retrace_factor`x budgets, under lax.cond so
    exact frames pay nothing. Results merge by min t (every reported hit
    is a real intersection, so min is the strictly better of the two
    passes); `uncertain` counts rays still beyond the re-trace bound."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    t_live = jnp.full(dirs.shape[:1], jnp.inf, jnp.float32)
    prim1, t1, unp1, _, _ = _closest_pass(clusters, origins, dirs, t_live,
                                          chunk_rows, m_budget, t_min,
                                          interpret, sc_budget)
    if retrace_factor <= 1:
        return prim1, t1, jnp.sum(unp1, dtype=jnp.int32)
    r = dirs.shape[0]
    chunk = chunk_rows * _LANE
    # Mosaic needs the ray-block sublane dim divisible by 8; tiny chunks
    # (interpret-mode tests) are exempt because the block equals the array.
    rows2 = chunk_rows if chunk_rows <= 8 \
        else max(8, chunk_rows // _RETRACE_CHUNK_DIV)

    def do_retrace(_):
        idx, sel_unp, covered = _retrace_chunk_gather(unp1, r, chunk)
        t2_max = jnp.where(sel_unp, jnp.inf, -1.0)
        prim2, t2, _, bound2, _ = _closest_pass(
            clusters, origins[idx], dirs[idx], t2_max, rows2,
            m_budget * retrace_factor, t_min, interpret,
            sc_budget * retrace_factor)
        t1_sel = t1[idx]
        better = sel_unp & (t2 < t1_sel)
        t_sel = jnp.where(better, t2, t1_sel)
        prim_sel = jnp.where(better, prim2, prim1[idx])
        # Rays that were not selected for pass 2 (dead padding / proven)
        # must not scatter: route them out of bounds, mode="drop".
        scatter_idx = jnp.where(sel_unp, idx, jnp.int32(r))
        t = t1.at[scatter_idx].set(t_sel, mode="drop")
        prim = prim1.at[scatter_idx].set(prim_sel, mode="drop")
        # A ray is proven once its merged best t is at or below the
        # re-trace pass's first-dropped-cluster bound; rays in unselected
        # chunks stay unproven.
        residual = jnp.sum(unp1, dtype=jnp.int32) - covered \
            + jnp.sum(sel_unp & (t_sel > bound2), dtype=jnp.int32)
        return prim, t, residual

    def skip(_):
        return prim1, t1, jnp.int32(0)

    return jax.lax.cond(jnp.any(unp1), do_retrace, skip, None)

# ---------------------------------------------------------------------------
# Deferred attribute fetch (the preamble killer)
# ---------------------------------------------------------------------------
# Output plane layout of the attribute pass: everything get_shading_data
# (render/shading.py, mirroring shading_pass.frag.glsl:738-812) derives
# from the hit triangle's vertex data, computed in-kernel from per-cluster
# DMA rows instead of a per-pixel shading_rows gather (~37 ms / 518k rows
# on v5e) followed by HBM-bound vmapped math.
ATTR_NORMAL = 0      # 3: interpolated shading normal (normalized)
ATTR_UV = 3          # 2: interpolated texture coordinate
ATTR_DUVDX = 5       # 2: d(uv)/d(pixel_x)
ATTR_DUVDY = 7       # 2: d(uv)/d(pixel_y)
ATTR_TANGENT = 9     # 3: unnormalized tangent (from UV edges)
ATTR_BITANGENT = 12  # 3
ATTR_MTL = 15        # 1: mean tangent length
ATTR_MATERIAL = 16   # 1: material index (exact float)
ATTR_FOUND = 17      # 1: 1.0 when the ray's primitive was covered
ATTR_PLANES = 18
# Accumulator layout: v0(3) e1(3) e2(3) n0(3) n1(3) n2(3) uv0(2) uv1(2)
# uv2(2) material(1) found(1).
_ACC_PLANES = 26


def _padded_attr_table(clusters: Clusters):
    k, w16 = clusters.attrs.shape
    w = -(-w16 // _LANE) * _LANE
    tab = clusters.attrs
    if w != w16:
        tab = jnp.concatenate(
            [tab, jnp.zeros((k, w - w16), tab.dtype)], axis=1)
    return tab.reshape(k, 1, w)


def _cross_planes(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot_planes(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _attr_pass(clusters: Clusters, ids, valid, rays8, nc: int,
               chunk_rows: int, m: int, ray_d_derivs, interpret: bool):
    """Attribute fetch over the SAME (chunk, m) grid and cull output as the
    closest-hit pass. rays8: the trace's ray planes + plane 7 holding each
    ray's best primitive id as float (-1 for miss). ray_d_derivs: (2, 3)
    d(ray_direction)/d(pixel_{x,y}) rows. Returns (NR*chunk, ATTR_PLANES).

    Per (chunk, cluster) step the kernel selects the 25 triangle scalars of
    each ray's best hit into a VMEM accumulator (cheap where-loop); at the
    chunk's last step it runs the full re-intersection / interpolation /
    tangent-frame math ONCE per ray (shading_pass.frag.glsl:738-812) and
    writes the attribute planes."""
    c = clusters.cluster_size
    tab, _, _ = _padded_tables(clusters)
    atab = _padded_attr_table(clusters)
    dcam = jnp.asarray(ray_d_derivs, jnp.float32).reshape(2, 3)

    def kernel(ids_ref, valid_ref, rays_ref, dcam_ref, tab_ref, attr_ref,
               out_ref, acc_ref):
        i = pl.program_id(0)
        mm = pl.program_id(1)

        @pl.when(mm == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        prim = rays_ref[7]
        cid = ids_ref[i * m + mm]
        base = (cid * c).astype(jnp.float32)
        sel_any = (prim >= base) & (prim < base + c)
        is_valid = valid_ref[i * m + mm] > 0

        @pl.when(is_valid & jnp.any(sel_any))
        def _():
            # Gate each 8-triangle block on whether any ray's best hit
            # falls in its id range (typically 1-2 of 8 blocks fire).
            g_sub = max(1, min(8, c))
            for g0 in range(0, c, g_sub):
                size = min(g_sub, c - g0)
                sel_g = (prim >= base + np.float32(g0)) \
                    & (prim < base + np.float32(g0 + size))

                @pl.when(jnp.any(sel_g))
                def _(g0=g0, size=size):
                    vals = [acc_ref[j] for j in range(_ACC_PLANES)]
                    for t in range(g0, g0 + size):
                        s = prim == base + np.float32(t)
                        sc = _tri_scalars(tab_ref, t, c) \
                            + [attr_ref[0, 0, kk * c + t]
                               for kk in range(16)]
                        sc.append(np.float32(1.0))  # found
                        vals = [jnp.where(s, scv, v)
                                for scv, v in zip(sc, vals)]
                    acc_ref[...] = jnp.stack(vals)

        @pl.when(mm == m - 1)
        def _():
            a = acc_ref[...]
            v0 = (a[0], a[1], a[2])
            e1 = (a[3], a[4], a[5])
            e2 = (a[6], a[7], a[8])
            n0 = (a[9], a[10], a[11])
            n1 = (a[12], a[13], a[14])
            n2 = (a[15], a[16], a[17])
            uv0 = (a[18], a[19])
            uv1 = (a[20], a[21])
            uv2 = (a[22], a[23])
            mat = a[24]
            found = a[25]
            o = (rays_ref[0], rays_ref[1], rays_ref[2])
            d = (rays_ref[3], rays_ref[4], rays_ref[5])

            # Barycentrics + screen-space derivatives
            # (ops/intersect.py ray_triangle_barycentrics, glsl:738-766).
            rce1 = _cross_planes(d, e2)
            det = _dot_planes(e1, rce1)
            det_ok = jnp.abs(det) > 1e-30
            rcp = 1.0 / jnp.where(det_ok, det, 1.0)
            r0 = tuple(o[j] - v0[j] for j in range(3))
            det0 = _dot_planes(r0, rce1)
            b1 = rcp * det0
            e0c0 = _cross_planes(e1, r0)
            det1 = _dot_planes(d, e0c0)
            b2 = -rcp * det1
            b0 = 1.0 - (b1 + b2)
            duv = []
            for di in range(2):
                dd = (dcam_ref[di, 0], dcam_ref[di, 1], dcam_ref[di, 2])
                rce1d = (dd[1] * e2[2] - dd[2] * e2[1],
                         dd[2] * e2[0] - dd[0] * e2[2],
                         dd[0] * e2[1] - dd[1] * e2[0])
                rcpd = -_dot_planes(e1, rce1d) * rcp * rcp
                det0d = _dot_planes(r0, rce1d)
                db1 = rcpd * det0 + rcp * det0d
                det1d = dd[0] * e0c0[0] + dd[1] * e0c0[1] + dd[2] * e0c0[2]
                db2 = -rcpd * det1 - rcp * det1d
                db0 = -(db1 + db2)
                duv.append((db0 * uv0[0] + db1 * uv1[0] + db2 * uv2[0],
                            db0 * uv0[1] + db1 * uv1[1] + db2 * uv2[1]))

            ni = tuple(b0 * n0[j] + b1 * n1[j] + b2 * n2[j]
                       for j in range(3))
            inv_len = jax.lax.rsqrt(jnp.maximum(_dot_planes(ni, ni), 1e-30))
            ni = tuple(x * inv_len for x in ni)
            uv = (b0 * uv0[0] + b1 * uv1[0] + b2 * uv2[0],
                  b0 * uv0[1] + b1 * uv1[1] + b2 * uv2[1])
            te0 = (uv1[0] - uv0[0], uv1[1] - uv0[1])
            te1 = (uv2[0] - uv0[0], uv2[1] - uv0[1])
            nxe0 = _cross_planes(ni, e1)
            e1xn = _cross_planes(e2, ni)
            tangent = tuple(e1xn[j] * te0[0] + nxe0[j] * te1[0]
                            for j in range(3))
            bitangent = tuple(e1xn[j] * te0[1] + nxe0[j] * te1[1]
                              for j in range(3))
            mtl = jnp.sqrt(0.5 * (_dot_planes(tangent, tangent)
                                  + _dot_planes(bitangent, bitangent)))

            planes = list(ni) + [uv[0], uv[1], duv[0][0], duv[0][1],
                                 duv[1][0], duv[1][1]] \
                + list(tangent) + list(bitangent) + [mtl, mat, found]
            ok = (found > 0.5) & det_ok
            out_ref[...] = jnp.stack(
                [jnp.where(ok, p, 0.0) for p in planes[:-1]]
                + [jnp.where(ok, 1.0, 0.0)])

    def call_one(ids_s, valid_s, rays_s, nc_s):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nc_s, m),
            in_specs=[
                pl.BlockSpec((8, chunk_rows, _LANE),
                             lambda i, mm, ids, valid: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, 3),
                             lambda i, mm, ids, valid: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, tab.shape[2]),
                             lambda i, mm, ids, valid:
                             (ids[i * m + mm], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, atab.shape[2]),
                             lambda i, mm, ids, valid:
                             (ids[i * m + mm], 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ATTR_PLANES, chunk_rows, _LANE),
                                   lambda i, mm, ids, valid: (0, i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((_ACC_PLANES, chunk_rows, _LANE), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (ATTR_PLANES, nc_s * chunk_rows, _LANE), jnp.float32),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary")),
            interpret=interpret,
        )(ids_s, valid_s, rays_s, dcam, tab, atab)
        # Rows leading so _sliced_call can concatenate chunk slices.
        return out.transpose(1, 0, 2)

    out = _sliced_call(call_one, nc, m, chunk_rows, ids, valid, rays8)
    return out.transpose(0, 2, 1).reshape(-1, ATTR_PLANES)


def trace_closest_attrs(clusters: Clusters, origins, dirs, ray_d_derivs,
                        chunk_rows: int = 16, m_budget: int = 48,
                        t_min: float = 1.0e-3, interpret: bool = False,
                        sc_budget: int = 32,
                        retrace_factor: int = _RETRACE_BUDGET_SCALE):
    """Closest hit + deferred attribute fetch + exactness re-trace.

    Returns (prim uint32 (R,), t (R,), uncertain (), attrs
    (R, ATTR_PLANES), stale bool (R,)). attrs are computed from the FIRST
    pass's hits; `stale` marks rays whose re-traced primitive differs
    (their attrs must be recomputed by the caller from shading_rows — a
    tiny compacted gather, the re-trace touches ~1e-3 of rays)."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    r = dirs.shape[0]
    t_live = jnp.full((r,), jnp.inf, jnp.float32)
    prim1, t1, unp1, _, cull = _closest_pass(
        clusters, origins, dirs, t_live, chunk_rows, m_budget, t_min,
        interpret, sc_budget)
    ids, valid, rays, nc = cull
    m = min(m_budget, clusters.cluster_count)
    chunk = chunk_rows * _LANE
    prim_f = jnp.where(prim1 == INVALID, -1.0, prim1.astype(jnp.float32))
    pad = nc * chunk - r
    if pad:
        prim_f = jnp.concatenate([prim_f, jnp.full((pad,), -1.0)])
    rays8 = jnp.concatenate(
        [rays, prim_f.reshape(1, -1, _LANE)], axis=0)
    attrs = _attr_pass(clusters, ids, valid, rays8, nc, chunk_rows, m,
                       ray_d_derivs, interpret)[:r]

    no_stale = jnp.zeros((r,), bool)
    if retrace_factor <= 1:
        return prim1, t1, jnp.sum(unp1, dtype=jnp.int32), attrs, no_stale
    rows2 = chunk_rows if chunk_rows <= 8 \
        else max(8, chunk_rows // _RETRACE_CHUNK_DIV)

    def do_retrace(_):
        idx, sel_unp, covered = _retrace_chunk_gather(unp1, r, chunk)
        t2_max = jnp.where(sel_unp, jnp.inf, -1.0)
        prim2, t2, _, bound2, _ = _closest_pass(
            clusters, origins[idx], dirs[idx], t2_max, rows2,
            m_budget * retrace_factor, t_min, interpret,
            sc_budget * retrace_factor)
        t1_sel = t1[idx]
        better = sel_unp & (t2 < t1_sel)
        t_sel = jnp.where(better, t2, t1_sel)
        prim_sel = jnp.where(better, prim2, prim1[idx])
        scatter_idx = jnp.where(sel_unp, idx, jnp.int32(r))
        t = t1.at[scatter_idx].set(t_sel, mode="drop")
        prim = prim1.at[scatter_idx].set(prim_sel, mode="drop")
        stale = no_stale.at[scatter_idx].set(better, mode="drop")
        residual = jnp.sum(unp1, dtype=jnp.int32) - covered \
            + jnp.sum(sel_unp & (t_sel > bound2), dtype=jnp.int32)
        return prim, t, residual, stale

    def skip(_):
        return prim1, t1, jnp.int32(0), no_stale

    prim, t, residual, stale = jax.lax.cond(jnp.any(unp1), do_retrace,
                                            skip, None)
    return prim, t, residual, attrs, stale
