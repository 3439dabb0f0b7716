"""Convex-polygon clipping against the upper hemisphere (z >= 0).

TPU-native replacement for the reference's generated jump table
(src/shaders/polygon_clipping.glsl:19-225). The reference encodes
(vertex_count | above-horizon bitmask) into an integer and switches over
~90 branchless cases — ideal for a scalar GPU core, hostile to XLA.

Here we implement the same semantics data-driven: a masked
Sutherland-Hodgman pass with static shapes. For a convex polygon clipped
against a single plane at most two edges cross the plane, so an input with
up to MAX_VERTS-1 vertices always fits the MAX_VERTS output buffer.

Contract (matches clip_polygon in the reference):
- input  v: (MAX_VERTS, 3), vertex_count (int); lanes >= count ignored.
- output v': (MAX_VERTS, 3), count' in {0} or [3, count+1]. If
  count' < MAX_VERTS, v'[count'] == v'[0] (first vertex repeated) and all
  remaining lanes also hold v'[0] so downstream fixed-lane loops are safe.
- winding is preserved.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .. import MAX_POLYGON_VERTEX_COUNT
from .math_utils import cumsum_lanes


def _intersect_z0(lhs, rhs):
    """Intersection of segment lhs->rhs with plane z == 0 (glsl iz0)."""
    t = lhs[..., 2] / (lhs[..., 2] - rhs[..., 2])
    xy = t[..., None] * rhs[..., :2] + (lhs[..., :2] - t[..., None] * lhs[..., :2])
    return jnp.concatenate([xy, jnp.zeros_like(xy[..., :1])], axis=-1)


def clip_polygon(vertices, vertex_count, max_verts: int = MAX_POLYGON_VERTEX_COUNT):
    """Clip a convex polygon to z >= 0.

    Args:
      vertices: (max_verts, 3) float32; lanes < vertex_count are the polygon.
      vertex_count: scalar int32.
    Returns:
      (clipped_vertices (max_verts, 3), clipped_count int32)
    """
    v = vertices
    lanes = np.arange(max_verts)
    active = lanes < vertex_count
    above = (v[:, 2] > 0.0) & active

    # next vertex = cyclic shift by one with the wrap at vertex_count.
    # (A dynamic-index gather here becomes a serialized batched gather
    # under vmap on TPU; roll + a single lane fix stays on the VPU.)
    wrap = lanes == vertex_count - 1
    v_next = jnp.where(wrap[:, None], v[0], jnp.roll(v, -1, axis=0))
    # Logical blend, not jnp.where: select on BOOL payloads lowers through
    # an i8 truncation Mosaic rejects.
    above_next = (wrap & above[0]) | (~wrap & jnp.roll(above, -1))

    # Per input edge (cur -> next): emit cur if cur above; emit the plane
    # intersection if the edge crosses the horizon.
    emit_cur = above
    emit_int = active & (above != above_next)
    isect = _intersect_z0(v, v_next)

    counts = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    offsets = cumsum_lanes(counts) - counts  # exclusive prefix sum
    out_count = jnp.sum(counts)

    # Scatter-free compose: out[j] = the unique emitted element whose output
    # slot is j. Each (k, j) match is exclusive, so a masked sum is exact;
    # jnp.where (not multiply) keeps NaNs from inactive isect lanes out.
    match_cur = emit_cur[:, None] & (offsets[:, None] == lanes[None, :])
    idx_int = offsets + emit_cur.astype(jnp.int32)
    match_int = emit_int[:, None] & (idx_int[:, None] == lanes[None, :])
    zero = jnp.zeros((), v.dtype)
    out = jnp.sum(jnp.where(match_cur[..., None], v[:, None, :], zero), axis=0)
    out = out + jnp.sum(jnp.where(match_int[..., None], isect[:, None, :],
                                  zero), axis=0)

    # Degenerate results (fewer than 3 vertices) count as fully clipped.
    out_count = jnp.where(out_count >= 3, out_count, 0)
    # Repeat the first output vertex in every unused lane.
    pad_mask = (lanes >= out_count)[:, None]
    out = jnp.where(pad_mask, out[0], out)
    out = jnp.where(out_count == 0, jnp.zeros_like(out), out)
    return out, out_count
