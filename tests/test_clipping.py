import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vulkan_renderer_tpu import MAX_POLYGON_VERTEX_COUNT as MAXV
from vulkan_renderer_tpu.ops.clipping import clip_polygon


def pad_polygon(verts):
    verts = np.asarray(verts, np.float32)
    pad = MAXV - verts.shape[0]
    return np.concatenate([verts, np.repeat(verts[:1], pad, 0)], axis=0)


def polygon_area_2d(verts2):
    v = np.asarray(verts2)
    x, y = v[:, 0], v[:, 1]
    return 0.5 * np.abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y))


def test_fully_above():
    quad = [[0, 0, 1], [1, 0, 1], [1, 1, 2], [0, 1, 2]]
    out, count = clip_polygon(jnp.asarray(pad_polygon(quad)), jnp.int32(4))
    assert int(count) == 4
    np.testing.assert_allclose(np.asarray(out)[:4], np.asarray(quad, np.float32))
    # Padding repeats the first output vertex.
    np.testing.assert_allclose(np.asarray(out)[4:],
                               np.broadcast_to(np.asarray(out)[0], (4, 3)))


def test_fully_below():
    tri = [[0, 0, -1], [1, 0, -2], [0, 1, -1]]
    out, count = clip_polygon(jnp.asarray(pad_polygon(tri)), jnp.int32(3))
    assert int(count) == 0


def test_crossing_triangle_gains_vertex():
    tri = [[0.0, 0.0, 1.0], [2.0, 0.0, -1.0], [-2.0, 0.0, -1.0]]
    # One vertex above -> clipped result is a triangle (1 above + 2 isects).
    out, count = clip_polygon(jnp.asarray(pad_polygon(tri)), jnp.int32(3))
    out = np.asarray(out)
    assert int(count) == 3
    assert np.all(out[: int(count), 2] >= -1e-6)


def test_quad_crossing_gains_vertex():
    quad = [[-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1]]
    out, count = clip_polygon(jnp.asarray(pad_polygon(quad)), jnp.int32(4))
    out = np.asarray(out)
    assert int(count) == 4
    assert np.all(out[:4, 2] >= -1e-6)
    # Intersections lie on z = 0.
    zs = np.sort(out[:4, 2])
    np.testing.assert_allclose(zs[:2], 0.0, atol=1e-6)


@pytest.mark.parametrize("n", [3, 4, 5, 6, 7])
def test_random_polygons_area_preserved(n, rng):
    """Clipped area (projected to a consistent plane) must equal the exact
    intersection area of the polygon with the half space z>=0."""
    for _ in range(50):
        # Convex planar polygon: regular n-gon in a random plane.
        angles = np.sort(rng.uniform(0, 2 * np.pi, n))
        center = rng.normal(0, 1, 3)
        basis = np.linalg.qr(rng.normal(0, 1, (3, 3)))[0][:, :2]
        verts = center + np.cos(angles)[:, None] * basis[:, 0] \
            + np.sin(angles)[:, None] * basis[:, 1]
        out, count = clip_polygon(jnp.asarray(pad_polygon(verts).astype(np.float32)),
                                  jnp.int32(n))
        out, count = np.asarray(out, np.float64), int(count)

        # Exact clipped polygon via shapely-free Sutherland-Hodgman in float64.
        poly = list(verts)
        clipped = []
        for i in range(n):
            cur, nxt = poly[i], poly[(i + 1) % n]
            if cur[2] > 0:
                clipped.append(cur)
            if (cur[2] > 0) != (nxt[2] > 0):
                t = cur[2] / (cur[2] - nxt[2])
                clipped.append(cur + t * (nxt - cur))
        if len(clipped) < 3:
            assert count == 0
            continue
        clipped = np.array(clipped)
        assert count == len(clipped)
        # Compare areas via the 3D shoelace (cross-product) formula.
        def area3d(v):
            s = np.zeros(3)
            for i in range(len(v)):
                s += np.cross(v[i], v[(i + 1) % len(v)])
            return 0.5 * np.linalg.norm(s)
        np.testing.assert_allclose(area3d(out[:count]), area3d(clipped),
                                   rtol=1e-4, atol=1e-6)
        assert np.all(out[:count, 2] >= -1e-5)


def test_vmap_works(rng):
    polys = rng.normal(0, 1, (16, MAXV, 3)).astype(np.float32)
    counts = np.full(16, 4, np.int32)
    out, cnt = jax.vmap(clip_polygon)(jnp.asarray(polys), jnp.asarray(counts))
    assert out.shape == (16, MAXV, 3)
