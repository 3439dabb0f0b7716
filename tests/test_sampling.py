"""Tests for solid-angle and projected-solid-angle polygon sampling.

Strategy (SURVEY.md §4): the reference's error-display modes become real
asserting tests — Monte Carlo cross-checks of total (projected) solid angle,
importance-sampling consistency for smooth integrands, and backward error of
the iterative PSA inversion below 1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vulkan_renderer_tpu import MAX_POLYGON_VERTEX_COUNT as MAXV
from vulkan_renderer_tpu.ops import sampling


def pad_polygon(verts):
    verts = np.asarray(verts, np.float32)
    pad = MAXV - verts.shape[0]
    if pad:
        verts = np.concatenate([verts, np.repeat(verts[:1], pad, 0)], axis=0)
    return verts


def make_polygon(rng, n, center_dir=None, radius=0.5, distance=2.0,
                 spread=False):
    """Convex planar n-gon at `distance` along center_dir, CCW in the plane
    as seen from the origin looking along center_dir (= 'clockwise from the
    origin' in the reference's convention when center_dir ~ +z).

    With spread=True the vertex angles are jittered around a regular n-gon,
    guaranteeing the polygon contains the point distance*center_dir (needed
    for guaranteed-central test cases)."""
    if center_dir is None:
        center_dir = np.array([0.2, -0.1, 1.0])
    center_dir = np.asarray(center_dir, np.float64)
    center_dir /= np.linalg.norm(center_dir)
    # Orthonormal basis (u, v) with u x v = center_dir.
    helper = np.array([1.0, 0.0, 0.0])
    if abs(center_dir[0]) > 0.9:
        helper = np.array([0.0, 1.0, 0.0])
    u = np.cross(helper, center_dir)
    u /= np.linalg.norm(u)
    v = np.cross(center_dir, u)
    if spread:
        angles = (np.arange(n) + rng.uniform(0.15, 0.85, n)) * (2 * np.pi / n)
    else:
        angles = np.sort(rng.uniform(0, 2 * np.pi, n))
        while np.min(np.diff(np.concatenate(
                [angles, [angles[0] + 2 * np.pi]]))) < 0.15:
            angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    center = distance * center_dir
    verts = center + radius * (np.cos(angles)[:, None] * u
                               + np.sin(angles)[:, None] * v)
    return verts.astype(np.float32)


def point_in_convex_polygon(point, verts):
    n = len(verts)
    normal = np.cross(verts[1] - verts[0], verts[2] - verts[0])
    sign = 0.0
    for i in range(n):
        edge = verts[(i + 1) % n] - verts[i]
        c = np.cross(edge, point - verts[i])
        s = np.dot(c, normal)
        if sign == 0.0:
            sign = s
        elif s * sign < 0:
            return False
    return True


def integrate_over_polygon_solid_angle(verts, g, res=400):
    """Deterministic quadrature of integral of g(dir) over the solid angle
    subtended by a planar polygon seen from the origin (float64).

    Converts to an area integral: domega = cos(theta) dA / r^2."""
    v = np.asarray(verts, np.float64)
    normal = np.cross(v[1] - v[0], v[2] - v[0])
    normal /= np.linalg.norm(normal)
    # Midpoint-rule grid in barycentric (a, b) space; cells with a+b<1 tile
    # the triangle. A square subcell of the triangle split along its diagonal
    # pairs with its mirror, so using centers of kept cells is a consistent
    # O(1/res^2) rule for smooth integrands.
    e = (np.arange(res) + 0.5) / res
    a_grid, b_grid = np.meshgrid(e, e, indexing="ij")
    mask = a_grid + b_grid < 1.0
    a_f, b_f = a_grid[mask], b_grid[mask]
    total = 0.0
    for i in range(len(v) - 2):
        p0, p1, p2 = v[0], v[i + 1], v[i + 2]
        tri_area2 = np.linalg.norm(np.cross(p1 - p0, p2 - p0))  # = 2*area
        pts = p0 + a_f[:, None] * (p1 - p0) + b_f[:, None] * (p2 - p0)
        r = np.linalg.norm(pts, axis=-1)
        dirs = pts / r[:, None]
        cos_theta = np.abs(dirs @ normal)
        w = cos_theta / (r * r)
        vals = np.asarray(g(jnp.asarray(dirs)), np.float64)
        total += np.sum(vals * w) * tri_area2 / (res * res)
    return total


def mc_polygon_solid_angles(verts, n_dirs=400_000, seed=7, weight_z=False):
    """MC estimate of (projected) solid angle of a polygon seen from origin."""
    rng = np.random.default_rng(seed)
    dirs = rng.normal(0, 1, (n_dirs, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    normal = np.cross(verts[1] - verts[0], verts[2] - verts[0])
    normal /= np.linalg.norm(normal)
    d = np.dot(normal, verts[0])
    denom = dirs @ normal
    with np.errstate(divide="ignore", invalid="ignore"):
        t = d / denom
    hits = t > 0
    pts = dirs * t[:, None]
    # Vectorized convex point-in-polygon.
    inside = hits.copy()
    nverts = len(verts)
    ref_sign = None
    for i in range(nverts):
        edge = verts[(i + 1) % nverts] - verts[i]
        c = np.cross(np.broadcast_to(edge, pts.shape), pts - verts[i])
        s = c @ normal
        if ref_sign is None:
            ref_sign = np.sign(np.where(s == 0, 1, s))
        inside &= (s * ref_sign) >= 0
    w = inside.astype(np.float64)
    if weight_z:
        w = w * np.maximum(dirs[:, 2], 0.0)
    return 4.0 * np.pi * np.mean(w)


# ===========================================================================
# Solid angle sampling
# ===========================================================================

def exact_polygon_solid_angle(verts):
    """Float64 triangle-fan solid angle via Van Oosterom-Strackee atan2."""
    v = np.asarray(verts, np.float64)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    total = 0.0
    for i in range(len(v) - 2):
        a, b, c = v[0], v[i + 1], v[i + 2]
        det = np.dot(a, np.cross(b, c))
        denom = 1.0 + np.dot(a, b) + np.dot(a, c) + np.dot(b, c)
        total += 2.0 * np.arctan2(abs(det), denom)
    return total


@pytest.mark.parametrize("n", [3, 4, 5, 7])
def test_solid_angle_total(n, rng):
    for _ in range(5):
        verts = make_polygon(rng, n)
        poly = sampling.prepare_solid_angle_polygon_sampling(
            jnp.asarray(pad_polygon(verts)), jnp.int32(n), jnp.zeros(3))
        exact = exact_polygon_solid_angle(verts)
        assert float(poly.solid_angle) == pytest.approx(exact, rel=1e-4)


@pytest.mark.parametrize("n", [3, 5])
def test_solid_angle_samples_hit_polygon(n, rng):
    verts = make_polygon(rng, n)
    poly = sampling.prepare_solid_angle_polygon_sampling(
        jnp.asarray(pad_polygon(verts)), jnp.int32(n), jnp.zeros(3))
    rnd = jnp.asarray(rng.uniform(0, 1, (2000, 2)).astype(np.float32))
    dirs = np.asarray(jax.vmap(
        lambda r: sampling.sample_solid_angle_polygon(poly, r))(rnd))
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-3)
    normal = np.cross(verts[1] - verts[0], verts[2] - verts[0]).astype(np.float64)
    d = np.dot(normal, verts[0].astype(np.float64))
    t = d / (dirs @ normal)
    pts = dirs * t[:, None]
    misses = sum(1 for p in pts if not point_in_convex_polygon(p, verts.astype(np.float64)))
    assert misses / len(pts) < 0.005  # allow boundary rounding


@pytest.mark.parametrize("n", [4])
def test_solid_angle_importance_consistency(n, rng):
    """Estimate integral of a smooth g over the polygon's solid angle with the
    sampler (density 1/Omega) and compare against brute-force MC."""
    verts = make_polygon(rng, n)
    poly = sampling.prepare_solid_angle_polygon_sampling(
        jnp.asarray(pad_polygon(verts)), jnp.int32(n), jnp.zeros(3))

    def g(d):
        return 1.0 + 0.5 * d[..., 0] + 0.25 * d[..., 2] ** 2

    n_samples = 200_000
    rnd = jnp.asarray(rng.uniform(0, 1, (n_samples, 2)).astype(np.float32))
    dirs = jax.vmap(lambda r: sampling.sample_solid_angle_polygon(poly, r))(rnd)
    est = float(poly.solid_angle) * float(jnp.mean(g(dirs)))

    exact = integrate_over_polygon_solid_angle(verts, g)
    assert est == pytest.approx(exact, rel=0.01)


# ===========================================================================
# Projected solid angle sampling
# ===========================================================================

def psa_prepare(verts, n):
    return sampling.prepare_projected_solid_angle_polygon_sampling(
        jnp.asarray(pad_polygon(verts)), jnp.int32(n))


def exact_projected_solid_angle(verts):
    """Float64 exact form-factor formula (Lambert/Baum):
    integral of max(z,0) over the polygon's solid angle, for polygons fully
    above the horizon: 0.5 * sum_i gamma_i * (unit_cross_i . z)."""
    v = np.asarray(verts, np.float64)
    v = v / np.linalg.norm(v, axis=-1, keepdims=True)
    total = 0.0
    n = len(v)
    for i in range(n):
        a, b = v[i], v[(i + 1) % n]
        c = np.cross(a, b)
        norm_c = np.linalg.norm(c)
        gamma = np.arctan2(norm_c, np.dot(a, b))
        total += gamma * (c[2] / norm_c)
    return abs(0.5 * total)


@pytest.mark.parametrize("n,central", [(3, False), (4, False), (5, False),
                                       (7, False), (4, True), (6, True)])
def test_psa_total(n, central, rng):
    for _ in range(5):
        if central:
            verts = make_polygon(rng, n, center_dir=[0.0, 0.0, 1.0],
                                 radius=1.0, distance=1.5, spread=True)
        else:
            verts = make_polygon(rng, n, center_dir=[0.6, 0.3, 0.74],
                                 radius=0.4, distance=2.0)
        poly = psa_prepare(verts, n)
        assert bool(sampling.is_central_case(poly)) == central
        exact = exact_projected_solid_angle(verts)
        assert float(poly.projected_solid_angle) == pytest.approx(exact, rel=1e-3)


@pytest.mark.parametrize("n,central", [(4, False), (5, False), (4, True)])
def test_psa_importance_consistency(n, central, rng):
    if central:
        verts = make_polygon(rng, n, center_dir=[0, 0, 1.0], radius=1.2,
                             distance=1.2, spread=True)
    else:
        verts = make_polygon(rng, n, center_dir=[0.5, -0.2, 0.84],
                             radius=0.5, distance=2.0)
    poly = psa_prepare(verts, n)
    psa = float(poly.projected_solid_angle)

    def g(d):
        return 1.0 + 0.3 * d[..., 1] + 0.5 * d[..., 2]

    n_samples = 200_000
    rnd = jnp.asarray(rng.uniform(1e-4, 1.0 - 1e-4,
                                  (n_samples, 2)).astype(np.float32))
    dirs = jax.vmap(
        lambda r: sampling.sample_projected_solid_angle_polygon(poly, r))(rnd)
    dirs_np = np.asarray(dirs)
    assert np.all(np.isfinite(dirs_np))
    z = np.maximum(dirs_np[:, 2], 1e-8)
    est = psa * float(np.mean(np.asarray(g(dirs)) / z))

    exact = integrate_over_polygon_solid_angle(verts, g)
    assert est == pytest.approx(exact, rel=0.02)


@pytest.mark.slow
@pytest.mark.parametrize("n", [3, 4, 5, 7])
def test_psa_backward_error(n, rng):
    """The 2-iteration inversion must have backward error < 1e-5 (the
    reference's acceptable_error bound, polygon_sampling.glsl:705)."""
    worst = 0.0
    for trial in range(10):
        verts = make_polygon(rng, n, center_dir=[0.4, 0.2, 0.89],
                             radius=0.45, distance=1.8)
        poly = psa_prepare(verts, n)
        if bool(sampling.is_central_case(poly)):
            continue
        rnd = jnp.asarray(rng.uniform(1e-3, 1 - 1e-3, (512, 2)).astype(np.float32))
        dirs = jax.vmap(
            lambda r: sampling.sample_projected_solid_angle_polygon(poly, r))(rnd)
        errors = jax.vmap(
            lambda r, d: sampling.compute_projected_solid_angle_polygon_sampling_error(
                poly, r, d))(rnd, dirs)
        backward = np.abs(np.asarray(errors)[:, 0])
        worst = max(worst, float(np.quantile(backward, 0.99)))
    assert worst < 1e-5


def test_psa_biased_close_to_unbiased(rng):
    verts = make_polygon(rng, 5, center_dir=[0.3, 0.1, 0.95], radius=0.5,
                         distance=2.0)
    padded = jnp.asarray(pad_polygon(verts))
    poly = sampling.prepare_projected_solid_angle_polygon_sampling(
        padded, jnp.int32(5))
    poly_b = sampling.prepare_projected_solid_angle_polygon_sampling(
        padded, jnp.int32(5), biased=True)
    assert float(poly_b.projected_solid_angle) == pytest.approx(
        float(poly.projected_solid_angle), rel=1e-3)
    rnd = jnp.asarray(rng.uniform(0.01, 0.99, (256, 2)).astype(np.float32))
    d0 = np.asarray(jax.vmap(
        lambda r: sampling.sample_projected_solid_angle_polygon(poly, r))(rnd))
    d1 = np.asarray(jax.vmap(
        lambda r: sampling.sample_projected_solid_angle_polygon(
            poly_b, r, biased=True))(rnd))
    # Biased variant skips iterations: close but not identical.
    assert np.quantile(np.linalg.norm(d0 - d1, axis=-1), 0.9) < 0.05


def test_psa_jit_and_vmap(rng):
    verts = make_polygon(rng, 4)
    padded = jnp.asarray(pad_polygon(verts))

    @jax.jit
    def run(rnd):
        poly = sampling.prepare_projected_solid_angle_polygon_sampling(
            padded, jnp.int32(4))
        return jax.vmap(
            lambda r: sampling.sample_projected_solid_angle_polygon(poly, r))(rnd)

    out = run(jnp.asarray(rng.uniform(0, 1, (64, 2)).astype(np.float32)))
    assert out.shape == (64, 3)
    assert np.all(np.isfinite(np.asarray(out)))
