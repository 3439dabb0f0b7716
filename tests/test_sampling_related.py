"""Tests for the related-work samplers (Urena, Arvo, Hart warps)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tests.test_sampling import (exact_polygon_solid_angle,
                                 integrate_over_polygon_solid_angle,
                                 make_polygon, pad_polygon)
from vulkan_renderer_tpu.ops import sampling_related as sr
from vulkan_renderer_tpu.ops.cubic import solve_cubic


def test_cubic_solver_three_real(rng):
    for _ in range(50):
        roots_true = np.sort(rng.uniform(-2, 2, 3))
        c3 = rng.uniform(0.5, 2.0)
        # c3 (x - r0)(x - r1)(x - r2)
        r0, r1, r2 = roots_true
        coeffs = np.array([-c3 * r0 * r1 * r2,
                           c3 * (r0 * r1 + r0 * r2 + r1 * r2),
                           -c3 * (r0 + r1 + r2), c3], np.float32)
        roots, three = solve_cubic(jnp.asarray(coeffs))
        assert bool(three)
        np.testing.assert_allclose(np.sort(np.asarray(roots)), roots_true,
                                   atol=2e-3)


def test_cubic_solver_one_real(rng):
    # (x - 1)(x^2 + 1) = x^3 - x^2 + x - 1
    coeffs = jnp.asarray([-1.0, 1.0, -1.0, 1.0], jnp.float32)
    roots, three = solve_cubic(coeffs)
    assert not bool(three)
    assert float(roots[0]) == pytest.approx(1.0, abs=1e-5)


def test_urena_rectangle_matches_exact(rng):
    """Urena solid angle equals the exact polygon solid angle; samples are
    uniform in it (importance-consistency check)."""
    # Rectangle in a tilted plane.
    s = np.array([0.5, 0.8, 1.5])
    axis_x = np.array([1.0, 0.0, 0.0])
    axis_y_raw = np.array([0.0, 0.8, 0.6])
    axis_y = axis_y_raw / np.linalg.norm(axis_y_raw)
    axis_z = np.cross(axis_x, axis_y)
    exl, eyl = 0.9, 0.7
    verts = np.array([s, s + exl * axis_x, s + exl * axis_x + eyl * axis_y,
                      s + eyl * axis_y], np.float32)
    squad = sr.prepare_solid_angle_rectangle_sampling_urena(
        jnp.asarray(s, jnp.float32), jnp.asarray(exl * axis_x, jnp.float32),
        jnp.asarray(eyl * axis_y, jnp.float32), jnp.float32(exl),
        jnp.float32(eyl), jnp.asarray(axis_x, jnp.float32),
        jnp.asarray(axis_y, jnp.float32), jnp.asarray(axis_z, jnp.float32),
        jnp.zeros(3, jnp.float32))
    exact = exact_polygon_solid_angle(verts)
    assert float(squad.solid_angle) == pytest.approx(exact, rel=1e-3)

    def g(d):
        return 1.0 + 0.4 * d[..., 0] + 0.2 * d[..., 2]

    rnd = jnp.asarray(rng.uniform(0, 1, (100_000, 2)).astype(np.float32))
    dirs = jax.vmap(lambda r: sr.sample_solid_angle_rectangle_urena(squad, r))(rnd)
    est = float(squad.solid_angle) * float(jnp.mean(g(dirs)))
    exact_int = integrate_over_polygon_solid_angle(verts, g)
    assert est == pytest.approx(exact_int, rel=0.01)


@pytest.mark.parametrize("n", [3, 5])
def test_arvo_solid_angle_matches_ours(n, rng):
    verts = make_polygon(rng, n)
    padded = jnp.asarray(pad_polygon(verts))
    poly = sr.prepare_solid_angle_polygon_sampling_arvo(
        padded, jnp.int32(n), jnp.zeros(3))
    exact = exact_polygon_solid_angle(verts)
    assert float(poly.solid_angle) == pytest.approx(exact, rel=1e-4)

    def g(d):
        return 1.0 + 0.5 * d[..., 1]

    rnd = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4, (100_000, 2)).astype(np.float32))
    dirs = jax.vmap(lambda r: sr.sample_solid_angle_polygon_arvo(poly, r))(rnd)
    assert np.all(np.isfinite(np.asarray(dirs)))
    est = float(poly.solid_angle) * float(jnp.mean(g(dirs)))
    exact_int = integrate_over_polygon_solid_angle(verts, g)
    assert est == pytest.approx(exact_int, rel=0.02)


@pytest.mark.parametrize("warp", ["bilinear", "biquadratic"])
def test_hart_warp_density_consistency(warp, rng):
    """Hart warps: E[g/p] over the polygon equals the plain integral."""
    # Polygon above the horizon in shading space (z up).
    verts = make_polygon(rng, 4, center_dir=[0.3, 0.2, 0.93], radius=0.5,
                         distance=1.8)
    padded = jnp.asarray(pad_polygon(verts))
    if warp == "bilinear":
        poly = sr.prepare_bilinear_cosine_warp_polygon_sampling_hart(
            padded, jnp.int32(4))
        sample = sr.sample_bilinear_cosine_warp_polygon_hart
    else:
        poly = sr.prepare_biquadratic_cosine_warp_polygon_sampling_hart(
            padded, jnp.int32(4))
        sample = sr.sample_biquadratic_cosine_warp_polygon_hart

    def g(d):
        return 1.0 + 0.3 * d[..., 0] + 0.5 * jnp.maximum(d[..., 2], 0.0)

    rnd = jnp.asarray(rng.uniform(1e-4, 1 - 1e-4, (150_000, 2)).astype(np.float32))
    dirs, densities = jax.vmap(lambda r: sample(poly, r))(rnd)
    d_np = np.asarray(densities)
    assert np.all(np.isfinite(np.asarray(dirs)))
    assert np.all(d_np > 0.0)
    est = float(jnp.mean(g(dirs) / densities))
    exact_int = integrate_over_polygon_solid_angle(verts, g)
    assert est == pytest.approx(exact_int, rel=0.02)


# ===========================================================================
# Arvo projected solid angle sampling
# ===========================================================================

from vulkan_renderer_tpu.ops import sampling_arvo_psa as arvo
from vulkan_renderer_tpu.ops import sampling as ours
from tests.test_sampling import exact_projected_solid_angle


@pytest.mark.parametrize("n,central", [(4, False), (5, False), (4, True)])
def test_arvo_psa_total(n, central, rng):
    for _ in range(5):
        if central:
            verts = make_polygon(rng, n, center_dir=[0, 0, 1.0], radius=1.0,
                                 distance=1.5, spread=True)
        else:
            verts = make_polygon(rng, n, center_dir=[0.6, 0.3, 0.74],
                                 radius=0.4, distance=2.0)
        poly = arvo.prepare_projected_solid_angle_polygon_sampling_arvo(
            jnp.asarray(pad_polygon(verts)), jnp.int32(n))
        assert bool(arvo.is_central_case_arvo(poly)) == central
        exact = exact_projected_solid_angle(verts)
        assert float(poly.projected_solid_angle) == pytest.approx(exact,
                                                                  rel=2e-3)


@pytest.mark.parametrize("central", [False, True])
def test_arvo_psa_importance_consistency(central, rng):
    if central:
        verts = make_polygon(rng, 4, center_dir=[0, 0, 1.0], radius=1.2,
                             distance=1.2, spread=True)
    else:
        verts = make_polygon(rng, 4, center_dir=[0.5, -0.2, 0.84],
                             radius=0.5, distance=2.0)
    poly = arvo.prepare_projected_solid_angle_polygon_sampling_arvo(
        jnp.asarray(pad_polygon(verts)), jnp.int32(4))
    psa = float(poly.projected_solid_angle)

    def g(d):
        return 1.0 + 0.3 * d[..., 1] + 0.5 * d[..., 2]

    rnd = jnp.asarray(rng.uniform(1e-3, 1 - 1e-3, (150_000, 2))
                      .astype(np.float32))
    dirs = jax.vmap(
        lambda r: arvo.sample_projected_solid_angle_polygon_arvo(
            poly, r, 3))(rnd)
    dirs_np = np.asarray(dirs)
    assert np.all(np.isfinite(dirs_np))
    z = np.maximum(dirs_np[:, 2], 1e-8)
    est = psa * float(np.mean(np.asarray(g(dirs)) / z))
    exact = integrate_over_polygon_solid_angle(verts, g)
    assert est == pytest.approx(exact, rel=0.02)


@pytest.mark.slow
def test_arvo_psa_backward_error(rng):
    worst = 0.0
    for _ in range(5):
        verts = make_polygon(rng, 5, center_dir=[0.4, 0.2, 0.89],
                             radius=0.45, distance=1.8)
        poly = arvo.prepare_projected_solid_angle_polygon_sampling_arvo(
            jnp.asarray(pad_polygon(verts)), jnp.int32(5))
        if bool(arvo.is_central_case_arvo(poly)):
            continue
        rnd = jnp.asarray(rng.uniform(1e-3, 1 - 1e-3, (256, 2))
                          .astype(np.float32))
        dirs = jax.vmap(
            lambda r: arvo.sample_projected_solid_angle_polygon_arvo(
                poly, r, 3))(rnd)
        errors = jax.vmap(
            lambda r, d:
            arvo.compute_projected_solid_angle_polygon_sampling_error_arvo(
                poly, r, d))(rnd, dirs)
        worst = max(worst, float(np.quantile(
            np.abs(np.asarray(errors)[:, 0]), 0.95)))
    assert worst < 1e-4  # Arvo's method is less accurate than ours by design
