import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vulkan_renderer_tpu.ops import brdf


def make_shading_data(normal=(0, 0, 1), outgoing=(0.3, 0.1, 0.95),
                      albedo=(0.5, 0.4, 0.3), f0=(0.04, 0.04, 0.04),
                      roughness=0.25):
    normal = jnp.asarray(normal, jnp.float32)
    normal = normal / jnp.linalg.norm(normal)
    outgoing = jnp.asarray(outgoing, jnp.float32)
    outgoing = outgoing / jnp.linalg.norm(outgoing)
    return brdf.ShadingData(
        position=jnp.zeros(3),
        normal=normal,
        outgoing=outgoing,
        lambert_outgoing=jnp.sum(normal * outgoing),
        diffuse_albedo=jnp.asarray(albedo, jnp.float32),
        fresnel_0=jnp.asarray(f0, jnp.float32),
        roughness=jnp.float32(roughness),
    )


def hemisphere_dirs(rng, n):
    d = rng.normal(0, 1, (n, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d[:, 2] = np.abs(d[:, 2])
    return d.astype(np.float32)


def test_brdf_nonnegative_and_reciprocal_shape(rng):
    data = make_shading_data()
    dirs = hemisphere_dirs(rng, 1000)
    vals = np.asarray(jax.vmap(lambda d: brdf.evaluate_brdf(data, d))(
        jnp.asarray(dirs)))
    assert np.all(vals >= 0.0)
    assert np.all(np.isfinite(vals))


def test_white_furnace_diffuse(rng):
    """Integral of diffuse BRDF * cos over the hemisphere stays <= albedo
    (energy conservation) and is close to albedo for smooth surfaces."""
    data = make_shading_data(outgoing=(0, 0, 1), albedo=(1.0, 1.0, 1.0),
                             roughness=0.05)
    n = 200_000
    dirs = hemisphere_dirs(rng, n)
    vals = np.asarray(jax.vmap(
        lambda d: brdf.evaluate_brdf(data, d, diffuse=True, specular=False))(
        jnp.asarray(dirs)))
    cos = dirs[:, 2]
    integral = 2 * np.pi * np.mean(vals[:, 0] * cos)
    assert 0.8 < integral <= 1.05


def test_vndf_density_integrates_to_one(rng):
    """The visible-normal density must integrate to 1 over the hemisphere."""
    outgoing = jnp.asarray([0.4, 0.0, 0.9165], jnp.float32)
    outgoing = outgoing / jnp.linalg.norm(outgoing)
    roughness = 0.4
    n = 400_000
    m = hemisphere_dirs(rng, n)
    micro_dot_out = m @ np.asarray(outgoing)
    dens = np.asarray(brdf.ggx_visible_normal_density(
        float(outgoing[2]), jnp.asarray(m[:, 2]),
        jnp.asarray(micro_dot_out), jnp.float32(roughness)))
    dens = np.where(micro_dot_out > 0, dens, 0.0)
    integral = 2 * np.pi * np.mean(dens)
    assert integral == pytest.approx(1.0, rel=0.02)


def test_vndf_sampling_matches_density(rng):
    """E[f(m)] under the sampler equals integral f * density dm."""
    outgoing = np.array([0.5, 0.2, 0.84], np.float32)
    outgoing /= np.linalg.norm(outgoing)
    roughness = 0.5
    n = 200_000
    rnd = jnp.asarray(rng.uniform(0, 1, (n, 2)).astype(np.float32))
    samples = np.asarray(jax.vmap(
        lambda r: brdf.sample_ggx_visible_normal(
            jnp.asarray(outgoing), jnp.asarray([roughness, roughness]), r))(rnd))
    assert np.all(samples[:, 2] >= -1e-6)
    np.testing.assert_allclose(np.linalg.norm(samples, axis=-1), 1.0,
                               atol=1e-3)

    def f(m):
        return (1.0 + m[:, 0]) * m[:, 2]

    est = np.mean(f(samples))
    m = hemisphere_dirs(rng, 400_000)
    micro_dot_out = m @ outgoing
    dens = np.asarray(brdf.ggx_visible_normal_density(
        float(outgoing[2]), jnp.asarray(m[:, 2]), jnp.asarray(micro_dot_out),
        jnp.float32(roughness)))
    dens = np.where(micro_dot_out > 0, dens, 0.0)
    ref = 2 * np.pi * np.mean(f(m) * dens)
    assert est == pytest.approx(ref, rel=0.02)


def test_reflected_direction_density_consistency(rng):
    """Density returned by the sampler matches the standalone evaluator."""
    outgoing = np.array([0.3, -0.2, 0.93], np.float32)
    outgoing /= np.linalg.norm(outgoing)
    roughness = 0.3
    rnd = jnp.asarray(rng.uniform(0.01, 0.99, (512, 2)).astype(np.float32))
    dirs, densities = jax.vmap(
        lambda r: brdf.sample_ggx_reflected_direction(
            jnp.asarray(outgoing), jnp.float32(roughness), r))(rnd)
    normal = jnp.asarray([0.0, 0.0, 1.0])
    recomputed = jax.vmap(
        lambda d: brdf.ggx_reflected_direction_density(
            jnp.float32(outgoing[2]), jnp.asarray(outgoing), d, normal,
            jnp.float32(roughness)))(dirs)
    np.testing.assert_allclose(np.asarray(densities), np.asarray(recomputed),
                               rtol=1e-3, atol=1e-5)
