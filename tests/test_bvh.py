"""BVH build + traversal correctness against brute force."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vulkan_renderer_tpu.render.bvh import (build_bvh, make_bvh_closest_hit,
                                            make_bvh_occlusion)
from vulkan_renderer_tpu.render.visibility import trace_primary_bruteforce
from vulkan_renderer_tpu.tools.export_scene import make_cornell_box, \
    morton_order


def random_scene(rng, t_count):
    centers = rng.uniform(-5, 5, (t_count, 3))
    tris = (centers[:, None, :]
            + rng.uniform(-0.3, 0.3, (t_count, 3, 3))).astype(np.float32)
    order = morton_order(tris.mean(1), tris.reshape(-1, 3).min(0),
                         tris.reshape(-1, 3).max(0))
    return tris[order]


@pytest.mark.parametrize("t_count,leaf", [(30, 4), (1000, 4), (1000, 8)])
def test_closest_hit_matches_bruteforce(t_count, leaf, rng):
    tris = random_scene(rng, t_count)
    bvh = build_bvh(tris, leaf_size=leaf)
    origin = np.array([0.0, 0.0, -12.0], np.float32)
    n = 2048
    dirs = rng.normal(0, 1, (n, 3))
    dirs[:, 2] = np.abs(dirs[:, 2]) + 0.3
    dirs = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)) \
        .astype(np.float32)
    closest = make_bvh_closest_hit(bvh, leaf_size=leaf)
    prim_b, t_b = map(np.asarray, jax.jit(jax.vmap(
        lambda d: closest(jnp.asarray(origin), d)))(jnp.asarray(dirs)))
    prim_r, t_r = map(np.asarray, trace_primary_bruteforce(
        jnp.asarray(tris), jnp.asarray(origin), jnp.asarray(dirs)))
    agree = np.isclose(t_b, t_r, rtol=1e-4) | (np.isinf(t_b) & np.isinf(t_r))
    assert agree.all()
    assert (prim_b == prim_r).all()


def test_occlusion_matches_bruteforce(rng):
    tris = random_scene(rng, 800)
    bvh = build_bvh(tris)
    origin = np.array([0.0, 0.0, -12.0], np.float32)
    n = 2048
    dirs = rng.normal(0, 1, (n, 3))
    dirs[:, 2] = np.abs(dirs[:, 2]) + 0.3
    dirs = (dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)) \
        .astype(np.float32)
    max_t = 14.0
    occl = make_bvh_occlusion(bvh)
    found = np.asarray(jax.jit(jax.vmap(
        lambda d: occl(jnp.asarray(origin), d, jnp.float32(max_t))))(
        jnp.asarray(dirs)))
    _, t_r = trace_primary_bruteforce(jnp.asarray(tris), jnp.asarray(origin),
                                      jnp.asarray(dirs))
    expect = np.isfinite(np.asarray(t_r)) & (np.asarray(t_r) <= max_t)
    assert (found == expect).all()


@pytest.mark.slow
def test_bvh_cornell_render_matches_bruteforce(rng):
    """Full-frame renders with forced traversal backends must agree."""
    import tempfile

    from vulkan_renderer_tpu.core.settings import (PolygonSamplingTechnique,
                                                   RenderSettings,
                                                   SamplingStrategy)
    from vulkan_renderer_tpu.render.pipeline import render_frame
    from vulkan_renderer_tpu.render.shading import SceneStatic
    from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
    from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
    from vulkan_renderer_tpu.scene.scene import load_scene
    from vulkan_renderer_tpu.tools.export_scene import write_test_scene

    d = tempfile.mkdtemp()
    vks = write_test_scene(d, "cornell_box", texture_resolution=16)
    light = PolygonalLightSpec(
        translation=np.array([1.0, 1.0, 1.99], np.float32),
        rotation_angles=np.array([np.pi, 0, 0], np.float32),
        scaling_x=0.4, scaling_y=0.4,
        radiant_flux=np.array([40.0, 35.0, 30.0], np.float32))
    scene = load_scene(vks, d + "/cornell_box_textures", [light])
    cam = FirstPersonCamera(
        position_world_space=np.array([1.0, 0.15, 1.0], np.float32),
        rotation_x=np.pi / 2, rotation_z=np.pi)
    settings = RenderSettings(
        sampling_strategy=SamplingStrategy.DIFFUSE_ONLY,
        polygon_sampling_technique=PolygonSamplingTechnique.PROJECTED_SOLID_ANGLE,
        sample_count=2, trace_shadow_rays=True, animate_noise=False,
        output_linear_rgb=True)
    rnd = np.array([12, 34, 56, 78], np.uint32)
    img_bf = np.asarray(render_frame(
        scene, SceneStatic(1, (0,), traversal="bruteforce"), cam, settings,
        16, 16, noise_random_numbers=rnd))
    img_bvh = np.asarray(render_frame(
        scene, SceneStatic(1, (0,), traversal="wavefront"), cam, settings,
        16, 16, noise_random_numbers=rnd))
    np.testing.assert_allclose(img_bvh, img_bf, atol=1e-5)
