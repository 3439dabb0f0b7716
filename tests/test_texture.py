"""Texture filtering (render/texture.py): trilinear LOD selection and the
anisotropic path (reference sampler: scene.c:546-557, maxAnisotropy=16)."""

import numpy as np
import jax.numpy as jnp

from vulkan_renderer_tpu.render.texture import (build_texture_atlas,
                                                sample_texture_grad,
                                                sample_texture_lod0)


def _stripe_atlas():
    """Vertical stripes at mip 0; uniform gray coarser mips (so any
    overblurring is visible as 0.5)."""
    r = 64
    stripe = np.zeros((r, r, 4), np.float32)
    stripe[:, ::2] = 1.0
    stripe[..., 3] = 1.0
    mips = [stripe]
    size = r // 2
    while size >= 1:
        gray = np.full((size, size, 4), 0.5, np.float32)
        gray[..., 3] = 1.0
        mips.append(gray)
        size //= 2
    return build_texture_atlas([mips])


def test_lod0_exact_fetch():
    atlas = _stripe_atlas()
    uv = jnp.asarray([0.5 / 64.0, 0.5 / 64.0])  # texel (0,0) center: stripe
    v = sample_texture_lod0(atlas, 0, uv)
    np.testing.assert_allclose(np.asarray(v)[0], 1.0, atol=1e-6)


def test_isotropic_lod_from_derivatives():
    atlas = _stripe_atlas()
    uv = jnp.asarray([0.3, 0.3])
    # Footprint of ~4 texels -> lod 2 -> gray mip.
    d = jnp.asarray([4.0 / 64.0, 0.0])
    v = sample_texture_grad(atlas, 0, uv, d, jnp.asarray([0.0, 4.0 / 64.0]))
    np.testing.assert_allclose(np.asarray(v)[0], 0.5, atol=1e-3)
    # Sub-texel footprint -> mip 0 detail survives.
    d = jnp.asarray([0.5 / 64.0, 0.0])
    v0 = sample_texture_grad(atlas, 0, jnp.asarray([0.5 / 64, 0.5 / 64]),
                             d, jnp.asarray([0.0, 0.5 / 64.0]))
    assert abs(float(v0[0]) - 1.0) < 0.26


def test_anisotropic_sharper_than_isotropic():
    """Grazing footprint: wide along v (stripe-invariant), narrow along u.
    Isotropic blurs to the gray mip; anisotropic taps stay at a finer lod
    and preserve the stripe contrast."""
    atlas = _stripe_atlas()
    uv = jnp.asarray([0.5 / 64.0, 0.5])   # on a white stripe
    duv_dx = jnp.asarray([0.5 / 64.0, 0.0])    # narrow across stripes
    duv_dy = jnp.asarray([0.0, 8.0 / 64.0])    # wide along stripes
    iso = sample_texture_grad(atlas, 0, uv, duv_dx, duv_dy,
                              max_anisotropy=1)
    aniso = sample_texture_grad(atlas, 0, uv, duv_dx, duv_dy,
                                max_anisotropy=8)
    # Isotropic lod = log2(8) = 3 -> gray.
    np.testing.assert_allclose(float(iso[0]), 0.5, atol=1e-3)
    # Anisotropic lod = log2(8/8) = 0 -> taps along v keep the stripe.
    assert float(aniso[0]) > 0.9, float(aniso[0])


def test_anisotropy_ratio_clamps_to_max():
    """eta caps at max_anisotropy: lod = log2(rho_max / A), never finer."""
    atlas = _stripe_atlas()
    uv = jnp.asarray([0.25, 0.25])
    duv_dx = jnp.asarray([1.0 / 64.0, 0.0])
    duv_dy = jnp.asarray([0.0, 32.0 / 64.0])  # ratio 32 > A=4
    v = sample_texture_grad(atlas, 0, uv, duv_dx, duv_dy, max_anisotropy=4)
    # lod = log2(32/4) = 3 -> gray mip everywhere along the line.
    np.testing.assert_allclose(float(v[0]), 0.5, atol=1e-2)


def test_isotropic_footprint_unchanged_by_aniso_path():
    """For square footprints the anisotropic sampler must agree with the
    trilinear one (eta == 1 -> all taps collapse onto uv)."""
    atlas = _stripe_atlas()
    uv = jnp.asarray([0.37, 0.71])
    d = jnp.asarray([2.0 / 64.0, 0.0])
    dy = jnp.asarray([0.0, 2.0 / 64.0])
    iso = sample_texture_grad(atlas, 0, uv, d, dy, max_anisotropy=1)
    aniso = sample_texture_grad(atlas, 0, uv, d, dy, max_anisotropy=8)
    np.testing.assert_allclose(np.asarray(aniso), np.asarray(iso),
                               atol=1e-5)
