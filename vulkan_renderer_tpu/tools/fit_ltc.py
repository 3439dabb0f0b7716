"""LTC table fitting: GGX -> linearly transformed cosines.

The reference ships precomputed fit<i>.dat tables (loaded by ltc_table.c);
the fitting code itself is not in its repo. This module regenerates
equivalent tables from scratch, TPU-style: every (fresnel, inclination,
roughness) texel is fitted IN PARALLEL with vmap + Adam instead of the
classic sequential Nelder-Mead sweep.

Model: forward LTC transform M = [[m00,0,m02],[0,m11,0],[m20,0,1]]
(the file format's 4 parameters + albedo). The fitted density is evaluated
exactly like the renderer's evaluate_ltc_density (via the analytic inverse),
so what we optimize is literally what the shading pass importance-samples.

Output: fit<i>.dat files byte-compatible with the reference loader
(assets/ltc_table.py::save_ltc_table_files / load_ltc_table_files).

Accuracy only affects MIS variance, never bias (see assets/ltc_table.py).
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.math_utils import M_HALF_PI, M_PI


def _fibonacci_hemisphere(count: int) -> np.ndarray:
    """Deterministic, roughly uniform hemisphere directions (z >= 0)."""
    i = np.arange(count) + 0.5
    z = i / count                       # uniform in z -> uniform in solid angle
    phi = i * (np.pi * (3.0 - np.sqrt(5.0)))
    r = np.sqrt(np.maximum(0.0, 1.0 - z * z))
    return np.stack([r * np.cos(phi), r * np.sin(phi), z], -1) \
        .astype(np.float32)


def fit_ltc_tables(resolution: int = 32, fresnel_count: int = 8,
                   sample_count: int = 512, steps: int = 600,
                   learning_rate: float = 0.02) -> np.ndarray:
    """Returns records (fresnel_count, resolution, resolution, 5) float32 of
    (m00, m02, m11, m20, albedo), laid out like the fit files: texel (y, x)
    with x = sqrt-roughness axis, y = inclination axis (ltc_utility.glsl
    texcoord conventions, ltc_table.c:184-192)."""
    import jax
    import jax.numpy as jnp

    from ..ops.brdf import ShadingData, evaluate_brdf

    # Texel-center parameter grids, inverted through the texcoord transforms.
    tex = (np.arange(resolution) + 0.5) / resolution
    rough_factor = (resolution - 1) / resolution
    rough_summand = 0.5 / resolution
    sqrt_rough = np.clip((tex - rough_summand) / rough_factor, 0.0, 1.0)
    roughness_axis = (sqrt_rough ** 2).astype(np.float32)
    incl_factor = (resolution - 1) / (M_HALF_PI * resolution)
    incl_summand = 0.5 / resolution
    inclination_axis = ((tex - incl_summand) / incl_factor).astype(np.float32)
    f0_axis = np.linspace(0.0, 1.0, fresnel_count).astype(np.float32)

    dirs = jnp.asarray(_fibonacci_hemisphere(sample_count))
    solid_angle_weight = 2.0 * M_PI / sample_count
    # Fixed low-discrepancy uniforms for VNDF sampling (deterministic fits).
    i = np.arange(sample_count) + 0.5
    vndf_rnd = jnp.asarray(np.stack([
        i / sample_count, (i * 0.6180339887498949) % 1.0], -1)
        .astype(np.float32))

    def brdf_cos(f0, roughness, inclination, directions):
        outgoing = jnp.stack([jnp.sin(inclination), 0.0 * inclination,
                              jnp.cos(inclination)])
        data = ShadingData(
            position=jnp.zeros(3), normal=jnp.asarray([0.0, 0.0, 1.0]),
            outgoing=outgoing,
            lambert_outgoing=jnp.cos(inclination),
            diffuse_albedo=jnp.zeros(3),
            fresnel_0=jnp.stack([f0, f0, f0]),
            roughness=jnp.maximum(roughness, 0.0064),
        )
        vals = jax.vmap(lambda d: evaluate_brdf(data, d, diffuse=False,
                                                specular=True)[0])(directions)
        return vals * jnp.maximum(directions[:, 2], 0.0)

    def ltc_density(params, directions):
        m00, m02, m11, m20 = params
        m00 = jax.nn.softplus(m00) + 1e-4
        m11 = jax.nn.softplus(m11) + 1e-4
        # Analytic inverse of [[m00,0,m02],[0,m11,0],[m20,0,1]] (same shape
        # as ltc_table.c:86-90 with d=(m00,m02,m11,m20)). det2 is clamped
        # positive; the loss penalizes approaching the degenerate region.
        det2 = jnp.maximum(m00 - m02 * m20, 1e-5)
        inv = jnp.array([
            [1.0, 0.0, -m02],
            [0.0, det2 / m11, 0.0],
            [-m20, 0.0, m00]]) / det2
        dc = directions @ inv.T
        len_sq = jnp.sum(dc * dc, axis=-1)
        det_inv = jnp.abs(jnp.linalg.det(inv))
        dens = jnp.maximum(dc[:, 2], 0.0) * det_inv / (len_sq * len_sq)
        return jnp.maximum(dens * (1.0 / M_PI), 0.0), m00 - m02 * m20

    def fit_one(f0, roughness, inclination):
        from ..ops.brdf import sample_ggx_reflected_direction
        alpha_s = jnp.clip(roughness, 0.0064, 1.0)
        outgoing = jnp.stack([jnp.sin(inclination), 0.0 * inclination,
                              jnp.cos(inclination)])
        # Albedo + lobe-concentrated eval points via VNDF importance
        # sampling with fixed low-discrepancy uniforms: resolves sharp
        # lobes that a uniform grid cannot.
        vndf_dirs, vndf_pdf = jax.vmap(
            lambda r: sample_ggx_reflected_direction(outgoing, alpha_s, r))(
            vndf_rnd)
        vndf_vals = brdf_cos(f0, roughness, inclination, vndf_dirs)
        good = (vndf_dirs[:, 2] > 0.0) & (vndf_pdf > 1e-8)
        albedo = jnp.mean(jnp.where(
            good, vndf_vals / jnp.maximum(vndf_pdf, 1e-8), 0.0))
        albedo = jnp.clip(albedo, 1e-4, 1.0)

        eval_dirs = jnp.concatenate([dirs, vndf_dirs], axis=0)
        target_raw = brdf_cos(f0, roughness, inclination, eval_dirs)
        target = target_raw / albedo

        # Initialization: isotropic scale ~ alpha, lobe tilted toward the
        # reflection direction.
        alpha = jnp.maximum(roughness, 0.0064)
        inv_softplus = lambda y: jnp.log(jnp.expm1(jnp.maximum(y, 1e-4)))
        tilt = jnp.tan(jnp.minimum(inclination, 1.4))
        params0 = jnp.stack([inv_softplus(alpha), alpha * tilt,
                             inv_softplus(alpha), 0.0 * alpha])

        def loss_fn(params):
            model, det2_raw = ltc_density(params, eval_dirs)
            # L2 on sqrt compresses the peak so wings still matter
            # (similar spirit to Heitz's L3 error); a barrier keeps the
            # transform away from the degenerate det <= 0 region.
            fit = jnp.mean((jnp.sqrt(model + 1e-6)
                            - jnp.sqrt(target + 1e-6)) ** 2)
            barrier = jnp.maximum(0.05 - det2_raw, 0.0) ** 2 * 100.0
            return fit + barrier

        grad_fn = jax.value_and_grad(loss_fn)

        def adam_step(state, _):
            params, m, v, t = state
            loss, g = grad_fn(params)
            t = t + 1.0
            m = 0.9 * m + 0.1 * g
            v = 0.999 * v + 0.001 * g * g
            m_hat = m / (1.0 - 0.9 ** t)
            v_hat = v / (1.0 - 0.999 ** t)
            params = params - learning_rate * m_hat / (jnp.sqrt(v_hat) + 1e-8)
            return (params, m, v, t), loss

        init = (params0, jnp.zeros(4), jnp.zeros(4), jnp.float32(0.0))
        (params, _, _, _), losses = jax.lax.scan(adam_step, init,
                                                 None, length=steps)
        m00 = jax.nn.softplus(params[0]) + 1e-4
        m11 = jax.nn.softplus(params[2]) + 1e-4
        return jnp.stack([m00, params[1], m11, params[3], albedo])

    fit_grid = jax.jit(jax.vmap(jax.vmap(jax.vmap(
        fit_one, in_axes=(None, 0, None)), in_axes=(None, None, 0)),
        in_axes=(0, None, None)))
    records = fit_grid(jnp.asarray(f0_axis), jnp.asarray(roughness_axis),
                       jnp.asarray(inclination_axis))
    # Axes: (fresnel, inclination, roughness, 5) -> matches the loader's
    # (layer, y, x) layout.
    return np.asarray(records)


def main(output_directory: str = "data/ltc_fits", resolution: int = 32,
         fresnel_count: int = 8) -> str:
    from ..assets.ltc_table import save_ltc_table_files
    records = fit_ltc_tables(resolution=resolution,
                             fresnel_count=fresnel_count)
    save_ltc_table_files(output_directory, records)
    return output_directory


if __name__ == "__main__":
    import sys
    out = main(*(sys.argv[1:2] or ["data/ltc_fits"]))
    print(f"wrote LTC fits to {out}")
