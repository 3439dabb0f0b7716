"""LTC table loading/synthesis.

Reads the reference's fit<i>.dat files (ltc_table.c:31-101): per file (one
per Fresnel level), u64 resolution then resolution^2 records of 5 floats
(m00, m02, m11, m20, albedo) describing the LTC transform M with m22 = 1.
The loader reproduces the reference's processing exactly: analytic
inversion, normalization by the entry of maximal magnitude, negation of
entry 1, clamped 16-bit UNORM quantization — then dequantizes to float
arrays, giving the same values the shader reads from its UNORM textures.

When no fit files are available (they ship with the reference's data
download, not its repo), `identity_ltc_table` provides tables with an
identity transform and an analytic GGX albedo approximation. The MIS
estimators stay unbiased with any table — fidelity only affects variance —
so this is a correct fallback until `tools/fit_ltc.py` generates real fits.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.ltc import LtcTable, make_ltc_constants


def _process_records(records: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """records: (N, 5) floats from a fit file -> (data_0 (N,4), data_1 (N,2))
    exactly as the reference quantizes them (ltc_table.c:82-116)."""
    d0, d1, d2, d3, albedo = [records[:, i] for i in range(5)]
    inverse = np.zeros((len(records), 3, 3), np.float32)
    inverse[:, 0, 0] = d2
    inverse[:, 0, 2] = -d1 * d2
    inverse[:, 1, 1] = d0 - d1 * d3
    inverse[:, 2, 0] = -d2 * d3
    inverse[:, 2, 2] = d0 * d2
    max_mag = np.abs(inverse).reshape(len(records), 9).max(axis=1)
    inverse /= np.maximum(max_mag, 1e-30)[:, None, None]
    processed = np.stack([
        inverse[:, 0, 0], inverse[:, 0, 2], inverse[:, 1, 1],
        inverse[:, 2, 0], inverse[:, 2, 2], albedo,
    ], axis=-1)
    processed[:, 1] *= -1.0
    quantized = np.clip(processed, 0.0, 1.0)
    quantized = np.floor(quantized * 65535.0 + 0.5) / 65535.0
    return quantized[:, :4].astype(np.float32), \
        quantized[:, 4:6].astype(np.float32)


def load_ltc_table_files(directory: str, fresnel_count: int = 51) -> LtcTable:
    """Load fit0.dat .. fit<fresnel_count-1>.dat (ltc_table.c:23-116)."""
    import jax.numpy as jnp
    t0_slices, t1_slices = [], []
    resolution = None
    for i in range(fresnel_count):
        path = os.path.join(directory, f"fit{i}.dat")
        with open(path, "rb") as f:
            (res,) = np.frombuffer(f.read(8), np.uint64)
            res = int(res)
            if resolution is None:
                resolution = res
            elif res != resolution:
                raise ValueError(f"{path}: inconsistent resolution {res}")
            records = np.frombuffer(f.read(res * res * 20), np.float32) \
                .reshape(res * res, 5)
        data_0, data_1 = _process_records(records)
        # Texel j indexes (roughness-major? see ltc_utility texcoord:
        # x=sqrt(roughness), y=inclination) -> row-major (y, x) layout.
        t0_slices.append(data_0.reshape(res, res, 4))
        t1_slices.append(data_1.reshape(res, res, 2))
    constants = make_ltc_constants(fresnel_count, resolution, resolution)
    merged = np.concatenate([np.stack(t0_slices), np.stack(t1_slices)],
                            axis=-1)
    from ..ops.ltc import make_quad_table
    merged_j = jnp.asarray(merged)
    return LtcTable(table=merged_j, constants=constants,
                    quad=make_quad_table(merged_j))


def save_ltc_table_files(directory: str, records: np.ndarray) -> None:
    """Write fit<i>.dat files; records: (F, res, res, 5) float32 of
    (m00, m02, m11, m20, albedo) per texel."""
    os.makedirs(directory, exist_ok=True)
    fresnel_count, res = records.shape[0], records.shape[1]
    for i in range(fresnel_count):
        with open(os.path.join(directory, f"fit{i}.dat"), "wb") as f:
            f.write(np.uint64(res).tobytes())
            f.write(np.ascontiguousarray(records[i], np.float32).tobytes())


def ggx_albedo_approx(roughness: np.ndarray, mu: np.ndarray,
                      f0: np.ndarray) -> np.ndarray:
    """Analytic approximation of the directional albedo of the Frostbite
    GGX+Schlick BRDF (split-sum style: E(mu, alpha) * F_avg-ish).
    Used only to weight MIS techniques, so moderate accuracy suffices."""
    # Lazarov/Karis environment-BRDF polynomial approximation.
    r = np.sqrt(np.clip(roughness, 0.0, 1.0))  # perceptual roughness
    c0 = np.array([-1.0, -0.0275, -0.572, 0.022])
    c1 = np.array([1.0, 0.0425, 1.04, -0.04])
    rr = np.stack([r, r, r, r], axis=-1) * c0 + c1
    a004 = np.minimum(rr[..., 0] * rr[..., 0],
                      np.exp2(-9.28 * mu)) * rr[..., 0] + rr[..., 1]
    scale = a004 * -1.04 + rr[..., 2]
    bias = a004 * 1.04 + rr[..., 3]
    return np.clip(f0 * scale + bias, 0.0, 1.0)


def identity_ltc_table(roughness_count: int = 32, inclination_count: int = 32,
                       fresnel_count: int = 8) -> LtcTable:
    """Identity-transform fallback tables (see module docstring)."""
    import jax.numpy as jnp
    table0 = np.zeros((fresnel_count, inclination_count, roughness_count, 4),
                      np.float32)
    table0[..., 0] = 1.0  # m00
    table0[..., 2] = 1.0  # m11
    table1 = np.zeros((fresnel_count, inclination_count, roughness_count, 2),
                      np.float32)
    table1[..., 0] = 1.0  # m22
    constants = make_ltc_constants(fresnel_count, roughness_count,
                                   inclination_count)
    # Albedo grid: texcoord x = sqrt(roughness)-mapped, y = inclination.
    tex_x = (np.arange(roughness_count) + 0.5) / roughness_count
    sqrt_rough = (tex_x - float(constants.roughness_summand)) \
        / max(float(constants.roughness_factor), 1e-6)
    roughness = np.clip(sqrt_rough, 0.0, 1.0) ** 2
    tex_y = (np.arange(inclination_count) + 0.5) / inclination_count
    inclination = (tex_y - float(constants.inclination_summand)) \
        / float(constants.inclination_factor)
    mu = np.clip(np.cos(inclination), 0.0, 1.0)
    f0 = np.linspace(0.0, 1.0, fresnel_count)
    albedo = ggx_albedo_approx(
        roughness[None, None, :],
        mu[None, :, None],
        f0[:, None, None])
    table1[..., 1] = albedo
    merged = np.concatenate([table0, table1], axis=-1)
    from ..ops.ltc import make_quad_table
    merged_j = jnp.asarray(merged)
    return LtcTable(table=merged_j, constants=constants,
                    quad=make_quad_table(merged_j))


_BUILTIN_DIRECTORY = os.path.join(os.path.dirname(__file__), "..",
                                  "data_builtin", "ltc_fits")
_DEFAULT_CACHE = None


def default_ltc_table() -> LtcTable:
    """The best available table: reference fit files under data/ltc_fits,
    then the packaged TPU-fitted tables (tools/fit_ltc.py output committed
    under data_builtin/), then the identity fallback."""
    global _DEFAULT_CACHE
    if _DEFAULT_CACHE is not None:
        return _DEFAULT_CACHE
    import warnings
    for directory, count in (("data/ltc_fits", 51),
                             (os.path.abspath(_BUILTIN_DIRECTORY), 51)):
        if os.path.exists(os.path.join(directory, "fit0.dat")):
            # Accept a truncated fit set (count existing files) rather than
            # silently discarding the directory.
            available = sum(
                os.path.exists(os.path.join(directory, f"fit{i}.dat"))
                for i in range(count))
            try:
                _DEFAULT_CACHE = load_ltc_table_files(directory, available)
                if available < count:
                    warnings.warn(
                        f"LTC table at {directory} has only {available} of "
                        f"{count} Fresnel fit levels (reference: "
                        "ltc_table.c:31-47 expects 51); specular MIS "
                        "weights will be coarser.", stacklevel=2)
                return _DEFAULT_CACHE
            except Exception as exc:
                warnings.warn(
                    f"failed to load LTC fits from {directory}: {exc!r} — "
                    "trying next source", stacklevel=2)
    warnings.warn(
        "no LTC fit tables found — FALLING BACK TO THE IDENTITY LTC TABLE "
        "(specular sampling degenerates to cosine sampling). Run "
        "tools/fit_ltc.py to generate tables.", stacklevel=2)
    _DEFAULT_CACHE = identity_ltc_table()
    return _DEFAULT_CACHE
