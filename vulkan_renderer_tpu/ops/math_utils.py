"""Scalar math utilities shared across kernels.

TPU-native equivalents of the reference's math helpers:
- Wang hash RNG (reference: src/math_utilities.h:50-57) — kept bit-exact
  because white-noise tables must match the reference byte-for-byte.
- Octahedral normal codec (reference: src/shaders/mesh_quantization.glsl:19-33
  and tools/io_export_vulkan_blender28.py:24-46).
- 21-bit position packing (reference: mesh_quantization.glsl:38-45).
- Error-free float products (Dekker/Veltkamp) used to build the Kahan-style
  stable 2x2 determinant. The GLSL reference relies on hardware fma
  (polygon_sampling.glsl:261-268); TPU fp32 has no scalar fma exposed through
  JAX, so we use the classic two_product error-free transformation instead,
  which gives the same 1.5-ulp determinant bound.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

F32 = jnp.float32

M_PI = 3.14159265358979323846
M_INV_PI = 1.0 / M_PI
M_HALF_PI = 0.5 * M_PI


# ---------------------------------------------------------------------------
# Wang hash (bit-exact with the reference, used for white noise + seeds)
# ---------------------------------------------------------------------------

def wang_hash(seed):
    """uint32 Wang hash; matches math_utilities.h:50-57 bit-exactly."""
    seed = jnp.asarray(seed, jnp.uint32)
    seed = (seed ^ jnp.uint32(61)) ^ (seed >> jnp.uint32(16))
    seed = seed * jnp.uint32(9)
    seed = seed ^ (seed >> jnp.uint32(4))
    seed = seed * jnp.uint32(0x27D4EB2D)
    seed = seed ^ (seed >> jnp.uint32(15))
    return seed


def wang_hash_np(seed: np.ndarray) -> np.ndarray:
    """Numpy twin of wang_hash for asset generation on host."""
    seed = np.asarray(seed, np.uint32)
    with np.errstate(over="ignore"):
        seed = (seed ^ np.uint32(61)) ^ (seed >> np.uint32(16))
        seed = seed * np.uint32(9)
        seed = seed ^ (seed >> np.uint32(4))
        seed = seed * np.uint32(0x27D4EB2D)
        seed = seed ^ (seed >> np.uint32(15))
    return seed


def cumsum_lanes(x):
    """Inclusive prefix sum over axis 0, unrolled (log2 n shift-adds).

    Used instead of jnp.cumsum on the tiny vertex-lane axes (n <= 8):
    the cumsum primitive has no Pallas/Mosaic lowering, and the unrolled
    form is pure VPU adds that fuse into the surrounding kernel."""
    n = x.shape[0]
    offset = 1
    while offset < n:
        zeros = jnp.zeros((offset,) + x.shape[1:], x.dtype)
        x = x + jnp.concatenate([zeros, x[:-offset]], axis=0)
        offset *= 2
    return x


def first_true_lane(mask, fallback):
    """Index of the first True along axis 0, else `fallback`.

    jnp.argmax has no Mosaic lowering; a masked min over the (static)
    lane iota reduces on the VPU and is exact."""
    n = mask.shape[0]
    lanes = jnp.arange(n, dtype=jnp.int32).reshape((n,) + (1,) * (mask.ndim - 1))
    idx = jnp.min(jnp.where(mask, lanes, jnp.int32(n)), axis=0)
    return jnp.where(idx < n, idx, fallback)


def pick_lane(arr, idx):
    """arr[idx] along axis 0 without a gather.

    Dynamic scalar indexing becomes a batched gather under vmap, which
    serializes on TPU. A one-hot select + reduce lowers to pure VPU
    select/add ops and is bit-exact (exactly one nonzero summand). Out-of-
    range idx returns zeros (gather-with-clamp semantics differ; callers
    must keep idx in range when the value matters)."""
    lanes_shape = (arr.shape[0],) + (1,) * (arr.ndim - 1)
    mask = (jnp.arange(arr.shape[0]) == idx).reshape(lanes_shape)
    if arr.dtype == jnp.bool_:
        return jnp.any(mask & arr, axis=0)
    zero = jnp.zeros((), arr.dtype)
    return jnp.sum(jnp.where(mask, arr, zero), axis=0)


# ---------------------------------------------------------------------------
# Error-free transformations / stable determinants
# ---------------------------------------------------------------------------

_SPLIT = np.float32(4097.0)  # 2**12 + 1 for fp32 Veltkamp splitting


def _two_product(a, b):
    """Returns (p, e) with p = fl(a*b) and p + e == a*b exactly (fp32)."""
    a = jnp.asarray(a, F32)
    b = jnp.asarray(b, F32)
    p = a * b
    a_hi = a * _SPLIT
    a_hi = a_hi - (a_hi - a)
    a_lo = a - a_hi
    b_hi = b * _SPLIT
    b_hi = b_hi - (b_hi - b)
    b_lo = b - b_hi
    e = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, e


def kahan(a, b, c, d):
    """a*b - c*d with ~1.5 ulp error (reference: polygon_sampling.glsl:261-268).

    The reference implements this with hardware fma; we use error-free
    two_product, which yields the same accuracy guarantee.
    """
    p1, e1 = _two_product(a, b)
    p2, e2 = _two_product(c, d)
    return (p1 - p2) + (e1 - e2)


def cross_stable(lhs, rhs):
    """Cross product with per-entry <=1.5 ulp error (polygon_sampling.glsl:273-279)."""
    return jnp.stack([
        kahan(lhs[..., 1], rhs[..., 2], lhs[..., 2], rhs[..., 1]),
        kahan(lhs[..., 2], rhs[..., 0], lhs[..., 0], rhs[..., 2]),
        kahan(lhs[..., 0], rhs[..., 1], lhs[..., 1], rhs[..., 0]),
    ], axis=-1)


def mix_fma(x, y, a):
    """Stable lerp as in polygon_sampling.glsl:183-185."""
    return a * y + (x - a * x)


# ---------------------------------------------------------------------------
# atan variants (polygon_sampling.glsl:83-111)
# ---------------------------------------------------------------------------

_ATAN_T3P8 = np.float32(2.414213562373095)   # tan(3*pi/8)
_ATAN_TP8 = np.float32(0.4142135623730950)   # tan(pi/8)


def atan_f32(x):
    """Single-precision arctangent, Cephes atanf polynomial (~2 ulp).

    jnp.arctan has no Pallas/Mosaic lowering; this branchless version is
    pure VPU arithmetic and is used on ALL paths so the fused kernel and
    the plain XLA pipeline stay numerically identical."""
    x = jnp.asarray(x, F32)
    ax = jnp.abs(x)
    big = ax > _ATAN_T3P8
    mid = (ax > _ATAN_TP8) & ~big
    safe_ax = jnp.where(ax > 0.0, ax, 1.0)
    r = jnp.where(big, -1.0 / jnp.where(big, safe_ax, 1.0),
                  jnp.where(mid, (ax - 1.0) / (ax + 1.0), ax))
    offset = jnp.where(big, F32(M_HALF_PI),
                       jnp.where(mid, F32(0.25 * M_PI), F32(0.0)))
    z = r * r
    p = z * F32(8.05374449538e-2) - F32(1.38776856032e-1)
    p = z * p + F32(1.99777106478e-1)
    p = z * p - F32(3.33329491539e-1)
    y = offset + (z * p * r + r)
    return jnp.where(x < 0.0, -y, y)


def positive_atan(tangent):
    """atan() offset to lie in [0, pi]: angle with tan(angle) == tangent."""
    return atan_f32(tangent) + jnp.where(tangent < 0.0, F32(M_PI), F32(0.0))


def fast_positive_atan(y):
    """Piecewise-polynomial positive atan, max abs error 1.16e-5.

    Matches the biased-sampling variant (polygon_sampling.glsl:83-97).
    """
    y = jnp.asarray(y, F32)
    ay = jnp.abs(y)
    rx = jnp.where(ay > 1.0, 1.0 / ay, ay)
    ry = rx * rx
    rz = ry * F32(0.02083509974181652) + F32(-0.08513300120830536)
    rz = ry * rz + F32(0.18014100193977356)
    rz = ry * rz + F32(-0.3302994966506958)
    ry = ry * rz + F32(0.9998660087585449)
    rz = -2.0 * ry * rx + F32(M_HALF_PI)
    rz = jnp.where(ay > 1.0, rz, F32(0.0))
    rx = rx * ry + rz
    return jnp.where(y < 0.0, F32(M_PI) - rx, rx)


# ---------------------------------------------------------------------------
# Octahedral normals (16 bit per component, zero-preserving affine map)
# ---------------------------------------------------------------------------

def decode_normal_octahedral_32bit(octahedral_unorm2):
    """Decode 2x16-bit UNORM octahedral normal (mesh_quantization.glsl:19-33).

    Input: (..., 2) floats in [0, 1] (the UNORM values).
    Output: (..., 3) normalized normals.
    """
    factor = F32(2.0 * (65534.0 / 65535.0))
    summand = F32(-(32768.0 / 65535.0) * (2.0 * (65534.0 / 65535.0)))
    o = octahedral_unorm2 * factor + summand
    ox, oy = o[..., 0], o[..., 1]
    nz = 1.0 - jnp.abs(ox) - jnp.abs(oy)
    sign_x = jnp.where(ox >= 0.0, F32(1.0), F32(-1.0))
    sign_y = jnp.where(oy >= 0.0, F32(1.0), F32(-1.0))
    below = nz < 0.0
    nx = jnp.where(below, (1.0 - jnp.abs(oy)) * sign_x, ox)
    ny = jnp.where(below, (1.0 - jnp.abs(ox)) * sign_y, oy)
    n = jnp.stack([nx, ny, nz], axis=-1)
    return n / jnp.linalg.norm(n, axis=-1, keepdims=True)


def encode_normal_octahedral_32bit_np(normals: np.ndarray) -> np.ndarray:
    """Encode unit normals to 2x16-bit UNORM ints; numpy, matches the Blender
    exporter's encoding (io_export_vulkan_blender28.py:24-46)."""
    n = np.asarray(normals, np.float32)
    n = n / np.maximum(1e-30, np.abs(n[..., 0:1]) + np.abs(n[..., 1:2]) + np.abs(n[..., 2:3]))
    below = n[..., 2] < 0.0
    abs_yx = np.abs(n[..., [1, 0]])
    signs = np.where(n[..., :2] >= 0.0, 1.0, -1.0)
    xy = np.where(below[..., None], (1.0 - abs_yx) * signs, n[..., :2])
    # Inverse of the zero-preserving affine map in the decoder:
    # unorm = (oct - summand) / factor, quantized to 16 bits.
    factor = 2.0 * (65534.0 / 65535.0)
    summand = -(32768.0 / 65535.0) * factor
    unorm = (xy - summand) / factor
    return np.clip(np.round(unorm * 65535.0), 0, 65535).astype(np.uint16)


# ---------------------------------------------------------------------------
# 21-bit quantized positions packed into 2x uint32
# ---------------------------------------------------------------------------

def decode_position_64bit(quantized_position, dequantization_factor,
                          dequantization_summand):
    """Unpack 3x21-bit coords from 2x uint32 (mesh_quantization.glsl:38-45)."""
    q0 = quantized_position[..., 0].astype(jnp.uint32)
    q1 = quantized_position[..., 1].astype(jnp.uint32)
    x = (q0 & jnp.uint32(0x1FFFFF)).astype(F32)
    y = (((q0 & jnp.uint32(0xFFE00000)) >> jnp.uint32(21))
         | ((q1 & jnp.uint32(0x3FF)) << jnp.uint32(11))).astype(F32)
    z = ((q1 & jnp.uint32(0x7FFFFC00)) >> jnp.uint32(10)).astype(F32)
    pos = jnp.stack([x, y, z], axis=-1)
    return pos * dequantization_factor + dequantization_summand


def encode_position_64bit_np(positions, box_min, box_max):
    """Quantize positions to 3x21 bits packed in 2x uint32 (numpy).

    Returns (packed (..., 2) uint32, dequantization_factor (3,),
    dequantization_summand (3,)). Mirrors the Blender exporter
    (io_export_vulkan_blender28.py:476-487).
    """
    positions = np.asarray(positions, np.float64)
    box_min = np.asarray(box_min, np.float64)
    box_max = np.asarray(box_max, np.float64)
    max_code = float((1 << 21) - 1)
    extent = np.maximum(box_max - box_min, 1e-30)
    factor = (extent / max_code).astype(np.float32)
    summand = box_min.astype(np.float32)
    q = np.clip(np.round((positions - box_min) / extent * max_code), 0, max_code)
    q = q.astype(np.uint64)
    combined = q[..., 0] | (q[..., 1] << 21) | (q[..., 2] << 42)
    lo = (combined & 0xFFFFFFFF).astype(np.uint32)
    hi = (combined >> 32).astype(np.uint32)
    return np.stack([lo, hi], axis=-1), factor, summand


# ---------------------------------------------------------------------------
# half <-> float bit manipulation (for HDR screenshot parity)
# ---------------------------------------------------------------------------

def float_to_half_bits_np(values: np.ndarray) -> np.ndarray:
    """fp32 -> fp16 bit pattern (uint16), numpy round-to-nearest-even."""
    return np.asarray(values, np.float32).astype(np.float16).view(np.uint16)


def half_bits_to_float_np(bits: np.ndarray) -> np.ndarray:
    """fp16 bit pattern (uint16) -> fp32; same mapping as the Giesen decoder
    used by the reference (math_utilities.h:70-84)."""
    return np.asarray(bits, np.uint16).view(np.float16).astype(np.float32)


# ---------------------------------------------------------------------------
# 4x4 inverse (used for the pixel->ray matrix; math_utilities.h:24-47)
# ---------------------------------------------------------------------------

def matrix_inverse_np(m: np.ndarray) -> np.ndarray:
    """4x4 inverse. The reference uses cofactors; numpy's solve is equivalent
    to working precision and runs on host only."""
    return np.linalg.inv(np.asarray(m, np.float64)).astype(np.float32)


def normalize(v, axis=-1, eps=0.0):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    if eps:
        n = jnp.maximum(n, eps)
    return v / n
