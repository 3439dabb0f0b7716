import jax.numpy as jnp
import numpy as np

from vulkan_renderer_tpu.ops import math_utils as mu


def test_wang_hash_matches_numpy():
    seeds = np.arange(1000, dtype=np.uint32)
    expected = mu.wang_hash_np(seeds)
    actual = np.asarray(mu.wang_hash(jnp.asarray(seeds)))
    np.testing.assert_array_equal(actual, expected)


def test_wang_hash_known_values():
    # Direct evaluation of the reference algorithm in pure Python ints.
    def ref(seed):
        seed = ((seed ^ 61) ^ (seed >> 16)) & 0xFFFFFFFF
        seed = (seed * 9) & 0xFFFFFFFF
        seed = seed ^ (seed >> 4)
        seed = (seed * 0x27D4EB2D) & 0xFFFFFFFF
        seed = seed ^ (seed >> 15)
        return seed
    for s in [0, 1, 243708, 3124705, 0xFFFFFFFF]:
        assert int(mu.wang_hash_np(np.uint32(s))) == ref(s)


def test_kahan_accuracy(rng):
    a, b, c, d = [rng.standard_normal(10000).astype(np.float32) for _ in range(4)]
    # Catastrophic cancellation setup: c*d close to a*b.
    c = a * (1.0 + np.float32(1e-6))
    d = b.copy()
    exact = (a.astype(np.float64) * b.astype(np.float64)
             - c.astype(np.float64) * d.astype(np.float64))
    ours = np.asarray(mu.kahan(a, b, c, d), np.float64)
    naive = np.asarray(a * b - c * d, np.float64)
    err_ours = np.abs(ours - exact)
    err_naive = np.abs(naive - exact)
    # Kahan must be dramatically better than the naive difference.
    assert np.median(err_ours[err_naive > 0]) <= np.median(err_naive[err_naive > 0])
    scale = np.maximum(np.abs(a * b), np.abs(c * d)).astype(np.float64)
    rel = err_ours / np.maximum(scale, 1e-30)
    assert np.max(rel) < 1e-6  # ~1.5 ulp of the products


def test_cross_stable_matches_cross(rng):
    x = rng.standard_normal((100, 3)).astype(np.float32)
    y = rng.standard_normal((100, 3)).astype(np.float32)
    ours = np.asarray(mu.cross_stable(jnp.asarray(x), jnp.asarray(y)))
    expected = np.cross(x.astype(np.float64), y.astype(np.float64))
    np.testing.assert_allclose(ours, expected, atol=1e-5)


def test_octahedral_roundtrip(rng):
    n = rng.standard_normal((500, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    encoded = mu.encode_normal_octahedral_32bit_np(n)
    decoded = np.asarray(mu.decode_normal_octahedral_32bit(
        jnp.asarray(encoded.astype(np.float32) / 65535.0)))
    dots = np.sum(decoded * n, axis=-1)
    assert np.all(dots > 0.99999)


def test_octahedral_axis_normals():
    # The affine map preserves exact zeros: +z roundtrips exactly; other
    # axes roundtrip within quantization error.
    n = np.array([[0, 0, 1]], np.float32)
    e = mu.encode_normal_octahedral_32bit_np(n)
    d = np.asarray(mu.decode_normal_octahedral_32bit(
        jnp.asarray(e.astype(np.float32) / 65535.0)))
    np.testing.assert_array_equal(d[0], n[0])
    for axis in [(0, 0, -1), (1, 0, 0), (0, 1, 0)]:
        n = np.array([axis], np.float32)
        e = mu.encode_normal_octahedral_32bit_np(n)
        d = np.asarray(mu.decode_normal_octahedral_32bit(
            jnp.asarray(e.astype(np.float32) / 65535.0)))
        np.testing.assert_allclose(d[0], n[0], atol=1e-4)


def test_position_pack_roundtrip(rng):
    box_min = np.array([-3.0, -1.0, -2.0])
    box_max = np.array([5.0, 7.0, 11.0])
    pos = rng.uniform(box_min, box_max, (1000, 3))
    packed, factor, summand = mu.encode_position_64bit_np(pos, box_min, box_max)
    decoded = np.asarray(mu.decode_position_64bit(
        jnp.asarray(packed), jnp.asarray(factor), jnp.asarray(summand)))
    # 21 bits over the box extent.
    max_err = np.max(np.abs(decoded - pos), axis=0)
    np.testing.assert_array_less(max_err, (box_max - box_min) / (1 << 21))


def test_positive_atan():
    t = jnp.asarray([-5.0, -1.0, -1e-3, 0.0, 1e-3, 1.0, 5.0], jnp.float32)
    out = np.asarray(mu.positive_atan(t))
    assert np.all(out >= 0.0) and np.all(out <= np.pi)
    np.testing.assert_allclose(np.tan(out), np.asarray(t), rtol=1e-4, atol=1e-6)


def test_fast_positive_atan_accuracy():
    t = jnp.asarray(np.linspace(-50, 50, 20001), jnp.float32)
    fast = np.asarray(mu.fast_positive_atan(t))
    exact = np.asarray(mu.positive_atan(t))
    assert np.max(np.abs(fast - exact)) < 2e-5


def test_half_roundtrip(rng):
    vals = rng.standard_normal(1000).astype(np.float32) * 10
    bits = mu.float_to_half_bits_np(vals)
    back = mu.half_bits_to_float_np(bits)
    np.testing.assert_allclose(back, vals, rtol=1e-3)
