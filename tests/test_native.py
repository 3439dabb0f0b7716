"""Native library parity: C++ fast paths must match the numpy fallbacks."""

import numpy as np
import pytest

from vulkan_renderer_tpu.core import native


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def test_bc1_native_matches_numpy(rng):
    from vulkan_renderer_tpu.assets import vkt
    img = rng.uniform(0, 1, (32, 32, 3)).astype(np.float32)
    raw = vkt.encode_bc1(img)
    a = native.decode_bc1(raw, 32, 32)
    # Call the numpy fallback directly (bypass the native dispatch).
    import unittest.mock as mock
    with mock.patch.object(native, "available", return_value=False):
        b = vkt.decode_bc1(raw, 32, 32)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_bc5_native_matches_numpy(rng):
    from vulkan_renderer_tpu.assets import vkt
    img = rng.uniform(0, 1, (16, 16, 2)).astype(np.float32)
    raw = vkt.encode_bc5(img)
    a = native.decode_bc5(raw, 16, 16)
    import unittest.mock as mock
    with mock.patch.object(native, "available", return_value=False):
        b = vkt.decode_bc5(raw, 16, 16)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_dequantize_native_matches_numpy(rng):
    from vulkan_renderer_tpu.ops.math_utils import encode_position_64bit_np
    pos = rng.uniform(-4, 9, (4000, 3))
    packed, factor, summand = encode_position_64bit_np(pos, pos.min(0),
                                                       pos.max(0))
    a = native.dequantize_positions(packed, factor, summand)
    q = packed.astype(np.uint64)
    combined = q[:, 0] | (q[:, 1] << 32)
    b = np.stack([combined & 0x1FFFFF, (combined >> 21) & 0x1FFFFF,
                  (combined >> 42) & 0x1FFFFF], -1).astype(np.float32) \
        * factor + summand
    np.testing.assert_allclose(a, b, atol=0)


def test_morton_native_matches_numpy(rng):
    from vulkan_renderer_tpu.tools.export_scene import _morton_3d
    tris = rng.uniform(-5, 5, (2000, 3, 3)).astype(np.float32)
    lo3 = tris.reshape(-1, 3).min(0)
    hi3 = tris.reshape(-1, 3).max(0)
    a = native.morton_codes(tris, lo3, hi3)
    centroids = (tris[:, 0] + tris[:, 1] + tris[:, 2]) / 3.0
    ext = np.maximum(hi3 - lo3, 1e-30)
    q = np.clip((centroids - lo3) / ext * ((1 << 21) - 1), 0,
                (1 << 21) - 1).astype(np.uint64)
    b = _morton_3d(q[:, 0], q[:, 1], q[:, 2])
    np.testing.assert_array_equal(a, b)
