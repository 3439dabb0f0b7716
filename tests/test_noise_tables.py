"""Sobol-family noise table generation (tools/generate_noise.py) and the
default-config noise path (reference default: ahmed, main.c:240)."""

import numpy as np
import pytest

from vulkan_renderer_tpu.tools.generate_noise import (
    _owen_scramble_nested, _sobol_u32, ahmed_blob, sobol_family_blob)


def _max_gap(values01):
    return np.diff(np.r_[0.0, np.sort(values01), 1.0]).max()


def test_sobol_first_dims_stratify():
    """Dims (0,1) of consecutive blocks tile the pixel grid exactly — the
    property the 4D-table construction relies on (noise_table.h:38-41)."""
    idx = np.arange(256, dtype=np.uint64)
    x = _sobol_u32(idx, 0) >> np.uint32(28)
    y = _sobol_u32(idx, 1) >> np.uint32(28)
    assert len(set(zip(x.tolist(), y.tolist()))) == 256


def test_owen_scramble_is_measure_preserving():
    """Nested scrambling permutes [0, 2^bits): bijective, and elementary
    dyadic intervals map onto dyadic intervals of the same size."""
    x = np.arange(1 << 12, dtype=np.uint32)
    s = _owen_scramble_nested(x, seed=9, bits=12)
    assert len(np.unique(s)) == 1 << 12
    # Top 4 bits depend only on top 4 bits: each 256-block maps to a block.
    blocks = s.reshape(16, 256) >> 8
    assert (blocks == blocks[:, :1]).all()


@pytest.mark.parametrize("kind", ["sobol_2d", "owen_2d", "burley_owen_2d"])
def test_sobol_family_per_pixel_stratification(kind):
    tab = sobol_family_blob(kind, 32, 32, 16)
    assert tab.shape == (16, 32, 32, 4)
    # Aggregate per-pixel gap statistics over ALL pixels and channels.
    # Measured: sobol-family median ~0.11, max ~0.22; white noise median
    # ~0.19, max ~0.49 over the same population.
    gaps = []
    for ch in range(4):
        v = np.sort(tab[:, :, :, ch].reshape(16, -1).astype(np.float64)
                    / 65536.0, axis=0)
        pad = np.zeros((1, v.shape[1]))
        g = np.diff(np.concatenate([pad, v, pad + 1.0]), axis=0).max(axis=0)
        gaps.append(g)
    g = np.concatenate(gaps)
    assert np.median(g) < 0.14, (kind, np.median(g))
    assert g.max() < 0.30, (kind, g.max())


def test_ahmed_per_pixel_and_screen_uniformity():
    tab = ahmed_blob(64, 64, 16)
    rng = np.random.RandomState(4)
    for _ in range(8):
        y, x = rng.randint(64), rng.randint(64)
        v = tab[:, y, x, 0].astype(np.float64) / 65536.0
        # Consecutive (0,2)-sequence chunk: PERFECT 1/16 stratification.
        assert _max_gap(v) <= 1.0 / 16.0 + 1e-9
    # Every layer must cover [0,1) over the screen (the 1-spp frame must
    # not sample one corner of the domain): sup-deviation vs uniform.
    for layer in (0, 1, 5, 15):
        lv = np.sort(tab[layer, :, :, 0].ravel().astype(np.float64) / 65536.0)
        dev = np.abs(lv - (np.arange(lv.size) + 0.5) / lv.size).max()
        assert dev < 0.05, (layer, dev)


def test_ahmed_not_white_and_loader_generates(tmp_path):
    """The loader must produce a REAL ahmed table (not the white fallback)
    by generating + caching the blob when it is missing."""
    from vulkan_renderer_tpu.assets.noise import NoiseType, load_noise_table
    table = load_noise_table(NoiseType.AHMED, str(tmp_path),
                             resolution=(64, 64, 16))
    assert not table.fallback
    assert (tmp_path / "noise" / "ahmed_2d_rgba_64x64_16.blob").exists()
    # Ahmed signature: per-pixel chunks are exactly stratified — white
    # noise fails this with overwhelming probability.
    v = table.table[:, 7, 7, 0].astype(np.float64) / 65536.0
    assert _max_gap(v) <= 1.0 / 16.0 + 1e-9
    # Cached file is reused byte-identically.
    again = load_noise_table(NoiseType.AHMED, str(tmp_path),
                             resolution=(64, 64, 16))
    np.testing.assert_array_equal(table.table, again.table)


def test_noise_image_matches_per_pixel_gather():
    """get_noise_image (roll+tile dense form) must be BIT-identical to
    get_noise_pairs over the row-major grid — it is the production frame
    path's noise source (render/pipeline.py)."""
    import jax.numpy as jnp

    from vulkan_renderer_tpu.ops.noise import (get_noise_image,
                                               get_noise_pairs)

    rng = np.random.default_rng(5)
    layers, th, tw = 8, 16, 32
    table = jnp.asarray(
        rng.integers(0, 65536, size=(layers, th, tw, 4)).astype(np.uint16))
    res_mask = np.array([tw - 1, th - 1], np.uint32)
    tex_mask = np.uint32(layers - 1)
    randoms = rng.integers(0, 1 << 32, size=4).astype(np.uint32)
    w, h, pairs = 40, 24, 9
    ys, xs = np.mgrid[0:h, 0:w]
    pixels = jnp.asarray(
        np.stack([xs, ys], axis=-1).reshape(-1, 2).astype(np.int32))

    ref = np.asarray(get_noise_pairs(table, pixels, pairs, res_mask,
                                     tex_mask, randoms))
    img = np.asarray(get_noise_image(table, w, h, pairs, tex_mask, randoms))
    np.testing.assert_array_equal(img, ref)
