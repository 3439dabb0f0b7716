"""Noise table generation: blue noise (void-and-cluster) and dither blobs.

The reference loads precomputed `.blob` files (noise_table.c:77-106) that
ship with its data download. This tool regenerates equivalent tables from
scratch so every noise_type setting works without the download:

    python -m vulkan_renderer_tpu.tools.generate_noise data

Files follow the exact naming/layout the loader expects:
    <type>_rgba_%02dx%02d_%02d.blob  — raw u16 RGBA, (layers, H, W, 4).

Void-and-cluster (Ulichney 1993) via FFT Gaussian energy, per channel and
layer; ranks are converted to u16 thresholds. This is the same family of
mask the reference's blue-noise blobs contain.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def _wrapped_gaussian_energy(size: int, sigma: float = 1.9) -> np.ndarray:
    x = np.arange(size)
    d = np.minimum(x, size - x).astype(np.float64)
    g1 = np.exp(-(d * d) / (2.0 * sigma * sigma))
    return np.outer(g1, g1)


def void_and_cluster(size: int, rng: np.random.Generator) -> np.ndarray:
    """Generate a (size, size) blue-noise rank array (0 .. size^2-1)."""
    kernel_f = np.fft.rfft2(_wrapped_gaussian_energy(size))

    def energy(mask):
        return np.fft.irfft2(np.fft.rfft2(mask) * kernel_f, s=(size, size))

    n = size * size
    # Initial pattern: ~10% random minority points, relaxed.
    count = max(1, n // 10)
    mask = np.zeros((size, size))
    idx = rng.choice(n, count, replace=False)
    mask.ravel()[idx] = 1.0
    for _ in range(8 * count):
        e = energy(mask)
        cluster = np.unravel_index(np.argmax(np.where(mask > 0, e, -np.inf)),
                                   mask.shape)
        mask[cluster] = 0.0
        e = energy(mask)
        void = np.unravel_index(np.argmin(np.where(mask > 0, np.inf, e)),
                                mask.shape)
        if void == cluster:
            mask[cluster] = 1.0
            break
        mask[void] = 1.0

    ranks = np.zeros((size, size), np.int64)
    # Phase 1: remove minority points one by one (ranks count-1 .. 0).
    work = mask.copy()
    for rank in range(count - 1, -1, -1):
        e = energy(work)
        cluster = np.unravel_index(np.argmax(np.where(work > 0, e, -np.inf)),
                                   work.shape)
        work[cluster] = 0.0
        ranks[cluster] = rank
    # Phase 2: insert points into voids (ranks count .. n-1).
    work = mask.copy()
    for rank in range(count, n):
        e = energy(work)
        void = np.unravel_index(np.argmin(np.where(work > 0, np.inf, e)),
                                work.shape)
        work[void] = 1.0
        ranks[void] = rank
    return ranks


def ranks_to_u16(ranks: np.ndarray) -> np.ndarray:
    n = ranks.size
    return np.floor(ranks.astype(np.float64) / n * 65536.0) \
        .clip(0, 65535).astype(np.uint16)


def generate_blob(kind: str, width: int, height: int, layers: int,
                  seed: int = 0) -> np.ndarray:
    """(layers, H, W, 4) uint16 table."""
    rng = np.random.default_rng(seed)
    out = np.empty((layers, height, width, 4), np.uint16)
    for layer in range(layers):
        for channel in range(4):
            if kind in ("blue_noise", "dithered_2d"):
                out[layer, :, :, channel] = ranks_to_u16(
                    void_and_cluster(width, rng))
            else:
                raise ValueError(kind)
    return out


def main(data_directory: str = "data", small: bool = False) -> None:
    noise_dir = os.path.join(data_directory, "noise")
    os.makedirs(noise_dir, exist_ok=True)
    # Dithered 128x128x1 (reference default resolution) — or 64 for smoke.
    size = 64 if small else 128
    table = generate_blob("dithered_2d", size, size, 1)
    path = os.path.join(noise_dir,
                        f"dithered_2d_rgba_{size:02d}x{size:02d}_01.blob")
    table.tofile(path)
    print(f"wrote {path}")
    # Blue noise 64x64 with a few layers (reference: 64^3; layer count is
    # free — the loader masks by layers-1).
    layers = 2 if small else 8
    table = generate_blob("blue_noise", 64, 64, layers, seed=1)
    path = os.path.join(noise_dir,
                        f"blue_noise_rgba_64x64_{layers:02d}.blob")
    table.tofile(path)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["data"]))
