"""Noise tables + per-frame randomization.

Reference: src/noise_table.c + src/shaders/noise_utility.glsl. White noise
is generated with the exact Wang-hash stream of the reference; other noise
types load from the same `.blob` files (raw u16 RGBA). Missing blobs fall
back to white noise so every noise_type setting stays runnable.
"""

from __future__ import annotations

import enum
import os
from typing import NamedTuple

import numpy as np

from ..ops.math_utils import wang_hash_np


class NoiseType(enum.Enum):
    """reference: noise_table.h:22-55."""
    WHITE = "white"
    BLUE = "blue_noise"
    SOBOL = "sobol_2d"
    OWEN = "owen_2d"
    BURLEY_OWEN = "burley_owen_2d"
    AHMED = "ahmed_2d"
    BLUE_NOISE_DITHERED = "dithered_2d"


def default_noise_resolution(noise_type: NoiseType):
    """(width, height, layers); reference: noise_table.c:23-43."""
    if noise_type == NoiseType.BLUE:
        return 64, 64, 64
    if noise_type == NoiseType.BLUE_NOISE_DITHERED:
        return 128, 128, 1
    return 256, 256, 64


class NoiseTable(NamedTuple):
    table: np.ndarray            # (layers, H, W, 4) uint16
    noise_type: str
    resolution_mask: np.ndarray  # (2,) uint32 (W-1, H-1)
    texture_index_mask: np.ndarray  # () uint32 (layers-1)
    # True when the requested type's blob was missing and white noise was
    # substituted; callers must surface this (output tagging, warnings).
    fallback: bool = False


INITIAL_RANDOM_SEED = 3124705  # noise_table.c:47


def load_noise_table(noise_type: NoiseType, data_directory: str = "data",
                     resolution=None) -> NoiseTable:
    if resolution is None:
        resolution = default_noise_resolution(noise_type)
    width, height, layers = resolution
    cell_count = width * height * layers * 4
    fallback = False
    if noise_type == NoiseType.WHITE:
        data = (wang_hash_np(np.arange(cell_count, dtype=np.uint32)
                             + np.uint32(243708))
                & np.uint32(0xFFFF)).astype(np.uint16)
    else:
        # blob naming: <type>_rgba_%02dx%02d_%02d.blob (noise_table.c:77-106)
        name = f"{noise_type.value}_rgba_{width:02d}x{height:02d}_{layers:02d}.blob"
        path = os.path.join(data_directory, "noise", name)
        if not os.path.exists(path):
            # Packaged tables (tools/generate_noise.py output) — any
            # resolution of the right type.
            import glob
            builtin = os.path.join(os.path.dirname(__file__), "..",
                                   "data_builtin", "noise",
                                   f"{noise_type.value}_rgba_*.blob")
            matches = sorted(glob.glob(builtin))
            if matches:
                path = matches[-1]
                stem = os.path.basename(path)[:-5]
                dims, layer_s = stem.rsplit("_", 2)[-2:]
                width, height = (int(v) for v in dims.split("x"))
                layers = int(layer_s)
                cell_count = width * height * layers * 4
        if not os.path.exists(path) and noise_type in (
                NoiseType.SOBOL, NoiseType.OWEN, NoiseType.BURLEY_OWEN,
                NoiseType.AHMED):
            # Sobol-family tables are cheap and deterministic to generate
            # (tools/generate_noise.py reproduces the constructions from
            # noise_table.h:28-47); build + cache instead of degrading.
            try:
                from ..tools.generate_noise import generate_sobol_family
                path = generate_sobol_family(data_directory, noise_type.value,
                                             width, height, layers)
            except OSError:
                pass  # read-only data dir: fall through to white fallback
        if os.path.exists(path):
            data = np.fromfile(path, np.uint16, cell_count)
        else:
            # Fallback: white noise keeps every setting runnable, but it is
            # a visible quality regression — warn LOUDLY and flag it.
            import warnings
            warnings.warn(
                f"noise table '{name}' not found under {data_directory}/noise"
                " or the packaged data_builtin/noise — FALLING BACK TO WHITE"
                " NOISE (visibly worse sample distribution). Generate blobs"
                " with tools/generate_noise.py.", stacklevel=2)
            data = (wang_hash_np(np.arange(cell_count, dtype=np.uint32)
                                 + np.uint32(243708))
                    & np.uint32(0xFFFF)).astype(np.uint16)
            fallback = True
    table = data.reshape(layers, height, width, 4)
    return NoiseTable(
        table=table,
        noise_type=noise_type.value,
        resolution_mask=np.array([width - 1, height - 1], np.uint32),
        texture_index_mask=np.uint32(layers - 1),
        fallback=fallback,
    )


def advance_noise_random_numbers(random_seed: int, animate: bool):
    """Per-frame randomization constants, bit-exact with
    set_noise_constants (noise_table.c:160-167): with animation,
    random_numbers[i] = wang_hash(seed * 4 + i) and the seed increments;
    without animation the numbers are the fixed pattern i * 0x123456.

    Returns (new_seed, (4,) uint32 random numbers)."""
    i = np.arange(4, dtype=np.uint32)
    if animate:
        with np.errstate(over="ignore"):
            rand = wang_hash_np(np.uint32(random_seed) * np.uint32(4) + i)
        random_seed = (random_seed + 1) & 0xFFFFFFFF
    else:
        rand = (i * np.uint32(0x123456)).astype(np.uint32)
    return random_seed, rand.astype(np.uint32)
