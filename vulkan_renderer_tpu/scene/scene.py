"""Scene assembly: files / procedural data -> device-resident pytree.

The TPU equivalent of load_scene (scene.c:409-559): parse .vks, decode all
material textures into one atlas, stack lights, attach LTC + noise tables.
Where the reference keeps descriptors and buffer views, resources here are
just arrays in a NamedTuple consumed by the jitted frame function.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..assets import vkt
from ..assets.ltc_table import identity_ltc_table
from ..assets.noise import NoiseTable, NoiseType, load_noise_table
from ..assets.vks import SceneMesh, load_vks
from ..ops.ltc import LtcTable
from ..render.texture import TextureAtlas, build_texture_atlas
from .lights import PolygonalLight, PolygonalLightSpec, stack_lights, \
    update_polygonal_light

INVALID_PRIMITIVE = np.uint32(0xFFFFFFFF)

MATERIAL_TEXTURE_SUFFIXES = ("BaseColor", "Specular", "Normal")


class Scene(NamedTuple):
    """Device-resident scene (leaf arrays only; static info in SceneInfo)."""
    # Mesh (dequantized once at load; the quantized originals are kept for
    # bit-parity checks and BVH rebuilds).
    triangle_positions: jnp.ndarray   # (T, 3, 3) f32
    triangle_normals: jnp.ndarray     # (T, 3, 3) f32 (decoded octahedral)
    triangle_tex_coords: jnp.ndarray  # (T, 3, 2) f32
    material_indices: jnp.ndarray     # (T,) i32
    # Textures: 3 per material, index = 3 * material + {0,1,2}.
    material_atlas: TextureAtlas
    # Lights (stacked, leading light axis).
    lights: PolygonalLight
    light_atlas: TextureAtlas
    # Tables.
    ltc: LtcTable
    noise_table: jnp.ndarray          # (L, H, W, 4) f32 in [0, 1]
    noise_resolution_mask: jnp.ndarray   # (2,) u32
    noise_texture_index_mask: jnp.ndarray  # () u32


def _decode_material_textures(texture_dir: str, material_names: list[str]
                              ) -> list[list[np.ndarray]]:
    """Decode <mat>_{BaseColor,Specular,Normal}.vkt mips (scene.c:523-543).
    Missing files fall back to neutral constants."""
    fallbacks = {
        "BaseColor": np.full((4, 4, 4), 0.8, np.float32),
        "Specular": np.tile(np.array([1.0, 0.5, 0.0, 1.0], np.float32),
                            (4, 4, 1)),
        "Normal": np.tile(np.array([0.5, 0.5, 1.0, 1.0], np.float32),
                          (4, 4, 1)),
    }
    textures = []
    for name in material_names:
        for suffix in MATERIAL_TEXTURE_SUFFIXES:
            path = os.path.join(texture_dir, f"{name}_{suffix}.vkt")
            if os.path.exists(path):
                tex = vkt.load_vkt(path)
                textures.append(tex.decode_to_float())
            else:
                textures.append([fallbacks[suffix]])
    return textures


def _decode_light_textures(paths: list[str]) -> tuple[list[list[np.ndarray]],
                                                      dict[str, int]]:
    """Dedup light texture paths; missing/empty -> white (main.c:371-391)."""
    unique: dict[str, int] = {}
    textures: list[list[np.ndarray]] = [[np.ones((4, 4, 4), np.float32)]]
    for p in paths:
        if not p or p in unique:
            continue
        if os.path.exists(p):
            unique[p] = len(textures)
            textures.append(vkt.load_vkt(p).decode_to_float())
        else:
            unique[p] = 0
    return textures, unique


def build_scene(mesh: SceneMesh, texture_dir: str,
                light_specs: list[PolygonalLightSpec],
                ltc: LtcTable | None = None,
                noise_type: NoiseType = NoiseType.WHITE,
                data_directory: str = "data") -> Scene:
    positions = mesh.dequantized_positions().reshape(-1, 3, 3)
    normals = mesh.decoded_normals().reshape(-1, 3, 3)
    tex_coords = mesh.decoded_tex_coords().reshape(-1, 3, 2)

    material_atlas = build_texture_atlas(
        _decode_material_textures(texture_dir, mesh.material_names))

    light_textures, path_to_index = _decode_light_textures(
        [spec.texture_file_path for spec in light_specs])
    lights = []
    for spec in light_specs:
        spec.texture_index = path_to_index.get(spec.texture_file_path, 0)
        lights.append(update_polygonal_light(spec))
    light_atlas = build_texture_atlas(light_textures)

    noise = load_noise_table(noise_type, data_directory)
    if ltc is None:
        ltc = identity_ltc_table()

    return Scene(
        triangle_positions=jnp.asarray(positions),
        triangle_normals=jnp.asarray(normals),
        triangle_tex_coords=jnp.asarray(tex_coords),
        material_indices=jnp.asarray(mesh.material_indices.astype(np.int32)),
        material_atlas=material_atlas,
        lights=stack_lights(lights),
        light_atlas=light_atlas,
        ltc=ltc,
        noise_table=jnp.asarray(
            noise.table.astype(np.float32) / 65535.0),
        noise_resolution_mask=jnp.asarray(noise.resolution_mask),
        noise_texture_index_mask=jnp.asarray(noise.texture_index_mask),
    )


def load_scene(vks_path: str, texture_dir: str,
               light_specs: list[PolygonalLightSpec], **kwargs) -> Scene:
    return build_scene(load_vks(vks_path), texture_dir, light_specs, **kwargs)
