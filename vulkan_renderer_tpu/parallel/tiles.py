"""Image-tile data parallelism over an ICI mesh.

The reference is single-GPU (SURVEY.md §2.7); the TPU-native scaling axis is
pixels: shard image rows over the mesh's 'tiles' axis, replicate the scene
(BVH, textures, tables — they are read-only), and let each chip shade its
rows. The only cross-chip communication is the implicit gather of the
output image, which XLA lowers onto ICI.

Usage:
    mesh = make_tile_mesh()                       # all available devices
    img = render_frame_sharded(mesh, scene, static, camera, settings, W, H)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.settings import RenderSettings
from ..render.pipeline import make_frame_constants, render_frame_jit
from ..render.shading import SceneStatic
from ..scene.camera import FirstPersonCamera
from ..scene.scene import Scene


def make_tile_mesh(devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), axis_names=("tiles",))


def _replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def render_frame_sharded(mesh: Mesh, scene: Scene, static: SceneStatic,
                         camera: FirstPersonCamera, settings: RenderSettings,
                         width: int, height: int, noise_random_numbers=None):
    """Render with image rows sharded over mesh axis 'tiles'.

    The frame function is pure and shards trivially: we annotate the output
    rows with P('tiles') and the inputs as replicated; XLA partitions the
    per-pixel vmap across chips (SPMD) with no communication until the
    final image assembly.
    """
    if noise_random_numbers is None:
        noise_random_numbers = (np.arange(4) * 0x123456).astype(np.uint32)
    n = mesh.devices.size
    if height % n:
        raise ValueError(f"height {height} not divisible by {n} devices")
    constants = make_frame_constants(camera, width, height, settings,
                                     noise_random_numbers)
    scene_r = _replicate(mesh, scene)
    constants_r = _replicate(mesh, constants)

    out_sharding = NamedSharding(mesh, P("tiles", None, None))
    render = jax.jit(
        render_frame_jit.__wrapped__,
        static_argnames=("static", "settings", "width", "height"),
        out_shardings=out_sharding)
    return render(scene_r, static, settings, constants_r, width, height)


def render_frame_shardmap(mesh: Mesh, scene: Scene, static: SceneStatic,
                          camera: FirstPersonCamera,
                          settings: RenderSettings,
                          width: int, height: int,
                          noise_random_numbers=None, with_stats=False):
    """Explicit shard_map frame: each device renders one image-row BAND
    through the full production pipeline — including the Pallas traversal
    kernels when static.traversal selects them — with the scene
    replicated. This is the multi-chip production path: GSPMD
    auto-partitioning (render_frame_sharded) cannot split the
    scalar-prefetched Pallas tracers, so the parallel axis must sit
    OUTSIDE the kernel calls; shard_map makes each shard run the
    single-chip code on its band (global pixel rows via row_offset, so
    rays and noise fetches are bit-identical to the unsharded frame).
    Cross-chip traffic is the output-band gather plus one psum of the
    exactness counters, both on ICI.
    """
    import functools

    try:
        from jax import shard_map as _sm
        # check_vma off: pallas_call out_shapes carry no vma annotation.
        shard_map = functools.partial(_sm, check_vma=False)
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map as _sme
        shard_map = functools.partial(_sme, check_rep=False)

    from ..render.pipeline import _render_frame_body

    if noise_random_numbers is None:
        noise_random_numbers = (np.arange(4) * 0x123456).astype(np.uint32)
    n = mesh.devices.size
    if height % n:
        raise ValueError(f"height {height} not divisible by {n} devices")
    band = height // n
    constants = make_frame_constants(camera, width, height, settings,
                                     noise_random_numbers)
    scene_r = _replicate(mesh, scene)
    constants_r = _replicate(mesh, constants)

    def shard_fn(scene_s, constants_s):
        row0 = jax.lax.axis_index("tiles") * band
        with jax.default_matmul_precision("highest"):
            out = _render_frame_body(scene_s, static, settings, constants_s,
                                     width, band, True, None, row0)
        image, stats = out
        stats = jax.tree.map(lambda x: jax.lax.psum(x, "tiles"), stats)
        return image, stats

    fn = shard_map(shard_fn, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P("tiles", None, None), P()))
    image, stats = jax.jit(fn)(scene_r, constants_r)
    if with_stats:
        return image, stats
    return image
