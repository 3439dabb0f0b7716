import os

import numpy as np
import pytest

from vulkan_renderer_tpu.assets import vks, vkt
from vulkan_renderer_tpu.assets.noise import (NoiseType,
                                              advance_noise_random_numbers,
                                              load_noise_table)
from vulkan_renderer_tpu.assets.quicksave import (Quicksave, load_quicksave,
                                                  save_quicksave)
from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
from vulkan_renderer_tpu.scene.lights import PolygonalLightSpec
from vulkan_renderer_tpu.tools import export_scene


def test_vks_roundtrip(tmp_path, rng):
    tris, norms, uvs, mats, names = export_scene.make_cornell_box()
    mesh = export_scene.build_scene_mesh(tris, norms, uvs, mats, names)
    path = str(tmp_path / "scene.vks")
    vks.save_vks(path, mesh)
    loaded = vks.load_vks(path)
    assert loaded.material_names == names
    assert loaded.triangle_count == mesh.triangle_count
    np.testing.assert_array_equal(loaded.quantized_positions,
                                  mesh.quantized_positions)
    np.testing.assert_array_equal(loaded.normals_and_tex_coords,
                                  mesh.normals_and_tex_coords)
    np.testing.assert_array_equal(loaded.material_indices,
                                  mesh.material_indices)
    # Dequantized positions close to the source triangles (after the Morton
    # permutation) within 21-bit quantization error.
    dq = loaded.dequantized_positions().reshape(-1, 3, 3)
    extent = tris.reshape(-1, 3).max(0) - tris.reshape(-1, 3).min(0)
    order = export_scene.morton_order(tris.mean(axis=1),
                                      tris.reshape(-1, 3).min(0),
                                      tris.reshape(-1, 3).max(0))
    np.testing.assert_allclose(dq, tris[order],
                               atol=float(np.max(extent)) / (1 << 20))


def test_vks_normals_and_uv_decode(tmp_path):
    tris, norms, uvs, mats, names = export_scene.make_cornell_box()
    mesh = export_scene.build_scene_mesh(tris, norms, uvs, mats, names)
    decoded_n = mesh.decoded_normals().reshape(-1, 3, 3)
    order = export_scene.morton_order(tris.mean(axis=1),
                                      tris.reshape(-1, 3).min(0),
                                      tris.reshape(-1, 3).max(0))
    dots = np.sum(decoded_n * norms[order], axis=-1)
    assert np.all(dots > 0.9999)
    decoded_uv = mesh.decoded_tex_coords().reshape(-1, 3, 2)
    # UVs match up to integer shifts (wrapping).
    diff = decoded_uv - uvs[order]
    frac = diff - np.round(diff.mean(axis=1, keepdims=True))
    assert np.max(np.abs(frac)) < 1e-3


def test_bc1_roundtrip(rng):
    img = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    # Smooth blocks compress well; use blockwise-constant image for tight check.
    img = np.repeat(np.repeat(rng.uniform(0, 1, (4, 4, 3)), 4, 0), 4, 1) \
        .astype(np.float32)
    raw = vkt.encode_bc1(img)
    decoded = vkt.decode_bc1(raw, 16, 16)
    assert np.max(np.abs(decoded - img)) < 0.04  # 5/6-bit endpoints


def test_bc5_roundtrip(rng):
    img = np.repeat(np.repeat(rng.uniform(0, 1, (4, 4, 2)), 4, 0), 4, 1) \
        .astype(np.float32)
    raw = vkt.encode_bc5(img)
    decoded = vkt.decode_bc5(raw, 16, 16)
    assert np.max(np.abs(decoded - img)) < 0.01  # 8-bit endpoints


def test_vkt_roundtrip(tmp_path, rng):
    img = export_scene.checkerboard_texture(64)
    tex = vkt.encode_texture(img, vkt.VK_FORMAT_BC1_RGB_SRGB_BLOCK)
    assert len(tex.mips) == 7  # 64 -> 1
    path = str(tmp_path / "t.vkt")
    vkt.save_vkt(path, tex)
    loaded = vkt.load_vkt(path)
    assert loaded.format == tex.format
    assert loaded.width == 64 and loaded.height == 64
    for a, b in zip(loaded.mips, tex.mips):
        np.testing.assert_array_equal(a, b)
    decoded = loaded.decode_to_float(0)[0]
    assert decoded.shape == (64, 64, 3)
    # sRGB-encoded checkerboard should decode near the linear original.
    assert np.mean(np.abs(decoded - img)) < 0.03


def test_quicksave_roundtrip(tmp_path):
    cam = FirstPersonCamera(
        position_world_space=np.array([1.0, 2.0, 3.0], np.float32),
        rotation_z=0.5, rotation_x=1.2, vertical_fov=1.0,
        near=0.1, far=100.0, speed=4.0)
    lights = [PolygonalLightSpec(
        rotation_angles=np.array([0.1, 0.2, 0.3], np.float32),
        scaling_x=2.0, scaling_y=3.0,
        translation=np.array([0.0, 1.0, 5.0], np.float32),
        radiant_flux=np.array([10.0, 8.0, 6.0], np.float32),
        vertices_plane_space=np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]],
                                      np.float32),
        texture_file_path="data/textures/foo.vkt")]
    path = str(tmp_path / "test.save")
    save_quicksave(path, Quicksave(camera=cam, lights=lights))
    loaded = load_quicksave(path)
    np.testing.assert_allclose(loaded.camera.position_world_space,
                               cam.position_world_space)
    assert loaded.camera.rotation_z == pytest.approx(0.5)
    assert loaded.camera.vertical_fov == pytest.approx(1.0)
    assert len(loaded.lights) == 1
    lt = loaded.lights[0]
    np.testing.assert_allclose(lt.vertices_plane_space,
                               lights[0].vertices_plane_space)
    assert lt.scaling_y == pytest.approx(3.0)
    assert lt.texture_file_path == "data/textures/foo.vkt"


def test_white_noise_bit_exact():
    table = load_noise_table(NoiseType.WHITE, resolution=(8, 8, 2))
    # First cell: wang_hash(0 + 243708) & 0xFFFF.
    from vulkan_renderer_tpu.ops.math_utils import wang_hash_np
    expected = int(wang_hash_np(np.uint32(243708))) & 0xFFFF
    assert int(table.table.reshape(-1)[0]) == expected
    assert table.table.shape == (2, 8, 8, 4)
    assert int(table.resolution_mask[0]) == 7
    assert int(table.texture_index_mask) == 1


def test_noise_random_numbers_match_reference():
    from vulkan_renderer_tpu.ops.math_utils import wang_hash_np
    seed, rand = advance_noise_random_numbers(3124705, animate=True)
    assert seed == 3124706
    for i in range(4):
        assert int(rand[i]) == int(wang_hash_np(np.uint32(3124705 * 4 + i)))
    _, frozen = advance_noise_random_numbers(7, animate=False)
    np.testing.assert_array_equal(frozen,
                                  (np.arange(4) * 0x123456).astype(np.uint32))


def test_write_test_scene(tmp_path):
    path = export_scene.write_test_scene(str(tmp_path), "cornell_box",
                                         texture_resolution=32)
    mesh = vks.load_vks(path)
    assert mesh.triangle_count == 30
    for name in mesh.material_names:
        for suffix in ("BaseColor", "Specular", "Normal"):
            tex_path = os.path.join(str(tmp_path), "cornell_box_textures",
                                    f"{name}_{suffix}.vkt")
            tex = vkt.load_vkt(tex_path)
            assert tex.width == 32


def test_noise_blob_roundtrip(tmp_path):
    """Generated .blob files load through the reference's naming scheme."""
    import numpy as np
    from vulkan_renderer_tpu.tools.generate_noise import generate_blob
    noise_dir = tmp_path / "noise"
    noise_dir.mkdir()
    table = generate_blob("blue_noise", 64, 64, 1, seed=3)
    (noise_dir / "blue_noise_rgba_64x64_01.blob").write_bytes(table.tobytes())
    loaded = load_noise_table(NoiseType.BLUE, str(tmp_path),
                              resolution=(64, 64, 1))
    np.testing.assert_array_equal(loaded.table, table)
    # Blue noise must differ from the white-noise fallback.
    white = load_noise_table(NoiseType.WHITE, resolution=(64, 64, 1))
    assert not np.array_equal(loaded.table, white.table)


def test_default_ltc_table_loads():
    from vulkan_renderer_tpu.assets.ltc_table import default_ltc_table
    table = default_ltc_table()
    assert table.table.ndim == 4 and table.table.shape[-1] == 6
    # Full reference fidelity: 51 Fresnel levels (ltc_table.c:31-47).
    assert table.table.shape[0] == 51
    assert table.quad is not None


def test_process_records_parity_with_reference_pipeline():
    """_process_records must reproduce ltc_table.c:62-116 exactly: build
    the inverse of M = [[d0,0,d1],[0,d2,0],[d3,0,1]] (cofactor form, no
    determinant division), normalize by the max |entry|, reorder to the
    two texture layouts, negate slot 1, quantize to u16 UNORM."""
    rng = np.random.RandomState(11)
    n = 64
    d0 = 0.05 + rng.rand(n).astype(np.float32)
    d1 = (rng.rand(n).astype(np.float32) - 0.5)
    d2 = 0.05 + rng.rand(n).astype(np.float32)
    d3 = (rng.rand(n).astype(np.float32) - 0.5) * 0.5
    albedo = rng.rand(n).astype(np.float32)
    records = np.stack([d0, d1, d2, d3, albedo], axis=-1)

    from vulkan_renderer_tpu.assets.ltc_table import _process_records
    got0, got1 = _process_records(records)

    for i in range(n):
        m = np.array([[d0[i], 0.0, d1[i]],
                      [0.0, d2[i], 0.0],
                      [d3[i], 0.0, 1.0]], np.float64)
        inv = np.linalg.inv(m) * np.linalg.det(m)  # adjugate (cofactor)
        inv /= np.abs(inv).max()
        expect = np.array([inv[0, 0], -inv[0, 2], inv[1, 1],
                           inv[2, 0], inv[2, 2], albedo[i]])
        expect = np.floor(np.clip(expect, 0.0, 1.0) * 65535.0 + 0.5) / 65535.0
        np.testing.assert_allclose(
            np.concatenate([got0[i], got1[i]]), expect, atol=2e-5,
            err_msg=f"record {i}")
