"""Viewer key handling + movement parity (camera.c:86-131) and the
headless orbit loop."""

import os
import tempfile

import numpy as np
import pytest

from vulkan_renderer_tpu.core.settings import (MisHeuristic,
                                               PolygonSamplingTechnique,
                                               SamplingStrategy,
                                               settings_violations)
from vulkan_renderer_tpu.scene.camera import FirstPersonCamera
from vulkan_renderer_tpu.tools.viewer import (InteractiveViewer, move_camera,
                                              run_orbit)


def test_move_camera_matches_reference_math():
    """camera.c:124-131: forward is -sin_z/-cos_z in x/y, right is
    -cos_z/+sin_z, vertical is +z."""
    cam = FirstPersonCamera(
        position_world_space=np.zeros(3, np.float32),
        rotation_x=0.5, rotation_z=0.3)
    out = move_camera(cam, forward=2.0, right=1.0, vertical=0.5)
    sin_z, cos_z = np.sin(0.3), np.cos(0.3)
    np.testing.assert_allclose(
        out.position_world_space,
        [-sin_z * 2.0 - cos_z * 1.0, -cos_z * 2.0 + sin_z * 1.0, 0.5],
        rtol=1e-6)
    # rotation_x clamps to [0, pi] (camera.c:102-103).
    assert move_camera(cam, rotate_x=-4.0).rotation_x == 0.0
    assert move_camera(cam, rotate_x=+4.0).rotation_x == np.pi


class _FakeApp:
    """Settings/camera holder; no rendering."""

    def __init__(self):
        from vulkan_renderer_tpu.core.app import SceneSpecification
        from vulkan_renderer_tpu.core.settings import RenderSettings
        self.scene_spec = SceneSpecification(camera=FirstPersonCamera(
            position_world_space=np.zeros(3, np.float32)))
        self.settings = RenderSettings()
        self.width = self.height = 0


def test_viewer_toggles_stay_legal():
    """Cycling techniques/strategies/heuristics through the viewer can
    never produce an illegal combination (the GUI-masking parity)."""
    viewer = InteractiveViewer(_FakeApp(), 32, 32)
    for _ in range(16):
        for key in ("t", "y", "u", "r"):
            viewer.handle_key(key)
            assert not settings_violations(viewer.app.settings)


def test_viewer_movement_keys():
    viewer = InteractiveViewer(_FakeApp(), 32, 32)
    assert viewer.handle_key("w")
    assert viewer.app.scene_spec.camera.position_world_space[1] != 0.0
    rz = viewer.app.scene_spec.camera.rotation_z
    assert viewer.handle_key("left")
    assert viewer.app.scene_spec.camera.rotation_z != rz
    assert not viewer.handle_key("unmapped")


@pytest.mark.slow
def test_run_orbit_renders_frames(tmp_path):
    from vulkan_renderer_tpu.core.app import Application, SceneSpecification
    from vulkan_renderer_tpu.experiments.setups import (
        _scene_default_camera, _scene_default_lights)
    from vulkan_renderer_tpu.tools.export_scene import write_test_scene

    d = tempfile.mkdtemp(prefix="viewer_")
    vks = write_test_scene(d, "cornell_box", texture_resolution=16)
    app = Application(SceneSpecification(
        name="cornell_box", vks_path=vks,
        texture_dir=os.path.join(d, "cornell_box_textures"),
        camera=_scene_default_camera("cornell_box"),
        lights=_scene_default_lights("cornell_box")),
        width=32, height=32, data_directory=d)
    paths = run_orbit(app, frames=3, output_dir=str(tmp_path / "orbit"),
                      width=32, height=32)
    assert len(paths) == 3
    assert all(os.path.exists(p) for p in paths)
