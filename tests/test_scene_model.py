import numpy as np
import pytest

from vulkan_renderer_tpu.scene.camera import (
    FirstPersonCamera, get_pixel_to_ray_direction_world_space,
    get_world_to_projection_space, get_world_to_view_space)
from vulkan_renderer_tpu.scene.lights import (PolygonalLightSpec,
                                              rotation_matrix_from_euler,
                                              update_polygonal_light)


def test_light_derivations_square():
    spec = PolygonalLightSpec(
        rotation_angles=np.zeros(3, np.float32),
        scaling_x=2.0, scaling_y=3.0,
        translation=np.array([1.0, 2.0, 5.0], np.float32),
        radiant_flux=np.array([np.pi * 24.0] * 3, np.float32),
        vertices_plane_space=np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]],
                                      np.float32))
    light = update_polygonal_light(spec)
    # Identity rotation: world verts = translation + (sx*x, sy*y, 0).
    np.testing.assert_allclose(
        light.vertices_world_space[0], [1 - 2, 2 - 3, 5], atol=1e-6)
    np.testing.assert_allclose(
        light.vertices_world_space[2], [1 + 2, 2 + 3, 5], atol=1e-6)
    # Area: 2x2 square scaled by (2, 3) -> 24.
    assert float(light.area) == pytest.approx(24.0, rel=1e-6)
    # Radiance = flux / (area * pi) = 1.
    np.testing.assert_allclose(light.surface_radiance, 1.0, rtol=1e-6)
    # Plane through translation with normal +/-z.
    assert abs(float(light.plane[2])) == pytest.approx(1.0, abs=1e-6)
    point_on = light.vertices_world_space[1]
    assert float(light.plane[:3] @ point_on + light.plane[3]) == \
        pytest.approx(0.0, abs=1e-5)
    # Padding repeats the first vertex.
    np.testing.assert_allclose(light.vertices_world_space[4:],
                               np.broadcast_to(light.vertices_world_space[0],
                                               (3, 3)))


def test_light_rotation_orthonormal(rng):
    for _ in range(10):
        angles = rng.uniform(-np.pi, np.pi, 3).astype(np.float32)
        r = rotation_matrix_from_euler(angles)
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_light_winding_flips_plane():
    ccw = PolygonalLightSpec(vertices_plane_space=np.array(
        [[-1, -1], [1, -1], [1, 1], [-1, 1]], np.float32),
        translation=np.array([0, 0, 5], np.float32))
    cw = PolygonalLightSpec(vertices_plane_space=np.array(
        [[-1, 1], [1, 1], [1, -1], [-1, -1]], np.float32),
        translation=np.array([0, 0, 5], np.float32))
    l_ccw = update_polygonal_light(ccw)
    l_cw = update_polygonal_light(cw)
    np.testing.assert_allclose(l_ccw.plane, -l_cw.plane, atol=1e-6)
    assert float(l_ccw.area) == pytest.approx(float(l_cw.area))


def test_camera_view_matrix_properties():
    cam = FirstPersonCamera(
        position_world_space=np.array([3.0, -2.0, 1.5], np.float32),
        rotation_x=0.7, rotation_z=-1.1)
    view = get_world_to_view_space(cam)
    # Camera position maps to origin.
    pos_h = np.append(cam.position_world_space, 1.0)
    np.testing.assert_allclose((view @ pos_h)[:3], 0.0, atol=1e-5)
    # Rotation part orthonormal.
    r = view[:3, :3]
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)


def test_projection_depth_range():
    cam = FirstPersonCamera(near=0.1, far=100.0,
                            rotation_x=np.pi / 2)  # looking along -y? n/a
    proj = get_world_to_projection_space(cam, 16 / 9)
    # A point at distance `near` straight ahead lands at depth -1, at `far`
    # at +1 (the reference's (far+near)/(far-near) convention).
    view = get_world_to_view_space(cam)
    inv_view = np.linalg.inv(view.astype(np.float64))
    for dist, expected in ((cam.near, -1.0), (cam.far, 1.0)):
        p_view = np.array([0.0, 0.0, -dist, 1.0])
        p_world = inv_view @ p_view
        clip = proj.astype(np.float64) @ p_world
        assert clip[2] / clip[3] == pytest.approx(expected, abs=1e-4)


def test_pixel_to_ray_matrix_center():
    cam = FirstPersonCamera(
        position_world_space=np.array([1.0, -2.0, 1.7], np.float32),
        rotation_x=0.5, rotation_z=0.3, vertical_fov=np.radians(60))
    width, height = 640, 480
    p2r = get_pixel_to_ray_direction_world_space(cam, width, height)
    # The center pixel's ray must align with the camera forward direction.
    center = p2r @ np.array([width / 2, height / 2, 1.0], np.float32)
    center /= np.linalg.norm(center)
    # Forward dir: view space -z transformed to world.
    view = get_world_to_view_space(cam)
    forward = np.linalg.inv(view.astype(np.float64))[:3, :3] @ [0, 0, -1]
    assert float(center @ forward) == pytest.approx(1.0, abs=1e-4)
    # Corner pixels: vertical angular extent matches the fov.
    top = p2r @ np.array([width / 2, 0.0, 1.0], np.float32)
    bottom = p2r @ np.array([width / 2, float(height), 1.0], np.float32)
    cos_fov = (top @ bottom) / (np.linalg.norm(top) * np.linalg.norm(bottom))
    assert np.degrees(np.arccos(cos_fov)) == pytest.approx(60.0, abs=0.5)
