"""Camera/math tests — verify glam-parity constructions geometrically
(`topo-renderer/src/data/camera.rs`)."""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from topo_renderer_tpu.geo import GeoCoord
from topo_renderer_tpu.models.camera import (
    FAR,
    NEAR,
    Camera,
    LightAngle,
    ViewMode,
    depth_from_dist,
    dist_from_depth,
)
from topo_renderer_tpu.models.uniforms import Uniforms, normal_to_world_rotation
from topo_renderer_tpu.ops import mathx
from topo_renderer_tpu.ops.geometry import R0, ecef_from_geo, geo_from_ecef, local_frame


def make_camera(lat=49.35135, lon=20.21139, height=2000.0, **kw):
    cam = Camera().reset(GeoCoord(lat, lon), height)
    return dataclasses.replace(cam, **kw) if kw else cam


def test_dist_depth_roundtrip():
    # `camera.rs:12-14`
    assert float(dist_from_depth(0.0)) == NEAR
    assert float(dist_from_depth(1.0)) == FAR
    for d in [60.0, 1000.0, 123456.0, 499999.0]:
        np.testing.assert_allclose(float(dist_from_depth(depth_from_dist(d))), d, rtol=1e-4)


def test_view_mode_toggle():
    # `camera.rs:25-32`
    assert ViewMode.DEFAULT.toggle() == ViewMode.NORMALS
    assert ViewMode.NORMALS.toggle() == ViewMode.POSITION
    assert ViewMode.POSITION.toggle() == ViewMode.DEFAULT


def test_light_angle():
    # Derived in closed form from Rz(theta) @ Ry(90-phi) @ Z:
    # (cos phi cos theta, cos phi sin theta, sin phi).
    v = np.asarray(LightAngle(theta=45.0, phi=0.0).to_vec3())
    np.testing.assert_allclose(v, [math.sqrt(0.5), math.sqrt(0.5), 0.0], atol=1e-6)
    v = np.asarray(LightAngle(theta=123.0, phi=90.0).to_vec3())
    np.testing.assert_allclose(v, [0.0, 0.0, 1.0], atol=1e-6)
    # Sun at zenith after reset (`camera.rs:88-93`): direction == up.
    cam = make_camera()
    np.testing.assert_allclose(
        np.asarray(cam.sun_angle.to_vec3()), np.asarray(cam.up()), atol=1e-5
    )


def test_ecef_transform():
    # `geometry.rs:12-20`
    p = np.asarray(ecef_from_geo(0.0, 0.0, 0.0))
    np.testing.assert_allclose(p, [R0, 0.0, 0.0], atol=1e-3)
    p = np.asarray(ecef_from_geo(1000.0, 90.0, 0.0))
    np.testing.assert_allclose(p, [0.0, R0 + 1000.0, 0.0], atol=0.5)
    p = np.asarray(ecef_from_geo(0.0, 20.0, 90.0))
    np.testing.assert_allclose(p[2], R0, rtol=1e-6)
    # inverse
    h, lon, lat = (np.asarray(x) for x in geo_from_ecef(ecef_from_geo(1234.0, 20.25, 49.5)))
    np.testing.assert_allclose([h, lon, lat], [1234.0, 20.25, 49.5], atol=2e-2)


def test_camera_up_and_direction():
    cam = make_camera()
    up = np.asarray(cam.up())
    np.testing.assert_allclose(np.linalg.norm(up), 1.0, rtol=1e-6)
    np.testing.assert_allclose(up, np.asarray(cam.eye) / np.linalg.norm(cam.eye), rtol=1e-6)

    d = np.asarray(cam.direction())
    np.testing.assert_allclose(np.linalg.norm(d), 1.0, rtol=1e-5)
    # pitch 0 -> direction is horizontal (orthogonal to up)
    np.testing.assert_allclose(np.dot(d, up), 0.0, atol=1e-5)
    # The canonical frame's "up" is (0,-1,0) (`camera.rs:104`), so positive
    # pitch (canonical +y) tilts the view *downward*.
    cam_dn = dataclasses.replace(cam, pitch=0.3)
    assert float(jnp.dot(cam_dn.direction(), cam.up())) < -0.25

    # direction_right is -90° about up (`camera.rs:113-115`): r = d x up.
    r = np.asarray(cam.direction_right())
    np.testing.assert_allclose(np.dot(r, d), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.dot(r, up), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.cross(d, up), r, atol=1e-5)


def test_rotation_arc_antiparallel():
    # up == (0, 1, 0) exactly: the antiparallel branch of from_rotation_arc.
    q = mathx.quat_from_rotation_arc(
        jnp.array([0.0, -1.0, 0.0]), jnp.array([0.0, 1.0, 0.0])
    )
    v = np.asarray(mathx.quat_rotate(q, jnp.array([0.0, -1.0, 0.0])))
    np.testing.assert_allclose(v, [0.0, 1.0, 0.0], atol=1e-6)
    # identity branch
    q = mathx.quat_from_rotation_arc(
        jnp.array([0.0, -1.0, 0.0]), jnp.array([0.0, -1.0, 0.0])
    )
    np.testing.assert_allclose(np.asarray(q), [0, 0, 0, 1], atol=1e-6)


def test_view_matrix_properties():
    cam = make_camera(pitch=-0.1, yaw=0.7)
    view = np.asarray(cam.get_view())
    eye = np.append(np.asarray(cam.eye), 1.0)
    # eye magnitude is ~6.4e6 m; float32 dot products leave sub-meter residue
    # (identical in the reference's f32 glam math).
    np.testing.assert_allclose(view @ eye, [0, 0, 0, 1], atol=1.0)
    d = np.append(np.asarray(cam.direction()), 0.0)
    np.testing.assert_allclose(view @ d, [0, 0, -1, 0], atol=1e-5)


def test_projection_depth_convention():
    cam = make_camera()
    proj = np.asarray(cam.build_view_proj_matrix(800.0, 450.0))
    d = np.asarray(cam.direction())
    eye = np.asarray(cam.eye)

    def ndc(p):
        h = proj @ np.append(p, 1.0)
        return h[:3] / h[3]

    # Points along the view axis: near -> z=0, far -> z=1, center -> x=y=0.
    # (atol reflects f32 cancellation: the point is built from an ~6.4e6 m
    # eye, so its camera-space position carries ~0.5 m of rounding.)
    np.testing.assert_allclose(ndc(eye + NEAR * d), [0, 0, 0], atol=5e-2)
    np.testing.assert_allclose(ndc(eye + FAR * d)[2], 1.0, atol=1e-5)
    # dist_from_depth inverts the depth of an on-axis point.
    for dist in [100.0, 5000.0, 300000.0]:
        z = ndc(eye + dist * d)[2]
        np.testing.assert_allclose(float(dist_from_depth(z)), dist, rtol=2e-2)


def test_project_point3_matches_manual():
    cam = make_camera()
    proj = cam.build_view_proj_matrix(800.0, 450.0)
    p = jnp.asarray(cam.eye) + 1000.0 * cam.direction()
    out = np.asarray(mathx.project_point3(proj, p))
    h = np.asarray(proj) @ np.append(np.asarray(p), 1.0)
    # atol for the on-axis x/y components, which are ~0 after cancellation.
    np.testing.assert_allclose(out, h[:3] / h[3], rtol=1e-5, atol=1e-3)


def test_fov_clamp_and_pitch_guard():
    cam = make_camera()
    assert float(cam.with_fovy(0.01).fov_y) == np.float32(math.radians(10.0))
    assert float(cam.with_fovy(7.0).fov_y) == np.float32(math.radians(160.0))
    # `camera.rs:168-172`: pitch capped at +90°, no lower guard.
    cam2 = dataclasses.replace(cam, pitch=math.radians(89.0)).rotate_pitch(math.radians(5.0))
    np.testing.assert_allclose(float(cam2.pitch), math.radians(89.0))
    cam3 = dataclasses.replace(cam, pitch=0.0).rotate_pitch(math.radians(-200.0))
    np.testing.assert_allclose(float(cam3.pitch), math.radians(-200.0), rtol=1e-6)


def test_camera_is_pytree():
    cam = make_camera()
    leaves = jax.tree_util.tree_leaves(cam)
    assert len(leaves) >= 7

    @jax.jit
    def f(c: Camera):
        return c.build_view_proj_matrix(800.0, 450.0)

    np.testing.assert_allclose(
        np.asarray(f(cam)), np.asarray(cam.build_view_proj_matrix(800.0, 450.0)), rtol=1e-6
    )


def test_uniforms_build():
    cam = make_camera()
    u = Uniforms.new(cam, 800.0, 450.0)
    assert u.camera_proj.shape == (4, 4)
    assert u.normal_proj.shape == (4, 4)
    np.testing.assert_allclose(np.asarray(u.camera_pos)[:3], np.asarray(cam.eye))
    assert int(u.view_mode) == 0
    # normal matrix = inverse transpose of view (`camera.rs:130-132`)
    v = np.asarray(cam.get_view())
    np.testing.assert_allclose(
        np.asarray(u.normal_proj), np.linalg.inv(v).T, rtol=1e-4, atol=1e-4
    )


def test_normal_to_world_rotation_maps_z_to_up():
    # local z must map to the radial up at the tiepoint (`data.rs:120-127`).
    rot = np.asarray(normal_to_world_rotation(20.0, 50.0))[:3, :3]
    _, _, up = (np.asarray(v) for v in local_frame(20.0, 50.0))
    np.testing.assert_allclose(rot @ [0, 0, 1], up, atol=1e-6)
    # And the reference's axis twist: local x -> south, local y -> east.
    east, north, _ = (np.asarray(v) for v in local_frame(20.0, 50.0))
    np.testing.assert_allclose(rot @ [1, 0, 0], -north, atol=1e-6)
    np.testing.assert_allclose(rot @ [0, 1, 0], east, atol=1e-6)
