"""Camera model: ECEF free-fly camera on the sphere.

Parity with `topo-renderer/src/data/camera.rs`:
  * constants NEAR=50, FAR=500,000; FOV default 45° clamped to [10°, 160°]
    (`camera.rs:7-10,73,160-162`)
  * ``dist_from_depth`` inverts the wgpu 0..1 perspective depth to metric
    distance (`camera.rs:12-14`)
  * ``ViewMode`` (Default=0, Normals=1, Position=2) (`camera.rs:17-33`) —
    note that the *shader* shows undithered shading for mode 1 and
    normal-as-color for mode 2 (`resources/shaders/render_shader.wgsl:107-114`);
    we replicate values and behavior, not the (mismatched) names.
  * ``LightAngle`` sun direction via extrinsic-XYZ Euler rotation
    (`camera.rs:36-53`): theta=0 points the sun along +X rotated to local
    zenith when (theta, phi) = (longitude, latitude).
  * sphere-local orientation: ``up`` = normalized eye; ``direction`` rotates a
    pitch/yaw direction from the canonical frame (whose "up" is (0,-1,0))
    onto the local frame via a shortest-arc quaternion (`camera.rs:99-111`).
  * view = glam ``look_to_rh``, projection = ``perspective_rh`` (0..1 depth)
    (`camera.rs:118-128`), normal matrix = inverse-transpose of view
    (`camera.rs:130-132`).

The camera is an immutable JAX pytree: controller code produces new cameras
via ``replace`` instead of mutating, so a camera can flow straight into jitted
render functions (including vmapped batches of cameras).
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Any

import jax
import jax.numpy as jnp

from topo_renderer_tpu.geo import GeoCoord
from topo_renderer_tpu.ops import mathx
from topo_renderer_tpu.ops.geometry import ecef_from_geo

NEAR = 50.0
FAR = 500_000.0
MIN_FOV = math.radians(10.0)
MAX_FOV = math.radians(160.0)
DEFAULT_FOV = math.radians(45.0)


def dist_from_depth(depth):
    """0..1 perspective depth -> metric distance (`camera.rs:12-14`)."""
    return FAR * NEAR / (FAR - depth * (FAR - NEAR))


def depth_from_dist(dist):
    """Inverse of :func:`dist_from_depth` — needed to write reference-
    convention depth buffers from ray-marched distances (no reference
    equivalent; algebraic inverse of `camera.rs:12-14`)."""
    return (FAR - FAR * NEAR / dist) / (FAR - NEAR)


class ViewMode(enum.IntEnum):
    DEFAULT = 0
    NORMALS = 1
    POSITION = 2

    def toggle(self) -> "ViewMode":
        # `camera.rs:25-32`
        return ViewMode((int(self) + 1) % 3)


@dataclasses.dataclass(frozen=True)
class LightAngle:
    """Sun direction angles in degrees (`camera.rs:36-43`):
    theta — "0 is down, around X"; phi — "0 is in direction of x, around Y"."""

    theta: Any = 0.0
    phi: Any = 0.0

    def to_vec3(self):
        # `camera.rs:45-53`: Mat3::from_euler(XYZEx, 0, (90-phi)°, theta°) @ Z.
        m = mathx.mat3_from_euler_xyz_ex(
            jnp.float32(0.0),
            jnp.radians(90.0 - jnp.float32(self.phi)),
            jnp.radians(jnp.float32(self.theta)),
        )
        return m @ jnp.array([0.0, 0.0, 1.0], jnp.float32)


jax.tree_util.register_dataclass(
    LightAngle, data_fields=["theta", "phi"], meta_fields=[]
)


@dataclasses.dataclass(frozen=True)
class Camera:
    eye: Any = dataclasses.field(
        default_factory=lambda: jnp.zeros(3, jnp.float32)
    )  # `Camera::DEFAULT_POSITION` (`camera.rs:86`)
    pitch: Any = 0.0
    yaw: Any = 0.0
    fov_y: Any = DEFAULT_FOV
    near: Any = NEAR
    far: Any = FAR
    view_mode: ViewMode = ViewMode.DEFAULT
    sun_angle: LightAngle = dataclasses.field(
        default_factory=lambda: LightAngle(theta=45.0, phi=0.0)
    )  # default sun (`camera.rs:75-79`)

    # -- orientation ------------------------------------------------------

    def up(self):
        # `camera.rs:95-97`
        return mathx.normalize(jnp.asarray(self.eye, jnp.float32))

    def direction(self):
        # `camera.rs:99-111`: rotate the canonical pitch/yaw direction so that
        # the canonical frame's (0,-1,0) maps onto local up.
        rot = mathx.quat_from_rotation_arc(
            jnp.array([0.0, -1.0, 0.0], jnp.float32), self.up()
        )
        pitch = jnp.float32(self.pitch)
        yaw = jnp.float32(self.yaw)
        d = jnp.stack(
            [
                jnp.cos(yaw) * jnp.cos(pitch),
                jnp.sin(pitch),
                jnp.sin(yaw) * jnp.cos(pitch),
            ]
        )
        return mathx.quat_rotate(rot, d)

    def direction_right(self):
        # `camera.rs:113-115`: rotate direction -90° about up.
        q = mathx.quat_from_axis_angle(self.up(), jnp.float32(-0.5 * jnp.pi))
        return mathx.quat_rotate(q, self.direction())

    def direction_down(self):
        # `camera.rs:117`
        return -self.up()

    # -- matrices ---------------------------------------------------------

    def get_view(self):
        # `camera.rs:118-120`
        return mathx.look_to_rh(
            jnp.asarray(self.eye, jnp.float32), self.direction(), self.up()
        )

    def build_view_proj_matrix(self, width, height):
        # `camera.rs:122-128`
        aspect = jnp.float32(width) / jnp.float32(height)
        proj = mathx.perspective_rh(
            jnp.float32(self.fov_y), aspect, jnp.float32(self.near), jnp.float32(self.far)
        )
        return proj @ self.get_view()

    def build_view_normal_matrix(self):
        # `camera.rs:130-132`
        return jnp.linalg.inv(self.get_view()).T

    def position(self):
        # `camera.rs:134-136`: vec4(eye, 0)
        return jnp.concatenate(
            [jnp.asarray(self.eye, jnp.float32), jnp.zeros(1, jnp.float32)]
        )

    # -- functional "mutators" -------------------------------------------

    def reset(self, coord: GeoCoord, height) -> "Camera":
        # `camera.rs:88-93`: move to the location and put the sun at its zenith.
        eye = ecef_from_geo(
            jnp.float32(height), jnp.float32(coord.longitude), jnp.float32(coord.latitude)
        )
        return dataclasses.replace(
            self,
            eye=eye,
            sun_angle=LightAngle(theta=coord.longitude, phi=coord.latitude),
        )

    def with_fovy(self, fov) -> "Camera":
        # clamp [10°, 160°] (`camera.rs:160-162`)
        return dataclasses.replace(self, fov_y=jnp.clip(jnp.float32(fov), MIN_FOV, MAX_FOV))

    def rotate_yaw(self, clockwise_rotation) -> "Camera":
        # `camera.rs:164-166`
        return dataclasses.replace(self, yaw=jnp.float32(self.yaw) + clockwise_rotation)

    def rotate_pitch(self, clockwise_rotation) -> "Camera":
        # `camera.rs:168-172`: the reference only guards the +90° side; the
        # rotation is skipped entirely when it would exceed it.
        new_pitch = jnp.float32(self.pitch) + clockwise_rotation
        pitch = jnp.where(new_pitch <= jnp.radians(90.0), new_pitch, jnp.float32(self.pitch))
        return dataclasses.replace(self, pitch=pitch)

    def toggle_view_mode(self) -> "Camera":
        return dataclasses.replace(self, view_mode=self.view_mode.toggle())


jax.tree_util.register_dataclass(
    Camera,
    data_fields=["eye", "pitch", "yaw", "fov_y", "near", "far", "sun_angle"],
    meta_fields=["view_mode"],
)
