"""glam-parity linear algebra in JAX.

The reference's camera/scene math is built on the Rust `glam` crate
(`topo-renderer/src/data/camera.rs`). For pixel comparability we reimplement
the exact same constructions with the same conventions:

  * column-vector matrices (``M @ v``), right-handed, depth range [0, 1]
    (wgpu convention) for ``perspective_rh``
  * ``look_to_rh`` per glam's `Mat4::look_to_rh`
  * ``quat_from_rotation_arc`` per glam's shortest-arc quaternion incl. the
    antiparallel branch using Pixar's orthonormal-vector construction
  * ``mat3_from_euler_xyz_ex`` — glam ``EulerRot::XYZEx`` (extrinsic X, then
    Y, then Z): ``Rz(c) @ Ry(b) @ Rx(a)``

Everything is float32 and jit-friendly (no Python branching on traced values).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS_ARC = 1.0 - 2.0 * jnp.finfo(jnp.float32).eps


def normalize(v, axis=-1, eps=0.0):
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, eps) if eps else v / n


def quat_from_axis_angle(axis, angle):
    """glam `Quat::from_axis_angle` — axis must be normalized. Returns xyzw."""
    half = 0.5 * angle
    s = jnp.sin(half)
    return jnp.concatenate([axis * s, jnp.cos(half)[None]])


def any_orthonormal_vector(v):
    """glam `Vec3::any_orthonormal_vector` (Pixar's orthonormal basis paper)."""
    sign = jnp.where(v[2] >= 0.0, 1.0, -1.0)  # f32::signum(0.0) == 1.0
    a = -1.0 / (sign + v[2])
    b = v[0] * v[1] * a
    return jnp.stack([b, sign + v[1] * v[1] * a, -v[1]])


def quat_from_rotation_arc(from_v, to_v):
    """glam `Quat::from_rotation_arc` — both inputs must be unit vectors.

    Used by `Camera::direction` (`camera.rs:104-111`) to rotate the canonical
    frame onto the sphere-local one.
    """
    d = jnp.dot(from_v, to_v)
    c = jnp.cross(from_v, to_v)
    general = normalize(jnp.concatenate([c, (1.0 + d)[None]]), eps=1e-30)
    antiparallel = quat_from_axis_angle(any_orthonormal_vector(from_v), jnp.pi)
    identity = jnp.array([0.0, 0.0, 0.0, 1.0], jnp.float32)
    q = jnp.where(d > _EPS_ARC, identity, jnp.where(d < -_EPS_ARC, antiparallel, general))
    return q


def quat_rotate(q, v):
    """Rotate vector by quaternion (xyzw)."""
    u = q[:3]
    w = q[3]
    return v + 2.0 * jnp.cross(u, jnp.cross(u, v) + w * v)


def rot_x(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([one, zero, zero]),
            jnp.stack([zero, c, -s]),
            jnp.stack([zero, s, c]),
        ]
    )


def rot_y(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, zero, s]),
            jnp.stack([zero, one, zero]),
            jnp.stack([-s, zero, c]),
        ]
    )


def rot_z(a):
    c, s = jnp.cos(a), jnp.sin(a)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, zero]),
            jnp.stack([s, c, zero]),
            jnp.stack([zero, zero, one]),
        ]
    )


def mat3_from_euler_xyz_ex(a, b, c):
    """glam ``Mat3::from_euler(EulerRot::XYZEx, a, b, c)``.

    Extrinsic X-Y-Z: rotations about the *fixed* axes applied in order X, Y,
    Z, i.e. ``Rz(c) @ Ry(b) @ Rx(a)``. Used by `LightAngle::to_vec3`
    (`camera.rs:45-53`) and `TerrainUniforms::new`
    (`topo-renderer/src/render/data.rs:122-127`).
    """
    return rot_z(c) @ rot_y(b) @ rot_x(a)


def look_to_rh(eye, direction, up):
    """glam `Mat4::look_to_rh` — view matrix for column vectors.

    `camera.rs:118-120` builds the view with the camera's forward direction
    (not a target point).
    """
    f = normalize(direction)
    s = normalize(jnp.cross(f, up))
    u = jnp.cross(s, f)
    zero = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    return jnp.stack(
        [
            jnp.concatenate([s, -jnp.dot(eye, s)[None]]),
            jnp.concatenate([u, -jnp.dot(eye, u)[None]]),
            jnp.concatenate([-f, jnp.dot(eye, f)[None]]),
            jnp.stack([zero, zero, zero, one]),
        ]
    )


def perspective_rh(fov_y, aspect, near, far):
    """glam `Mat4::perspective_rh` — RH, zero-to-one depth (wgpu).

    `camera.rs:122-128`. NDC z is 0 at the near plane and 1 at the far plane.
    """
    h = jnp.cos(0.5 * fov_y) / jnp.sin(0.5 * fov_y)
    w = h / aspect
    r = far / (near - far)
    zero = jnp.zeros((), jnp.float32)
    one = jnp.ones((), jnp.float32)
    return jnp.stack(
        [
            jnp.stack([w, zero, zero, zero]),
            jnp.stack([zero, h, zero, zero]),
            jnp.stack([zero, zero, r, r * near]),
            jnp.stack([zero, zero, -one, zero]),
        ]
    )


def mat4_from_mat3(m):
    out = jnp.zeros((4, 4), m.dtype).at[:3, :3].set(m)
    return out.at[3, 3].set(1.0)


def project_point3(m, p):
    """glam `Mat4::project_point3`: apply homogeneous transform and divide by w.

    Used for peak-label projection (`render_engine.rs:352`). Supports batched
    points ``[..., 3]``.
    """
    ph = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
    out = ph @ m.T
    return out[..., :3] / out[..., 3:4]


def transform_vector3(m, v):
    """Apply a mat4 to a direction (w=0), no perspective divide."""
    return v @ m[:3, :3].T
