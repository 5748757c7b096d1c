"""Sphere geometry: geographic coordinates -> ECEF positions.

Parity with `topo-renderer/src/render/geometry.rs:5,12-20` and the identical
math in the vertex shader (`resources/shaders/render_shader.wgsl:53-64`):
the Earth is a sphere of radius R0 = 6,371,000 m; a point at longitude λ,
latitude φ and height h sits at

    r = R0 + h
    x = r cos φ cos λ,  y = r cos φ sin λ,  z = r sin φ

All functions are float32, jit-friendly, and broadcast over leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

R0 = 6_371_000.0


def ecef_from_geo(height, longitude_deg, latitude_deg):
    """`geometry::transform` (`geometry.rs:12-20`): (h, lon°, lat°) -> ECEF [...,3]."""
    r = R0 + height
    lon = jnp.radians(longitude_deg)
    lat = jnp.radians(latitude_deg)
    cos_lat = jnp.cos(lat)
    return jnp.stack(
        [r * cos_lat * jnp.cos(lon), r * cos_lat * jnp.sin(lon), r * jnp.sin(lat)],
        axis=-1,
    )


def geo_from_ecef(p):
    """Inverse mapping: ECEF [...,3] -> (height, lon°, lat°).

    No reference equivalent (the reference never inverts); needed by the
    ray-marcher to sample the heightfield along ECEF rays.
    """
    r = jnp.linalg.norm(p, axis=-1)
    lat = jnp.degrees(jnp.arcsin(jnp.clip(p[..., 2] / r, -1.0, 1.0)))
    lon = jnp.degrees(jnp.arctan2(p[..., 1], p[..., 0]))
    return r - R0, lon, lat


def local_frame(lon_deg, lat_deg):
    """Orthonormal (east, north, up) at a geographic position, ECEF axes.

    TPU-native helper for panorama azimuth frames; the reference gets the
    equivalent via quaternion rotations in `Camera` (`camera.rs:99-116`).
    """
    lon = jnp.radians(lon_deg)
    lat = jnp.radians(lat_deg)
    sin_lon, cos_lon = jnp.sin(lon), jnp.cos(lon)
    sin_lat, cos_lat = jnp.sin(lat), jnp.cos(lat)
    east = jnp.stack([-sin_lon, cos_lon, jnp.zeros_like(sin_lon)], axis=-1)
    north = jnp.stack([-sin_lat * cos_lon, -sin_lat * sin_lon, cos_lat], axis=-1)
    up = jnp.stack([cos_lat * cos_lon, cos_lat * sin_lon, sin_lat], axis=-1)
    return east, north, up
