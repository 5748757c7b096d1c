"""Shared test fixtures: synthetic terrain tiles and scenes."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from topo_renderer_tpu.data.coordinate_transform import CoordinateTransform
from topo_renderer_tpu.geo import GeoCoord, GeoLocation
from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.models.scene import TerrainTile, build_mosaic
from topo_renderer_tpu.ops import mathx


def yaw_towards(cam: Camera, target_dir):
    """Yaw value that points the camera's horizontal direction at target_dir."""
    up = np.asarray(cam.up())
    q = mathx.quat_from_rotation_arc(jnp.array([0.0, -1.0, 0.0]), jnp.asarray(up))
    x_w = np.asarray(mathx.quat_rotate(q, jnp.array([1.0, 0.0, 0.0])))
    z_w = np.asarray(mathx.quat_rotate(q, jnp.array([0.0, 0.0, 1.0])))
    t = np.asarray(target_dir, np.float64)
    t = t - up * (t @ up)
    t /= np.linalg.norm(t)
    return float(np.arctan2(t @ z_w, t @ x_w))


def east_at(cam: Camera):
    eye = np.asarray(cam.eye, np.float64)
    lon = np.arctan2(eye[1], eye[0])
    return np.array([-np.sin(lon), np.cos(lon), 0.0])


def synthetic_heights(n=65, amp=500.0, base=1500.0, seed=0, freq=3.0):
    """Smooth hills: sum of a few sinusoids, deterministic."""
    rng = np.random.default_rng(seed)
    ys, xs = np.mgrid[0:n, 0:n] / (n - 1)
    h = np.full((n, n), base, np.float64)
    for k in range(1, 4):
        ax, ay = rng.uniform(0, 2 * np.pi, 2)
        h += (amp / k) * np.sin(freq * k * np.pi * xs + ax) * np.cos(
            freq * k * np.pi * ys + ay
        )
    return h.astype(np.float32)


def make_tile(lat_deg=49, lon_deg=20, n=65, span_deg=None, **kw) -> TerrainTile:
    """A synthetic 'tile' anchored like a COP-90 tile: tiepoint at the NW
    corner (lat_deg+1 unless span given)."""
    span = span_deg if span_deg is not None else 1.0
    ps = span / (n - 1)
    transform = CoordinateTransform(
        raster_point=(0.0, 0.0),
        model_point=(float(lon_deg), float(lat_deg) + span),
        pixel_scale=(ps, ps),
    )
    return TerrainTile(
        location=GeoLocation.from_coord(lat_deg, lon_deg),
        heights=synthetic_heights(n, **kw),
        transform=transform,
    )


def small_scene(n=65, span_deg=0.05, height_above=800.0, **cam_kw):
    """Single small tile + a camera placed near its west edge looking east."""
    tile = make_tile(49, 20, n=n, span_deg=span_deg)
    mosaic = build_mosaic([tile])
    # Camera near the west edge, centered in latitude.
    lat = 49.0 + span_deg * 0.5
    lon = 20.0 + span_deg * 0.12
    gy = (tile.transform.model_point[1] - lat) / tile.transform.pixel_scale[1]
    gx = (lat and (lon - tile.transform.model_point[0]) / tile.transform.pixel_scale[0])
    h_here = float(tile.heights[int(round(gy)), int(round(gx))])
    cam = Camera().reset(GeoCoord(lat, lon), h_here + height_above)
    # Look east: find yaw that points the camera along +east. Instead of
    # solving, rely on the canonical frame: yaw is defined in the canonical
    # frame, so tests just pick a yaw and accept whatever azimuth it is.
    import dataclasses

    cam = dataclasses.replace(cam, **cam_kw) if cam_kw else cam
    return mosaic, cam, tile
