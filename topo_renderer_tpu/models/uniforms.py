"""Uniform pytrees — the data contracts between scene state and the jitted
render pipeline.

Parity with `topo-renderer/src/render/data.rs`:
  * ``Uniforms`` {camera_proj, normal_proj, camera_pos, sun_direction,
    view_mode} (`data.rs:33-72`)
  * ``PostprocessingUniforms`` {viewport, pixelize_n} (`data.rs:74-94`);
    pixelize_n >= 100 disables pixelization
    (`postprocessing_shader.wgsl:70-72`, default 100 in
    `src/data/application_data.rs:31`)
  * ``TerrainUniforms`` {raster_point, model_point, pixel_scale, size,
    normal_to_world_rot} (`data.rs:113-152`) — the rotation maps tile-local
    normals into ECEF via Mat3::from_euler(XYZEx, 0, (90-lat)°, lon°) with
    the *tiepoint* latitude/longitude (`data.rs:120-127`).
  * ``PeakInstance`` {position, name, visible} (`data.rs:96-111`).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from topo_renderer_tpu.data.coordinate_transform import CoordinateTransform
from topo_renderer_tpu.models.camera import Camera
from topo_renderer_tpu.ops import mathx


@dataclasses.dataclass(frozen=True)
class Uniforms:
    camera_proj: Any
    normal_proj: Any
    camera_pos: Any
    sun_direction: Any
    view_mode: Any

    @staticmethod
    def new(camera: Camera, width, height) -> "Uniforms":
        # `data.rs:42-58`
        return Uniforms(
            camera_proj=camera.build_view_proj_matrix(width, height),
            normal_proj=camera.build_view_normal_matrix(),
            camera_pos=camera.position(),
            sun_direction=camera.sun_angle.to_vec3(),
            view_mode=jnp.int32(int(camera.view_mode)),
        )


jax.tree_util.register_dataclass(
    Uniforms,
    data_fields=["camera_proj", "normal_proj", "camera_pos", "sun_direction", "view_mode"],
    meta_fields=[],
)


@dataclasses.dataclass(frozen=True)
class PostprocessingUniforms:
    viewport: Any
    pixelize_n: Any = 100.0  # disabled (`application_data.rs:31`)

    @staticmethod
    def new(width, height, pixelize_n=100.0) -> "PostprocessingUniforms":
        return PostprocessingUniforms(
            viewport=jnp.array([width, height], jnp.float32),
            pixelize_n=jnp.float32(pixelize_n),
        )


jax.tree_util.register_dataclass(
    PostprocessingUniforms, data_fields=["viewport", "pixelize_n"], meta_fields=[]
)


def normal_to_world_rotation(model_lon_deg, model_lat_deg):
    """Tile-local normal frame -> ECEF rotation (`data.rs:120-127`).

    Built from the tile tiepoint's (longitude, latitude). NOTE: combined with
    the normal kernel's axis conventions this maps the local x axis to
    geographic *south* and y to *east* — we replicate the reference's
    behavior exactly rather than "fixing" the frame, since shading parity
    depends on it (see `ops/normals.py`).
    """
    m3 = mathx.mat3_from_euler_xyz_ex(
        jnp.float32(0.0),
        jnp.radians(90.0 - jnp.float32(model_lat_deg)),
        jnp.radians(jnp.float32(model_lon_deg)),
    )
    return mathx.mat4_from_mat3(m3)


@dataclasses.dataclass(frozen=True)
class TerrainUniforms:
    raster_point: Any
    model_point: Any
    pixel_scale: Any
    size: Any
    normal_to_world_rot: Any

    @staticmethod
    def new(transform: CoordinateTransform, width: int, height: int) -> "TerrainUniforms":
        # `data.rs:119-151`
        return TerrainUniforms(
            raster_point=jnp.array(transform.raster_point, jnp.float32),
            model_point=jnp.array(transform.model_point, jnp.float32),
            pixel_scale=jnp.array(transform.pixel_scale, jnp.float32),
            size=jnp.array([width, height], jnp.float32),
            normal_to_world_rot=normal_to_world_rotation(
                transform.model_point[0], transform.model_point[1]
            ),
        )


jax.tree_util.register_dataclass(
    TerrainUniforms,
    data_fields=["raster_point", "model_point", "pixel_scale", "size", "normal_to_world_rot"],
    meta_fields=[],
)


@dataclasses.dataclass
class PeakInstance:
    """Host-side peak instance (`data.rs:96-111`): ECEF position (with the
    +10 m offset applied at construction, `background_runner.rs:158`), label
    text, and the latest visibility decision."""

    position: Any
    name: str
    visible: bool = False
