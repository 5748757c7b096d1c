"""topo-renderer-tpu: TPU-native terrain vista renderer.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of krzyz/topo-renderer
(a Rust/WebGPU terrain panorama renderer): Copernicus GLO-90 DEM tiles are
decoded into device-resident heightfield arrays; camera projection, normal
computation, terrain rendering, postprocessing and peak-label occlusion are
jitted array programs; batching and device-mesh sharding turn the renderer
into a throughput panorama generator.

Layer map (mirrors SURVEY.md §1 of the reference):
  geo                 — L0 geo primitives (tile ids, coords)
  backend / data      — L1 data service + L3 fetch/decode pipeline
  models              — L2 application data model (camera, scene, uniforms)
  ops / render        — L4 compute + render engine (JAX/Pallas)
  control / app       — L5 controllers and application shell
  frontends           — L6 CLI and web frontends
  parallel            — device-mesh sharding (no reference equivalent; TPU-native)
"""

import jax as _jax

# Rendering geometry (view/projection matrices, ECEF positions ~6.4e6 m with
# meter-scale features) needs true float32 matmuls. TPU matmuls default to
# bfloat16 inputs; force full precision globally — throughput-critical kernels
# opt into lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

from topo_renderer_tpu.geo import (
    GeoCoord,
    GeoLocation,
    Latitude,
    LatitudeDirection,
    Longitude,
    LongitudeDirection,
)
from topo_renderer_tpu.config import Settings

__version__ = "0.1.0"

__all__ = [
    "GeoCoord",
    "GeoLocation",
    "Latitude",
    "LatitudeDirection",
    "Longitude",
    "LongitudeDirection",
    "Settings",
    "__version__",
]
