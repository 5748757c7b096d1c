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

import os as _os

import jax as _jax

# Rendering geometry (view/projection matrices, ECEF positions ~6.4e6 m with
# meter-scale features) needs true float32 matmuls. TPU matmuls default to
# bfloat16 inputs; force full precision globally — throughput-critical kernels
# opt into lower precision explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "highest")

# Honor JAX_PLATFORMS even when an out-of-tree PJRT plugin ignores it (the
# axon TPU plugin registers itself regardless of the env var, which silently
# moved "hermetic CPU" runs onto the TPU tunnel). Setting the config key is
# authoritative as long as the backend is not initialized yet.
if _os.environ.get("JAX_PLATFORMS"):
    try:
        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backend already initialized by the embedding process

# Persistent compilation cache: render pipelines compile per image shape;
# caching makes the second process start in milliseconds instead of minutes.
# Opt out with TOPO_NO_COMPILE_CACHE=1.
if not _os.environ.get("TOPO_NO_COMPILE_CACHE"):
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.environ.get(
            "TOPO_COMPILE_CACHE", _os.path.expanduser("~/.cache/topo_renderer_tpu_xla")
        ),
    )
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
