"""Device mesh construction for multi-chip rendering.

The reference is a single-GPU interactive renderer (SURVEY §5: no distributed
backend exists); the TPU build's distributed story (SURVEY §7 step 8) is:
  * ``dp`` — data parallelism over viewpoints (batched panorama generation),
  * ``az`` — azimuth parallelism: one panorama's columns split across
    devices, with 1-column halo exchange for the postprocess contour
    (a `ppermute` ring over ICI — the same neighbor-exchange pattern
    ring attention uses for sequence parallelism).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, dp: int | None = None, az: int | None = None) -> Mesh:
    """Build a (dp, az) mesh over the first ``n_devices`` devices.

    Defaults put as much parallelism as possible on ``dp`` (throughput mode);
    pass ``az`` to split single panoramas across chips.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if az is None:
        az = 1 if dp is None else n_devices // dp
    if dp is None:
        dp = n_devices // az
    if dp * az != n_devices:
        raise ValueError(f"dp({dp}) * az({az}) != devices({n_devices})")
    import numpy as np

    return Mesh(np.asarray(devices).reshape(dp, az), axis_names=("dp", "az"))
