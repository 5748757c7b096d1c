"""Peak-label visibility: depth-buffer occlusion without readback.

The reference renders a frame, copies the full Depth32Float buffer to the CPU
over PCIe (256-byte padded rows, `topo-renderer/src/render/render_engine.rs:
219-249`), then tests every peak against the readback
(`render_engine.rs:338-396`). On TPU the depth buffer stays on device: peaks
are projected and their depth texels gathered in one tiny jitted op; only the
boolean visibility vector and pixel positions ever reach the host.

Parity details (`render_engine.rs:349-377`):
  * frustum test: -1 < ndc.x < 1, -1 < ndc.y < 1, ndc.z < 1 (note: no
    near-side z > 0 check — replicated);
  * pixel position: x = trunc(0.5*(ndc.x+1)*W), y = trunc(-0.5*(ndc.y-1)*H);
  * visible iff dist(peak) - 10 m < dist(depth texel)
    (`render_engine.rs:372-376`), both linearized via `dist_from_depth`.

Peaks are padded to a fixed capacity so the op never recompiles as tile sets
change (SURVEY §7 "dynamic tile sets under jit").
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from topo_renderer_tpu.models.camera import dist_from_depth

OCCLUSION_TOLERANCE_M = 10.0  # `render_engine.rs:374`


@partial(jax.jit, static_argnames=("width", "height"))
def peak_visibility(
    positions,
    valid,
    view_proj,
    depth,
    *,
    width: int,
    height: int,
    tolerance_rel: float = 0.0,
):
    """Visibility + screen positions for a padded peak array.

    Args:
      positions: ``f32[P, 3]`` ECEF peak positions (already offset +10 m at
        construction, `background_runner.rs:158`).
      valid: ``bool[P]`` padding mask.
      view_proj: ``f32[4, 4]`` camera view-projection of the depth snapshot.
      depth: ``f32[H, W]`` 0..1 depth buffer.
      width/height: viewport size (static).

    Returns dict with ``visible bool[P]``, ``x i32[P]``, ``y i32[P]``,
    ``in_frustum bool[P]``.
    """
    positions = jnp.asarray(positions, jnp.float32)
    ph = jnp.concatenate([positions, jnp.ones_like(positions[:, :1])], axis=-1)
    clip = ph @ view_proj.T
    ndc = clip[:, :3] / clip[:, 3:4]

    in_frustum = (
        (ndc[:, 0] > -1.0)
        & (ndc[:, 0] < 1.0)
        & (ndc[:, 1] > -1.0)
        & (ndc[:, 1] < 1.0)
        & (ndc[:, 2] < 1.0)
        & jnp.asarray(valid)
    )

    x = (0.5 * (ndc[:, 0] + 1.0) * width).astype(jnp.int32)
    y = (-0.5 * (ndc[:, 1] - 1.0) * height).astype(jnp.int32)
    xc = jnp.clip(x, 0, width - 1)
    yc = jnp.clip(y, 0, height - 1)

    texel = depth[yc, xc]
    terrain_dist = dist_from_depth(texel)
    peak_dist = dist_from_depth(ndc[:, 2])
    # The reference's 10 m tolerance assumes an exact depth buffer
    # (`render_engine.rs:374`); LOD-mode renders carry a distance error
    # proportional to distance, covered by ``tolerance_rel``.
    tol = OCCLUSION_TOLERANCE_M + jnp.float32(tolerance_rel) * peak_dist
    visible = in_frustum & (peak_dist - tol < terrain_dist)

    return {"visible": visible, "x": x, "y": y, "in_frustum": in_frustum}


@partial(jax.jit, static_argnames=("spec",))
def peak_visibility_panorama(
    positions,
    valid,
    eye,
    spec,
    depth,
    azimuth_offset=0.0,
    elev_offset=0.0,
    tolerance_rel: float = 0.0,
):
    """Panorama-space variant (TPU-native extension — the reference has no
    panorama mode): peaks project via azimuth/elevation, occlusion compares
    metric distance against the panorama depth buffer with the same 10 m
    tolerance.
    """
    from topo_renderer_tpu.ops.geometry import R0  # local import avoids cycle

    eye = jnp.asarray(eye, jnp.float32)
    positions = jnp.asarray(positions, jnp.float32)
    W, H = spec.width, spec.height

    e_norm = jnp.linalg.norm(eye)
    up = eye / e_norm
    lon0 = jnp.arctan2(eye[1], eye[0])
    lat0 = jnp.arcsin(jnp.clip(eye[2] / e_norm, -1.0, 1.0))
    east = jnp.stack([-jnp.sin(lon0), jnp.cos(lon0), jnp.zeros_like(lon0)])
    north = jnp.stack(
        [-jnp.sin(lat0) * jnp.cos(lon0), -jnp.sin(lat0) * jnp.sin(lon0), jnp.cos(lat0)]
    )

    w = positions - eye
    dist = jnp.linalg.norm(w, axis=-1)
    w_up = w @ up
    w_n = w @ north
    w_e = w @ east
    azimuth = jnp.arctan2(w_e, w_n)  # 0 = north, increasing eastward
    elev = jnp.arcsin(jnp.clip(w_up / jnp.maximum(dist, 1e-6), -1.0, 1.0))

    # Wrap azimuth into the panorama span.
    rel = (azimuth - spec.azimuth_start - jnp.float32(azimuth_offset)) % (2.0 * jnp.pi)
    u = rel / spec.azimuth_span
    e_lo, e_hi = spec.elevation_range()
    v = (jnp.float32(elev_offset) + jnp.float32(e_hi) - elev) / jnp.float32(e_hi - e_lo)

    x = (u * W).astype(jnp.int32)
    y = (v * H).astype(jnp.int32)
    in_view = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0) & jnp.asarray(valid)

    xc = jnp.clip(x, 0, W - 1)
    yc = jnp.clip(y, 0, H - 1)
    terrain_dist = dist_from_depth(depth[yc, xc])
    tol = OCCLUSION_TOLERANCE_M + jnp.float32(tolerance_rel) * dist
    visible = in_view & (dist - tol < terrain_dist)
    return {"visible": visible, "x": x, "y": y, "in_frustum": in_view}
