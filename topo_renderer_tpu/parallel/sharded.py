"""Multi-chip sharded panorama rendering: dp x az over a device mesh.

TPU-native distributed design (SURVEY §7 step 8 — the reference has no
multi-device concept, SURVEY §5):

  * ``dp`` axis: viewpoints of a batch are data-parallel — zero
    communication, linear throughput scaling for BASELINE config 5.
  * ``az`` axis: a single panorama's azimuth columns are split across
    devices. Column marching is embarrassingly parallel per column; the only
    cross-shard data dependency is the postprocess contour's 3x3 pixel
    neighborhood at shard boundaries, satisfied by exchanging 1-column halos
    around the azimuth ring with `jax.lax.ppermute` (wrap-around — which for
    a 360° panorama is *more* correct than the single-device edge clamp).
  * peak-label visibility: each shard tests peaks against its own depth
    slice; a `psum` over ``az`` merges the per-shard decisions (each peak
    projects into exactly one shard).

All collectives ride ICI inside one `shard_map`; the mosaic is replicated
(tiles are the working set of a *view*, not a partitionable batch).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from topo_renderer_tpu.ops.labels import peak_visibility_panorama
from topo_renderer_tpu.ops.panorama import PanoramaSpec, render_panorama
from topo_renderer_tpu.ops.postprocess import _contour_mix


def render_batch_sharded(
    mosaic,
    eyes,
    sun_directions,
    spec: PanoramaSpec,
    mesh,
    *,
    view_mode=0,
    fog: str | None = None,
    peak_positions=None,
    peak_valid=None,
):
    """Render ``eyes f32[B, 3]`` panoramas over a (dp, az) mesh.

    Returns ``(color f32[B, H, W, 3], depth f32[B, H, W], visible bool[B, P])``
    (``visible`` is all-False-shaped ``[B, 0]`` when no peaks are given).
    """
    n_az = mesh.shape["az"]
    n_dp = mesh.shape["dp"]
    B = eyes.shape[0]
    if B % n_dp:
        raise ValueError(f"batch {B} not divisible by dp={n_dp}")
    if spec.width % n_az:
        raise ValueError(f"width {spec.width} not divisible by az={n_az}")

    local_spec = dataclasses.replace(
        spec,
        width=spec.width // n_az,
        azimuth_span=spec.azimuth_span / n_az,
        elev_min=spec.elevation_range()[0],
        elev_max=spec.elevation_range()[1],
    )

    has_peaks = peak_positions is not None
    if not has_peaks:
        peak_positions = jnp.zeros((8, 3), jnp.float32)
        peak_valid = jnp.zeros((8,), bool)

    def shard_fn(eyes_l, suns_l, ppos, pvalid):
        az_idx = jax.lax.axis_index("az")
        offset = (spec.azimuth_span / n_az) * az_idx.astype(jnp.float32)
        px_offset = (spec.width // n_az) * az_idx.astype(jnp.float32)

        def one(e, s):
            out = render_panorama(
                mosaic,
                e,
                local_spec,
                s,
                view_mode=view_mode,
                fog=fog,
                apply_postprocess=False,
                azimuth_offset=offset,
                pixel_offset_x=px_offset,
            )
            vis = peak_visibility_panorama(
                ppos, pvalid, e, local_spec, out["depth"], azimuth_offset=offset
            )
            return out["color"], out["depth"], vis["visible"]

        color, depth, visible = jax.vmap(one)(eyes_l, suns_l)
        # [b, H, Wl, 3], [b, H, Wl], [b, P]

        # --- halo exchange for the postprocess contour ------------------
        # Neighbors on the azimuth ring: receive my right neighbor's first
        # column as my right halo and vice versa.
        ring_fwd = [(i, (i + 1) % n_az) for i in range(n_az)]
        ring_bwd = [(i, (i - 1) % n_az) for i in range(n_az)]
        left_halo_d = jax.lax.ppermute(depth[..., -1:], "az", ring_fwd)
        right_halo_d = jax.lax.ppermute(depth[..., :1], "az", ring_bwd)
        depth_pad = jnp.concatenate([left_halo_d, depth, right_halo_d], axis=-1)
        mixf = _contour_mix(depth_pad)[..., 1:-1]
        color = color * (1.0 - mixf[..., None])

        # --- merge label decisions across azimuth shards ----------------
        visible_any = jax.lax.psum(visible.astype(jnp.int32), "az") > 0
        return color, depth, visible_any

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P(), P()),
        out_specs=(P("dp", None, "az", None), P("dp", None, "az"), P("dp")),
        check_vma=False,
    )
    color, depth, visible = fn(
        jnp.asarray(eyes, jnp.float32),
        jnp.asarray(sun_directions, jnp.float32),
        jnp.asarray(peak_positions, jnp.float32),
        jnp.asarray(peak_valid),
    )
    if not has_peaks:
        visible = visible[:, :0]
    return color, depth, visible


def jit_sharded_step(mosaic, spec, mesh, **kw):
    """Jitted closure over static spec/mesh — the 'training step' equivalent
    used by `__graft_entry__.dryrun_multichip`."""
    f = partial(render_batch_sharded, spec=spec, mesh=mesh, **kw)

    @jax.jit
    def step(eyes, suns, ppos, pvalid):
        return f(mosaic, eyes, suns, peak_positions=ppos, peak_valid=pvalid)

    return step
