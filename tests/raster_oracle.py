"""Test-only oracle: exact triangle rasterization of the terrain mesh.

This is a slow, straightforward numpy implementation of the reference's GPU
pipeline — grid mesh with alternating diagonals
(`topo-renderer/src/render/render_buffer.rs:191-219`), vertex transform
(`resources/shaders/render_shader.wgsl:47-73`), depth test Less, perspective-
correct attribute interpolation, and the fragment shading — used to validate
the TPU ray-marcher against genuine rasterization on small scenes.
"""

from __future__ import annotations

import numpy as np

from topo_renderer_tpu.ops.geometry import R0


def rasterize(
    heights: np.ndarray,
    normals: np.ndarray,
    cell_tile: np.ndarray,
    model_point,
    pixel_scale,
    view_proj: np.ndarray,
    eye: np.ndarray,
    sun: np.ndarray,
    width: int,
    height: int,
    sky=(0.0, 0.71, 0.885),
):
    """Returns (color_linear [H,W,3] without dither, depth [H,W], dist [H,W]).

    ``normals`` are per-vertex *world-space* normals (the renderer bakes the
    per-tile rotation at mosaic build). Dither is omitted (compare against
    view_mode=1 renders); everything else matches the reference pipeline.
    """
    gh, gw = heights.shape
    lon = model_point[0] + pixel_scale[0] * np.arange(gw)
    lat = model_point[1] - pixel_scale[1] * np.arange(gh)
    lam = np.radians(lon)[None, :]
    phi = np.radians(lat)[:, None]
    r = R0 + heights
    pos = np.stack(
        [
            r * np.cos(phi) * np.cos(lam),
            r * np.cos(phi) * np.sin(lam),
            r * np.sin(phi),
        ],
        axis=-1,
    )  # [gh, gw, 3] f64

    # world normals per vertex *per owning tile* are applied per-triangle
    # below (each triangle uses its cell's tile rotation).

    ph = np.concatenate([pos, np.ones_like(pos[..., :1])], axis=-1)
    clip = ph @ view_proj.T  # [gh, gw, 4]
    w_clip = clip[..., 3]
    ndc = clip[..., :3] / w_clip[..., None]
    sx = (ndc[..., 0] + 1.0) * 0.5 * width
    sy = (1.0 - ndc[..., 1]) * 0.5 * height
    sz = ndc[..., 2]

    zbuf = np.full((height, width), np.inf)
    nbuf = np.zeros((height, width, 3))
    pbuf = np.zeros((height, width, 3))
    hitbuf = np.zeros((height, width), bool)

    def tri_vertices(cy, cx):
        p = (cx + cy) % 2
        nw, ne = (cy, cx), (cy, cx + 1)
        sw, se = (cy + 1, cx), (cy + 1, cx + 1)
        if p == 0:
            return [(nw, sw, se), (nw, ne, se)]
        return [(nw, ne, sw), (se, ne, sw)]

    for cy in range(gh - 1):
        for cx in range(gw - 1):
            if cell_tile[cy, cx] < 0:
                continue
            for tri in tri_vertices(cy, cx):
                vs = np.array([[sx[v], sy[v]] for v in tri])
                ws = np.array([w_clip[v] for v in tri])
                if np.any(ws <= 1e-3):
                    continue  # crude near clip; test scenes avoid this
                zs = np.array([sz[v] for v in tri])
                x0 = max(int(np.floor(vs[:, 0].min())), 0)
                x1 = min(int(np.ceil(vs[:, 0].max())) + 1, width)
                y0 = max(int(np.floor(vs[:, 1].min())), 0)
                y1 = min(int(np.ceil(vs[:, 1].max())) + 1, height)
                if x0 >= x1 or y0 >= y1:
                    continue
                pxs = np.arange(x0, x1) + 0.5
                pys = np.arange(y0, y1) + 0.5
                px, py = np.meshgrid(pxs, pys)
                a, bq, cq = vs[0], vs[1], vs[2]
                den = (bq[1] - cq[1]) * (a[0] - cq[0]) + (cq[0] - bq[0]) * (
                    a[1] - cq[1]
                )
                if abs(den) < 1e-12:
                    continue
                l0 = ((bq[1] - cq[1]) * (px - cq[0]) + (cq[0] - bq[0]) * (py - cq[1])) / den
                l1 = ((cq[1] - a[1]) * (px - a[0]) + (a[0] - cq[0]) * (py - a[1])) / den
                l2 = 1.0 - l0 - l1
                inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
                if not inside.any():
                    continue
                depth = l0 * zs[0] + l1 * zs[1] + l2 * zs[2]
                region = (slice(y0, y1), slice(x0, x1))
                closer = inside & (depth < zbuf[region]) & (depth >= 0) & (depth <= 1)
                if not closer.any():
                    continue
                inv_w = l0 / ws[0] + l1 / ws[1] + l2 / ws[2]
                n_w = np.stack([normals[v] for v in tri])  # [3, 3]
                p_w = np.stack([pos[v] for v in tri])
                n_i = (
                    l0[..., None] * n_w[0] / ws[0]
                    + l1[..., None] * n_w[1] / ws[1]
                    + l2[..., None] * n_w[2] / ws[2]
                ) / inv_w[..., None]
                p_i = (
                    l0[..., None] * p_w[0] / ws[0]
                    + l1[..., None] * p_w[1] / ws[1]
                    + l2[..., None] * p_w[2] / ws[2]
                ) / inv_w[..., None]
                zb = zbuf[region]
                zb[closer] = depth[closer]
                zbuf[region] = zb
                nb = nbuf[region]
                nb[closer] = n_i[closer]
                nbuf[region] = nb
                pb = pbuf[region]
                pb[closer] = p_i[closer]
                pbuf[region] = pb
                hb = hitbuf[region]
                hb[closer] = True
                hitbuf[region] = hb

    # Fragment shading (view_mode=1: no dither), `render_shader.wgsl:96-115`.
    nn = nbuf / np.maximum(np.linalg.norm(nbuf, axis=-1, keepdims=True), 1e-20)
    diffuse = 0.7 * np.maximum((nn * sun).sum(-1), 0.0)
    intensity = 0.01 + diffuse
    color = np.repeat(intensity[..., None], 3, axis=-1)
    color[~hitbuf] = sky
    depth_out = np.where(hitbuf, zbuf, 1.0)
    dist = np.linalg.norm(pbuf - eye, axis=-1)
    dist[~hitbuf] = np.inf
    return color, depth_out, dist
