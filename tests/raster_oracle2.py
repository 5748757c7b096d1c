"""Second, independent rasterizer oracle — written from the reference's WGSL
and pipeline state ALONE, deliberately without consulting
`tests/raster_oracle.py`, so that a shared misreading of the shader cannot
pass both (VERDICT round-1 gap #1: independent parity evidence).

Sources (all in /root/reference):
  * vertex/fragment shader: `resources/shaders/render_shader.wgsl`
      - `to_model` texel -> lon/lat affine (`:35-45`): x uses +pixel_scale.x,
        y uses **-pixel_scale.y** from the NW model point;
      - vertex ECEF on the R0 + height sphere (`:53-64`);
      - normals texture decode 2*rgb - 1 (`:66`), rotated to world (`:68`);
      - fragment: ambient 0.01 + diffuse 0.7 * max(n.sun, 0) (`:96-101`),
        hash dither seeded `clip_position.xy + camera_pos.xy -
        world_position.xy` (`:75-87,102`), view modes 1 (undithered linear)
        and 2 (normal visualisation) (`:104-110`);
  * mesh: `src/render/render_buffer.rs:185-219` — vertices (i, j) with i the
    x/texel column (outer loop), index = i * height + j; per cell two
    triangles with the split diagonal alternating by (i + j) % 2;
  * raster state: `src/render/pipeline.rs:222-229` — FrontFace::Ccw,
    cull Back, depth compare Less (terrain pass), depth cleared to 1.0 and
    color to the sky constant (`src/render/terrain_renderer.rs:373-421`);
  * projection: `src/data/camera.rs:118-128` — glam `perspective_rh`
    (wgpu 0..1 depth) * `look_to_rh`.

Implementation notes (hardware semantics, not reference code):
  * WebGPU clip volume is -w <= x,y <= w, 0 <= z <= w; triangles are clipped
    against z >= 0 (Sutherland–Hodgman in clip space) before the viewport
    transform x_fb = (ndc.x + 1)/2 * W, y_fb = (1 - ndc.y)/2 * H (y down).
  * Depth is ndc z interpolated linearly in screen space; @location varyings
    are perspective-correct (interp(v/w) / interp(1/w)).
  * Front-facing = counter-clockwise in framebuffer coordinates (y down);
    the top-left fill rule breaks ties on shared edges.
  * All fragment arithmetic runs in float32, matching GPU precision — the
    dither's `fract` of ECEF-magnitude products is only reproducible in f32.
"""

from __future__ import annotations

import numpy as np

SKY = np.array([0.0, 0.71, 0.885], np.float32)  # terrain_renderer.rs:379-384


def _hash12n(seed):
    """`render_shader.wgsl:75-79`, elementwise f32. seed: [..., 2]."""
    seed = seed.astype(np.float32)
    p = seed * np.array([5.3987, 5.4421], np.float32)
    p = (p - np.floor(p)).astype(np.float32)
    # dot(p.yx, p.xy + vec2(21.5351, 14.3137))
    q = np.array([21.5351, 14.3137], np.float32)
    d = (p[..., 1] * (p[..., 0] + q[0]) + p[..., 0] * (p[..., 1] + q[1])).astype(
        np.float32
    )
    p = (p + d[..., None]).astype(np.float32)
    v = (p[..., 0] * p[..., 1] * np.float32(95.4307)).astype(np.float32)
    return (v - np.floor(v)).astype(np.float32)


def _hash42n(p):
    """`render_shader.wgsl:81-83`: three decorrelated hashes. p: [..., 2]."""
    return np.stack(
        [
            _hash12n(p),
            _hash12n((p + np.float32(0.07)).astype(np.float32)),
            _hash12n((p + np.float32(0.11)).astype(np.float32)),
        ],
        axis=-1,
    )


def dither_rgb(color, p):
    """`render_shader.wgsl:85-87`: color + (hash42n(p) + hash42n(p+0.13) - 1)/255."""
    p = p.astype(np.float32)
    n = _hash42n(p) + _hash42n((p + np.float32(0.13)).astype(np.float32))
    return (color + (n - np.float32(1.0)) / np.float32(255.0)).astype(np.float32)


def _clip_near(tri):
    """Clip a triangle (list of [clip4 + varyings] rows) against z >= 0."""
    out = []
    n = len(tri)
    for i in range(n):
        a, b = tri[i], tri[(i + 1) % n]
        za, zb = a[2], b[2]
        if za >= 0.0:
            out.append(a)
        if (za >= 0.0) != (zb >= 0.0):
            t = za / (za - zb)
            out.append(a + (b - a) * t)
    return out


def rasterize2(
    heights,
    normals_world,
    raster_point,
    model_point,
    pixel_scale,
    view_proj,
    camera_pos,
    sun_direction,
    width,
    height,
    view_mode=0,
):
    """Rasterize one tile exactly as the reference's terrain pass does.

    Args:
      heights: ``f32[Ht, Wt]`` heightmap texture content (row y, col x).
      normals_world: ``f32[Ht, Wt, 3]`` world-space normal per texel (the
        decoded normal texture after the tile->world rotation).
      raster_point / model_point / pixel_scale: TerrainUniforms
        (`render_shader.wgsl:10-16`): lon/lat affine anchors.
      view_proj: ``f32[4, 4]`` projection * view (row-vector-on-right
        convention: clip = M @ [x, y, z, 1]).
      camera_pos: ``f32[3]`` ECEF eye (dither seed term).
      sun_direction: ``f32[3]``.
      width/height: viewport in pixels.
      view_mode: 0 default (dithered), 1 linear undithered, 2 normals.

    Returns (color ``f32[height, width, 3]`` linear, depth ``f32[height, width]``).
    """
    heights = np.asarray(heights, np.float32)
    normals_world = np.asarray(normals_world, np.float32)
    vp = np.asarray(view_proj, np.float32)
    cam = np.asarray(camera_pos, np.float32)
    sun = np.asarray(sun_direction, np.float32)
    Ht, Wt = heights.shape

    # --- vertex stage for every texel (render_shader.wgsl:47-72) ---
    xs = np.arange(Wt, dtype=np.float32)
    ys = np.arange(Ht, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys)  # [Ht, Wt] texel coords (x, y)
    lon = np.radians(
        (gx - np.float32(raster_point[0])) * np.float32(pixel_scale[0])
        + np.float32(model_point[0])
    )
    lat = np.radians(
        (gy - np.float32(raster_point[1])) * np.float32(-pixel_scale[1])
        + np.float32(model_point[1])
    )
    R0 = np.float32(6_371_000.0)
    R = R0 + heights
    wx = R * np.cos(lat) * np.cos(lon)
    wy = R * np.cos(lat) * np.sin(lon)
    wz = R * np.sin(lat)
    world = np.stack([wx, wy, wz], axis=-1).astype(np.float32)  # [Ht, Wt, 3]

    ph = np.concatenate([world, np.ones((Ht, Wt, 1), np.float32)], axis=-1)
    clip = np.einsum("rc,hwc->hwr", vp, ph).astype(np.float32)  # [Ht, Wt, 4]

    # Vertex index layout: index = i * Ht + j with i = x column, j = y row
    # (render_buffer.rs:185-189 iterates i outer over size.0, j inner).
    def vrow(i, j):
        # [clip4 | world3 | normal3] as one float64 row for stable clipping.
        return np.concatenate(
            [clip[j, i], world[j, i], normals_world[j, i]]
        ).astype(np.float64)

    color_buf = np.tile(SKY.astype(np.float32), (height, width, 1))
    depth_buf = np.full((height, width), 1.0, np.float32)

    px_grid, py_grid = np.meshgrid(
        np.arange(width, dtype=np.float64) + 0.5,
        np.arange(height, dtype=np.float64) + 0.5,
    )

    def shade(world_p, normal_p, fb_xy):
        """Fragment stage (render_shader.wgsl:96-114), f32 arithmetic."""
        world_p = world_p.astype(np.float32)
        n = normal_p.astype(np.float32)
        n = n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
        if view_mode == 2:
            return (0.5 * (n + 1.0)).astype(np.float32)
        diff = np.float32(0.7) * np.maximum(n @ sun, np.float32(0.0))
        lin = ((np.float32(0.01) + diff)[..., None] * np.ones(3, np.float32)).astype(
            np.float32
        )
        if view_mode == 1:
            return lin
        seed = (
            fb_xy.astype(np.float32) + cam[:2].astype(np.float32)
        ).astype(np.float32) - world_p[..., :2].astype(np.float32)
        return dither_rgb(lin, seed)

    def raster_tri(rows):
        a, b, c = rows
        wabc = np.array([a[3], b[3], c[3]])
        if np.any(wabc <= 0.0):
            return  # fully clipped against w>0 after near clip (degenerate)
        ndc = np.stack([a[:3] / a[3], b[:3] / b[3], c[:3] / c[3]])
        # Framebuffer coords, y down.
        sx = (ndc[:, 0] + 1.0) * 0.5 * width
        sy = (1.0 - ndc[:, 1]) * 0.5 * height
        sz = ndc[:, 2]

        # Signed area in framebuffer space (y down): CCW -> negative under
        # the standard (y-up) cross product, so front-facing iff area < 0.
        area = (sx[1] - sx[0]) * (sy[2] - sy[0]) - (sx[2] - sx[0]) * (sy[1] - sy[0])
        if area >= 0.0:  # back-facing (or degenerate): culled
            return

        lo_x = max(int(np.floor(sx.min() - 0.5)), 0)
        hi_x = min(int(np.ceil(sx.max() + 0.5)), width - 1)
        lo_y = max(int(np.floor(sy.min() - 0.5)), 0)
        hi_y = min(int(np.ceil(sy.max() + 0.5)), height - 1)
        if lo_x > hi_x or lo_y > hi_y:
            return

        px = px_grid[lo_y : hi_y + 1, lo_x : hi_x + 1]
        py = py_grid[lo_y : hi_y + 1, lo_x : hi_x + 1]

        # Edge functions E_i(p) = (p - v_i) x (v_{i+1} - v_i); for a
        # triangle E_bc(a) = -area, so with our front-facing convention
        # (area < 0) the raw edge values are already positive inside:
        # sigma = -sign(area) = +1 keeps one code path should the
        # convention ever change.
        sigma = 1.0

        def edge(x0, y0, x1, y1):
            return ((px - x0) * (y1 - y0) - (py - y0) * (x1 - x0)) * sigma

        e0 = edge(sx[1], sy[1], sx[2], sy[2])
        e1 = edge(sx[2], sy[2], sx[0], sy[0])
        e2 = edge(sx[0], sy[0], sx[1], sy[1])

        def topleft(x0, y0, x1, y1):
            # y-down framebuffer: a "top" edge is horizontal with the inside
            # below it (dx < 0 under inside-positive orientation); a "left"
            # edge runs upward (dy > 0).
            dx, dy = (x1 - x0) * sigma, (y1 - y0) * sigma
            return (dy == 0.0 and dx < 0.0) or dy > 0.0

        inc0 = e0 >= 0.0 if topleft(sx[1], sy[1], sx[2], sy[2]) else e0 > 0.0
        inc1 = e1 >= 0.0 if topleft(sx[2], sy[2], sx[0], sy[0]) else e1 > 0.0
        inc2 = e2 >= 0.0 if topleft(sx[0], sy[0], sx[1], sy[1]) else e2 > 0.0
        inside = inc0 & inc1 & inc2
        if not inside.any():
            return

        # Sigma-normalized edges sum to sigma * -area (= |area| for our
        # front-facing area < 0 convention), so that is the barycentric
        # denominator.
        inv_area = 1.0 / (sigma * -area)
        l0 = e0 * inv_area
        l1 = e1 * inv_area
        l2 = e2 * inv_area

        z = l0 * sz[0] + l1 * sz[1] + l2 * sz[2]  # linear in screen space
        sub_d = depth_buf[lo_y : hi_y + 1, lo_x : hi_x + 1]
        passed = inside & (z.astype(np.float32) < sub_d) & (z >= 0.0) & (z <= 1.0)
        if not passed.any():
            return

        # Perspective-correct varyings.
        inv_w = l0 / a[3] + l1 / b[3] + l2 / c[3]
        attrs = np.stack([rows[0][4:], rows[1][4:], rows[2][4:]])  # [3, 6]
        num = (
            l0[..., None] * (attrs[0] / a[3])
            + l1[..., None] * (attrs[1] / b[3])
            + l2[..., None] * (attrs[2] / c[3])
        )
        vary = num / inv_w[..., None]
        fb_xy = np.stack([px, py], axis=-1)
        rgb = shade(vary[..., 0:3], vary[..., 3:6], fb_xy)

        sub_c = color_buf[lo_y : hi_y + 1, lo_x : hi_x + 1]
        sub_c[passed] = rgb[passed]
        sub_d[passed] = z[passed].astype(np.float32)

    # --- triangle loop (render_buffer.rs:191-219) ---
    for i in range(Wt - 1):
        for j in range(Ht - 1):
            v00 = vrow(i, j)
            v01 = vrow(i, j + 1)
            v10 = vrow(i + 1, j)
            v11 = vrow(i + 1, j + 1)
            if (i + j) % 2 == 0:
                tris = [[v00, v01, v11], [v11, v10, v00]]
            else:
                tris = [[v00, v01, v10], [v11, v10, v01]]
            for tri in tris:
                clipped = _clip_near(tri)
                for k in range(1, len(clipped) - 1):
                    raster_tri([clipped[0], clipped[k], clipped[k + 1]])

    return color_buf, depth_buf
