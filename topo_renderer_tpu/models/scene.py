"""Scene model: terrain tiles assembled into a device-resident mosaic.

The reference keeps one GPU heightmap texture + normal texture + uniform
buffer per tile (`topo-renderer/src/render/render_buffer.rs:23-118`) and
draws each tile as its own mesh with per-tile seam-stitch compute dispatches
(`src/render/terrain_renderer.rs:173-347`). The TPU-native design instead
assembles all loaded tiles into **one mosaic array** on device:

  * adjacent COP-90 tiles share their seam row/column, so stitching becomes a
    plain dense normal computation (see `ops/normals.py`);
  * the renderer marches rays against a single array instead of looping tiles;
  * tile identity survives as a per-cell index used to apply each tile's own
    normal->world rotation (`src/render/data.rs:120-127`) exactly like the
    per-tile uniform buffer did.

``TerrainTile`` is the host-side decoded tile (`background_runner.rs:99-168`
product); ``TerrainMosaic`` is the device pytree every jitted render function
consumes. Heights of missing/unloaded areas are masked invalid and can never
produce hits (matching unloaded tiles simply not being drawn,
`terrain_renderer.rs:361-363`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from topo_renderer_tpu.data.coordinate_transform import CoordinateTransform
from topo_renderer_tpu.geo import GeoLocation
from topo_renderer_tpu.models.uniforms import normal_to_world_rotation
from topo_renderer_tpu.ops.normals import compute_normals


def pack_normals(normals_world: np.ndarray) -> np.ndarray:
    """Pack world-space normals into 10-bit-per-channel uint32 words.

    The reference stores *tile-local* normals in an Rgba8Unorm texture
    (`compute_normals_shader.wgsl:47-50`) and rotates them per tile in the
    vertex shader (`render_shader.wgsl:66-67`). We apply the tile rotation at
    build time instead and store world-space normals, so shading needs one
    u32 gather and zero per-pixel rotations. 10 bits/channel keeps the extra
    quantization (1/512) far below the reference's own 8-bit step (1/128 in
    decoded units).
    """
    enc = np.round(np.clip(0.5 * (normals_world + 1.0), 0.0, 1.0) * 1023.0).astype(
        np.uint32
    )
    return enc[..., 0] | (enc[..., 1] << 10) | (enc[..., 2] << 20)


def unpack_normals(packed):
    """Device-side unpack: uint32 -> three decoded float planes (SoA)."""
    nx = 2.0 * ((packed & 0x3FF).astype(jnp.float32) / 1023.0) - 1.0
    ny = 2.0 * (((packed >> 10) & 0x3FF).astype(jnp.float32) / 1023.0) - 1.0
    nz = 2.0 * (((packed >> 20) & 0x3FF).astype(jnp.float32) / 1023.0) - 1.0
    return nx, ny, nz


@dataclasses.dataclass
class TerrainTile:
    """One decoded DEM tile on the host (reference: the TerrainReady payload,
    `background_runner.rs:267-269`)."""

    location: GeoLocation
    heights: np.ndarray  # f32[H, W], rows north -> south
    transform: CoordinateTransform

    @property
    def size(self) -> tuple[int, int]:
        """(width, height) like the reference's decoder dimensions."""
        return (self.heights.shape[1], self.heights.shape[0])


# Texels outside any loaded tile carry this height. It is negative enough
# that any triangle with a poisoned corner can never be hit by a ray (the
# reference simply doesn't draw unloaded tiles, `terrain_renderer.rs:361-363`)
# while staying well inside float32 range.
POISON_HEIGHT = -1.0e12


@dataclasses.dataclass(frozen=True)
class TerrainMosaic:
    """Device-resident stitched terrain.

    Affine raster<->model mapping (mirrors `CoordinateTransform`, with
    raster_point fixed at the mosaic origin):
        lon = gx * pixel_scale[0] + model_point[0]
        lat = -gy * pixel_scale[1] + model_point[1]

    Layout choices are TPU-driven:
      * ``heights_flat`` is the only array the inner march loop gathers from;
        validity is encoded by poisoning unloaded texels (POISON_HEIGHT)
        instead of a second mask array.
      * gather tables are stored *flat* (1-D). XLA gathers want linear
        T(1024) layouts; storing 2-D T(8,128)-tiled arrays forces a full
        relayout copy of the table on every render call (observed as
        hundreds of ms in traces).
      * ``attr_packed_flat`` rows carry (height, quantized *world-space*
        normal) — 10 bits/channel normals extend the reference's Rgba8Unorm
        texture idea (`compute_normals_shader.wgsl:47-50`) with the per-tile
        rotation of `render_shader.wgsl:66-67` baked in at build — so one
        row gather fetches every shading attribute.
      * ``host`` carries host-only bookkeeping (valid mask, cell ownership)
        outside the pytree so it is never transferred to the device.
    """

    heights_flat: Any  # f32[Hm*Wm], POISON_HEIGHT outside valid tiles
    attr_packed_flat: Any  # f32[Hm*Wm, 2]: (height, bitcast(normal)) rows
    cell_heights_flat: Any  # f32[Hm*Wm, 8]: per-cell corner rows — heights
    # (NW, NE, SW, SE) then the corners' bitcast packed world normals. One
    # 32 B row gather feeds the exact triangle march AND the hit shading
    # (gather cost is per-row, not per-byte); dummy [1, 8] when disabled
    has_cell_table: bool  # static: whether cell_heights_flat is real
    shape: tuple  # (Hm, Wm) — static
    mip_heights_flat: tuple  # per-level flat f32 height pyramids (level 1..)
    mip_attr_flat: tuple  # per-level packed (height, normal) rows (level 1..)
    mip_hmax_flat: tuple  # per-level DILATED max-height bounds (level 1..) —
    # conservative: >= any height within the texel's footprint + 1 texel ring
    mip_shapes: tuple  # static shapes of the mip levels
    host: "MosaicHostData"  # valid/cell_tile/tile_rot, host-side only
    model_point: Any  # f32[2] (lon, lat) of texel (0, 0)
    pixel_scale: Any  # f32[2] degrees per texel (positive)
    hmax: Any  # f32 scalar: max height (for the ray shell bound)
    bound_center: Any  # f32[3] ECEF center of the mosaic bounding sphere
    bound_radius: Any  # f32 scalar bounding-sphere radius (meters)
    # Optional per-level 2-D copies of the packed attribute planes,
    # f32[2, h_l, w_l] (plane 0 = heights, plane 1 = bitcast normal bits),
    # indexed by level (0 = base). Entry is None for levels below the build's
    # window_table_min. Clipmap window extraction dynamic-slices these —
    # reading exactly the window's texels — instead of slicing full-width row
    # bands out of the flat gather tables (~50 MB/frame at 100-tile scale).
    win_attr_2d: tuple = ()
    # UNDILATED max pyramid (per level, flat) — kept only by streaming
    # builds (`build_mosaic(keep_hmax_raw=True)`): incremental slot updates
    # (`models/mosaic_update.py`) recompute the dilated bounds from local
    # slices of it. Empty tuple otherwise.
    mip_hmax_raw_flat: tuple = ()
    # Static: which table levels (0 = base, 1.. = mips) are row-sharded
    # across a device mesh axis (`parallel/sharded_mosaic.py`); empty for
    # replicated mosaics. Extraction picks the shard_map path per level.
    sharded_rows: tuple = ()
    # Static: set ONLY on the shard-local view constructed INSIDE a
    # shard_map over the geo axis (`render_perspective_sharded`):
    # `surface.cell_rows` then assembles each gather by masked local fetch
    # + psum so the exact march runs against row-sharded cell tables.
    cell_sharded: bool = False
    # Static base texel size in meters (rounded to 3 significant digits so
    # small per-scene variation does not fragment the jit cache). The LOD
    # step schedule (`ops/panorama.py::_lod_segments`) and the clipmap window
    # coverage guarantee both key off the *actual* texel size; COP-90 is
    # ~92.6 m (3 arcsec), synthetic test tiles are much finer.
    texel_m: float = 92.6

    @property
    def heights(self):
        """2-D view ``f32[Hm, Wm]`` (device op; hot loops use heights_flat)."""
        return self.heights_flat.reshape(self.shape)

    @property
    def normals_packed(self):
        bits = jax.lax.bitcast_convert_type(
            self.attr_packed_flat[:, 1], jnp.uint32
        )
        return bits.reshape(self.shape)

    @property
    def normals(self):
        """Decoded world-space normals ``f32[Hm, Wm, 3]`` (device op)."""
        nx, ny, nz = unpack_normals(self.normals_packed)
        return jnp.stack([nx, ny, nz], axis=-1)

    @property
    def valid(self):
        return self.host.valid

    @property
    def cell_tile(self):
        return self.host.cell_tile

    @property
    def tile_rot(self):
        return self.host.tile_rot


class MosaicHostData:
    """Host bookkeeping bundle kept out of the jit pytree.

    Hash/eq are constant: the data is non-semantic for compiled programs, so
    different mosaics must not fragment the jit cache through it.
    """

    def __init__(self, valid, cell_tile, tile_rot):
        self.valid = valid
        self.cell_tile = cell_tile
        self.tile_rot = tile_rot

    def __hash__(self):
        return 0

    def __eq__(self, other):
        return isinstance(other, MosaicHostData)


jax.tree_util.register_dataclass(
    TerrainMosaic,
    data_fields=[
        "heights_flat",
        "attr_packed_flat",
        "cell_heights_flat",
        "mip_heights_flat",
        "mip_attr_flat",
        "mip_hmax_flat",
        "model_point",
        "pixel_scale",
        "hmax",
        "bound_center",
        "bound_radius",
        "win_attr_2d",
        "mip_hmax_raw_flat",
    ],
    meta_fields=[
        "shape", "mip_shapes", "host", "has_cell_table", "sharded_rows",
        "cell_sharded", "texel_m",
    ],
)


def _texel_m_hint(ps_y_deg: float) -> float:
    """Static meters-per-texel hint from the latitude pixel scale (meridian
    arc ~111,132 m/degree), rounded to 3 significant digits for jit-cache
    stability."""
    return float(f"{abs(float(ps_y_deg)) * 111_132.0:.3g}")


def build_max_mips(heights: "np.ndarray", shapes, return_raw: bool = False):
    """Dilated max-height pyramid matching ``shapes``: each level-L texel
    bounds every height within its 2^L footprint plus a 1-texel ring, so a
    single nearest gather conservatively bounds any segment that stays within
    one texel of the sampled one (the two-level exact march relies on it).
    ``return_raw`` also returns the undilated pooled pyramid (streaming
    builds keep it for incremental dilation updates)."""
    out = []
    raw = []
    cur = heights
    for (h2, w2) in shapes:
        pooled = np.full((h2, w2), np.float32(POISON_HEIGHT), np.float32)
        ch = cur[: 2 * h2, : 2 * w2]
        pooled = ch.reshape(h2, 2, w2, 2).max(axis=(1, 3))
        # include odd remainder rows/cols in the last texel's bound
        if cur.shape[0] > 2 * h2:
            pooled[-1] = np.maximum(pooled[-1], cur[2 * h2 :, : 2 * w2].reshape(-1, w2, 2).max(axis=(0, 2)))
        if cur.shape[1] > 2 * w2:
            pooled[:, -1] = np.maximum(
                pooled[:, -1], cur[: 2 * h2, 2 * w2 :].reshape(h2, 2, -1).max(axis=(1, 2))
            )
        # dilate by one texel (3x3 max)
        p = np.pad(pooled, 1, mode="edge")
        dil = pooled
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                dil = np.maximum(dil, p[dy : dy + h2, dx : dx + w2])
        out.append(dil.astype(np.float32))
        raw.append(pooled.astype(np.float32))
        cur = pooled
    return (out, raw) if return_raw else out


def build_height_mips(heights: "np.ndarray", n_levels: int | None = None):
    """Average-pooled height pyramid for distance-matched LOD sampling.

    Poisoned texels stay poisoned (POISON_HEIGHT dominates any average),
    which conservatively shrinks the valid region at coarse levels. Levels
    stop when either dimension would fall below 4 texels.
    """
    mips = []
    shapes = []
    cur = heights
    level = 0
    while True:
        h, w = cur.shape
        if (n_levels is not None and level >= n_levels) or min(h, w) < 8:
            break
        h2, w2 = h // 2, w // 2
        pooled = cur[: 2 * h2, : 2 * w2].reshape(h2, 2, w2, 2).mean(axis=(1, 3))
        pooled = np.maximum(pooled, np.float32(POISON_HEIGHT)).astype(np.float32)
        # Re-poison anything touched by a poisoned texel.
        pooled[pooled < 0.1 * POISON_HEIGHT] = POISON_HEIGHT
        mips.append(pooled)
        shapes.append((h2, w2))
        cur = pooled
        level += 1
    return mips, shapes


@partial(
    jax.jit,
    static_argnames=(
        "quantize_normals",
        "correct_axes",
        "exact_tables",
        "window_table_min",
        "keep_hmax_raw",
    ),
)
def _device_mosaic_tables(
    heights_raw,
    valid,
    owner,
    rot_flat,
    geo,
    *,
    quantize_normals: bool,
    correct_axes: bool,
    exact_tables: bool,
    window_table_min: int,
    keep_hmax_raw: bool = False,
):
    """Device-side mosaic table construction (normals, packing, mips,
    max-pyramid, window tables) — one jitted program.

    The reference computes normals in GPU compute shaders
    (`compute_normals_shader.wgsl`, dispatched per loaded tile in
    `terrain_renderer.rs:192-347`); this is the TPU equivalent for the whole
    mosaic, ~10x faster than the host numpy path at 100-tile scale (and the
    heavy tables never cross the host->device link). Semantics mirror the
    host path in :func:`build_mosaic` texel-for-texel (tests pin both).

    Args: ``heights_raw`` f32[H, W] with zeros outside ``valid``; ``owner``
    int32[H, W] per-texel owning-tile index; ``rot_flat`` f32[T*9] row-major
    tile rotations; ``geo`` f32[4] = (lon_nw, lat_nw, ps_x, ps_y).
    """
    from topo_renderer_tpu.ops.normals import compute_normals_soa

    lon_nw, lat_nw, ps_x, ps_y = geo[0], geo[1], geo[2], geo[3]
    heights_p = jnp.where(valid, heights_raw, jnp.float32(POISON_HEIGHT))

    def enc10(c):
        return jnp.round(jnp.clip(0.5 * (c + 1.0), 0.0, 1.0) * 1023.0).astype(
            jnp.uint32
        )

    def world_packed(h_for_normals, v, owner_l, level):
        s = float(2**level)
        off = (s - 1.0) / 2.0
        nx, ny, nz = compute_normals_soa(
            h_for_normals,
            (ps_x * s, ps_y * s),
            raster_point=(0.0, 0.0),
            model_point=(lon_nw + ps_x * off, lat_nw - ps_y * off),
            valid=v,
            quantize=quantize_normals,
            correct_axes=correct_axes,
        )
        base = owner_l * 9

        def R(i, j):
            return jnp.take(rot_flat, base + (3 * i + j))

        wx = R(0, 0) * nx + R(0, 1) * ny + R(0, 2) * nz
        wy = R(1, 0) * nx + R(1, 1) * ny + R(1, 2) * nz
        wz = R(2, 0) * nx + R(2, 1) * ny + R(2, 2) * nz
        packed = enc10(wx) | (enc10(wy) << 10) | (enc10(wz) << 20)
        # Invalid texels pack 0 (the unrotated sentinel): their bytes must
        # not depend on which tile slot the borrow-clamp assigns them, or
        # incremental slot updates could not be bit-identical to a fresh
        # build (they are masked out of every sampling path regardless).
        return jnp.where(v, packed, jnp.uint32(0))

    def pack_rows(h2d, packed2d):
        return jnp.stack(
            [
                h2d.reshape(-1),
                jax.lax.bitcast_convert_type(packed2d, jnp.float32).reshape(-1),
            ],
            axis=-1,
        )

    def win2d(h2d, packed2d):
        return jnp.stack(
            [h2d, jax.lax.bitcast_convert_type(packed2d, jnp.float32)], axis=0
        )

    packed0 = world_packed(heights_raw, valid, owner, 0)

    # Average-pooled height pyramid (mirrors build_height_mips: clamp at
    # POISON, re-poison anything touched by a poisoned texel).
    mips = []
    cur = heights_p
    while min(cur.shape) >= 8:
        h2, w2 = cur.shape[0] // 2, cur.shape[1] // 2
        c = cur[: 2 * h2, : 2 * w2]
        pooled = 0.25 * ((c[0::2, 0::2] + c[0::2, 1::2]) + (c[1::2, 0::2] + c[1::2, 1::2]))
        pooled = jnp.maximum(pooled, jnp.float32(POISON_HEIGHT))
        pooled = jnp.where(
            pooled < 0.1 * POISON_HEIGHT, jnp.float32(POISON_HEIGHT), pooled
        )
        mips.append(pooled)
        cur = pooled

    mip_attrs, win_tables = [], []
    if heights_raw.size > window_table_min:
        win_tables.append(win2d(heights_p, packed0))
    else:
        win_tables.append(None)
    for level, mh in enumerate(mips, start=1):
        s = 2**level
        h_l, w_l = mh.shape
        v_l = mh > 0.5 * POISON_HEIGHT
        owner_l = owner[::s, ::s][:h_l, :w_l]
        packed_l = world_packed(jnp.where(v_l, mh, 0.0), v_l, owner_l, level)
        mip_attrs.append(pack_rows(mh, packed_l))
        win_tables.append(win2d(mh, packed_l) if mh.size > window_table_min else None)

    # Dilated max pyramid (mirrors build_max_mips, including folding odd
    # remainder rows/cols into the last texel's bound).
    mip_hmax = []
    mip_hmax_raw = []
    cur = heights_p
    for mh in mips:
        h2, w2 = mh.shape
        c = cur[: 2 * h2, : 2 * w2]
        pooled = jnp.maximum(
            jnp.maximum(c[0::2, 0::2], c[0::2, 1::2]),
            jnp.maximum(c[1::2, 0::2], c[1::2, 1::2]),
        )
        if cur.shape[0] > 2 * h2:
            er = cur[2 * h2 :, : 2 * w2]
            em = jnp.maximum(er[:, 0::2], er[:, 1::2]).max(axis=0)
            pooled = pooled.at[-1].set(jnp.maximum(pooled[-1], em))
        if cur.shape[1] > 2 * w2:
            ec = cur[: 2 * h2, 2 * w2 :]
            em = jnp.maximum(ec[0::2], ec[1::2]).max(axis=1)
            pooled = pooled.at[:, -1].set(jnp.maximum(pooled[:, -1], em))
        p = jnp.pad(pooled, 1, mode="edge")
        dil = pooled
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                dil = jnp.maximum(dil, p[dy : dy + h2, dx : dx + w2])
        mip_hmax.append(dil)
        mip_hmax_raw.append(pooled)
        cur = pooled

    if exact_tables:
        # Edge-clamped shifts (NOT roll): the last row/column's cell rows are
        # never sampled (cell indices clamp to size-2), and clamped values —
        # unlike wrapped ones — are reproducible by incremental slot updates.
        # Rows carry the 4 corner heights AND the 4 corners' packed normals
        # (bitcast): TPU gather cost is per-row, not per-byte, so the exact
        # march reads its surface AND the shader reads its attributes from
        # ONE 32 B row gather each (4 separate corner gathers before).
        def shifts(x):
            e = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
            s_ = jnp.concatenate([x[1:], x[-1:]], axis=0)
            se = jnp.concatenate([s_[:, 1:], s_[:, -1:]], axis=1)
            return x, e, s_, se

        hq = shifts(heights_p)
        pq = shifts(jax.lax.bitcast_convert_type(packed0, jnp.float32))
        cell = jnp.stack([c.reshape(-1) for c in hq + pq], axis=-1)
    else:
        cell = jnp.zeros((1, 8), jnp.float32)

    return dict(
        heights=heights_p.reshape(-1),
        attr=pack_rows(heights_p, packed0),
        cell=cell,
        mips=tuple(m.reshape(-1) for m in mips),
        mip_attrs=tuple(mip_attrs),
        mip_hmax=tuple(m.reshape(-1) for m in mip_hmax),
        mip_hmax_raw=tuple(m.reshape(-1) for m in mip_hmax_raw)
        if keep_hmax_raw
        else (),
        win_attr_2d=tuple(win_tables),
    )


def _resample_tile_lon(tile: TerrainTile, ps_fine: float, lon_anchor: float) -> TerrainTile:
    """Linearly resample a tile's rows onto the mosaic's fine longitude
    lattice (anchored at ``lon_anchor``) so COP-90 latitude bands with wider
    longitude spacing stitch into one uniform grid."""
    t = tile.transform
    ps_c = t.pixel_scale[0]
    lon0, lat0 = t.to_model((0.0, 0.0))
    lon_last = lon0 + ps_c * (tile.heights.shape[1] - 1)
    k0 = int(np.ceil((lon0 - lon_anchor) / ps_fine - 1e-6))
    k1 = int(np.floor((lon_last - lon_anchor) / ps_fine + 1e-6))
    lons = lon_anchor + ps_fine * np.arange(k0, k1 + 1)
    coarse_coords = (lons - lon0) / ps_c  # fractional coarse columns
    i0 = np.clip(np.floor(coarse_coords).astype(int), 0, tile.heights.shape[1] - 2)
    frac = (coarse_coords - i0).astype(np.float32)
    resampled = (
        tile.heights[:, i0] * (1.0 - frac) + tile.heights[:, i0 + 1] * frac
    ).astype(np.float32)
    return TerrainTile(
        location=tile.location,
        heights=resampled,
        transform=CoordinateTransform(
            raster_point=(0.0, 0.0),
            model_point=(float(lons[0]), float(lat0)),
            pixel_scale=(float(ps_fine), float(t.pixel_scale[1])),
        ),
    )


def build_mosaic(
    tiles: Sequence[TerrainTile],
    quantize_normals: bool = True,
    correct_axes: bool = False,
    exact_tables: bool = True,
    window_table_min: int = 262_144,
    on_device: bool = False,
    canvas: tuple | None = None,
    keep_hmax_raw: bool = False,
) -> TerrainMosaic:
    """Assemble decoded tiles into one stitched mosaic (host -> device).

    ``on_device=True`` ships only the stitched raw heights + tile metadata to
    the device and builds every derived table (normals, packed attributes,
    mips, max-pyramid, windows) in one jitted program
    (:func:`_device_mosaic_tables`) — the reference's GPU-compute-shader
    normal pass, TPU style. ~10x faster than the host path at large tile
    counts; output matches the host path to normal-quantization LSBs.

    ``canvas=(lon_nw, lat_nw, h_m, w_m)`` pins the mosaic raster to a fixed
    frame larger than the tile bbox (texels outside any tile stay poisoned).
    The streaming engine uses this so incremental per-tile slot updates
    (`models/mosaic_update.py`) operate on static shapes with a stable mip
    pooling phase — an incremental add/unload is then bit-identical to a
    from-scratch build on the same canvas.

    Tiles must share a common pixel scale (COP-90 tiles within a latitude
    band do); their tiepoints must differ by integer texel multiples. Both
    1201-texel (shared seam row/col, SRTM-style) and 1200-texel (abutting)
    layouts work: texels land on the common grid, overlapping seam texels are
    written once.
    """
    if not tiles:
        raise ValueError("build_mosaic needs at least one tile")

    # COP-90's longitude spacing widens in latitude bands (4.5" above 50°N,
    # 6" above 60°N, ...); latitude spacing is always 3". Mosaics are built
    # on the finest longitude grid present: coarser tiles are linearly
    # resampled along their rows onto that lattice. (The reference renders
    # each tile on its own grid — per-band shading differences from the
    # resample are sub-texel.)
    ps_y = tiles[0].transform.pixel_scale[1]
    for t in tiles:
        if not np.isclose(t.transform.pixel_scale[1], ps_y, rtol=1e-5):
            raise ValueError("mixed latitude pixel scales are not supported")
    ps_x = min(t.transform.pixel_scale[0] for t in tiles)

    if canvas is not None:
        lon_nw, lat_nw = float(canvas[0]), float(canvas[1])
    else:
        lon_nw = min(t.transform.to_model((0.0, 0.0))[0] for t in tiles)
        lat_nw = max(t.transform.to_model((0.0, 0.0))[1] for t in tiles)

    native_res = [
        bool(np.isclose(t.transform.pixel_scale[0], ps_x, rtol=1e-5)) for t in tiles
    ]
    tiles = [
        t if native else _resample_tile_lon(t, ps_x, lon_nw)
        for t, native in zip(tiles, native_res)
    ]

    # Texel (0,0) of tile t sits at model coords to_model((0,0)).
    origins = []
    for t in tiles:
        lon0, lat0 = t.transform.to_model((0.0, 0.0))
        origins.append((lon0, lat0))

    offsets = []
    for (lon0, lat0), t in zip(origins, tiles):
        ox = round((lon0 - lon_nw) / ps_x)
        oy = round((lat_nw - lat0) / ps_y)
        # Tolerance covers f32 tiepoint rounding (~2e-6 deg) at any realistic
        # pixel scale while still rejecting genuinely misaligned grids.
        if abs((lon0 - lon_nw) / ps_x - ox) > 0.02 or abs((lat_nw - lat0) / ps_y - oy) > 0.02:
            raise ValueError("tile grids are not aligned to a common raster")
        offsets.append((ox, oy))

    if canvas is not None:
        h_m, w_m = int(canvas[2]), int(canvas[3])
        for (ox, oy), t in zip(offsets, tiles):
            if ox < 0 or oy < 0 or oy + t.heights.shape[0] > h_m or ox + t.heights.shape[1] > w_m:
                raise ValueError("tile falls outside the pinned canvas")
    else:
        h_m = max(oy + t.heights.shape[0] for (ox, oy), t in zip(offsets, tiles))
        w_m = max(ox + t.heights.shape[1] for (ox, oy), t in zip(offsets, tiles))

    heights = np.zeros((h_m, w_m), np.float32)
    valid = np.zeros((h_m, w_m), bool)
    cell_tile = np.full((h_m, w_m), -1, np.int32)
    rotations = np.zeros((len(tiles), 3, 3), np.float32)

    # Deterministic order: resampled (originally coarser) tiles first so
    # native-resolution data wins shared seam texels, then the reference's
    # BTreeMap location order.
    order = sorted(
        range(len(tiles)), key=lambda i: (1 if native_res[i] else 0, tiles[i].location)
    )
    for idx in order:
        t = tiles[idx]
        ox, oy = offsets[idx]
        th, tw = t.heights.shape
        heights[oy : oy + th, ox : ox + tw] = t.heights
        valid[oy : oy + th, ox : ox + tw] = True
        # Cells of this tile: NW texels [oy, oy+th-2] x [ox, ox+tw-2].
        cell_tile[oy : oy + th - 1, ox : ox + tw - 1] = idx
        rotations[idx] = np.asarray(
            normal_to_world_rotation(
                t.transform.model_point[0], t.transform.model_point[1]
            )
        )[:3, :3]

    # A texel's rotation comes from the tile owning its cell; the mosaic's
    # last row/column have no own cell, so they borrow the adjacent cell's
    # owner (that tile's triangles are the ones referencing these texels).
    owner = cell_tile[
        np.minimum(np.arange(h_m), h_m - 2)[:, None],
        np.minimum(np.arange(w_m), w_m - 2)[None, :],
    ]
    owner = np.where(owner < 0, 0, owner)

    hmax = float(heights[valid].max()) if valid.any() else 0.0

    # Bounding sphere over the mosaic's geographic extent (used to clip ray
    # march intervals tightly — the terrain shell alone spans the whole
    # planet's horizon).
    lon_se = lon_nw + ps_x * (w_m - 1)
    lat_se = lat_nw - ps_y * (h_m - 1)
    corner_geo = [
        (lon_nw, lat_nw),
        (lon_se, lat_nw),
        (lon_nw, lat_se),
        (lon_se, lat_se),
    ]
    corners = []
    for lon, lat in corner_geo:
        for hh in (0.0, hmax):
            lam, phi = np.radians(lon), np.radians(lat)
            r = 6_371_000.0 + hh
            corners.append(
                (
                    r * np.cos(phi) * np.cos(lam),
                    r * np.cos(phi) * np.sin(lam),
                    r * np.sin(phi),
                )
            )
    corners = np.asarray(corners, np.float64)
    center = corners.mean(axis=0)
    radius = float(np.linalg.norm(corners - center, axis=1).max()) * 1.001 + 1.0

    if on_device:
        arrs = _device_mosaic_tables(
            jnp.asarray(heights),
            jnp.asarray(valid),
            jnp.asarray(owner),
            jnp.asarray(rotations.reshape(-1)),
            jnp.asarray([lon_nw, lat_nw, ps_x, ps_y], jnp.float32),
            quantize_normals=bool(quantize_normals),
            correct_axes=bool(correct_axes),
            exact_tables=bool(exact_tables),
            window_table_min=int(window_table_min),
            keep_hmax_raw=bool(keep_hmax_raw),
        )
        mip_shapes = []
        hh, ww = h_m, w_m
        while min(hh, ww) >= 8:  # mirrors build_height_mips' stop rule
            hh, ww = hh // 2, ww // 2
            mip_shapes.append((hh, ww))
        return TerrainMosaic(
            heights_flat=arrs["heights"],
            attr_packed_flat=arrs["attr"],
            cell_heights_flat=arrs["cell"],
            has_cell_table=bool(exact_tables),
            shape=(h_m, w_m),
            mip_heights_flat=arrs["mips"],
            mip_attr_flat=arrs["mip_attrs"],
            mip_hmax_flat=arrs["mip_hmax"],
            mip_hmax_raw_flat=arrs["mip_hmax_raw"],
            mip_shapes=tuple(mip_shapes),
            win_attr_2d=arrs["win_attr_2d"],
            host=MosaicHostData(
                valid=valid, cell_tile=cell_tile, tile_rot=rotations
            ),
            model_point=jnp.array([lon_nw, lat_nw], jnp.float32),
            pixel_scale=jnp.array([abs(ps_x), abs(ps_y)], jnp.float32),
            hmax=jnp.float32(hmax),
            bound_center=jnp.asarray(center, jnp.float32),
            bound_radius=jnp.float32(radius),
            texel_m=_texel_m_hint(ps_y),
        )

    # ---- host (numpy) table build ----------------------------------------
    normals_local = np.asarray(
        compute_normals(
            heights,
            (ps_x, ps_y),
            raster_point=(0.0, 0.0),
            model_point=(lon_nw, lat_nw),
            valid=valid,
            quantize=quantize_normals,
            correct_axes=correct_axes,
        )
    )
    # Rotate to world space per owning tile (texels on a seam take the
    # owning tile's rotation; adjacent tiles' rotations differ by <=1 degree,
    # matching the reference's per-triangle behavior to well under 1/255).
    normals_world = np.empty_like(normals_local)
    for idx in range(len(tiles)):
        mask = owner == idx
        if mask.any():
            normals_world[mask] = normals_local[mask] @ rotations[idx].T
    normals_packed = pack_normals(normals_world)
    # Invalid texels pack 0 (see the device path's world_packed note):
    # their bytes must be slot-order-independent for incremental updates.
    normals_packed[~valid] = 0

    heights = heights.copy()
    heights[~valid] = POISON_HEIGHT

    mips, mip_shapes = build_height_mips(heights)
    attr_packed = np.stack(
        [heights.reshape(-1), normals_packed.reshape(-1).view(np.float32)], axis=-1
    )

    # 2-D window-source copies for clipmap extraction (see TerrainMosaic).
    win_tables = [
        np.stack([heights, normals_packed.view(np.float32)], axis=0)
        if heights.size > window_table_min
        else None
    ]

    # Per-level attribute tables: normals recomputed from the pooled heights
    # at the level's texel spacing (proper LOD shading), rotated by the
    # (downsampled) owning tile and packed beside the pooled height.
    mip_attrs = []
    for level, (mh, (h_l, w_l)) in enumerate(zip(mips, mip_shapes), start=1):
        s = float(2**level)
        off = (s - 1.0) / 2.0
        mp_l = (lon_nw + ps_x * off, lat_nw - ps_y * off)
        v_l = mh > 0.5 * POISON_HEIGHT
        n_l = np.asarray(
            compute_normals(
                np.where(v_l, mh, 0.0).astype(np.float32),
                (ps_x * s, ps_y * s),
                raster_point=(0.0, 0.0),
                model_point=mp_l,
                valid=v_l,
                quantize=quantize_normals,
                correct_axes=correct_axes,
            )
        )
        owner_l = owner[:: 2**level, :: 2**level][:h_l, :w_l]
        nw_l = np.empty_like(n_l)
        for idx in range(len(tiles)):
            mask = owner_l == idx
            if mask.any():
                nw_l[mask] = n_l[mask] @ rotations[idx].T
        packed_l = pack_normals(nw_l)
        packed_l[~v_l] = 0  # slot-order-independent bytes for invalid texels
        mip_attrs.append(
            np.stack(
                [mh.reshape(-1), packed_l.reshape(-1).view(np.float32)], axis=-1
            )
        )
        win_tables.append(
            np.stack([mh, packed_l.view(np.float32)], axis=0)
            if mh.size > window_table_min
            else None
        )

    if exact_tables:
        # Edge-clamped shifts, matching the device path (see its note; rows
        # carry corner heights + corner packed normals).
        def shifts_np(x):
            e = np.concatenate([x[:, 1:], x[:, -1:]], axis=1)
            s_ = np.concatenate([x[1:], x[-1:]], axis=0)
            se = np.concatenate([s_[:, 1:], s_[:, -1:]], axis=1)
            return x, e, s_, se

        hq = shifts_np(heights)
        pq = shifts_np(normals_packed.view(np.float32))
        cell = np.stack(hq + pq, axis=-1).reshape(-1, 8)
    else:
        cell = np.zeros((1, 8), np.float32)

    _hmax_dil, _hmax_raw = build_max_mips(heights, mip_shapes, return_raw=True)
    return TerrainMosaic(
        heights_flat=jnp.asarray(heights.reshape(-1)),
        attr_packed_flat=jnp.asarray(attr_packed),
        cell_heights_flat=jnp.asarray(cell),
        has_cell_table=bool(exact_tables),
        shape=(h_m, w_m),
        mip_heights_flat=tuple(jnp.asarray(m.reshape(-1)) for m in mips),
        mip_attr_flat=tuple(jnp.asarray(a) for a in mip_attrs),
        mip_hmax_flat=tuple(
            jnp.asarray(m.reshape(-1)) for m in _hmax_dil
        ),
        mip_hmax_raw_flat=tuple(
            jnp.asarray(m.reshape(-1)) for m in _hmax_raw
        )
        if keep_hmax_raw
        else (),
        mip_shapes=tuple(mip_shapes),
        host=MosaicHostData(valid=valid, cell_tile=cell_tile, tile_rot=rotations),
        model_point=jnp.array([lon_nw, lat_nw], jnp.float32),
        pixel_scale=jnp.array([abs(ps_x), abs(ps_y)], jnp.float32),
        hmax=jnp.float32(hmax),
        bound_center=jnp.asarray(center, jnp.float32),
        bound_radius=jnp.float32(radius),
        win_attr_2d=tuple(
            None if w is None else jnp.asarray(w) for w in win_tables
        ),
        texel_m=_texel_m_hint(ps_y),
    )


@dataclasses.dataclass(frozen=True)
class Scene:
    """Everything a render call needs (reference: `ApplicationData` +
    `Uniforms`, `src/data/application_data.rs:16-45`)."""

    mosaic: TerrainMosaic
    camera: Any  # models.camera.Camera
    pixelize_n: Any = 100.0  # disabled by default (`application_data.rs:31`)


jax.tree_util.register_dataclass(
    Scene, data_fields=["mosaic", "camera", "pixelize_n"], meta_fields=[]
)
