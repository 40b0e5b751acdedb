"""1/16-resolution tile hierarchy - the TPU equivalent of ClassifyTiles/SmoothTiles.

The reference classifies 16x16 pixel tiles (sky / lit / umbra) so later passes can early-out
whole thread groups (Common.hlsli:118-135, REBLUR_ClassifyTiles.cs.hlsl:22-55,
SIGMA_ClassifyTiles.hlsli:27-79). TPUs prefer dense predicated compute over control-flow
divergence, so the tile maps become multiplicative masks here; the Pallas kernels additionally
use them with scalar prefetch to skip whole grid blocks.
"""

from __future__ import annotations

import jax.numpy as jnp

TILE = 16


def tile_reduce(img, op: str = "max", tile: int = TILE):
    """Reduce (H, W) -> (ceil(H/t), ceil(W/t)) with min/max/sum over each t x t tile."""
    h, w = img.shape[0], img.shape[1]
    ph = (-h) % tile
    pw = (-w) % tile
    if op == "max":
        pad_val = -jnp.inf
    elif op == "min":
        pad_val = jnp.inf
    else:
        pad_val = 0.0
    x = jnp.pad(img, ((0, ph), (0, pw)), constant_values=pad_val)
    x = x.reshape((h + ph) // tile, tile, (w + pw) // tile, tile)
    if op == "max":
        return x.max(axis=(1, 3))
    if op == "min":
        return x.min(axis=(1, 3))
    return x.sum(axis=(1, 3))


def tile_upsample_nearest(tile_map, h: int, w: int, tile: int = TILE):
    """Broadcast a (th, tw) tile map back to (h, w) pixels."""
    up = jnp.repeat(jnp.repeat(tile_map, tile, axis=0), tile, axis=1)
    return up[:h, :w]


def classify_sky_tiles(view_z, denoising_range, tile: int = TILE):
    """REBLUR/RELAX ClassifyTiles: 1 where ALL pixels of the tile are beyond denoisingRange.

    (REBLUR_ClassifyTiles.cs.hlsl:22-55: ballot over viewZ > gDenoisingRange). Returns the
    1/16-res float map; consumers multiply by (1 - sky).
    """
    is_sky = (jnp.abs(view_z) > denoising_range).astype(jnp.float32)
    return tile_reduce(is_sky, "min", tile)


def tile_upsample_bspline(tile_map, h: int, w: int, tile: int = TILE):
    """Gather-free cubic B-spline tile-map upsampling.

    Exactly equals resample.sample_bicubic_bspline(tile_map, pixel_uv_grid(h, w)) when
    h == th*tile and w == tw*tile (phase-aligned 16x upsampling): the 16 sub-pixel phases
    have *static* filter weights over a 5-texel footprint, so the whole filter collapses to
    two tiny (16, 5) matmuls over shifted copies - no per-pixel gather (which is pathologically
    slow through this backend's XLA path; see ARCHITECTURE.md "backend findings").
    """
    import numpy as np

    th, tw = tile_map.shape
    assert th * tile == h and tw * tile == w, "phase-aligned path requires exact 16x"

    # static per-phase weights over footprint offsets -2..+2
    f = (np.arange(tile, dtype=np.float64) + 0.5) / tile - 0.5
    base = np.floor(f).astype(np.int64)
    t = f - base
    w0 = (1.0 - 3.0 * t + 3.0 * t * t - t ** 3) / 6.0
    w1 = (4.0 - 6.0 * t * t + 3.0 * t ** 3) / 6.0
    w2 = (1.0 + 3.0 * t + 3.0 * t * t - 3.0 * t ** 3) / 6.0
    w3 = t ** 3 / 6.0
    wm = np.zeros((tile, 5), np.float32)
    for p in range(tile):
        for i, wi in enumerate((w0[p], w1[p], w2[p], w3[p])):
            wm[p, base[p] + i - 1 + 2] = wi
    wm = jnp.asarray(wm)

    tp = jnp.pad(tile_map, ((2, 2), (2, 2)), mode="edge")
    rows = jnp.stack([tp[a:a + th, :] for a in range(5)], -1)          # (th, tw+4, 5)
    ry = jnp.einsum("hwa,pa->hpw", rows, wm).reshape(h, tw + 4)
    cols = jnp.stack([ry[:, b:b + tw] for b in range(5)], -1)          # (h, tw, 5)
    return jnp.einsum("hwb,qb->hwq", cols, wm).reshape(h, w)


def upsample_tile_value(tiles_smoothed, h: int, w: int, resolution_scale,
                        tile: int = TILE):
    """Tile-value (channel 1) upsampled to pixels with sky (channel 0) zeroed.

    Fast phase-aligned path when shapes allow and resolution_scale is statically 1
    (rect == resource); otherwise the reference gather-based bicubic.
    """
    from . import resample

    th, tw = tiles_smoothed.shape[:2]
    rs = resolution_scale
    static_one = isinstance(rs, (int, float)) and float(rs) == 1.0
    if static_one and th * tile == h and tw * tile == w:
        tile_value = tile_upsample_bspline(tiles_smoothed[..., 1], h, w, tile)
    else:
        uv = resample.pixel_uv_grid(h, w)
        rs_vec = jnp.broadcast_to(jnp.asarray(rs, jnp.float32), (2,))
        tile_value = resample.sample_bicubic_bspline(
            tiles_smoothed[..., 1], uv * rs_vec[None, None, :])
    sky = tile_upsample_nearest(tiles_smoothed[..., 0], h, w, tile)
    return jnp.where(sky > 0.0, 0.0, tile_value)
