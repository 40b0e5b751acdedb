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
