"""Texture-sampling equivalents: gather-based bilinear / nearest / Catmull-Rom fetches.

The reference leans on GPU texture units (SampleLevel/Gather4 with linear-clamp samplers,
e.g. Common.hlsli:638-656). On TPU these become explicit XLA gathers over (H, W, C) arrays.
Reprojection footprints are spatially coherent, so XLA lowers these gathers reasonably well;
the hot paths later get Pallas equivalents.

Conventions:
  - images are (H, W) or (H, W, C) jnp arrays; pixel (x, y) lives at array [y, x];
  - uv is (..., 2) = (u, v) in [0, 1] over the FULL resource, y-down, texel centers at
    (i + 0.5) / size - exactly the D3D sampler convention the shaders use;
  - addressing is clamp-to-edge (the NRD samplers are *Clamp, InstanceImpl.cpp descriptor
    pool uses linear/nearest clamp).
"""

from __future__ import annotations

import jax.numpy as jnp

from .. import math as nm


def _chanify(img):
    """Return (img_hwc, had_channels)."""
    if img.ndim == 2:
        return img[..., None], False
    return img, True


def texel_fetch(img, x, y):
    """Integer fetch with clamp addressing. x, y int arrays of any (same) shape."""
    img, had_c = _chanify(img)
    h, w = img.shape[0], img.shape[1]
    xc = jnp.clip(x, 0, w - 1)
    yc = jnp.clip(y, 0, h - 1)
    out = img[yc, xc]
    return out if had_c else out[..., 0]


def sample_nearest(img, uv):
    """Nearest-clamp sampler."""
    img_c, had_c = _chanify(img)
    h, w = img_c.shape[0], img_c.shape[1]
    x = jnp.floor(uv[..., 0] * w).astype(jnp.int32)
    y = jnp.floor(uv[..., 1] * h).astype(jnp.int32)
    return texel_fetch(img, x, y)


def gather_2x2(img, origin):
    """Fetch the 2x2 footprint at integer origin (..., 2)=(x, y): returns (s00,s10,s01,s11).

    Equivalent of Gather4 usage in the temporal passes (each s* shaped (..., C) or (...)).
    """
    x0 = origin[..., 0].astype(jnp.int32)
    y0 = origin[..., 1].astype(jnp.int32)
    s00 = texel_fetch(img, x0, y0)
    s10 = texel_fetch(img, x0 + 1, y0)
    s01 = texel_fetch(img, x0, y0 + 1)
    s11 = texel_fetch(img, x0 + 1, y0 + 1)
    return s00, s10, s01, s11


def sample_bilinear(img, uv):
    """Linear-clamp sampler (SampleLevel with gLinearClamp)."""
    img_c, had_c = _chanify(img)
    h, w = img_c.shape[0], img_c.shape[1]
    origin, f = nm.bilinear_filter(uv, jnp.asarray([w, h], jnp.float32))
    s00, s10, s01, s11 = gather_2x2(img_c, origin)
    wts = nm.bilinear_weights(f)
    out = (s00 * wts[..., 0:1] + s10 * wts[..., 1:2]
           + s01 * wts[..., 2:3] + s11 * wts[..., 3:4])
    return out if had_c else out[..., 0]


def bilinear_custom(img, origin, weights):
    """_BilinearFilterWithCustomWeights_Color (Common.hlsli:648-656).

    origin: integer top-left texel (..., 2) = (x, y); weights (..., 4) in (00,10,01,11) order.
    Renormalizes; returns 0 where the weight sum is ~0.
    """
    img_c, had_c = _chanify(img)
    s00, s10, s01, s11 = gather_2x2(img_c, origin)
    out = nm.apply_bilinear_custom_weights(s00, s10, s01, s11, weights)
    return out if had_c else out[..., 0]


def sample_catrom(img, sample_pos, use_bicubic=None, bilinear_custom_weights=None,
                  sharpness: float = 0.5):
    """13-tap Catmull-Rom (no corners) with optional per-pixel bilinear fallback.

    Port of `_BicubicFilterNoCornersWithFallbackToBilinearFilterWithCustomWeights`
    (Common.hlsli:602-646). `sample_pos` is in PIXELS of `img` (uv * size).
    When `use_bicubic` (bool array ...,) is False at a pixel, falls back to the custom
    bilinear weights (..., 4). Can return 0 where the weight sum vanishes, like the original.
    """
    img_c, had_c = _chanify(img)
    h, w = img_c.shape[0], img_c.shape[1]
    size = jnp.asarray([w, h], jnp.float32)
    inv_size = 1.0 / size

    center_pos = jnp.floor(sample_pos - 0.5) + 0.5
    f = nm.saturate(sample_pos - center_pos)
    w0x, w1x, w2x, w3x = nm.catmull_rom_weights(f[..., 0], sharpness)
    w0y, w1y, w2y, w3y = nm.catmull_rom_weights(f[..., 1], sharpness)
    w12x, w12y = w1x + w2x, w1y + w2y
    tcx = w2x / w12x
    tcy = w2y / w12y

    wa = w12x * w0y          # top edge
    wb = w0x * w12y          # left edge
    wc = w12x * w12y         # center 2x2
    wd = w3x * w12y          # right edge
    we = w12x * w3y          # bottom edge

    if use_bicubic is not None:
        bw = bilinear_custom_weights
        ub = use_bicubic
        wa = jnp.where(ub, wa, bw[..., 0])
        wb = jnp.where(ub, wb, bw[..., 1])
        wc = jnp.where(ub, wc, bw[..., 2])
        wd = jnp.where(ub, wd, bw[..., 3])
        we = jnp.where(ub, we, 0.0)
    wsum = wa + wb + wc + wd + we

    # Texture coordinates (Common.hlsli:623-628)
    cx, cy = center_pos[..., 0], center_pos[..., 1]
    if use_bicubic is not None:
        ub = use_bicubic
        uv01 = jnp.stack([jnp.where(ub, cx + tcx, cx), jnp.where(ub, cy - 1.0, cy),
                          jnp.where(ub, cx - 1.0, cx + 1.0), jnp.where(ub, cy + tcy, cy)], -1)
        uv23 = jnp.stack([jnp.where(ub, cx + tcx, cx), jnp.where(ub, cy + tcy, cy + 1.0),
                          jnp.where(ub, cx + 2.0, cx + 1.0), jnp.where(ub, cy + tcy, cy + 1.0)],
                         -1)
        uv4 = jnp.stack([jnp.where(ub, cx + tcx, cx + f[..., 0]),
                         jnp.where(ub, cy + 2.0, cy + f[..., 1])], -1)
    else:
        uv01 = jnp.stack([cx + tcx, cy - 1.0, cx - 1.0, cy + tcy], -1)
        uv23 = jnp.stack([cx + tcx, cy + tcy, cx + 2.0, cy + tcy], -1)
        uv4 = jnp.stack([cx + tcx, cy + 2.0], -1)

    def tap(px, py):
        return sample_bilinear(img_c, jnp.stack([px, py], -1) * inv_size)

    color = tap(uv01[..., 0], uv01[..., 1]) * wa[..., None]
    color = color + tap(uv01[..., 2], uv01[..., 3]) * wb[..., None]
    color = color + tap(uv23[..., 0], uv23[..., 1]) * wc[..., None]
    color = color + tap(uv23[..., 2], uv23[..., 3]) * wd[..., None]
    color = color + tap(uv4[..., 0], uv4[..., 1]) * we[..., None]
    color = jnp.where((wsum < 0.0001)[..., None], 0.0,
                      color / jnp.where(jnp.abs(wsum) < 0.0001, 1.0, wsum)[..., None])
    return color if had_c else color[..., 0]


def sample_bicubic_bspline(img, uv):
    """Cubic B-spline texture filter (TextureCubic in SIGMA_Common.hlsli:44-93).

    Smoothing (not interpolating) bicubic; used to upsample the 1/16-res tile maps without
    blocky artifacts. Direct 16-tap evaluation of the 4-tap-bilinear trick's exact result.
    """
    img_c, had_c = _chanify(img)
    h, w = img_c.shape[0], img_c.shape[1]
    pos = uv * jnp.asarray([w, h], jnp.float32) - 0.5
    base = jnp.floor(pos)
    f = pos - base

    def bspline_w(t):
        # cubic B-spline basis at offsets -1..2
        t2 = t * t
        t3 = t2 * t
        w0 = (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0
        w1 = (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0
        w2 = (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0
        w3 = t3 / 6.0
        return w0, w1, w2, w3

    wx = bspline_w(f[..., 0])
    wy = bspline_w(f[..., 1])
    x0 = base[..., 0].astype(jnp.int32)
    y0 = base[..., 1].astype(jnp.int32)
    out = 0.0
    for j in range(4):
        row = 0.0
        for i in range(4):
            row = row + texel_fetch(img_c, x0 + (i - 1), y0 + (j - 1)) * wx[i][..., None]
        out = out + row * wy[j][..., None]
    return out if had_c else out[..., 0]


def pixel_uv_grid(h: int, w: int, dtype=jnp.float32):
    """uv of every pixel center for a (h, w) rect: (h, w, 2), y-down."""
    x = (jnp.arange(w, dtype=dtype) + 0.5) / w
    y = (jnp.arange(h, dtype=dtype) + 0.5) / h
    u, v = jnp.meshgrid(x, y)
    return jnp.stack([u, v], axis=-1)


def pixel_pos_grid(h: int, w: int):
    """Integer pixel coordinates: (h, w, 2) int32 = (x, y)."""
    x = jnp.arange(w, dtype=jnp.int32)
    y = jnp.arange(h, dtype=jnp.int32)
    xx, yy = jnp.meshgrid(x, y)
    return jnp.stack([xx, yy], axis=-1)


def is_in_screen_nearest(uv):
    """IsInScreenNearest (Common.hlsli:280-283)."""
    inside = jnp.logical_and(jnp.all(uv > 0.0, axis=-1), jnp.all(uv < 1.0, axis=-1))
    return inside.astype(jnp.float32)


def is_in_screen_bilinear(footprint_origin, rect_size):
    """IsInScreenBilinear (Common.hlsli:287-295): per-tap validity of a 2x2 footprint."""
    px = footprint_origin[..., 0]
    py = footprint_origin[..., 1]
    rx, ry = rect_size[0], rect_size[1]

    def ok(p, r):
        return jnp.logical_and(p >= 0.0, p < r).astype(jnp.float32)

    x0, x1 = ok(px, rx), ok(px + 1.0, rx)
    y0, y1 = ok(py, ry), ok(py + 1.0, ry)
    return jnp.stack([x0 * y0, x1 * y0, x0 * y1, x1 * y1], axis=-1)
