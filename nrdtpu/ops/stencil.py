"""Fixed-offset stencil helpers: the TPU replacement for CTA shared-memory preloading.

The reference preloads a (GROUP+2*BORDER)^2 tile into groupshared memory and walks 3x3/5x5
neighborhoods (Common.hlsli:109-150). On TPU the idiomatic equivalent is whole-image shifted
views: XLA fuses the pad+slice chains into the consuming elementwise graph, and the Pallas
kernels later read halo'd VMEM blocks directly. These helpers define the semantics both
implementations must match.
"""

from __future__ import annotations

import jax.numpy as jnp


def shifted(img, dy: int, dx: int, mode: str = "edge", fill=0.0):
    """View of `img` shifted so that out[y, x] = img[y + dy, x + dx].

    mode 'edge' clamps (texture clamp addressing), 'constant' fills with `fill`.
    Static dy/dx only (stencil offsets are compile-time in every NRD pass).
    """
    if dy == 0 and dx == 0:
        return img
    h, w = img.shape[0], img.shape[1]
    pad_top = max(-dy, 0)
    pad_bot = max(dy, 0)
    pad_left = max(-dx, 0)
    pad_right = max(dx, 0)
    pad_width = [(pad_top, pad_bot), (pad_left, pad_right)] + [(0, 0)] * (img.ndim - 2)
    if mode == "edge":
        padded = jnp.pad(img, pad_width, mode="edge")
    else:
        padded = jnp.pad(img, pad_width, mode="constant", constant_values=fill)
    return padded[pad_top + dy: pad_top + dy + h, pad_left + dx: pad_left + dx + w]


def offsets_square(radius: int, exclude_center: bool = False, exclude_corners: bool = False):
    """Static list of (dy, dx) offsets for a (2r+1)^2 stencil."""
    out = []
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            if exclude_center and dy == 0 and dx == 0:
                continue
            if exclude_corners and abs(dy) == radius and abs(dx) == radius:
                continue
            out.append((dy, dx))
    return out


def local_moments(img, radius: int = 1, mode: str = "edge"):
    """Mean and second moment over a (2r+1)^2 neighborhood (for sigma clamping)."""
    taps = offsets_square(radius)
    m1 = jnp.zeros_like(img)
    m2 = jnp.zeros_like(img)
    for dy, dx in taps:
        t = shifted(img, dy, dx, mode)
        m1 = m1 + t
        m2 = m2 + t * t
    inv = 1.0 / len(taps)
    return m1 * inv, m2 * inv


def local_min_max(img, radius: int = 1, mode: str = "edge"):
    """Min/max over a (2r+1)^2 neighborhood (RCRS clamps)."""
    lo = img
    hi = img
    for dy, dx in offsets_square(radius, exclude_center=True):
        t = shifted(img, dy, dx, mode)
        lo = jnp.minimum(lo, t)
        hi = jnp.maximum(hi, t)
    return lo, hi
