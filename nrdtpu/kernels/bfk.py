"""bf16 tap-pipeline idioms for the Pallas kernels (round-4 substrate).

Measured on the target (bench_vpu / bench_micro, 1440p full-res plane units):
  fma f32 3.1 us, fma bf16 1.9 us (vregs hold 2x bf16 elements)
  unaligned window load f32 13.6 us, bf16 5.6 us
  compare+select 6.0 us -- and Mosaic REJECTS bf16 `cmpf` outright on this target
  ("Target does not support this comparison"), so bf16 chains must express
  step/equality tests arithmetically (clip-based), not with comparisons.

Precision split rule (mirrors the reference's fp32-position / fp16-color split):
  f32  : viewZ taps, plane-distance / disocclusion-threshold chains (catastrophic
         cancellation: the weight argument is a small difference of O(viewZ) terms;
         bf16's 8-bit mantissa would inject ~40% of the threshold as noise)
  bf16 : normal / roughness / signal taps, angle weights, hit-dist weights,
         Gaussian radius weights, accumulation (normalized sums of <= 20 taps)
"""

from __future__ import annotations

import jax.numpy as jnp

BF = jnp.bfloat16


def step_ge0(x):
    """1.0 where x >= 0 else 0.0, without a vector compare.

    Exact 0/1 away from |x| < ~1e-30 (where the source branch is itself degenerate).
    Works on bf16 (no cmpf) and f32 alike."""
    return jnp.clip(x * 1e30 + 0.5, 0.0, 1.0)


def step_gt(x, thr):
    """1.0 where x > thr else 0.0 (arithmetic; exact for |x - thr| > ~1e-30)."""
    return jnp.clip((x - thr) * 1e30, 0.0, 1.0)


def mask_eq(a, b, scale=256.0):
    """1.0 where a == b else 0.0 for small-integer-valued planes (material IDs).

    Exact when |a - b| is 0 or >= 1/scale and values are bf16-representable."""
    return jnp.clip(1.0 - jnp.abs(a - b) * scale, 0.0, 1.0)


def acos_approx_b(x):
    """AcosApprox with the sign branch expressed arithmetically (bf16-safe).

    Same polynomial as reblur_pallas._acos_approx
    (Common.hlsli AcosApprox); the x>=0 select becomes a lerp by step_ge0."""
    import numpy as np

    res = jnp.sqrt(jnp.clip(1.0 - jnp.abs(x), 0.0, 1.0)) * float(np.pi / 2.0)
    return res + (float(np.pi) - 2.0 * res) * (1.0 - step_ge0(x))


def border_dists(fx32, fy32, rect_w, rect_h, dt=BF, clamp=64.0):
    """Per-block border-distance planes for the arithmetic in-screen test.

    fx32/fy32: f32 integer pixel coordinates of the block. Distances are clamped to
    `clamp` (> max tap offset) so they are integer-exact in bf16 (integers <= 256).
    Returns (dl, dr, du, dd): distance to the left/right/up/down screen border."""
    dl = jnp.minimum(fx32, clamp).astype(dt)
    dr = jnp.minimum(rect_w - 1.0 - fx32, clamp).astype(dt)
    du = jnp.minimum(fy32, clamp).astype(dt)
    dd = jnp.minimum(rect_h - 1.0 - fy32, clamp).astype(dt)
    return dl, dr, du, dd


def w_inscreen(dists, off_y, off_x):
    """1.0 iff the static tap (off_y, off_x) lands in-screen, else 0.0.

    Replaces the 4-compare + 3-and chain (4 x 6 us sel-class ops) with
    2 subtracts + min + clip on the precomputed border-distance planes. Exact:
    distances and offsets are integers, so min(...) + 1 is <= 0 or >= 1."""
    dl, dr, du, dd = dists
    dt = dl.dtype.type
    dx_ = (dr if off_x >= 0 else dl) - dt(abs(off_x))
    dy_ = (dd if off_y >= 0 else du) - dt(abs(off_y))
    return jnp.clip(jnp.minimum(dx_, dy_) + 1.0, 0.0, 1.0)
