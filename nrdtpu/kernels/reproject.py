"""TPU-native history reprojection: block-uniform motion base + per-pixel tent residual.

NRD reprojection is a textured gather: sample history at pixel + motion with bilinear taps,
each tap occlusion-tested (plane distance / viewZ) before weighting
(SIGMA_TemporalStabilization.hlsli:110-163, REBLUR_TemporalAccumulation.hlsli surface-motion
path). The VPU has no per-pixel gather (Mosaic's dynamic_gather handles one vreg along the
gather axis only), so the gather is decomposed:

  motion(px) = B(block) + q(px),  B integer per grid block, q per-pixel residual

* B: rounded block-mean of the motion field, computed gather-free in XLA (reshape+mean) and
  applied in-kernel as ONE runtime-uniform roll pair per plane (Win.tap_dyn).
* q: per-pixel, clamped to [-1, 1): resolved by weighting a static 3x3 tap neighbourhood
  with bilinear hat weights - every tap individually occlusion-tested, exactly like the
  reference's per-tap bilinear custom weights.
* |q| >= 1 (motion deviating >1 px from the block mean - fast objects crossing a block,
  strong parallax): the pixel is treated as disoccluded (weights 0 -> history reset).
  The reference instead gathers arbitrarily far; this is the documented TPU divergence, and
  it degrades exactly where temporal reuse is least trustworthy.

Camera motion (the dominant case) varies sub-pixel across a 64x256 block for realistic
frame-to-frame deltas, so B+q is exact there.
"""

from __future__ import annotations

import jax.numpy as jnp


def block_motion_base(mv_pix_y, mv_pix_x, block=(64, 256), bound=(30, 126),
                      halo=(32, 128)):
    """Per-block integer motion base (gh, gw) int32 pair, clipped to the halo budget.

    mv_pix_*: (H, W) f32 motion in pixels. Gather-free: reshape + mean + round.
    The effective block is pick_block(h, w, block) - identical to what stencil_call
    resolves, so the (gh, gw) grid always matches."""
    from .harness import pick_block

    h, w = mv_pix_y.shape
    bh, bw = pick_block(h, w, block, halo)
    gh, gw = -(-h // bh), -(-w // bw)
    ph, pw = gh * bh, gw * bw
    if (ph, pw) != (h, w):
        mv_pix_y = jnp.pad(mv_pix_y, ((0, ph - h), (0, pw - w)), mode="edge")
        mv_pix_x = jnp.pad(mv_pix_x, ((0, ph - h), (0, pw - w)), mode="edge")

    def reduce_mean(m):
        return m.reshape(gh, bh, gw, bw).mean(axis=(1, 3))

    by = jnp.clip(jnp.round(reduce_mean(mv_pix_y)), -bound[0], bound[0]).astype(jnp.int32)
    bx = jnp.clip(jnp.round(reduce_mean(mv_pix_x)), -bound[1], bound[1]).astype(jnp.int32)
    return by, bx


def residual_and_validity(mv_pix_y, mv_pix_x, base_y, base_x, budget=1.0):
    """Per-pixel residual q = motion - base and its validity mask (|q| within budget).

    Inputs are (bh, bw) blocks / scalars inside a kernel. Returns (qy, qx, valid).
    budget: capture half-width in pixels. 1.0 = the classic 3x3 tent; resolvers
    that weight a wider static raw-cell neighbourhood (reblur_smb_resolve's 5x5
    hat) pass 2.0, halving the in-block motion deviation that forces a history
    reset (VERDICT r2 ask #6: rotation/zoom retention)."""
    qy = mv_pix_y - base_y.astype(jnp.float32)
    qx = mv_pix_x - base_x.astype(jnp.float32)
    eps = 1e-4
    b = float(budget)
    valid = ((qy >= -b) & (qy < b - eps) & (qx >= -b) & (qx < b - eps))
    return qy, qx, valid.astype(jnp.float32)


def tent_weight(q, d: int):
    """Bilinear hat weight of tap offset d for residual q: max(0, 1 - |q - d|)."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(q - float(d)))


TAPS = (-1, 0, 1)


def block_wide_flag(mv_pix_y, mv_pix_x, base_y, base_x, block=(64, 256),
                    halo=(32, 128), thresh=1.0):
    """(gh, gw) f32: 1.0 where any pixel's residual |motion - base| exceeds
    `thresh` px. Gates the exact wide-capture path per block (reblur_pallas
    _smb_kernel): pans stay on the cheap narrow path, zoom/orbit blocks with a
    real in-block motion gradient pay for exact residual capture."""
    from .harness import pick_block

    h, w = mv_pix_y.shape
    bh, bw = pick_block(h, w, block, halo)
    gh, gw = -(-h // bh), -(-w // bw)
    ph, pw = gh * bh, gw * bw
    if (ph, pw) != (h, w):
        mv_pix_y = jnp.pad(mv_pix_y, ((0, ph - h), (0, pw - w)), mode="edge")
        mv_pix_x = jnp.pad(mv_pix_x, ((0, ph - h), (0, pw - w)), mode="edge")
    qy = jnp.abs(mv_pix_y.reshape(gh, bh, gw, bw)
                 - base_y.astype(jnp.float32)[:, None, :, None])
    qx = jnp.abs(mv_pix_x.reshape(gh, bh, gw, bw)
                 - base_x.astype(jnp.float32)[:, None, :, None])
    dev = jnp.maximum(qy.max(axis=(1, 3)), qx.max(axis=(1, 3)))
    return (dev > thresh).astype(jnp.float32)
