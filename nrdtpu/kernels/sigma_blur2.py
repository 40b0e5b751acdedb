"""SIGMA Blur/PostBlur, v2: static tap lattice + per-block tile/level predication.

v1 (sigma_pallas._sigma_blur_kernel) rotated the 8-tap Poisson disk per frame (dynamic
window rolls) and ran every radius level for every block. v2 (same redesign as
reblur_blur2, see its docstring):
  * static integer tap offsets (unrotated SPECIAL_8 x RADIUS_LEVELS);
  * a per-block skip of the ENTIRE filter where the smoothed tile map is zero - the
    TPU equivalent of SIGMA's tile-based thread-group early-out
    (SIGMA_ClassifyTiles/SmoothTiles + Common.hlsli:118-135);
  * per-block (min,max)-radius level predication. The per-block radius bounds are
    derived in XLA from the 5x5-dilated penumbra bounds (the kernel's refined penumbra
    is a convex combination of a 5x5 neighbourhood, so the dilated bounds are
    conservative).

Reference: SIGMA_Blur.hlsli:92-244, SIGMA_Common.hlsli:21-33.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .. import math as nm
from ..frontend import NRD_EPS
from ..ops import tiles
from .harness2 import block_minmax, stencil_call2
from .sigma_pallas import (
    BLOCK, HALO_X, HALO_Y, RADIUS_LEVELS, _S_DIRS, _S_FRUSTUM, _S_MISC, _S_W2V,
    _blur_scalars, _compute_weight, _decode_oct_normal2, _is_lit, _smoothstep,
)

# level buckets: PARTITION by block max radius (exactly one bucket fires), the
# reblur_blur2 v3 scheme. v2 used hat-blend semantics whose exact liveness test
# ((rmax > LEV[li-1]) & (rmin < LEV[li+1])) fired ALL levels on any block mixing
# lit pixels (radius 0) with wide penumbra (radius 32) - measured 2.58 ms/launch on
# the blob-shadow bench scene vs 0.74 on an unmixed field. Per-pixel radius rides
# the Gaussian instead: tap at lattice level L and pixel radius r weighs
# exp(-0.66 (L*tapz)^2 / r^2) = GetGaussianWeight of the tap's fraction of r
# (SIGMA_Blur.hlsli:244 samples at the per-pixel radius with a constant Gaussian;
# the rescale is the lattice-form equivalent, documented divergence like reblur's).
_LEV = RADIUS_LEVELS
_LO = [-1e9] + list(_LEV[:-1])
_HI = list(_LEV[:-1]) + [1e9]


def _static_offsets():
    """8 x len(_LEV) integer lattice offsets + the Gaussian constant k_t per tap."""
    out = []
    for tap in np.asarray(nm.SPECIAL_8):
        per_level = []
        for lv in _LEV:
            ox = int(np.clip(round(float(tap[0]) * lv), -32, 32))
            oy = int(np.clip(round(float(tap[1]) * lv), -32, 32))
            k_t = -0.66 * (float(tap[2]) * lv) ** 2
            per_level.append((oy, ox, k_t))
        out.append(per_level)
    return out


def _sigma_blur2_kernel(first_pass, channels, has_shadow_in, smem, bsm, wins, centers,
                        outs, origin, scratch):
    pen_w, z_w = wins[0], wins[1]
    s_ws = wins[2:2 + (channels if has_shadow_in else 0)]
    nx_w, ny_w = wins[-2], wins[-1]
    (tile_ref,) = centers
    pen_out = outs[0]
    s_outs = outs[1:1 + channels]
    rmin_b, rmax_b, tmax_b = bsm
    bh, bw = pen_w.bh, pen_w.bw

    def shadow_taps(dy, dx, lit_t):
        # SIGMA_TYPE taps: first pass w/o input -> IsLit(penumbra); first pass w/ input
        # (translucency) -> raw; later passes -> sqrt-unpack (SIGMA_Blur.hlsli:24-35)
        if not has_shadow_in:
            return [lit_t]
        ts = [sw.tap(dy, dx) for sw in s_ws]
        if not first_pass:
            ts = [t * t for t in ts]
        return ts
    y0 = origin[0].astype(jnp.float32)
    x0 = origin[1].astype(jnp.float32)

    view_z_scale = smem[_S_MISC + 4]
    rect_w = smem[_S_MISC + 5]
    rect_h = smem[_S_MISC + 6]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h

    center_pen = pen_w.tap()
    view_z = z_w.tap()  # pre-decoded |viewZ| * scale (caller-side)
    center_s = shadow_taps(0, 0, _is_lit(center_pen))

    # copy-through init (tile==0 / lit / sky blocks end here)
    center_packed = [jnp.sqrt(jnp.clip(cs, 0.0, 1.0)) for cs in center_s]
    for c in range(channels):
        s_outs[c][:, :] = center_packed[min(c, len(center_packed) - 1)]
    pen_out[:, :] = center_pen

    i_b, j_b = pl.program_id(0), pl.program_id(1)

    @pl.when(tmax_b[i_b, j_b] > 0.0)
    def _():
        row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
        col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
        fxp = x0 + col  # integer pixel coords as f32, for per-tap in-screen tests
        fyp = y0 + row
        u = (fxp + 0.5) * inv_w
        v = (fyp + 0.5) * inv_h
        tile_value = tile_ref[:, :]

        fx0, fy0, fdx, fdy = smem[_S_FRUSTUM], smem[_S_FRUSTUM + 1], \
            smem[_S_FRUSTUM + 2], smem[_S_FRUSTUM + 3]

        # view_pos(us, vs, z) with us affine in the static offset: (dirx + cx_k) * z
        dirx = u * fdx + fx0
        diry = v * fdy + fy0
        xvx, xvy, xvz = dirx * view_z, diry * view_z, view_z
        nwx, nwy, nwz = _decode_oct_normal2(nx_w.tap(), ny_w.tap())
        m = [smem[_S_W2V + k] for k in range(9)]
        nvx = m[0] * nwx + m[1] * nwy + m[2] * nwz
        nvy = m[3] * nwx + m[4] * nwy + m[5] * nwz
        nvz = m[6] * nwx + m[7] * nwy + m[8] * nwz

        unproject = smem[_S_MISC + 1]
        pixel_size = unproject * view_z
        frustum_size = smem[_S_MISC + 2] * view_z
        plane_sens = smem[_S_MISC]
        ga = 1.0 / (plane_sens * frustum_size)
        gb = -(nvx * xvx + nvy * xvy + nvz * xvz) * ga

        # per-tap algebra hoists (same folding as reblur_fused):
        #   d(tap) = dot(Nv, Xv_tap) = z_t * (A + off_x * P + off_y * Q) with
        #   A, P, Q per-pixel planes - 3 vector ops per tap instead of 7;
        #   both_lit(center, tap) = (2 lit_c - 1) * lit_t + (1 - lit_c) - one fma.
        d_a = nvx * dirx + nvy * diry + nvz
        d_p = nvx * (inv_w * fdx)
        d_q = nvy * (inv_h * fdy)
        lit_c = _is_lit(center_pen)
        bl_m = 2.0 * lit_c - 1.0
        bl_b = 1.0 - lit_c

        # ---- dense 5x5 (SIGMA_Blur.hlsli:92-148) ----
        # in-screen masks per axis offset, reused across the 25 taps
        mx = {dx: ((fxp >= jnp.float32(-dx))
                   & (fxp <= rect_w - jnp.float32(1 + dx))).astype(jnp.float32)
              for dx in range(-2, 3)}
        my = {dy: ((fyp >= jnp.float32(-dy))
                   & (fyp <= rect_h - jnp.float32(1 + dy))).astype(jnp.float32)
              for dy in range(-2, 3)}
        n_s = len(center_s)
        sum_x = jnp.zeros((bh, bw), jnp.float32)
        sum_y = jnp.zeros((bh, bw), jnp.float32)
        result = [jnp.zeros((bh, bw), jnp.float32) for _ in range(n_s)]
        pen_acc = jnp.zeros((bh, bw), jnp.float32)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                pen_t = pen_w.tap(dy, dx)
                lit_t = _is_lit(pen_t)
                if dy == 0 and dx == 0:
                    w_ = jnp.ones((bh, bw), jnp.float32)
                    s_t = center_s
                else:
                    z_t = z_w.tap(dy, dx)
                    s_t = shadow_taps(dy, dx, lit_t)
                    d = z_t * (d_a + jnp.float32(dx) * d_p + jnp.float32(dy) * d_q)
                    w_ = (mx[dx] * my[dy]) * _compute_weight(d, ga, gb)
                    w_ = w_ * (bl_m * lit_t + bl_b)
                    r2 = (dx * dx + dy * dy) / 4.0
                    w_ = w_ * float(np.exp(-0.66 * r2))
                result = [r + st * w_ for r, st in zip(result, s_t)]
                sum_x = sum_x + w_
                w2 = w_ * pixel_size / (pixel_size + pen_t)
                w2 = w2 * (1.0 - lit_t)
                pen_acc = pen_acc + pen_t * w2
                sum_y = sum_y + w2

        result = [r / sum_x for r in result]
        sum_x = jnp.ones((bh, bw), jnp.float32)
        penumbra = pen_acc / jnp.maximum(sum_y, NRD_EPS)
        sum_y = (sum_y != 0.0).astype(jnp.float32)

        pen_px = penumbra / pixel_size
        f = _smoothstep(0.0, 2.0, pen_px)
        result = [cs + (r - cs) * f for cs, r in zip(center_s, result)]

        f4 = 4.0 + (1.0 - 4.0) * f
        result = [r * f4 for r in result]
        penumbra = penumbra * f4
        sum_x = sum_x * f4
        sum_y = sum_y * f4

        unclamped = penumbra / pixel_size * tile_value
        min_radius = jnp.minimum(unclamped, 2.0)
        blur_radius = jnp.clip(unclamped, min_radius, 32.0)
        inv_r2 = 1.0 / jnp.square(jnp.clip(blur_radius, 1.0, _LEV[-1]))

        inv_est_pen = 1.0 / jnp.maximum(penumbra, NRD_EPS)
        taps = _static_offsets()

        # sparse static lattice, one live level per block (see module constants);
        # accumulators live in the out refs + scratch across the predicated bodies
        for c in range(n_s):
            s_outs[c][:, :] = result[c]
        pen_out[:, :] = penumbra
        scratch[0][:, :] = sum_x
        scratch[1][:, :] = sum_y
        rmax = jnp.minimum(rmax_b[i_b, j_b], jnp.float32(_LEV[-1]))
        for li in range(len(_LEV)):
            active = (rmax > jnp.float32(_LO[li])) & (rmax <= jnp.float32(_HI[li]))

            @pl.when(active)
            def _(li=li):
                res_acc = [s_outs[c][:, :] for c in range(n_s)]
                pen_a = pen_out[:, :]
                sx_acc = scratch[0][:, :]
                sy_acc = scratch[1][:, :]
                for k in range(8):
                    off_y, off_x, k_t = taps[k][li]
                    pen_t = pen_w.tap(off_y, off_x)
                    lit_t = _is_lit(pen_t)
                    z_t = z_w.tap(off_y, off_x)
                    s_t = shadow_taps(off_y, off_x, lit_t)
                    in_screen = ((fxp >= jnp.float32(-off_x))
                                 & (fxp <= rect_w - jnp.float32(1 + off_x))
                                 & (fyp >= jnp.float32(-off_y))
                                 & (fyp <= rect_h - jnp.float32(1 + off_y))
                                 ).astype(jnp.float32)
                    d = z_t * (d_a + jnp.float32(off_x) * d_p
                               + jnp.float32(off_y) * d_q)
                    w_ = in_screen * _compute_weight(d, ga, gb)
                    w_ = w_ * (bl_m * lit_t + bl_b)
                    w_ = w_ * jnp.exp(jnp.float32(k_t) * inv_r2)
                    w_ = w_ * jnp.clip(pen_t * inv_est_pen, 0.0, 1.0)
                    res_acc = [r + st * w_ for r, st in zip(res_acc, s_t)]
                    sx_acc = sx_acc + w_
                    w2 = w_ * pixel_size / (pixel_size + pen_t)
                    w2 = w2 * (1.0 - lit_t)
                    pen_a = pen_a + pen_t * w2
                    sy_acc = sy_acc + w2
                for c in range(n_s):
                    s_outs[c][:, :] = res_acc[c]
                pen_out[:, :] = pen_a
                scratch[0][:, :] = sx_acc
                scratch[1][:, :] = sy_acc

        inv_sx = 1.0 / scratch[0][:, :]
        sum_y2 = scratch[1][:, :]
        penumbra_out = jnp.where(sum_y2 == 0.0, center_pen,
                                 pen_out[:, :] / jnp.maximum(sum_y2, NRD_EPS))

        denoising_range = smem[_S_MISC + 3]
        no_denoise = (tile_value == 0.0) | (center_pen == 0.0) \
            | (view_z > denoising_range)
        for c in range(channels):
            cc = min(c, n_s - 1)
            shadow_out = jnp.sqrt(jnp.clip(s_outs[cc][:, :] * inv_sx, 0.0, 1.0))
            s_outs[c][:, :] = jnp.where(no_denoise, center_packed[cc], shadow_out)
        pen_out[:, :] = jnp.where(no_denoise, center_pen, penumbra_out)


def _dilate_minmax(mn, mx):
    """3x3 block-neighbourhood dilation of per-block (min, max) grids.

    The kernel's refined penumbra mixes a 5x5 pixel neighbourhood, which can cross a
    block boundary - dilating by one block is conservative. jnp.roll wraps at grid
    edges; wrapped values only widen the bounds, which stays conservative."""
    mn_d, mx_d = mn, mx
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mn_d = jnp.minimum(mn_d, jnp.roll(mn, (dy, dx), (0, 1)))
            mx_d = jnp.maximum(mx_d, jnp.roll(mx, (dy, dx), (0, 1)))
    return mn_d, mx_d


def sigma_blur_pallas2(sc, dc, penumbra_in, shadow_in, view_z_in, normal_roughness,
                       tiles_smoothed, *, first_pass: bool, channels: int,
                       rs_static=None):
    """Drop-in replacement for sigma_pallas.sigma_blur_pallas (v2 kernel)."""
    h, w = penumbra_in.shape
    rs = 1.0 if rs_static else sc["resolution_scale"]
    tile_value = tiles.upsample_tile_value(tiles_smoothed, h, w, rs)

    scalars = _blur_scalars(sc, dc, sc["rotator"])  # dirs slots unused (static lattice)

    has_shadow_in = shadow_in is not None
    if has_shadow_in:
        if shadow_in.ndim == 2:
            shadow_in = shadow_in[..., None]
        # shadow rides bf16: sqrt-packed [0,1] values (8-bit-class data, the
        # reference stores them as unorm8/16) - a bf16 tap load is ~2.4x
        # cheaper than f32 (bench_micro), and the translucency variant pays
        # 4 planes x 33 taps of them. The conversion round trip costs ~4
        # plane-writes, net win for channels > 1 and neutral for shadow.
        shadow_planes = [shadow_in[..., c].astype(jnp.bfloat16)
                         for c in range(channels)]
    else:
        shadow_planes = []

    # conservative per-block radius bounds: refined penumbra is a convex combination
    # over a 5x5 neighbourhood and radius <= pen_px * tile * 4 (the f4 boost cancels)
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]
    pixel_size = sc["unproject"] * view_z
    lit = penumbra_in >= jnp.float32(65504.0)
    pen_px = jnp.where(lit, 0.0, penumbra_in) / jnp.maximum(pixel_size, NRD_EPS)
    # in-kernel: radius = pen_avg_px * f4 * tile with pen_avg a convex 5x5 mix and
    # f4 in [1, 4] -> bounds [min(pen_px)*tile, 4*max(pen_px)*tile], clipped like radius
    rmin_b, _mx = block_minmax(jnp.clip(pen_px * tile_value, 0.0, 32.0),
                               BLOCK, (HALO_Y, HALO_X))
    _mn, rmax_b = block_minmax(jnp.clip(pen_px * tile_value * 4.0, 0.0, 32.0),
                               BLOCK, (HALO_Y, HALO_X))
    rmin_b, rmax_b = _dilate_minmax(rmin_b, rmax_b)
    tmax_b = block_minmax(tile_value, BLOCK, (HALO_Y, HALO_X))[1]

    outs = stencil_call2(
        functools.partial(_sigma_blur2_kernel, first_pass, channels, has_shadow_in),
        [penumbra_in, view_z] + shadow_planes
        + [normal_roughness[..., 0], normal_roughness[..., 1]],
        n_out=1 + channels, halo=(HALO_Y, HALO_X), block=BLOCK,
        scalars=scalars, block_scalars=[rmin_b, rmax_b, tmax_b],
        center_inputs=[tile_value], scratch_blocks=2)
    return outs[0], jnp.stack(outs[1:], -1)
