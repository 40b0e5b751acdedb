"""Pallas TPU kernels for the SIGMA pipeline (Blur/PostBlur + TemporalStabilization).

Same pass semantics as passes/sigma/kernels.py (the XLA reference path), re-expressed for
the VPU on the halo-window harness (kernels/harness.py): fixed 5x5 taps are static-offset
vector loads, the 8 rotated Poisson taps become loads at *runtime-uniform* integer offsets
(the per-frame rotator is a scalar) evaluated at a small set of static radius levels blended
per pixel by a hat function over radius, and the history reprojection uses the block-base +
tent-residual decomposition (kernels/reproject.py) instead of a texture gather.

Documented divergences from the HLSL (quality-neutral by construction, see ARCHITECTURE.md):
  - per-pixel blur radius is quantized to RADIUS_LEVELS with linear blending instead of a
    continuous radius ("snap to the pixel center", SIGMA_Blur.hlsli:215, already quantizes
    tap positions to integers in the reference);
  - the anisotropic screen-space skew (SIGMA_Blur.hlsli:169-174, range ~[0.5, 1]) is folded
    into the radius magnitude instead of per-axis scaling;
  - image borders exclude out-of-screen taps (renormalized) instead of clamp-sampling;
  - reprojection with per-pixel motion deviating >1 px from the block mean is treated as
    disocclusion (reproject.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import math as nm
from ..frontend import NRD_EPS, NRD_FP16_MAX
from ..ops import tiles
from . import reproject as rp
from .harness import stencil_call
from .harness2 import stencil_call2

HALO_Y = 32
HALO_X = 128
# 4 levels, not 6: every instantiated level's tap body is ISSUED predicated on all
# blocks (Mosaic lowers pl.when over vector code to masked issue at ~half a live
# body's cost - bench_tap.py "5x same body"), so the hat ladder's granularity is paid
# in issue bandwidth frame-wide. The hat blend between adjacent levels keeps the
# radius response continuous at the coarser spacing.
RADIUS_LEVELS = (2.0, 6.0, 14.0, 32.0)
BLOCK = (64, 256)


def _level_weights(radius):
    """Per-pixel hat weights over RADIUS_LEVELS (sum=1 for radius within range)."""
    levels = RADIUS_LEVELS
    ws = []
    r = jnp.clip(radius, levels[0], levels[-1])
    for i, lv in enumerate(levels):
        lo = levels[i - 1] if i > 0 else levels[0]
        hi = levels[i + 1] if i + 1 < len(levels) else levels[-1]
        up = jnp.clip((r - lo) / max(lv - lo, 1e-6), 0.0, 1.0) if i > 0 \
            else jnp.ones_like(r)
        down = jnp.clip((hi - r) / max(hi - lv, 1e-6), 0.0, 1.0) \
            if i + 1 < len(levels) else jnp.ones_like(r)
        ws.append(up * down)
    return ws


def _is_lit(p):
    return (p >= NRD_FP16_MAX).astype(jnp.float32)


def _both_lit_or_unlit(p1, p2):
    return ((p1 == 0.0) == (p2 == 0.0)).astype(jnp.float32)


def _smoothstep(a, b, x):
    t = jnp.clip((x - a) / (b - a), 0.0, 1.0)
    return t * t * (3.0 - 2.0 * t)


def _compute_weight(x, px, py):
    return _smoothstep(1.0, 0.0, jnp.abs(x * px + py))


def _decode_oct_normal2(px_, py_):
    """_NRD_DecodeUnitVector (R10G10B10A2 path) on two planes; returns (nx, ny, nz)."""
    qx = px_ * 2.0 - 1.0
    qy = py_ * 2.0 - 1.0
    z = 1.0 - jnp.abs(qx) - jnp.abs(qy)
    t = jnp.clip(-z, 0.0, 1.0)
    nx = qx - t * jnp.where(qx >= 0.0, 1.0, -1.0)
    ny = qy - t * jnp.where(qy >= 0.0, 1.0, -1.0)
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + z * z, 1e-15))
    return nx * inv, ny * inv, z * inv


# =============================================================================
# Blur kernel
# =============================================================================

# scalar layout in SMEM (f32): see _blur_scalars
_S_DIRS = 0            # 16: 8 x (dx, dy) rotated poisson dirs (unit radius)
_S_FRUSTUM = 16        # 4
_S_W2V = 20            # 9: world_to_view rotation, row-major
_S_MISC = 29           # plane_dist_sens, unproject, min_rect_dim_mul_unproject,
#                        denoising_range, view_z_scale, rect_w, rect_h
_S_TOTAL = 36


def _blur_scalars(sc, dc, rotator):
    dirs = []
    for tap in nm.SPECIAL_8:
        d = nm.rotate_vector2(rotator, jnp.asarray(tap[:2]))
        dirs.append(d)
    dirs = jnp.stack(dirs).reshape(-1)  # 16
    w2v = jnp.asarray(sc["world_to_view"])[:3, :3].reshape(-1)
    misc = jnp.stack([
        jnp.asarray(dc["plane_dist_sensitivity"], jnp.float32),
        jnp.asarray(sc["unproject"], jnp.float32),
        jnp.asarray(sc["min_rect_dim_mul_unproject"], jnp.float32),
        jnp.asarray(sc["denoising_range"], jnp.float32),
        jnp.asarray(sc["view_z_scale"], jnp.float32),
        jnp.asarray(sc["rect_size"][0], jnp.float32),
        jnp.asarray(sc["rect_size"][1], jnp.float32),
    ])
    return jnp.concatenate([dirs, jnp.asarray(sc["frustum"], jnp.float32), w2v, misc])


def _gauss_weights():
    return [float(np.exp(-0.66 * t[2] * t[2])) for t in nm.SPECIAL_8]


def _sigma_blur_kernel(first_pass, smem, bsm, wins, centers, outs, origin):
    pen_w, z_w, s_w, nx_w, ny_w = wins
    (tile_ref,) = centers
    pen_out, s_out = outs
    bh, bw = pen_out.shape[:2]
    y0 = origin[0].astype(jnp.float32)
    x0 = origin[1].astype(jnp.float32)

    view_z_scale = smem[_S_MISC + 4]
    rect_w = smem[_S_MISC + 5]
    rect_h = smem[_S_MISC + 6]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h

    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (x0 + col + 0.5) * inv_w
    v = (y0 + row + 0.5) * inv_h

    center_pen = pen_w.tap()
    view_z = jnp.abs(z_w.tap()) * view_z_scale
    tile_value = tile_ref[:, :]

    if first_pass:
        center_s = _is_lit(center_pen)
    else:
        center_s = s_w.tap()
        center_s = center_s * center_s  # unpack sqrt-packed shadow

    # geometry setup
    fx0, fy0, fdx, fdy = smem[_S_FRUSTUM], smem[_S_FRUSTUM + 1], \
        smem[_S_FRUSTUM + 2], smem[_S_FRUSTUM + 3]

    def view_pos(uu, vv, zz):
        x = (uu * fdx + fx0) * zz
        y = (vv * fdy + fy0) * zz
        return x, y, zz

    xvx, xvy, xvz = view_pos(u, v, view_z)

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

    # ---- dense 5x5 (SIGMA_Blur.hlsli:92-148) ----
    sum_x = jnp.zeros((bh, bw), jnp.float32)
    sum_y = jnp.zeros((bh, bw), jnp.float32)
    result = jnp.zeros((bh, bw), jnp.float32)
    pen_acc = jnp.zeros((bh, bw), jnp.float32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            pen_t = pen_w.tap(dy, dx)
            if dy == 0 and dx == 0:
                w_ = jnp.ones((bh, bw), jnp.float32)
                s_t = center_s
            else:
                z_t = jnp.abs(z_w.tap(dy, dx)) * view_z_scale
                if first_pass:
                    s_t = _is_lit(pen_t)
                else:
                    s_t = s_w.tap(dy, dx)
                    s_t = s_t * s_t
                us = u + dx * inv_w
                vs = v + dy * inv_h
                sx, sy, sz = view_pos(us, vs, z_t)
                in_scr = ((us > 0.0) & (us < 1.0) & (vs > 0.0) & (vs < 1.0)) \
                    .astype(jnp.float32)
                d = nvx * sx + nvy * sy + nvz * sz
                w_ = in_scr * _compute_weight(d, ga, gb)
                w_ = w_ * _both_lit_or_unlit(center_pen, pen_t)
                r2 = (dx * dx + dy * dy) / 4.0
                w_ = w_ * float(np.exp(-0.66 * r2))
            result = result + jnp.where(w_ == 0.0, 0.0, s_t * w_)
            sum_x = sum_x + w_
            w2 = w_ * pixel_size / (pixel_size + pen_t)
            w2 = w2 * (1.0 - _is_lit(pen_t))
            pen_acc = pen_acc + jnp.where(w2 == 0.0, 0.0, pen_t * w2)
            sum_y = sum_y + w2

    result = result / sum_x
    sum_x = jnp.ones((bh, bw), jnp.float32)
    penumbra = pen_acc / jnp.maximum(sum_y, NRD_EPS)
    sum_y = (sum_y != 0.0).astype(jnp.float32)

    pen_px = penumbra / pixel_size
    f = _smoothstep(0.0, 2.0, pen_px)
    result = center_s + (result - center_s) * f

    f4 = 4.0 + (1.0 - 4.0) * f
    result = result * f4
    penumbra = penumbra * f4
    sum_x = sum_x * f4
    sum_y = sum_y * f4

    # blur radius (GetKernelRadiusInPixels with scale = tile value)
    unclamped = penumbra / pixel_size * tile_value
    min_radius = jnp.minimum(unclamped, 2.0)
    blur_radius = jnp.clip(unclamped, min_radius, 32.0)

    inv_est_pen = 1.0 / jnp.maximum(penumbra, NRD_EPS)
    gauss = _gauss_weights()
    lw_all = _level_weights(blur_radius)

    # ---- sparse taps: 8 runtime dirs x static radius levels ----
    for k in range(8):
        dir_x = smem[_S_DIRS + 2 * k]
        dir_y = smem[_S_DIRS + 2 * k + 1]
        for li, lv in enumerate(RADIUS_LEVELS):
            off_x = jnp.round(dir_x * lv).astype(jnp.int32)
            off_y = jnp.round(dir_y * lv).astype(jnp.int32)
            off_x = jnp.clip(off_x, -32, 32)
            off_y = jnp.clip(off_y, -32, 32)

            pen_t = pen_w.tap_dyn(off_y, off_x)
            z_t = jnp.abs(z_w.tap_dyn(off_y, off_x)) * view_z_scale
            if first_pass:
                s_t = _is_lit(pen_t)
            else:
                s_t = s_w.tap_dyn(off_y, off_x)
                s_t = s_t * s_t

            us = u + off_x.astype(jnp.float32) * inv_w
            vs = v + off_y.astype(jnp.float32) * inv_h
            sx, sy, sz = view_pos(us, vs, z_t)
            in_screen = ((us > 0.0) & (us < 1.0) & (vs > 0.0) & (vs < 1.0)).astype(
                jnp.float32)
            d = nvx * sx + nvy * sy + nvz * sz
            w_ = in_screen * _compute_weight(d, ga, gb)
            w_ = w_ * _both_lit_or_unlit(center_pen, pen_t)
            w_ = w_ * gauss[k]
            w_ = w_ * jnp.clip(pen_t * inv_est_pen, 0.0, 1.0)
            w_ = w_ * lw_all[li]

            result = result + jnp.where(w_ == 0.0, 0.0, s_t * w_)
            sum_x = sum_x + w_
            w2 = w_ * pixel_size / (pixel_size + pen_t)
            w2 = w2 * (1.0 - _is_lit(pen_t))
            penumbra = penumbra + jnp.where(w2 == 0.0, 0.0, pen_t * w2)
            sum_y = sum_y + w2

    result_out = result / sum_x
    penumbra_out = jnp.where(sum_y == 0.0, center_pen,
                             penumbra / jnp.maximum(sum_y, NRD_EPS))
    shadow_out = jnp.sqrt(jnp.clip(result_out, 0.0, 1.0))
    center_packed = jnp.sqrt(jnp.clip(center_s, 0.0, 1.0))

    no_denoise = (tile_value == 0.0) | (center_pen == 0.0) \
        | (view_z > smem[_S_MISC + 3])
    s_out[:, :] = jnp.where(no_denoise, center_packed, shadow_out)
    pen_out[:, :] = jnp.where(no_denoise, center_pen, penumbra_out)


def sigma_blur_pallas(sc, dc, penumbra_in, shadow_in, view_z_in, normal_roughness,
                      tiles_smoothed, *, first_pass: bool, channels: int,
                      rs_static=None):
    """Pallas SIGMA Blur/PostBlur. shadow_in None on first opaque pass.

    Returns (penumbra_out, shadow_packed_out (h, w, channels))."""
    h, w = penumbra_in.shape
    rs = 1.0 if rs_static else sc["resolution_scale"]
    tile_value = tiles.upsample_tile_value(tiles_smoothed, h, w, rs)

    rotator = sc["rotator"] if first_pass else sc["rotator_post"]
    scalars = _blur_scalars(sc, dc, rotator)

    assert channels == 1, "pallas SIGMA path is single-channel (translucency -> XLA path)"
    if shadow_in is None:
        shadow_img = jnp.zeros((h, w), jnp.float32)  # unused placeholder
    else:
        shadow_img = shadow_in[..., 0] if shadow_in.ndim == 3 else shadow_in

    pen_out, s_out = stencil_call(
        functools.partial(_sigma_blur_kernel, first_pass),
        [penumbra_in, view_z_in, shadow_img,
         normal_roughness[..., 0], normal_roughness[..., 1]],
        n_windows=5, n_out=2, halo=(HALO_Y, HALO_X), block=BLOCK,
        scalars=scalars, center_inputs=[tile_value])
    return pen_out, s_out[..., None]


# =============================================================================
# TemporalStabilization (fully in-kernel; block-base + tent-residual reprojection)
# =============================================================================

def _sigma_ts_kernel(channels, smem, bsm, wins, centers, outs, origin, scratch):
    """In-kernel part of TemporalStabilization: history gather + moments + clamp.

    All elementwise position math (both MV branches, prev-view plane distance threshold)
    happens XLA-side in sigma_ts_pallas and arrives as derived planes: per-pixel motion in
    pixels (mvy/mvx), the expected previous view-space depth (xv_prev_z), and the
    pre-masked disocclusion threshold (thr, includes in-screen and validity)."""
    pen_w = wins[0]
    s_ws = wins[1:1 + channels]
    pz_w = wins[1 + channels]
    hl_w = wins[2 + channels]
    hist_ws = wins[3 + channels:3 + 2 * channels]
    z_ref, exp_ref, thr_ref, mvy_ref, mvx_ref, tile_ref = centers
    out_refs = outs[:channels]
    hl_out = outs[channels]
    bh, bw = mvy_ref.shape[:2]

    stab_strength = smem[0]
    denoising_range = smem[1]

    i = pl.program_id(0)
    j = pl.program_id(1)
    base_y = bsm[0][i, j]
    base_x = bsm[1][i, j]

    pen = pen_w.tap()
    shadow = [sw.tap() for sw in s_ws]
    shadow = [t * t for t in shadow]
    view_z = z_ref[:, :]          # already |.| * view_z_scale
    xv_prev_z = exp_ref[:, :]
    mvy = mvy_ref[:, :]
    mvx = mvx_ref[:, :]
    tile_value = tile_ref[:, :]

    # ---- reprojection resolve (TS lines 110-163), block-base + tent-residual form ----
    qy, qx, valid = rp.residual_and_validity(mvy, mvx, base_y, base_x)
    qy = jnp.clip(qy, -1.0, 0.999)
    qx = jnp.clip(qx, -1.0, 0.999)
    thr = thr_ref[:, :] * valid - (1.0 - valid)  # invalid -> threshold < 0 rejects all

    # prev-frame windows arrive pre-shifted by the DMA base offset
    hist_acc = [jnp.zeros((bh, bw), jnp.float32) for _ in range(channels)]
    hl_acc = jnp.zeros((bh, bw), jnp.float32)
    wsum = jnp.zeros((bh, bw), jnp.float32)
    for dy in rp.TAPS:
        wy_ = rp.tent_weight(qy, dy)
        for dx in rp.TAPS:
            wgt = wy_ * rp.tent_weight(qx, dx)
            z_t = pz_w.tap(dy, dx)
            occ = (jnp.abs(z_t - xv_prev_z) <= thr).astype(jnp.float32)
            w_ = wgt * occ
            hist_acc = [a + hw.tap(dy, dx) * w_ for a, hw in zip(hist_acc, hist_ws)]
            hl_acc = hl_acc + hl_w.tap(dy, dx) * w_
            wsum = wsum + w_

    inv = jnp.where(wsum < 1e-4, 0.0, 1.0 / jnp.maximum(wsum, 1e-4))
    history = [jnp.clip(a * inv, 0.0, 1.0) for a in hist_acc]
    history = [t * t for t in history]  # unpack sqrt packing
    history_length = hl_acc * inv

    # ---- 5x5 moments (SIGMA_TemporalStabilization.hlsli:73-108), separable form ----
    # The tap weight factors: w(dy, dx) = match * g(dy) * g(dx) with the lit-match
    # binary in the tap -> match = (2*lit_c - 1) * lit_t + (1 - lit_c). So each moment
    # is two separable Gaussian blurs (over plane and lit*plane) combined per pixel:
    #   sum w * x = (2*lit_c - 1) * G[lit * x] + (1 - lit_c) * G[x]
    # 10 shifted-fma ops per blurred plane instead of 25 data-dependent taps.
    # (The reference's center tap uses w = 1, which equals match(center) * g(0)^2.)
    gv = [float(np.exp(-0.66 * (d * d) / 4.0)) for d in range(-2, 3)]

    def _sep_blur(v):
        acc = None
        for i, g in enumerate(gv):
            sl = v[:, i: i + bw] * jnp.float32(g)
            acc = sl if acc is None else acc + sl
        out = None
        for i, g in enumerate(gv):
            sl = acc[i: i + bh, :] * jnp.float32(g)
            out = sl if out is None else out + sl
        return out

    lit_e = _is_lit(pen_w.ext(2, 2))
    lit_c = lit_e[2: 2 + bh, 2: 2 + bw]
    bl_m = 2.0 * lit_c - 1.0
    bl_b = 1.0 - lit_c
    gsum = float(sum(gv)) ** 2
    msum = bl_m * _sep_blur(lit_e) + bl_b * gsum
    m1 = []
    m2 = []
    for sw in s_ws:
        t2 = jnp.square(sw.ext(2, 2))
        t4 = jnp.square(t2)
        m1.append(bl_m * _sep_blur(lit_e * t2) + bl_b * _sep_blur(t2))
        m2.append(bl_m * _sep_blur(lit_e * t4) + bl_b * _sep_blur(t4))
    m1 = [a / msum for a in m1]
    m2 = [a / msum for a in m2]
    sigma = [jnp.sqrt(jnp.abs(b - a * a)) for a, b in zip(m1, m2)]

    # ---- clamp + antilag + street magic (lines 165-194) ----
    sig_scale = 3.0 + (1.0 - 3.0) * (1.0 / (1.0 + history_length))
    hist_clamped = [jnp.clip(hh, a - sg * sig_scale, a + sg * sig_scale)
                    for hh, a, sg in zip(history, m1, sigma)]

    antilag = jnp.abs(hist_clamped[0] - history[0])
    antilag = jnp.sqrt(jnp.clip(antilag, 0.0, 1.0))
    antilag = jnp.clip(1.0 - antilag, 0.0, 1.0)
    history_length = history_length * antilag

    history_weight = history_length / (1.0 + history_length)
    street_magic = 0.6 * history_weight * antilag
    hist_clamped = [hc + (hh - hc) * street_magic
                    for hc, hh in zip(hist_clamped, history)]
    blend = jnp.minimum(stab_strength, history_weight)
    result = [sh + (hc - sh) * blend for sh, hc in zip(shadow, hist_clamped)]

    is_hard = (tile_value == 0.0) | (pen == 0.0)
    result = [jnp.where(is_hard, sh, r) for sh, r in zip(shadow, result)]
    history_length = jnp.where(is_hard, 7.0, history_length)
    new_hl = jnp.minimum(history_length + 1.0, 7.0)

    dead = view_z > denoising_range
    for c in range(channels):
        out_refs[c][:, :] = jnp.where(dead, jnp.sqrt(jnp.clip(shadow[c], 0.0, 1.0)),
                                      jnp.sqrt(jnp.clip(result[c], 0.0, 1.0)))
    hl_out[:, :] = jnp.where(dead, history_length, jnp.round(new_hl))


def sigma_ts_pallas(sc, dc, view_z_in, mv_in, penumbra, shadow_packed,
                    history_packed, prev_view_z, prev_history_len, tiles_smoothed,
                    *, channels: int, rs_static=None):
    """SIGMA TemporalStabilization. Returns (out, new_prev_view_z, new_hl).

    XLA side: elementwise position math only - both MV branches, the prev-view plane
    distance threshold (passes/sigma/kernels.py:294-366 semantics). No gathers, no pads.
    Kernel side: history/length gather (block-base + tent residual), 5x5 moments,
    sigma clamp, antilag."""
    from ..ops import resample

    h, w = view_z_in.shape
    rs = 1.0 if rs_static else sc["resolution_scale"]
    tile_value = tiles.upsample_tile_value(tiles_smoothed, h, w, rs)

    if shadow_packed.ndim == 2:
        shadow_packed = shadow_packed[..., None]
    if history_packed.ndim == 2:
        history_packed = history_packed[..., None]
    shadow_planes = [shadow_packed[..., c] for c in range(channels)]
    hist_planes = [history_packed[..., c] for c in range(channels)]

    uv = resample.pixel_uv_grid(h, w)
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]

    # current & previous positions (TS :110-132) - elementwise
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    w2v = jnp.asarray(sc["world_to_view"])
    x = xv @ w2v[:3, :3]
    mv = mv_in[..., :3] * sc["mv_scale"][None, None, :3]
    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    is_world_mv = sc["mv_scale"][3] != 0.0

    smb_uv_screen = uv + mv[..., :2]
    mv_z_computed = (x @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2] - view_z
    mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_z_computed, mv[..., 2])
    view_z_prev = view_z + mv_z
    xv_prev_local = nm.reconstruct_view_position(
        smb_uv_screen, sc["frustum_prev"][None, None, :], view_z_prev, sc["ortho_mode"])
    x_prev_screen = xv_prev_local @ w2v_prev[:3, :3] + sc["camera_delta"][None, None, :]

    x_prev_world = x + mv
    smb_uv_world = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_prev_world)

    x_prev = jnp.where(is_world_mv, x_prev_world, x_prev_screen)
    smb_pixel_uv = jnp.where(is_world_mv, smb_uv_world, smb_uv_screen)

    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    thr = nm.get_disocclusion_threshold(0.02, frustum_size, 1.0)
    thr = thr * resample.is_in_screen_nearest(smb_pixel_uv) - NRD_EPS
    xv_prev_z = (x_prev @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2]

    # motion in pixels relative to this pixel (prev rect == rect on the pallas path)
    rect_prev = sc["rect_size_prev"]
    mv_pix = smb_pixel_uv * rect_prev[None, None, :] - uv * jnp.asarray(
        [w, h], jnp.float32)[None, None, :]
    mv_pix_x, mv_pix_y = mv_pix[..., 0], mv_pix[..., 1]

    base_y, base_x = rp.block_motion_base(mv_pix_y, mv_pix_x, BLOCK,
                                          bound=(HALO_Y - 2, HALO_X - 2))

    scalars = jnp.stack([
        jnp.asarray(dc["stabilization_strength"], jnp.float32),
        jnp.asarray(sc["denoising_range"], jnp.float32),
    ])

    import functools as _ft
    outs = stencil_call2(
        _ft.partial(_sigma_ts_kernel, channels),
        [penumbra] + shadow_planes + [prev_view_z, prev_history_len] + hist_planes,
        n_out=channels + 1, halo=(HALO_Y, HALO_X), block=BLOCK,
        scalars=scalars, block_scalars=[base_y, base_x],
        center_inputs=[view_z, xv_prev_z, thr, mv_pix_y, mv_pix_x, tile_value],
        base_offset=(base_y, base_x),
        offset_windows=[False] * (1 + channels) + [True] * (2 + channels))

    out = jnp.stack(outs[:channels], -1)
    hl_out = outs[channels]
    dead = view_z > sc["denoising_range"]
    new_prev_view_z = jnp.where(dead, prev_view_z, view_z)
    new_hl = jnp.where(dead, prev_history_len, hl_out)
    return out, new_prev_view_z, new_hl
