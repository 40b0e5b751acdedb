"""Pallas TPU kernels for the SIGMA pipeline (Blur/PostBlur + TemporalStabilization).

Same pass semantics as passes/sigma/kernels.py (the XLA reference path), re-expressed for
the VPU: each grid block DMAs a halo'd window into VMEM, fixed 5x5 taps are static-offset
vector loads, and the 8 rotated Poisson taps become loads at *runtime-uniform* integer
offsets (the per-frame rotator is a scalar) evaluated at a small set of static radius levels,
blended per pixel by a hat function over log-radius.

Documented divergences from the HLSL (quality-neutral by construction, see ARCHITECTURE.md):
  - per-pixel blur radius is quantized to RADIUS_LEVELS with linear blending instead of a
    continuous radius ("snap to the pixel center", SIGMA_Blur.hlsli:215, already quantizes
    tap positions to integers in the reference);
  - the anisotropic screen-space skew (SIGMA_Blur.hlsli:169-174, range ~[0.5, 1]) is folded
    into the radius magnitude instead of per-axis scaling.
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
from ..ops import resample, tiles

# Halo sizes: Y must keep the window sublane-aligned (multiple of 8), X must keep the
# window lane-aligned (multiple of 128). Both must cover SIGMA_MAX_PIXEL_RADIUS = 32.
HALO_Y = 32
HALO_X = 128
RADIUS_LEVELS = (2.0, 4.0, 7.0, 12.0, 20.0, 32.0)
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


def _sigma_blur_kernel(channels, first_pass, smem, pen_ref, z_ref, s_ref, nx_ref, ny_ref,
                       tile_ref, pen_out, s_out):
    bh, bw = pen_out.shape[:2]
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = (i * bh).astype(jnp.float32)
    x0 = (j * bw).astype(jnp.float32)

    view_z_scale = smem[_S_MISC + 4]
    rect_w = smem[_S_MISC + 5]
    rect_h = smem[_S_MISC + 6]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h

    # Mosaic requires aligned (multiple-of-8 sublane) ref slices; taps therefore load the
    # whole window once and use (dynamic) rolls + one aligned slice.
    _cache = {}

    def _val(ref):
        if id(ref) not in _cache:
            _cache[id(ref)] = ref[:, :]
        return _cache[id(ref)]

    def win(ref, dy, dx, c=None):
        val = _val(ref)
        if dy != 0:
            val = pltpu.roll(val, (-dy) % val.shape[0], 0)
        if dx != 0:
            val = pltpu.roll(val, (-dx) % val.shape[1], 1)
        return val[HALO_Y: HALO_Y + bh, HALO_X: HALO_X + bw]

    def win_dyn(ref, dy, dx, is3=False):
        val = _val(ref)
        val = pltpu.roll(val, jnp.mod(-dy, val.shape[0]), 0)
        val = pltpu.roll(val, jnp.mod(-dx, val.shape[1]), 1)
        return val[HALO_Y: HALO_Y + bh, HALO_X: HALO_X + bw]

    row = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 0).astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (bh, bw), 1).astype(jnp.float32)
    u = (x0 + col + 0.5) * inv_w
    v = (y0 + row + 0.5) * inv_h

    center_pen = win(pen_ref, 0, 0)
    view_z = jnp.abs(win(z_ref, 0, 0)) * view_z_scale
    tile_value = tile_ref[:, :]

    if first_pass:
        center_s = _is_lit(center_pen)
    else:
        center_s = win(s_ref, 0, 0)
        center_s = center_s * center_s  # unpack sqrt-packed shadow

    # geometry setup
    fx0, fy0, fdx, fdy = smem[_S_FRUSTUM], smem[_S_FRUSTUM + 1], \
        smem[_S_FRUSTUM + 2], smem[_S_FRUSTUM + 3]

    def view_pos(uu, vv, zz):
        x = (uu * fdx + fx0) * zz
        y = (vv * fdy + fy0) * zz
        return x, y, zz

    xvx, xvy, xvz = view_pos(u, v, view_z)

    nwx, nwy, nwz = _decode_oct_normal2(win(nx_ref, 0, 0), win(ny_ref, 0, 0))
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
            pen_t = win(pen_ref, dy, dx)
            if dy == 0 and dx == 0:
                w_ = jnp.ones((bh, bw), jnp.float32)
                s_t = center_s
            else:
                z_t = jnp.abs(win(z_ref, dy, dx)) * view_z_scale
                if first_pass:
                    s_t = _is_lit(pen_t)
                else:
                    s_t = win(s_ref, dy, dx)
                    s_t = s_t * s_t
                sx, sy, sz = view_pos(u + dx * inv_w, v + dy * inv_h, z_t)
                d = nvx * sx + nvy * sy + nvz * sz
                w_ = _compute_weight(d, ga, gb)
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

            pen_t = win_dyn(pen_ref, off_y, off_x)
            z_t = jnp.abs(win_dyn(z_ref, off_y, off_x)) * view_z_scale
            if first_pass:
                s_t = _is_lit(pen_t)
            else:
                s_t = win_dyn(s_ref, off_y, off_x)
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
                      tiles_smoothed, *, first_pass: bool, channels: int):
    """Pallas SIGMA Blur/PostBlur. shadow_in None on first opaque pass.

    Returns (penumbra_out, shadow_packed_out (h, w, channels))."""
    h, w = penumbra_in.shape
    uv = resample.pixel_uv_grid(h, w)
    tile_value = resample.sample_bicubic_bspline(
        tiles_smoothed[..., 1], uv * sc["resolution_scale"][None, None, :])
    sky = tiles.tile_upsample_nearest(tiles_smoothed[..., 0], h, w)
    tile_value = jnp.where(sky > 0.0, 0.0, tile_value)

    rotator = sc["rotator"] if first_pass else sc["rotator_post"]
    scalars = _blur_scalars(sc, dc, rotator)

    assert channels == 1, "pallas SIGMA path is single-channel (translucency -> XLA path)"
    if shadow_in is None:
        shadow_img = jnp.zeros((h, w), jnp.float32)  # unused placeholder
    else:
        shadow_img = shadow_in[..., 0] if shadow_in.ndim == 3 else shadow_in

    bh, bw = BLOCK
    gh, gw = -(-h // bh), -(-w // bw)
    ph, pw = gh * bh, gw * bw

    def pad2(img):
        return jnp.pad(img, ((HALO_Y, HALO_Y + ph - h), (HALO_X, HALO_X + pw - w)),
                       mode="edge")

    pen_p = pad2(penumbra_in)
    z_p = pad2(view_z_in)
    s_p = pad2(shadow_img)
    nx_p = pad2(normal_roughness[..., 0])
    ny_p = pad2(normal_roughness[..., 1])
    tile_p = jnp.pad(tile_value, ((0, ph - h), (0, pw - w)), mode="edge")

    win_h, win_w = bh + 2 * HALO_Y, bw + 2 * HALO_X

    kernel = functools.partial(_sigma_blur_kernel, channels, first_pass)

    def body(smem, pen_hbm, z_hbm, s_hbm, nx_hbm, ny_hbm, tile_ref, pen_out, s_out,
             pen_w, z_w, s_w, nx_w, ny_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        y0 = pl.multiple_of(i * pen_out.shape[0], 8)
        x0 = pl.multiple_of(j * pen_out.shape[1], 128)
        copies = [
            pltpu.make_async_copy(pen_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  pen_w, sems.at[0]),
            pltpu.make_async_copy(z_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  z_w, sems.at[1]),
            pltpu.make_async_copy(s_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  s_w, sems.at[2]),
            pltpu.make_async_copy(nx_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  nx_w, sems.at[3]),
            pltpu.make_async_copy(ny_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  ny_w, sems.at[4]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        kernel(smem, pen_w, z_w, s_w, nx_w, ny_w, tile_ref, pen_out, s_out)

    pen_out, s_out = pl.pallas_call(
        body,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((5,)),
        ],
    )(scalars, pen_p, z_p, s_p, nx_p, ny_p, tile_p)

    return pen_out[:h, :w], s_out[:h, :w][..., None]



# =============================================================================
# TemporalStabilization (hybrid)
# =============================================================================
#
# The reprojection resolve (surface-motion uv, 2x2 history/historyLength/prevViewZ taps with
# plane-distance occlusion, bilinear custom weights) is a handful of elementwise ops plus 12
# coherent gathers - small enough for the XLA path. The stencil work (5x5 moments) and the
# clamp/antilag arithmetic run in a Pallas kernel over halo'd windows.

TS_HALO_Y = 8
TS_HALO_X = 128  # lane alignment

_T_MISC = 0  # stabilization_strength, denoising_range, view_z_scale
_T_TOTAL = 3


def _sigma_ts_kernel(smem, pen_ref, z_ref, s_ref, hist_res_ref, hl_res_ref, tile_ref,
                     out_ref, hl_out):
    bh, bw = out_ref.shape[:2]

    stab_strength = smem[0]
    denoising_range = smem[1]
    view_z_scale = smem[2]

    _cache = {}

    def _val(ref):
        if id(ref) not in _cache:
            _cache[id(ref)] = ref[:, :]
        return _cache[id(ref)]

    def win2(ref, dy, dx):
        val = _val(ref)
        if dy != 0:
            val = pltpu.roll(val, (-dy) % val.shape[0], 0)
        if dx != 0:
            val = pltpu.roll(val, (-dx) % val.shape[1], 1)
        return val[TS_HALO_Y: TS_HALO_Y + bh, TS_HALO_X: TS_HALO_X + bw]

    pen = win2(pen_ref, 0, 0)
    view_z = jnp.abs(win2(z_ref, 0, 0)) * view_z_scale
    shadow = win2(s_ref, 0, 0)
    shadow = shadow * shadow
    tile_value = tile_ref[:, :]
    history = hist_res_ref[:, :]
    history = jnp.clip(history, 0.0, 1.0)
    history = history * history  # unpack
    history_length = hl_res_ref[:, :]

    # 5x5 moments (SIGMA_TemporalStabilization.hlsli:73-108)
    m1 = jnp.zeros((bh, bw), jnp.float32)
    m2 = jnp.zeros((bh, bw), jnp.float32)
    wsum = jnp.zeros((bh, bw), jnp.float32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            s_t = win2(s_ref, dy, dx)
            s_t = s_t * s_t
            if dy == 0 and dx == 0:
                w_ = jnp.ones((bh, bw), jnp.float32)
            else:
                p_t = win2(pen_ref, dy, dx)
                w_ = _both_lit_or_unlit(pen, p_t)
                r2 = (dx * dx + dy * dy) / 4.0
                w_ = w_ * float(np.exp(-0.66 * r2))
            m1 = m1 + s_t * w_
            m2 = m2 + s_t * s_t * w_
            wsum = wsum + w_
    m1 = m1 / wsum
    m2 = m2 / wsum
    sigma = jnp.sqrt(jnp.abs(m2 - m1 * m1))

    # clamp + antilag + street magic (lines 165-194)
    sigma_s = sigma * (3.0 + (1.0 - 3.0) * (1.0 / (1.0 + history_length)))
    hist_clamped = jnp.clip(history, m1 - sigma_s, m1 + sigma_s)

    antilag = jnp.abs(hist_clamped - history)
    antilag = jnp.sqrt(jnp.clip(antilag, 0.0, 1.0))
    antilag = jnp.clip(1.0 - antilag, 0.0, 1.0)
    history_length = history_length * antilag

    history_weight = history_length / (1.0 + history_length)
    street_magic = 0.6 * history_weight * antilag
    hist_clamped = hist_clamped + (history - hist_clamped) * street_magic
    result = shadow + (hist_clamped - shadow) * jnp.minimum(stab_strength, history_weight)

    is_hard = (tile_value == 0.0) | (pen == 0.0)
    result = jnp.where(is_hard, shadow, result)
    history_length = jnp.where(is_hard, 7.0, history_length)
    new_hl = jnp.minimum(history_length + 1.0, 7.0)

    dead = view_z > denoising_range
    out_ref[:, :] = jnp.where(dead, jnp.sqrt(jnp.clip(shadow, 0.0, 1.0)),
                              jnp.sqrt(jnp.clip(result, 0.0, 1.0)))
    hl_out[:, :] = jnp.where(dead, history_length, jnp.round(new_hl))


def sigma_ts_pallas(sc, dc, view_z_in, mv_in, penumbra, shadow_packed,
                    history_packed, prev_view_z, prev_history_len, tiles_smoothed,
                    *, channels: int):
    """Hybrid SIGMA TemporalStabilization. Returns (out_packed, new_prev_view_z, new_hl)."""
    assert channels == 1
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]
    tile_value = resample.sample_bicubic_bspline(
        tiles_smoothed[..., 1], uv * sc["resolution_scale"][None, None, :])
    sky = tiles.tile_upsample_nearest(tiles_smoothed[..., 0], h, w)
    tile_value = jnp.where(sky > 0.0, 0.0, tile_value)

    shadow_img = shadow_packed[..., 0] if shadow_packed.ndim == 3 else shadow_packed
    hist_img = history_packed[..., 0] if history_packed.ndim == 3 else history_packed

    # ---- XLA reprojection resolve (screen-space MV path, TS lines 110-163) ----
    mv = mv_in[..., :3] * sc["mv_scale"][None, None, :3]
    smb_uv = uv + mv[..., :2]
    view_z_prev_expected = view_z + mv[..., 2]

    rect = sc["rect_size"][None, None, :]
    origin, frac = nm.bilinear_filter(smb_uv, rect)
    z_taps = resample.gather_2x2(prev_view_z, origin)
    hl_taps = resample.gather_2x2(prev_history_len, origin)
    h_taps = resample.gather_2x2(hist_img, origin)

    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    in_screen = resample.is_in_screen_nearest(smb_uv)
    thr = frustum_size * 0.02 * in_screen - NRD_EPS

    occ = [(jnp.abs(jnp.abs(tz) * sc["view_z_scale"] - view_z_prev_expected) <= thr)
           .astype(jnp.float32) for tz in z_taps]
    bw_ = nm.bilinear_weights(frac)
    wts = jnp.stack([bw_[..., 0] * occ[0], bw_[..., 1] * occ[1],
                     bw_[..., 2] * occ[2], bw_[..., 3] * occ[3]], -1)
    wsum = jnp.sum(wts, -1)
    inv = jnp.where(wsum < 1e-4, 0.0, 1.0 / jnp.maximum(wsum, 1e-4))
    hist_res = (h_taps[0] * wts[..., 0] + h_taps[1] * wts[..., 1]
                + h_taps[2] * wts[..., 2] + h_taps[3] * wts[..., 3]) * inv
    hl_res = (hl_taps[0] * wts[..., 0] + hl_taps[1] * wts[..., 1]
              + hl_taps[2] * wts[..., 2] + hl_taps[3] * wts[..., 3]) * inv

    # ---- Pallas kernel for moments + clamp + antilag ----
    scalars = jnp.stack([
        jnp.asarray(dc["stabilization_strength"], jnp.float32),
        jnp.asarray(sc["denoising_range"], jnp.float32),
        jnp.asarray(sc["view_z_scale"], jnp.float32),
    ])
    bh, bw2 = BLOCK
    gh, gw = -(-h // bh), -(-w // bw2)
    ph, pw = gh * bh, gw * bw2

    def padh(img):
        return jnp.pad(img, ((TS_HALO_Y, TS_HALO_Y + ph - h),
                             (TS_HALO_X, TS_HALO_X + pw - w)), mode="edge")

    def pad0(img):
        return jnp.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    pen_p = padh(penumbra)
    z_p = padh(view_z_in)
    s_p = padh(shadow_img)
    hist_p = pad0(hist_res)
    hl_p = pad0(hl_res)
    tile_p = pad0(tile_value)

    win_h, win_w = bh + 2 * TS_HALO_Y, bw2 + 2 * TS_HALO_X

    def body(smem, pen_hbm, z_hbm, s_hbm, hist_ref, hl_ref, tile_ref, out_ref, hl_out,
             pen_w, z_w, s_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        y0 = pl.multiple_of(i * bh, 8)
        x0 = pl.multiple_of(j * bw2, 128)
        copies = [
            pltpu.make_async_copy(pen_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  pen_w, sems.at[0]),
            pltpu.make_async_copy(z_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  z_w, sems.at[1]),
            pltpu.make_async_copy(s_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  s_w, sems.at[2]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        _sigma_ts_kernel(smem, pen_w, z_w, s_w, hist_ref, hl_ref, tile_ref,
                         out_ref, hl_out)

    vmem_block = lambda: pl.BlockSpec((bh, bw2), lambda i, j: (i, j),
                                      memory_space=pltpu.VMEM)
    out, hl_out = pl.pallas_call(
        body,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            vmem_block(),
            vmem_block(),
            vmem_block(),
        ],
        out_specs=(vmem_block(), vmem_block()),
        out_shape=(
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )(scalars, pen_p, z_p, s_p, hist_p, hl_p, tile_p)

    out = out[:h, :w]
    new_hl = hl_out[:h, :w]
    dead = view_z > sc["denoising_range"]
    new_prev_view_z = jnp.where(dead, prev_view_z, view_z)
    new_hl = jnp.where(dead, prev_history_len, new_hl)
    return out[..., None], new_prev_view_z, new_hl
