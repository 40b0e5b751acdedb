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

HALO = 32                       # SIGMA_MAX_PIXEL_RADIUS (SIGMA_Config.hlsli:33)
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


def _decode_oct_normal(p):
    """_NRD_DecodeUnitVector for the R10G10B10A2 path; p: (..., 2) in [0,1]."""
    q = p * 2.0 - 1.0
    z = 1.0 - jnp.abs(q[..., 0]) - jnp.abs(q[..., 1])
    t = jnp.clip(-z, 0.0, 1.0)
    sgn = jnp.where(q >= 0.0, 1.0, -1.0)
    xy = q - t[..., None] * sgn
    n = jnp.concatenate([xy, z[..., None]], -1)
    return n * jax.lax.rsqrt(jnp.maximum(jnp.sum(n * n, -1, keepdims=True), 1e-15))


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


def _sigma_blur_kernel(channels, first_pass, smem, pen_ref, z_ref, s_ref, nr_ref,
                       tile_ref, pen_out, s_out):
    bh, bw = pen_out.shape[:2]
    halo = HALO
    i = pl.program_id(0)
    j = pl.program_id(1)
    y0 = (i * bh).astype(jnp.float32)
    x0 = (j * bw).astype(jnp.float32)

    view_z_scale = smem[_S_MISC + 4]
    rect_w = smem[_S_MISC + 5]
    rect_h = smem[_S_MISC + 6]
    inv_w = 1.0 / rect_w
    inv_h = 1.0 / rect_h

    def win(ref, dy, dx, c=None):
        if c is None:
            return ref[halo + dy: halo + dy + bh, halo + dx: halo + dx + bw]
        return ref[halo + dy: halo + dy + bh, halo + dx: halo + dx + bw, :]

    def win_dyn(ref, dy, dx, is3=False):
        if is3:
            return ref[pl.ds(halo + dy, bh), pl.ds(halo + dx, bw), :]
        return ref[pl.ds(halo + dy, bh), pl.ds(halo + dx, bw)]

    row = jax.lax.broadcasted_iota(jnp.float32, (bh, bw), 0)
    col = jax.lax.broadcasted_iota(jnp.float32, (bh, bw), 1)
    u = (x0 + col + 0.5) * inv_w
    v = (y0 + row + 0.5) * inv_h

    center_pen = win(pen_ref, 0, 0)
    view_z = jnp.abs(win(z_ref, 0, 0)) * view_z_scale
    tile_value = tile_ref[:, :]

    if first_pass and channels == 1:
        center_s = _is_lit(center_pen)[..., None]
    else:
        center_s = win(s_ref, 0, 0, c=True)
        if not first_pass:
            center_s = center_s * center_s  # unpack sqrt-packed shadow

    # geometry setup
    fx0, fy0, fdx, fdy = smem[_S_FRUSTUM], smem[_S_FRUSTUM + 1], \
        smem[_S_FRUSTUM + 2], smem[_S_FRUSTUM + 3]

    def view_pos(uu, vv, zz):
        x = (uu * fdx + fx0) * zz
        y = (vv * fdy + fy0) * zz
        return x, y, zz

    xvx, xvy, xvz = view_pos(u, v, view_z)

    nr = win(nr_ref, 0, 0, c=True)
    n_world = _decode_oct_normal(nr[..., :2])
    m = [smem[_S_W2V + k] for k in range(9)]
    nvx = m[0] * n_world[..., 0] + m[1] * n_world[..., 1] + m[2] * n_world[..., 2]
    nvy = m[3] * n_world[..., 0] + m[4] * n_world[..., 1] + m[5] * n_world[..., 2]
    nvz = m[6] * n_world[..., 0] + m[7] * n_world[..., 1] + m[8] * n_world[..., 2]

    unproject = smem[_S_MISC + 1]
    pixel_size = unproject * view_z
    frustum_size = smem[_S_MISC + 2] * view_z
    plane_sens = smem[_S_MISC]
    ga = 1.0 / (plane_sens * frustum_size)
    gb = -(nvx * xvx + nvy * xvy + nvz * xvz) * ga

    # ---- dense 5x5 (SIGMA_Blur.hlsli:92-148) ----
    sum_x = jnp.zeros((bh, bw), jnp.float32)
    sum_y = jnp.zeros((bh, bw), jnp.float32)
    result = jnp.zeros((bh, bw, channels), jnp.float32)
    pen_acc = jnp.zeros((bh, bw), jnp.float32)
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            pen_t = win(pen_ref, dy, dx)
            if dy == 0 and dx == 0:
                w_ = jnp.ones((bh, bw), jnp.float32)
                s_t = center_s
            else:
                z_t = jnp.abs(win(z_ref, dy, dx)) * view_z_scale
                if first_pass and channels == 1:
                    s_t = _is_lit(pen_t)[..., None]
                else:
                    s_t = win(s_ref, dy, dx, c=True)
                    if not first_pass:
                        s_t = s_t * s_t
                sx, sy, sz = view_pos(u + dx * inv_w, v + dy * inv_h, z_t)
                d = nvx * sx + nvy * sy + nvz * sz
                w_ = _compute_weight(d, ga, gb)
                w_ = w_ * _both_lit_or_unlit(center_pen, pen_t)
                r2 = (dx * dx + dy * dy) / 4.0
                w_ = w_ * float(np.exp(-0.66 * r2))
            result = result + jnp.where((w_ == 0.0)[..., None], 0.0, s_t * w_[..., None])
            sum_x = sum_x + w_
            w2 = w_ * pixel_size / (pixel_size + pen_t)
            w2 = w2 * (1.0 - _is_lit(pen_t))
            pen_acc = pen_acc + jnp.where(w2 == 0.0, 0.0, pen_t * w2)
            sum_y = sum_y + w2

    result = result / sum_x[..., None]
    sum_x = jnp.ones((bh, bw), jnp.float32)
    penumbra = pen_acc / jnp.maximum(sum_y, NRD_EPS)
    sum_y = (sum_y != 0.0).astype(jnp.float32)

    pen_px = penumbra / pixel_size
    f = _smoothstep(0.0, 2.0, pen_px)
    result = center_s + (result - center_s) * f[..., None]

    f4 = 4.0 + (1.0 - 4.0) * f
    result = result * f4[..., None]
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
            off_x = jnp.clip(off_x, -HALO, HALO)
            off_y = jnp.clip(off_y, -HALO, HALO)

            pen_t = win_dyn(pen_ref, off_y, off_x)
            z_t = jnp.abs(win_dyn(z_ref, off_y, off_x)) * view_z_scale
            if first_pass and channels == 1:
                s_t = _is_lit(pen_t)[..., None]
            else:
                s_t = win_dyn(s_ref, off_y, off_x, is3=True)
                if not first_pass:
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

            result = result + jnp.where((w_ == 0.0)[..., None], 0.0, s_t * w_[..., None])
            sum_x = sum_x + w_
            w2 = w_ * pixel_size / (pixel_size + pen_t)
            w2 = w2 * (1.0 - _is_lit(pen_t))
            pen_acc = pen_acc + 0.0  # penumbra accumulated below
            penumbra = penumbra + jnp.where(w2 == 0.0, 0.0, pen_t * w2)
            sum_y = sum_y + w2

    result_out = result / sum_x[..., None]
    penumbra_out = jnp.where(sum_y == 0.0, center_pen,
                             penumbra / jnp.maximum(sum_y, NRD_EPS))
    shadow_out = jnp.sqrt(jnp.clip(result_out, 0.0, 1.0))
    center_packed = jnp.sqrt(jnp.clip(center_s, 0.0, 1.0))

    no_denoise = (tile_value == 0.0) | (center_pen == 0.0) \
        | (view_z > smem[_S_MISC + 3])
    s_out[:, :, :] = jnp.where(no_denoise[..., None], center_packed, shadow_out)
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

    if shadow_in is None:
        shadow_img = jnp.zeros((h, w, 1), jnp.float32)  # unused placeholder
    else:
        shadow_img = shadow_in if shadow_in.ndim == 3 else shadow_in[..., None]

    bh, bw = BLOCK
    gh, gw = -(-h // bh), -(-w // bw)
    ph, pw = gh * bh, gw * bw
    halo = HALO

    def pad2(img):
        return jnp.pad(img, ((halo, halo + ph - h), (halo, halo + pw - w)), mode="edge")

    def pad3(img):
        return jnp.pad(img, ((halo, halo + ph - h), (halo, halo + pw - w), (0, 0)),
                       mode="edge")

    pen_p = pad2(penumbra_in)
    z_p = pad2(view_z_in)
    s_p = pad3(shadow_img)
    nr_p = pad3(normal_roughness)
    tile_p = jnp.pad(tile_value, ((0, ph - h), (0, pw - w)), mode="edge")

    win_h, win_w = bh + 2 * halo, bw + 2 * halo

    kernel = functools.partial(_sigma_blur_kernel, channels, first_pass)

    def body(smem, pen_hbm, z_hbm, s_hbm, nr_hbm, tile_ref, pen_out, s_out,
             pen_w, z_w, s_w, nr_w, sems):
        i = pl.program_id(0)
        j = pl.program_id(1)
        y0 = i * (pen_out.shape[0])
        x0 = j * (pen_out.shape[1])
        copies = [
            pltpu.make_async_copy(pen_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  pen_w, sems.at[0]),
            pltpu.make_async_copy(z_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w)],
                                  z_w, sems.at[1]),
            pltpu.make_async_copy(s_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w), :],
                                  s_w, sems.at[2]),
            pltpu.make_async_copy(nr_hbm.at[pl.ds(y0, win_h), pl.ds(x0, win_w), :],
                                  nr_w, sems.at[3]),
        ]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()
        kernel(smem, pen_w, z_w, s_w, nr_w, tile_ref, pen_out, s_out)

    pen_out, s_out = pl.pallas_call(
        body,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((bh, bw), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bh, bw, channels), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ph, pw), jnp.float32),
            jax.ShapeDtypeStruct((ph, pw, channels), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w), jnp.float32),
            pltpu.VMEM((win_h, win_w, shadow_img.shape[2]), jnp.float32),
            pltpu.VMEM((win_h, win_w, 4), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(scalars, pen_p, z_p, s_p, nr_p, tile_p)

    return pen_out[:h, :w], s_out[:h, :w, :]
