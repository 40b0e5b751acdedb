"""SIGMA shadow denoiser kernels - TPU rebuilds of Shaders/Include/SIGMA_*.hlsli.

Pipeline (Source/Sigma.cpp:25-90, Source/Denoisers/Sigma_Shadow.hpp):
  ClassifyTiles -> SmoothTiles (1/16 res) -> [Copy] -> Blur -> PostBlur
  -> [TemporalStabilization] -> [SplitScreen]

All functions are pure jnp over (h, w[, c]) planes. The CTA/SMEM structure of the shaders
becomes whole-image shifted stencils (ops.stencil) and gathers (ops.resample); the tile-based
early-outs become multiplicative masks (dense predication - TPU-friendly), preserving the
arithmetic of the non-culled path exactly.

SIGMA_TYPE (float vs float4 w/ translucency, SIGMA_Config.hlsli:39-43) is a static `channels`
switch: shadow planes are (h, w, c) with c = 1 or 4 (x = shadow, yzw = translucency).

Deliberate divergences from the HLSL (documented per SURVEY.md §7.3.5):
  - R32_UINT viewZ+3bit-history packing (SIGMA_TemporalStabilization.hlsli:25-31) is stored
    as two planes (prev_view_z f32, history_len f32) - packing was a bandwidth trick, planes
    are cheaper on TPU and keep full precision;
  - tile-map bicubic upsampling uses an exact 16-tap B-spline instead of the 4-bilinear-tap
    factorization (same filter, same values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import math as nm
from ...frontend import NRD_EPS, NRD_FP16_MAX
from ...ops import resample, stencil, tiles

# SIGMA_Config.hlsli:29-36
SIGMA_MAX_PIXEL_RADIUS = 32.0
SIGMA_TS_SIGMA_SCALE = 3.0
SIGMA_MAX_ACCUM_FRAME_NUM = 7.0
SIGMA_POISSON_SAMPLES = nm.SPECIAL_8
NRD_DISOCCLUSION_THRESHOLD = 0.02  # Common.hlsli:67


def is_lit(penumbra):
    """IsLit macro (SIGMA_Common.hlsli:16)."""
    return (penumbra >= NRD_FP16_MAX).astype(jnp.float32)


def pack_shadow(s):
    """PackShadow = Math::Sqrt01 (SIGMA_Common.hlsli:15)."""
    return jnp.sqrt(nm.saturate(s))


def unpack_shadow(s):
    return s * s


def get_kernel_radius_in_pixels(hit_dist, unproject_z, scale=1.0):
    """GetKernelRadiusInPixels (SIGMA_Common.hlsli:23-35), 5x5 estimation variant."""
    unclamped = hit_dist / unproject_z * scale
    min_radius = jnp.minimum(unclamped, 2.0)
    return jnp.clip(unclamped, min_radius, SIGMA_MAX_PIXEL_RADIUS)


def are_both_lit_or_unlit(penumbra1, penumbra2):
    """AreBothLitOrUnlit (SIGMA_Common.hlsli:37-43): NoL-invalid (==0) agreement."""
    return ((penumbra1 == 0.0) == (penumbra2 == 0.0)).astype(jnp.float32)


# ---------------------------------------------------------------------------
# ClassifyTiles (SIGMA_ClassifyTiles.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("SIGMA/classify_tiles")
def classify_tiles(sc, penumbra, view_z, translucency=None):
    """Per-16x16-tile masks. Returns (th, tw, 3): x = needs-denoising, y = maxRadius/16,
    z = all-sky. Ballot counting (InterlockedAdd at :62-63) becomes tile_reduce sums."""
    view_z = jnp.abs(view_z) * sc["view_z_scale"]
    is_inf = (view_z > sc["denoising_range"]).astype(jnp.float32)
    is_shadow = (penumbra == 0.0).astype(jnp.float32)
    lit = is_lit(penumbra)

    if translucency is not None:
        is_opaque = (nm.luminance(translucency[..., 1:4]) < 0.003).astype(jnp.float32)
    else:
        is_opaque = jnp.ones_like(penumbra)

    lit_vote = jnp.maximum(jnp.maximum(lit, is_inf), is_shadow)
    umbra_vote = jnp.maximum(jnp.maximum((1.0 - lit) * is_opaque, is_inf), is_shadow)

    hit_dist = jnp.where(jnp.logical_or(lit > 0, is_inf > 0), 0.0, penumbra)
    pixel_size = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"], 1.0, view_z)
    pixel_radius = get_kernel_radius_in_pixels(hit_dist, pixel_size)

    n = tiles.TILE * tiles.TILE
    all_lit = (tiles.tile_reduce(lit_vote, "sum") == n).astype(jnp.float32)
    all_umbra = (tiles.tile_reduce(umbra_vote, "sum") == n).astype(jnp.float32)
    all_inf = (tiles.tile_reduce(is_inf, "sum") == n).astype(jnp.float32)
    max_radius = tiles.tile_reduce(pixel_radius, "max")

    x = 1.0 - jnp.maximum(all_lit, all_umbra)
    y = nm.saturate(max_radius / 16.0)
    return jnp.stack([x, y, all_inf], axis=-1)


# ---------------------------------------------------------------------------
# SmoothTiles (SIGMA_SmoothTiles.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("SIGMA/smooth_tiles")
def smooth_tiles(tile_map):
    """Gaussian dilation of the radius channel, width driven by the center radius.

    Returns (th, tw, 2): (isInf, blurred radius). GROUP 16x16, BORDER 1 -> 3x3 window.
    """
    center_y = tile_map[..., 1]
    k = 1.01 / (center_y + 0.01)
    blurry = jnp.zeros_like(center_y)
    wsum = jnp.zeros_like(center_y)
    for dy, dx in stencil.offsets_square(1):
        d2 = float(dy * dy + dx * dx)
        w = jnp.exp2(-k * d2)
        blurry = blurry + stencil.shifted(tile_map[..., 0], dy, dx, "edge") * w
        wsum = wsum + w
    blurry = blurry / wsum
    return jnp.stack([tile_map[..., 2], blurry], axis=-1)


# ---------------------------------------------------------------------------
# Blur / PostBlur (SIGMA_Blur.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("SIGMA/blur")
def blur(sc, dc, penumbra_in, shadow_in, view_z_in, normal_roughness, tiles_smoothed,
         *, first_pass: bool, translucent: bool, channels: int,
         normal_encoding, roughness_encoding):
    """Dense 5x5 penumbra estimation + sparse 8-tap Poisson shadow filter.

    shadow_in: None on the first pass of the opaque variant (derived as IsLit(penumbra),
    SIGMA_Blur.hlsli:24-35); on post pass it holds sqrt-packed values to unpack.
    Returns (penumbra_out, shadow_packed_out).
    """
    from ... import frontend as fe

    h, w = penumbra_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]

    if shadow_in is None:
        shadow = is_lit(penumbra_in)[..., None]
    else:
        shadow = shadow_in if shadow_in.ndim == 3 else shadow_in[..., None]
        if not first_pass:
            shadow = unpack_shadow(shadow)

    center_penumbra = penumbra_in
    center_shadow = shadow

    # tile value: bicubic upsample of the smoothed 1/16-res radius map (:67)
    tile_value = resample.sample_bicubic_bspline(
        tiles_smoothed[..., 1], uv * sc["resolution_scale"][None, None, :])
    sky_tile = tiles.tile_upsample_nearest(tiles_smoothed[..., 0], h, w)

    # geometry (:77-90)
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    n_world, _, _ = fe.unpack_normal_roughness(normal_roughness, normal_encoding,
                                               roughness_encoding)
    nv = n_world @ jnp.asarray(sc["world_to_view"])[:3, :3].T
    pixel_size = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"], 1.0, view_z)
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    # GetViewVector (SIGMA_Common.hlsli:18-21); ortho_mode is traced -> select
    vv = jnp.where(sc["ortho_mode"] == 0.0, nm.normalize(-xv),
                   jnp.asarray([0.0, 0.0, -1.0], jnp.float32))
    nov = jnp.abs(nm.dot(nv, vv))
    ga, gb = nm.get_geometry_weight_params(sc["plane_dist_sensitivity"], frustum_size, xv, nv)

    # ---- dense 5x5 estimation (:92-148), BORDER = 2 ----
    border = 2
    rect_size_inv = sc["rect_size_inv"][None, None, :]
    sum_x = jnp.zeros_like(view_z)
    sum_y = jnp.zeros_like(view_z)
    result = jnp.zeros_like(center_shadow)
    penumbra_acc = jnp.zeros_like(view_z)
    for dy, dx in stencil.offsets_square(border):
        penum = stencil.shifted(penumbra_in, dy, dx)
        zs = stencil.shifted(view_z, dy, dx)
        s = stencil.shifted(shadow, dy, dx)
        if dy == 0 and dx == 0:
            w_ = jnp.ones_like(view_z)
        else:
            uv_s = uv + jnp.asarray([dx, dy], jnp.float32) * rect_size_inv
            xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                               sc["ortho_mode"])
            w_ = nm.compute_weight(nm.dot(nv, xvs), ga, gb)
            w_ = w_ * are_both_lit_or_unlit(center_penumbra, penum)
            w_ = w_ * nm.get_gaussian_weight(float((dx * dx + dy * dy) ** 0.5) / border)
        result = result + jnp.where((w_ == 0.0)[..., None], 0.0, s * w_[..., None])
        sum_x = sum_x + w_
        w_ = w_ * pixel_size / (pixel_size + penum)
        w_ = w_ * (1.0 - is_lit(penum))
        penumbra_acc = penumbra_acc + jnp.where(w_ == 0.0, 0.0, penum * w_)
        sum_y = sum_y + w_

    result = result / sum_x[..., None]
    sum_x = jnp.ones_like(sum_x)
    penumbra = penumbra_acc / jnp.maximum(sum_y, NRD_EPS)
    sum_y = (sum_y != 0.0).astype(jnp.float32)

    # avoid blurry result if penumbra < BORDER px (:145-148)
    penumbra_in_pixels = penumbra / pixel_size
    f = nm.smoothstep(0.0, border, penumbra_in_pixels)
    result = nm.lerp(center_shadow, result, f[..., None])

    # ---- sparse 8-tap Poisson (:150-256) ----
    f4 = nm.lerp(4.0, 1.0, f)
    result = result * f4[..., None]
    penumbra = penumbra * f4
    sum_x = sum_x * f4
    sum_y = sum_y * f4

    blur_radius = get_kernel_radius_in_pixels(penumbra, pixel_size, tile_value)

    rotator = sc["rotator"] if first_pass else sc["rotator_post"]  # NRD_FRAME mode
    # SIGMA_USE_SCREEN_SPACE_SAMPLING == 1 (:168-174)
    skew = nm.lerp(1.0 - jnp.abs(nv[..., :2]), 1.0, nov[..., None])
    skew = skew / jnp.max(skew, axis=-1, keepdims=True)
    skew = skew * rect_size_inv * blur_radius[..., None]
    scaled_rotator = nm.scale_rotator(jnp.broadcast_to(rotator, uv.shape[:2] + (4,)), skew)

    inv_estimated_penumbra = 1.0 / jnp.maximum(penumbra, NRD_EPS)
    rect_size = sc["rect_size"][None, None, :]

    for tap in SIGMA_POISSON_SAMPLES:
        offset = jnp.asarray(tap[:2])
        uv_s = uv + nm.rotate_vector2(scaled_rotator, jnp.broadcast_to(offset, uv.shape))
        # snap to pixel center (:215)
        uv_s = (jnp.floor(uv_s * rect_size) + 0.5) / rect_size

        penum = resample.sample_nearest(penumbra_in, uv_s)
        zs = jnp.abs(resample.sample_nearest(view_z_in, uv_s)) * sc["view_z_scale"]
        if shadow_in is None:
            s = is_lit(penum)[..., None]
        else:
            s = resample.sample_nearest(shadow_in if shadow_in.ndim == 3
                                        else shadow_in[..., None], uv_s)
            if not first_pass:
                s = unpack_shadow(s)

        xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                           sc["ortho_mode"])
        w_ = resample.is_in_screen_nearest(uv_s)
        w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
        w_ = w_ * are_both_lit_or_unlit(center_penumbra, penum)
        w_ = w_ * nm.get_gaussian_weight(float(tap[2]))
        w_ = w_ * nm.saturate(penum * inv_estimated_penumbra)  # umbra-leak guard (:244)

        result = result + jnp.where((w_ == 0.0)[..., None], 0.0, s * w_[..., None])
        sum_x = sum_x + w_
        w_ = w_ * pixel_size / (pixel_size + penum)
        w_ = w_ * (1.0 - is_lit(penum))
        penumbra = penumbra + jnp.where(w_ == 0.0, 0.0, penum * w_)
        sum_y = sum_y + w_

    # final normalization (:258-259)
    result_out = result / sum_x[..., None]
    penumbra_out = jnp.where(sum_y == 0.0, center_penumbra,
                             penumbra / jnp.maximum(sum_y, NRD_EPS))
    shadow_out = pack_shadow(result_out)

    # passthrough / early-out masks (:51-75)
    center_packed = pack_shadow(center_shadow)
    no_denoise = jnp.logical_or(tile_value == 0.0, center_penumbra == 0.0)
    no_denoise = jnp.logical_or(no_denoise, sky_tile > 0.0)
    no_denoise = jnp.logical_or(no_denoise, view_z > sc["denoising_range"])

    shadow_final = jnp.where(no_denoise[..., None], center_packed, shadow_out)
    penumbra_final = jnp.where(no_denoise, center_penumbra, penumbra_out)
    if channels == 1:
        shadow_final = shadow_final[..., :1]
    return penumbra_final, shadow_final


# ---------------------------------------------------------------------------
# TemporalStabilization (SIGMA_TemporalStabilization.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("SIGMA/temporal_stabilization")
def temporal_stabilization(sc, dc, view_z_in, mv_in, penumbra, shadow_packed,
                           history_packed, prev_view_z, prev_history_len, tiles_smoothed,
                           *, channels: int):
    """Surface-motion reprojection + sigma-clamped history blend + antilag.

    Returns (out_shadow_packed, new_prev_view_z, new_history_len).
    `history_packed` is the previous frame's OUT_SHADOW_TRANSLUCENCY (sqrt-packed).
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]
    shadow = unpack_shadow(shadow_packed)
    input_center = shadow

    sky_tile = tiles.tile_upsample_nearest(tiles_smoothed[..., 0], h, w)
    tile_value = resample.sample_bicubic_bspline(
        tiles_smoothed[..., 1], uv * sc["resolution_scale"][None, None, :])
    is_hard_shadow = jnp.logical_or(tile_value == 0.0, penumbra == 0.0)

    # local 5x5 moments (:73-108), BORDER = 2
    border = 2
    m1 = jnp.zeros_like(shadow)
    m2 = jnp.zeros_like(shadow)
    wsum = jnp.zeros_like(view_z)
    for dy, dx in stencil.offsets_square(border):
        s = stencil.shifted(shadow, dy, dx)
        if dy == 0 and dx == 0:
            w_ = jnp.ones_like(view_z)
        else:
            penum_s = stencil.shifted(penumbra, dy, dx)
            w_ = are_both_lit_or_unlit(penumbra, penum_s)
            w_ = w_ * nm.get_gaussian_weight(float((dx * dx + dy * dy) ** 0.5) / border)
        m1 = m1 + s * w_[..., None]
        m2 = m2 + s * s * w_[..., None]
        wsum = wsum + w_
    m1 = m1 / wsum[..., None]
    m2 = m2 / wsum[..., None]
    sigma = nm.get_std_dev(m1, m2)

    # current & previous positions (:110-132)
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    w2v = jnp.asarray(sc["world_to_view"])
    x = xv @ w2v[:3, :3]  # RotateVectorInverse: R^T @ v  ==  v @ R
    mv = mv_in * sc["mv_scale"][None, None, :3]
    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    is_world_mv = sc["mv_scale"][3] != 0.0

    # screen-space MV branch (:118-127)
    smb_uv_screen = uv + mv[..., :2]
    mv_z_computed = (x @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2] - view_z
    mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_z_computed, mv[..., 2])
    view_z_prev = view_z + mv_z
    xv_prev_local = nm.reconstruct_view_position(
        smb_uv_screen, sc["frustum_prev"][None, None, :], view_z_prev, sc["ortho_mode"])
    x_prev_screen = xv_prev_local @ w2v_prev[:3, :3] + sc["camera_delta"][None, None, :]

    # world-space MV branch (:129-132)
    x_prev_world = x + mv
    smb_uv_world = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_prev_world)

    x_prev = jnp.where(is_world_mv, x_prev_world, x_prev_screen)
    smb_pixel_uv = jnp.where(is_world_mv, smb_uv_world, smb_uv_screen)

    # history length gather with disocclusion (:134-151)
    rect_size_prev = sc["rect_size_prev"]
    origin, frac = nm.bilinear_filter(smb_pixel_uv, rect_size_prev[None, None, :])
    z00, z10, z01, z11 = resample.gather_2x2(prev_view_z, origin)
    l00, l10, l01, l11 = resample.gather_2x2(prev_history_len, origin)
    prev_z4 = jnp.stack([z00, z10, z01, z11], -1)
    prev_len4 = jnp.stack([l00, l10, l01, l11], -1)

    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    disocclusion_threshold = nm.get_disocclusion_threshold(
        NRD_DISOCCLUSION_THRESHOLD, frustum_size, 1.0)
    disocclusion_threshold = disocclusion_threshold * resample.is_in_screen_nearest(
        smb_pixel_uv)
    disocclusion_threshold = disocclusion_threshold - NRD_EPS

    xv_prev = x_prev @ w2v_prev[:3, :3].T + w2v_prev[:3, 3]
    smb_plane_dist = jnp.abs(prev_z4 - xv_prev[..., 2:3])
    smb_occlusion = (smb_plane_dist <= disocclusion_threshold[..., None]).astype(jnp.float32)
    occ_weights = nm.get_bilinear_custom_weights(frac, smb_occlusion)
    history_length = nm.apply_bilinear_custom_weights(
        prev_len4[..., 0:1], prev_len4[..., 1:2], prev_len4[..., 2:3], prev_len4[..., 3:4],
        occ_weights)[..., 0]

    # sample history (:153-163)
    is_catrom = jnp.sum(occ_weights, -1) > 3.5
    sample_pos = nm.saturate(smb_pixel_uv) * rect_size_prev[None, None, :]
    history = resample.sample_catrom(history_packed, sample_pos, is_catrom, occ_weights)
    history = nm.saturate(history)
    history = unpack_shadow(history)

    # clamp history (:165-170)
    sigma = sigma * nm.lerp(SIGMA_TS_SIGMA_SCALE, 1.0, 1.0 / (1.0 + history_length))[..., None]
    history_clamped = jnp.clip(history, m1 - sigma, m1 + sigma)

    # antilag (:172-181)
    antilag = jnp.abs(history_clamped[..., 0] - history[..., 0])
    antilag = jnp.sqrt(nm.saturate(antilag))  # SIGMA_ADJUST_HISTORY_LENGTH_BY_ANTILAG == 1
    antilag = nm.saturate(1.0 - antilag)
    history_length = history_length * antilag

    # history weight + street magic (:183-194)
    history_weight = history_length / (1.0 + history_length)
    street_magic = 0.6 * history_weight * antilag
    history_clamped = nm.lerp(history_clamped, history, street_magic[..., None])
    result = nm.lerp(input_center, history_clamped,
                     jnp.minimum(dc["stabilization_strength"], history_weight)[..., None])

    # hard-shadow early-out (:65-71): passthrough + full history length
    result = jnp.where(is_hard_shadow[..., None], input_center, result)
    history_length = jnp.where(is_hard_shadow, SIGMA_MAX_ACCUM_FRAME_NUM, history_length)

    new_history_length = jnp.minimum(history_length + 1.0, SIGMA_MAX_ACCUM_FRAME_NUM)

    # sky / out-of-range: keep output = input, history length untouched semantics
    dead = jnp.logical_or(sky_tile > 0.0, view_z > sc["denoising_range"])
    out = jnp.where(dead[..., None], shadow_packed, pack_shadow(result))
    # 3-bit quantization parity with PackViewZAndHistoryLength (:25-31)
    new_history_length = jnp.round(jnp.where(dead, prev_history_len, new_history_length))
    new_prev_view_z = jnp.where(dead, prev_view_z, view_z)
    return out, new_prev_view_z, new_history_length


# ---------------------------------------------------------------------------
# SplitScreen (SIGMA_SplitScreen.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("SIGMA/split_screen")
def split_screen(sc, penumbra, view_z_in, out_shadow, translucency=None, *, channels: int):
    """Left `splitScreen` fraction shows the raw (hard) shadow input."""
    h, w = penumbra.shape
    view_z = jnp.abs(view_z_in) * sc["view_z_scale"]
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    if translucency is not None:
        s = translucency
    else:
        s = is_lit(penumbra)[..., None]
    s = s * (view_z < sc["denoising_range"]).astype(jnp.float32)[..., None]
    if channels == 1:
        s = s[..., :1]
    show_input = (u[None, :, None] <= sc["split_screen"])
    return jnp.where(show_input, s, out_shadow)
