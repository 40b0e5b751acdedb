"""Numpy parity oracle for the SIGMA pillars: Blur/PostBlur and TemporalStabilization.

Line-by-line transliterations of
  /root/reference/Shaders/Include/SIGMA_Blur.hlsli (dense 5x5 penumbra estimation
    lines 92-148 + sparse 8-tap Poisson filter lines 150-269, screen-space sampling -
    SIGMA_USE_SPARSE_BLUR=1, SIGMA_USE_SCREEN_SPACE_SAMPLING=1)
  /root/reference/Shaders/Include/SIGMA_TemporalStabilization.hlsli (local variance
    lines 73-108, reprojection + history-length gather lines 110-163, clamp/antilag/
    street-magic lines 165-226)
  /root/reference/Shaders/Include/SIGMA_Common.hlsli (IsLit, AreBothLitOrUnlit,
    GetKernelRadiusInPixels, PackShadow)
in plain numpy. Host constants (sc/dc dicts) come from the engine's camera/settings
port - the oracle transliterates the SHADERS, the host math is pinned separately by
tests/test_camera.py.

Assumptions encoded (and asserted by the driving test): rect == resource,
viewZScale = 1, all pixels within denoisingRange, no sky tiles, uniform live tile
value (tileValue = 1.0 everywhere - the tile machinery is pinned by
tests/test_sigma.py's classifier tests, this oracle pins the filter formulas).
"""

from __future__ import annotations

import numpy as np

from . import hlsl as H

F32 = np.float32

# SIGMA_Config.hlsli
SIGMA_POISSON_SAMPLE_NUM = 8        # :32
SIGMA_MAX_PIXEL_RADIUS = 32.0       # :34
SIGMA_TS_SIGMA_SCALE = 3.0          # :35
SIGMA_MAX_ACCUM_FRAME_NUM = 7.0     # :36
NRD_DISOCCLUSION_THRESHOLD = 0.02   # Common.hlsli:67
BORDER = 2


def is_lit(penumbra):
    """IsLit (SIGMA_Common.hlsli:14)."""
    return (penumbra >= np.float32(65504.0)).astype(F32)


def pack_shadow(s):
    """PackShadow = Math::Sqrt01 (SIGMA_Common.hlsli:13)."""
    return np.sqrt(H.saturate(s))


def unpack_shadow(s):
    """SIGMA_BackEnd_UnpackShadow (NRD.hlsli:516-519): s * s."""
    return s * s


def are_both_lit_or_unlit(p1, p2):
    """AreBothLitOrUnlit (SIGMA_Common.hlsli:35-41)."""
    return ((p1 == 0.0) == (p2 == 0.0)).astype(F32)


def get_kernel_radius_in_pixels(hit_dist, unproject_z, scale):
    """GetKernelRadiusInPixels (SIGMA_Common.hlsli:21-33),
    SIGMA_5X5_BLUR_RADIUS_ESTIMATION_KERNEL == 1."""
    unclamped = hit_dist / unproject_z * scale
    min_radius = np.minimum(unclamped, 2.0)
    return np.clip(unclamped, min_radius, SIGMA_MAX_PIXEL_RADIUS)


def _shift(img, dy, dx):
    """s_* groupshared tap at int offset, clamp-at-edge (Preload's clamp :16)."""
    h, w = img.shape[:2]
    ys = np.clip(np.arange(h) + dy, 0, h - 1)
    xs = np.clip(np.arange(w) + dx, 0, w - 1)
    return img[np.ix_(ys, xs)]


def blur(sc, dc, penumbra_in, shadow_in, view_z_in, normal_roughness,
         *, first_pass: bool, translucent: bool):
    """SIGMA_Blur.hlsli:77-269 with tileValue = 1 everywhere.

    shadow_in: None on the opaque first pass (derived as IsLit(penumbra), :24-29);
    sqrt-packed on the post pass. Returns (penumbra_out, shadow_packed_out)."""
    h, w = penumbra_in.shape
    view_z = np.abs(view_z_in) * F32(sc["view_z_scale"])
    uv = _pixel_uv(h, w)
    tile_value = np.ones((h, w), F32)

    if shadow_in is None:
        shadow = is_lit(penumbra_in)[..., None]
    else:
        shadow = shadow_in if shadow_in.ndim == 3 else shadow_in[..., None]
        if not first_pass:
            shadow = unpack_shadow(shadow)

    center_penumbra = penumbra_in
    center_shadow = shadow.copy()

    # Position / normal / parameters (:77-90)
    frustum = np.asarray(sc["frustum"], F32)
    ortho = float(sc["ortho_mode"])
    xv = H.reconstruct_view_position(uv, frustum, view_z, ortho)
    n_world = H.unpack_normal_roughness(normal_roughness)[0]
    nv = H.rotate_vector(np.asarray(sc["world_to_view"]), n_world)
    pixel_size = H.pixel_radius_to_world(sc["unproject"], ortho, 1.0, view_z)
    frustum_size = H.get_frustum_size(sc["min_rect_dim_mul_unproject"], ortho, view_z)
    # GetViewVector (SIGMA_Common.hlsli:16-19), view space
    vv = (H.normalize(-xv) if ortho == 0.0
          else np.broadcast_to(np.asarray([0, 0, -1], F32), xv.shape))
    nov = np.abs(np.sum(nv * vv, -1))
    ga, gb = H.get_geometry_weight_params(sc["plane_dist_sensitivity"], frustum_size,
                                          xv, nv, 0.0)

    # ---- dense 5x5 (:96-148) ----
    rect_size_inv = np.asarray([1.0 / w, 1.0 / h], F32)
    sum_x = np.zeros((h, w), F32)
    sum_y = np.zeros((h, w), F32)
    result = np.zeros_like(shadow)
    penumbra = np.zeros((h, w), F32)
    for j in range(2 * BORDER + 1):
        for i in range(2 * BORDER + 1):
            dy, dx = j - BORDER, i - BORDER
            penum = _shift(penumbra_in, dy, dx)
            zs = _shift(view_z, dy, dx)
            s = _shift(shadow, dy, dx)
            if dy == 0 and dx == 0:
                w_ = np.ones((h, w), F32)
            else:
                uv_s = uv + np.asarray([dx, dy], F32) * rect_size_inv
                xvs = H.reconstruct_view_position(uv_s, frustum, zs, ortho)
                w_ = H.compute_weight(np.sum(nv * xvs, -1), ga, gb)
                w_ = w_ * are_both_lit_or_unlit(center_penumbra, penum)
                w_ = w_ * H.get_gaussian_weight(
                    F32(np.hypot(dx, dy) / BORDER))
            result = result + np.where((w_ == 0.0)[..., None], 0.0, s * w_[..., None])
            sum_x = sum_x + w_
            w_ = w_ * pixel_size / (pixel_size + penum)
            w_ = w_ * (1.0 - is_lit(penum))
            penumbra = penumbra + np.where(w_ == 0.0, 0.0, penum * w_)
            sum_y = sum_y + w_

    result = result / sum_x[..., None]
    sum_x = np.ones_like(sum_x)
    penumbra = penumbra / np.maximum(sum_y, H.NRD_EPS)
    sum_y = (sum_y != 0.0).astype(F32)

    # avoid blurry result if penumbra < BORDER px (:145-148)
    penumbra_in_pixels = penumbra / pixel_size
    f = H.smoothstep(0.0, BORDER, penumbra_in_pixels)
    result = H.lerp(center_shadow, result, f[..., None])

    # ---- sparse (:150-256), SIGMA_USE_SPARSE_BLUR == 1 ----
    f4 = H.lerp(4.0, 1.0, f)
    result = result * f4[..., None]
    penumbra = penumbra * f4
    sum_x = sum_x * f4
    sum_y = sum_y * f4

    blur_radius = get_kernel_radius_in_pixels(penumbra, pixel_size, tile_value)

    rotator = np.asarray(sc["rotator"] if first_pass else sc["rotator_post"], F32)
    # SIGMA_USE_SCREEN_SPACE_SAMPLING == 1 (:168-174)
    skew = H.lerp(1.0 - np.abs(nv[..., :2]), 1.0, nov[..., None])
    skew = skew / np.max(skew, -1, keepdims=True)
    skew = skew * rect_size_inv * blur_radius[..., None]
    scaled_rotator = H.scale_rotator(np.broadcast_to(rotator, (h, w, 4)), skew)

    inv_estimated_penumbra = 1.0 / np.maximum(penumbra, H.NRD_EPS)
    rect_size = np.asarray([w, h], F32)

    for tap in H.G_SPECIAL8:
        offset = np.asarray(tap[:2], F32)
        uv_s = uv + H.rotate_vector2(scaled_rotator, np.broadcast_to(offset, uv.shape))
        # snap to the pixel center (:215)
        uv_s = (np.floor(uv_s * rect_size) + 0.5) / rect_size

        penum = H.sample_nearest(penumbra_in, uv_s)
        zs = np.abs(H.sample_nearest(view_z_in, uv_s)) * F32(sc["view_z_scale"])
        if shadow_in is None:
            s = is_lit(penum)[..., None]
        else:
            s = H.sample_nearest(shadow_in if shadow_in.ndim == 3
                                 else shadow_in[..., None], uv_s)
            if not first_pass:
                s = unpack_shadow(s)

        xvs = H.reconstruct_view_position(uv_s, frustum, zs, ortho)
        w_ = H.is_in_screen_nearest(uv_s)
        w_ = w_ * H.compute_weight(np.sum(nv * xvs, -1), ga, gb)
        w_ = w_ * are_both_lit_or_unlit(center_penumbra, penum)
        w_ = w_ * H.get_gaussian_weight(F32(tap[2]))
        w_ = w_ * H.saturate(penum * inv_estimated_penumbra)  # umbra-leak guard (:244)

        result = result + np.where((w_ == 0.0)[..., None], 0.0, s * w_[..., None])
        sum_x = sum_x + w_
        w_ = w_ * pixel_size / (pixel_size + penum)
        w_ = w_ * (1.0 - is_lit(penum))
        penumbra = penumbra + np.where(w_ == 0.0, 0.0, penum * w_)
        sum_y = sum_y + w_

    result_out = result / sum_x[..., None]
    penumbra_out = np.where(sum_y == 0.0, center_penumbra,
                            penumbra / np.maximum(sum_y, H.NRD_EPS))
    shadow_out = pack_shadow(result_out)

    # early-out passthrough (:70-76); tileValue = 1, so only centerPenumbra == 0
    no_denoise = center_penumbra == 0.0
    shadow_final = np.where(no_denoise[..., None], pack_shadow(center_shadow),
                            shadow_out)
    penumbra_final = np.where(no_denoise, center_penumbra, penumbra_out)
    return penumbra_final.astype(F32), shadow_final.astype(F32)


def temporal_stabilization(sc, dc, view_z_in, mv_in, penumbra, shadow_packed,
                           history_packed, prev_view_z, prev_history_len):
    """SIGMA_TemporalStabilization.hlsli:46-226 with tileValue = 1 everywhere.

    Returns (out_shadow_packed, new_prev_view_z, new_history_len)."""
    h, w = view_z_in.shape
    uv = _pixel_uv(h, w)
    view_z = np.abs(view_z_in) * F32(sc["view_z_scale"])
    shadow = unpack_shadow(shadow_packed)
    if shadow.ndim == 2:
        shadow = shadow[..., None]
    input_center = shadow
    is_hard_shadow = penumbra == 0.0  # tileValue = 1 (:63)

    # local variance, 5x5 (:73-108)
    m1 = np.zeros_like(shadow)
    m2 = np.zeros_like(shadow)
    wsum = np.zeros((h, w), F32)
    for j in range(2 * BORDER + 1):
        for i in range(2 * BORDER + 1):
            dy, dx = j - BORDER, i - BORDER
            s = _shift(shadow, dy, dx)
            if dy == 0 and dx == 0:
                w_ = np.ones((h, w), F32)
            else:
                penum_s = _shift(penumbra, dy, dx)
                w_ = are_both_lit_or_unlit(penumbra, penum_s)
                w_ = w_ * H.get_gaussian_weight(F32(np.hypot(dx, dy) / BORDER))
            m1 = m1 + s * w_[..., None]
            m2 = m2 + s * s * w_[..., None]
            wsum = wsum + w_
    m1 = m1 / wsum[..., None]
    m2 = m2 / wsum[..., None]
    sigma = H.get_std_dev(m1, m2)

    # current and previous positions (:110-132)
    frustum = np.asarray(sc["frustum"], F32)
    ortho = float(sc["ortho_mode"])
    xv = H.reconstruct_view_position(uv, frustum, view_z, ortho)
    w2v = np.asarray(sc["world_to_view"])
    x = H.rotate_vector_inverse(w2v, xv)
    mv = mv_in * np.asarray(sc["mv_scale"], F32)[None, None, :3]
    w2v_prev = np.asarray(sc["world_to_view_prev"])
    if sc["mv_scale"][3] == 0.0:  # screen-space MV
        smb_pixel_uv = uv + mv[..., :2]
        if sc["mv_scale"][2] == 0.0:
            mv_z = H.affine_transform(w2v_prev, x)[..., 2] - view_z
        else:
            mv_z = mv[..., 2]
        view_z_prev = view_z + mv_z
        xv_prev_local = H.reconstruct_view_position(
            smb_pixel_uv, np.asarray(sc["frustum_prev"], F32), view_z_prev, ortho)
        x_prev = H.rotate_vector_inverse(w2v_prev, xv_prev_local) \
            + np.asarray(sc["camera_delta"], F32)[None, None, :]
    else:  # world-space MV
        x_prev = x + mv
        smb_pixel_uv = H.get_screen_uv(np.asarray(sc["world_to_clip_prev"]), x_prev)

    # history length gather with disocclusion (:134-151)
    rect_size_prev = np.asarray(sc["rect_size_prev"], F32)
    origin, frac = H.get_bilinear_filter(smb_pixel_uv, rect_size_prev)
    prev_z4 = H.gather_2x2(prev_view_z, origin)
    prev_len4 = H.gather_2x2(prev_history_len, origin)

    frustum_size = H.get_frustum_size(sc["min_rect_dim_mul_unproject"], ortho, view_z)
    disocclusion_threshold = H.get_disocclusion_threshold(
        NRD_DISOCCLUSION_THRESHOLD, frustum_size, 1.0)
    disocclusion_threshold = disocclusion_threshold * H.is_in_screen_nearest(
        smb_pixel_uv)
    disocclusion_threshold = disocclusion_threshold - H.NRD_EPS

    xv_prev = H.affine_transform(w2v_prev, x_prev)
    occ = [(np.abs(z - xv_prev[..., 2]) <= disocclusion_threshold).astype(F32)
           for z in prev_z4]
    occ_w = H.get_bilinear_custom_weights(frac, np.stack(occ, -1))
    history_length = H.apply_bilinear_custom_weights(
        prev_len4[0], prev_len4[1], prev_len4[2], prev_len4[3], occ_w)

    # sample history (:153-163). NOTE: the reference sums the bilinear-MODULATED
    # weights (sum <= 1), not the raw 0/1 occlusion as REBLUR TA does
    # (REBLUR_TemporalAccumulation.hlsli:272 vs SIGMA_TemporalStabilization
    # .hlsli:153) - so isCatRomAllowed is never true here. Transliterated as-is.
    is_catrom = np.sum(occ_w, -1) > 3.5
    history = H.catrom_with_bilinear_fallback(
        history_packed, H.saturate(smb_pixel_uv) * rect_size_prev, is_catrom, occ_w)
    history = H.saturate(history)
    history = unpack_shadow(history)
    if history.ndim == 2:
        history = history[..., None]

    # clamp history (:165-170)
    sigma = sigma * H.lerp(SIGMA_TS_SIGMA_SCALE, 1.0,
                           1.0 / (1.0 + history_length))[..., None]
    history_clamped = np.clip(history, m1 - sigma, m1 + sigma)

    # antilag (:172-181), SIGMA_ADJUST_HISTORY_LENGTH_BY_ANTILAG == 1
    antilag = np.abs(history_clamped[..., 0] - history[..., 0])
    antilag = np.sqrt(H.saturate(antilag))
    antilag = H.saturate(1.0 - antilag)
    history_length = history_length * antilag

    # history weight + street magic (:183-194)
    history_weight = history_length / (1.0 + history_length)
    street_magic = 0.6 * history_weight * antilag
    history_clamped = H.lerp(history_clamped, history, street_magic[..., None])
    result = H.lerp(input_center, history_clamped,
                    np.minimum(F32(dc["stabilization_strength"]),
                               history_weight)[..., None])

    # hard-shadow early-out (:65-71): passthrough + MAX history length
    result = np.where(is_hard_shadow[..., None], input_center, result)
    history_length = np.where(is_hard_shadow, SIGMA_MAX_ACCUM_FRAME_NUM,
                              history_length)

    # update + outputs (:220-226)
    new_history_length = np.minimum(history_length + 1.0, SIGMA_MAX_ACCUM_FRAME_NUM)
    out = pack_shadow(result)
    return (out.astype(F32), view_z.astype(F32),
            np.round(new_history_length).astype(F32))


def _pixel_uv(h, w):
    x = (np.arange(w, dtype=F32) + 0.5) / w
    y = (np.arange(h, dtype=F32) + 0.5) / h
    return np.stack(np.meshgrid(x, y), -1)
