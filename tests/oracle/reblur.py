"""Numpy parity oracle for the REBLUR pillars: TA (diffuse), spatial filter, history fix.

Line-by-line transliterations of
  /root/reference/Shaders/Include/REBLUR_TemporalAccumulation.hlsli (diffuse slice:
    surface-motion machinery lines 59-305 + diffuse accumulation lines 826-930)
  /root/reference/Shaders/Include/REBLUR_Common_DiffuseSpatialFilter.hlsli (BLUR /
    POST_BLUR modes, screen-space sampling - REBLUR_USE_SCREEN_SPACE_SAMPLING_FOR_DIFFUSE=1)
  /root/reference/Shaders/Include/REBLUR_HistoryFix.hlsli (diffuse half, lines 66-255)
in plain numpy. Host constants (sc/dc dicts) come from the engine's camera/settings
port - the oracle transliterates the SHADERS, the host math is pinned separately by
tests/test_camera.py.

Assumptions encoded (and asserted by the driving test): R10G10B10A2 normal encoding,
LINEAR roughness, no checkerboard, no confidence inputs, rect == resource,
viewZScale = 1, all pixels within denoisingRange (no sky early-outs).
"""

from __future__ import annotations

import numpy as np

from . import hlsl as H

F32 = np.float32

# REBLUR_Config.hlsli constants
REBLUR_PRE_BLUR_FRACTION_SCALE = 2.0            # :71
REBLUR_PRE_BLUR_NON_LINEAR_ACCUM_SPEED = 1.0 / 11.0  # :72
REBLUR_BLUR_FRACTION_SCALE = 1.0                # :75
REBLUR_POST_BLUR_FRACTION_SCALE = 0.5           # :78
REBLUR_POST_BLUR_RADIUS_SCALE = 2.0             # :79
REBLUR_ALMOST_ZERO_ANGLE = float(np.cos(np.deg2rad(89.0)))  # :82
REBLUR_SAMPLES_PER_FRAME = 1.0                  # :91
REBLUR_COLOR_CLAMPING_SIGMA_SCALE = 2.0         # :97 (non-perf)
# REBLUR_Common.hlsli firefly suppressor constants (values via passes/reblur/common.py
# which cites the same lines; re-stated here numerically)
FIREFLY_MAX_RELATIVE_INTENSITY = 38.0
FIREFLY_RADIUS_SCALE = 0.1
FIREFLY_FAST_RELATIVE_INTENSITY = 4.0

BLUR = "blur"
POST_BLUR = "post_blur"


def _pixel_uv(h, w):
    x = (np.arange(w, dtype=F32) + 0.5) / w
    y = (np.arange(h, dtype=F32) + 0.5) / h
    return np.stack(np.meshgrid(x, y), -1)


def _luma(sig):
    """GetLuma, YCoCg packing (REBLUR_Common.hlsli:212-218): .x."""
    return sig[..., 0]


def _change_luma(sig, new_luma):
    """ChangeLuma (REBLUR_Common.hlsli:221-226)."""
    scale = (new_luma + H.NRD_EPS) / (_luma(sig) + H.NRD_EPS)
    return np.concatenate([sig[..., :3] * scale[..., None], sig[..., 3:]], -1)


def _clamp_negative_to_zero(sig):
    """ClampNegativeToZero, YCoCg variant (REBLUR_Common.hlsli:228-240)."""
    rgb = H.linear_to_ycocg(H.ycocg_to_linear(sig[..., :3]))
    return np.concatenate([rgb, H.saturate(sig[..., 3:4])], -1)


def _min_hitdist_limit(dc, roughness=1.0):
    """GetMinAllowedLimitForHitDistNonLinearAccumSpeed (REBLUR_Common.hlsli:94-102)."""
    frame_num = 0.5 * H.get_spec_magic_curve(roughness) * dc["max_accumulated_frame_num"]
    return 1.0 / (1.0 + frame_num)


def _mix_history_and_current(dc, history, current, f, roughness=1.0):
    """MixHistoryAndCurrent, float4 (REBLUR_Common.hlsli:200-207)."""
    limit = _min_hitdist_limit(dc, roughness)
    xyz = H.lerp(history[..., :3], current[..., :3], f[..., None])
    w = H.lerp(history[..., 3], current[..., 3], np.maximum(f, limit))
    return np.concatenate([xyz, w[..., None]], -1)


def _fade_on_accum_frames(dc, accum_speed):
    """GetFadeBasedOnAccumulatedFrames (REBLUR_Common.hlsli:104-110)."""
    a = dc["history_fix_frame_num"] * 2.0 / 3.0 + 1e-6
    b = dc["history_fix_frame_num"] * 4.0 / 3.0 + 2e-6
    return H.linearstep(a, b, accum_speed)


# ---------------------------------------------------------------------------
# Diffuse spatial filter (REBLUR_Common_DiffuseSpatialFilter.hlsli)
# ---------------------------------------------------------------------------


def diffuse_spatial_filter(sc, dc, mode, signal, view_z_in, normal_roughness, data1,
                           use_exp_approx=False):
    """BLUR / POST_BLUR over a YCoCg float4 signal. Returns the filtered signal."""
    h, w = view_z_in.shape
    uv = _pixel_uv(h, w)
    view_z = H.unpack_view_z(view_z_in, float(sc["view_z_scale"]))
    n, roughness, material_id = H.unpack_normal_roughness(normal_roughness)

    frustum = np.asarray(sc["frustum"], F32)
    xv = H.reconstruct_view_position(uv, frustum, view_z, float(sc["ortho_mode"]))
    nv = H.rotate_vector(sc["world_to_view"], n)
    vv = -xv / np.maximum(np.linalg.norm(xv, axis=-1, keepdims=True), 1e-15)
    nov = np.abs(np.sum(nv * vv, -1))
    frustum_size = H.get_frustum_size(float(sc["min_rect_dim_mul_unproject"]),
                                      float(sc["ortho_mode"]), view_z)
    rotator = np.asarray(sc["rotator"] if mode == BLUR else sc["rotator_post"], F32)

    fraction_scale = REBLUR_BLUR_FRACTION_SCALE if mode == BLUR \
        else REBLUR_POST_BLUR_FRACTION_SCALE
    radius_scale = 1.0 if mode == BLUR else REBLUR_POST_BLUR_RADIUS_SCALE

    # Hit distance factor (:44-47)
    hit_dist_scale = H.hit_dist_normalization(view_z, dc["hit_dist_params"], 1.0)
    hit_dist = signal[..., 3] * hit_dist_scale
    hit_dist_factor = H.get_hit_dist_factor(hit_dist, frustum_size)

    # Blur radius (:52-67)
    boost = 1.0 - _fade_on_accum_frames(dc, data1)
    boost = boost * (1.0 - H.pow5(nov))
    nlas = 1.0 / (1.0 + REBLUR_SAMPLES_PER_FRAME * (1.0 - boost) * data1)
    blur_radius = dc["max_blur_radius"] * np.sqrt(H.saturate(hit_dist_factor * nlas))
    blur_radius = blur_radius * radius_scale
    blur_radius = np.maximum(blur_radius, dc["min_blur_radius"])

    # Weights (:70-80)
    ga, gb = H.get_geometry_weight_params(dc["plane_dist_sensitivity"], frustum_size,
                                          xv, nv, nlas)
    nwp = H.get_normal_weight_param(nlas, dc["lobe_angle_fraction"]) / fraction_scale
    ha, hb = H.get_hit_distance_weight_params(signal[..., 3], nlas)
    min_hdw = dc["min_hit_distance_weight"] * fraction_scale
    min_hdw = min_hdw * np.sqrt(nlas)  # :77-79 (not PRE_BLUR, not occlusion)

    # Screen-space settings (:82-93)
    skew = H.lerp(1.0 - np.abs(nv[..., :2]), 1.0, nov[..., None])
    skew = skew / np.max(skew, -1, keepdims=True)
    rect_inv = np.asarray([1.0 / w, 1.0 / h], F32)
    skew = skew * rect_inv * blur_radius[..., None]
    scaled_rotator = H.scale_rotator(np.broadcast_to(rotator, uv.shape[:2] + (4,)), skew)

    rect = np.asarray([w, h], F32)
    sum_ = np.ones((h, w), F32)
    acc = signal.copy()
    min_mat = float(dc["diff_min_material"])

    for tap in H.G_SPECIAL8:
        offset = tap[:2]
        uv_s = uv + H.rotate_vector2(scaled_rotator, np.broadcast_to(offset, uv.shape))
        uv_s = (np.floor(uv_s * rect) + 0.5) / rect  # snap to pixel center (:117)

        zs = H.unpack_view_z(H.sample_nearest(view_z_in, uv_s), float(sc["view_z_scale"]))
        ns, rs, ms = H.unpack_normal_roughness(H.sample_nearest(normal_roughness, uv_s))

        angle = H.acos_approx(np.sum(n * ns, -1))
        xvs = H.reconstruct_view_position(uv_s, frustum, zs, float(sc["ortho_mode"]))

        w_ = H.is_in_screen_nearest(uv_s)
        w_ = w_ * H.compute_weight(np.sum(nv * xvs, -1), ga, gb)
        w_ = w_ * (np.maximum(material_id, min_mat)
                   == np.maximum(ms, min_mat)).astype(F32)
        w_ = w_ * H.compute_weight(angle, nwp, 0.0)

        s = H.sample_nearest(signal, uv_s)
        s = np.where((w_ == 0.0)[..., None], 0.0, s)  # Denanify
        w_ = w_ * H.lerp(min_hdw, 1.0,
                         H.compute_exponential_weight(s[..., 3], ha, hb, use_exp_approx))
        w_ = w_ * H.get_gaussian_weight(float(tap[2]))

        sum_ = sum_ + w_
        acc = acc + s * w_[..., None]

    return acc / np.maximum(sum_, H.NRD_EPS)[..., None]


# ---------------------------------------------------------------------------
# History fix, diffuse half (REBLUR_HistoryFix.hlsli:66-255)
# ---------------------------------------------------------------------------


def history_fix_diffuse(sc, dc, view_z_in, normal_roughness, data1_diff, signal,
                        fast_history, use_exp_approx=False):
    """Returns (signal_out, fast_history_out)."""
    h, w = view_z_in.shape
    uv = _pixel_uv(h, w)
    view_z = H.unpack_view_z(view_z_in, float(sc["view_z_scale"]))
    n, roughness, material_id = H.unpack_normal_roughness(normal_roughness)
    frustum = np.asarray(sc["frustum"], F32)
    xv = H.reconstruct_view_position(uv, frustum, view_z, float(sc["ortho_mode"]))
    nv = H.rotate_vector(sc["world_to_view"], n)
    frustum_size = H.get_frustum_size(float(sc["min_rect_dim_mul_unproject"]),
                                      float(sc["ortho_mode"]), view_z)
    frame_num = data1_diff

    # Stride between taps (:63, :74-76)
    stride = dc["history_fix_base_pixel_stride"] / (2.0 + frame_num)
    stride = stride * (frame_num < dc["history_fix_frame_num"]).astype(F32)
    stride = np.floor(stride)

    # History reconstruction (:78-168)
    nlas = 1.0 / (1.0 + frame_num)
    nwp = H.get_normal_weight_param(nlas, dc["lobe_angle_fraction"])
    ga, gb = H.get_geometry_weight_params(dc["plane_dist_sensitivity"], frustum_size,
                                          xv, nv, nlas)
    sumd = 1.0 + frame_num
    hit_dist_scale = H.hit_dist_normalization(view_z, dc["hit_dist_params"], 1.0)
    hit_dist = signal[..., 3] * hit_dist_scale
    hit_dist_factor = H.get_hit_dist_factor(hit_dist, frustum_size)
    ha, hb = H.get_hit_distance_weight_params(hit_dist_factor, nlas, 1.0)

    acc = signal * sumd[..., None]
    min_mat = float(dc["diff_min_material"])
    rect = np.asarray([w, h], F32)
    rect_inv = 1.0 / rect
    px = np.floor(uv[..., 0] * w).astype(np.int64)
    py = np.floor(uv[..., 1] * h).astype(np.int64)
    stride_i = (stride + 0.5).astype(np.int64)

    for j in range(-2, 3):
        for i in range(-2, 3):
            if i == 0 and j == 0:
                continue
            if abs(i) + abs(j) == 4:
                continue
            uv_s = uv + np.stack([i * stride, j * stride], -1) * rect_inv
            pos_x = np.clip(px + i * stride_i, 0, w - 1)
            pos_y = np.clip(py + j * stride_i, 0, h - 1)

            zs = H.unpack_view_z(view_z_in[pos_y, pos_x], float(sc["view_z_scale"]))
            ns, _, ms = H.unpack_normal_roughness(normal_roughness[pos_y, pos_x])

            angle = H.acos_approx(np.sum(ns * n, -1))
            xvs = H.reconstruct_view_position(uv_s, frustum, zs, float(sc["ortho_mode"]))

            w_ = H.is_in_screen_nearest(uv_s)
            w_ = w_ * H.compute_weight(np.sum(nv * xvs, -1), ga, gb)
            w_ = w_ * (np.maximum(material_id, min_mat)
                       == np.maximum(ms, min_mat)).astype(F32)
            w_ = w_ * H.compute_exponential_weight(angle, nwp, 0.0, use_exp_approx)
            w_ = w_ * (1.0 + data1_diff[pos_y, pos_x])  # :140-142 (non-perf)

            s = signal[pos_y, pos_x]
            s = np.where((w_ == 0.0)[..., None], 0.0, s)
            hs = s[..., 3] * hit_dist_scale
            hs_factor = H.get_hit_dist_factor(hs, frustum_size)
            w_ = w_ * H.compute_exponential_weight(hs_factor, ha, hb, use_exp_approx)

            sumd = sumd + w_
            acc = acc + s * w_[..., None]

    recon = acc * H.positive_rcp(sumd)[..., None]
    diff = np.where((stride != 0.0)[..., None], recon, signal)

    # Local variance over the OLD fast history (:170-196)
    diff_center_old = fast_history
    m1 = diff_center_old.copy()
    m2 = diff_center_old * diff_center_old
    f = H.saturate(frame_num / (dc["history_fix_frame_num"] + H.NRD_EPS))
    diff_center = H.lerp(_luma(diff), diff_center_old, f)
    fast_out = diff_center

    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    for j in range(-1, 2):
        for i in range(-1, 2):
            if i == 0 and j == 0:
                continue
            d = fast_history[np.clip(ys + j, 0, h - 1), np.clip(xs + i, 0, w - 1)]
            m1 = m1 + d
            m2 = m2 + d * d

    diff_luma = _luma(diff)

    # (anti-firefly off: default ReblurSettings.enableAntiFirefly == false)

    # Fast history clamping (:230-241)
    m1 = m1 / 9.0
    m2 = m2 / 9.0
    sigma = H.get_std_dev(m1, m2) * REBLUR_COLOR_CLAMPING_SIGMA_SCALE
    clamped = np.clip(diff_luma, m1 - sigma, m1 + sigma)
    fast_is_shorter = float(dc["max_fast_accumulated_frame_num"]
                            < dc["max_accumulated_frame_num"])
    diff_luma = H.lerp(clamped, diff_luma,
                       1.0 / (1.0 + fast_is_shorter * frame_num * 2.0))

    return _change_luma(diff, diff_luma), fast_out


# ---------------------------------------------------------------------------
# Temporal accumulation, diffuse slice (REBLUR_TemporalAccumulation.hlsli)
# ---------------------------------------------------------------------------


def surface_motion(sc, dc, view_z_in, normal_roughness, mv_in, prev_view_z,
                   prev_normal_roughness, prev_diff_accum, prev_spec_accum,
                   prev_material):
    """Shared surface-motion machinery (TA lines 59-305): geometry, reprojection,
    16-tap occlusion footprint, accumulation-speed resolve, footprint quality.
    Returns the dict consumed by ta_diffuse and ta_specular."""
    h, w = view_z_in.shape
    uv = _pixel_uv(h, w)
    view_z = H.unpack_view_z(view_z_in, float(sc["view_z_scale"]))
    n, roughness, material_id = H.unpack_normal_roughness(normal_roughness)
    frustum = np.asarray(sc["frustum"], F32)
    xv = H.reconstruct_view_position(uv, frustum, view_z, float(sc["ortho_mode"]))
    x = H.rotate_vector(sc["view_to_world"], xv)  # camera-relative: no translation

    # Navg over the 2x2 upper-left quad (:72-99)
    n_avg = np.zeros_like(n)
    for dy, dx in ((-1, -1), (-1, 0), (0, -1), (0, 0)):
        ys = np.clip(np.arange(h)[:, None] + dy, 0, h - 1)
        xs = np.clip(np.arange(w)[None, :] + dx, 0, w - 1)
        ns, _, _ = H.unpack_normal_roughness(normal_roughness[ys, xs])
        n_avg = n_avg + ns
    n_avg = n_avg / 4.0

    # Previous position and surface motion uv (:136-155)
    mv = mv_in * np.asarray(sc["mv_scale"], F32)[None, None, :3]
    w2v_prev = np.asarray(sc["world_to_view_prev"], F32)
    is_world_mv = float(sc["mv_scale"][3]) != 0.0
    if is_world_mv:
        x_prev = x + mv
        smb_uv = H.get_screen_uv(sc["world_to_clip_prev"], x_prev)
    else:
        smb_uv = uv + mv[..., :2]
        if float(sc["mv_scale"][2]) == 0.0:
            mv_z = H.affine_transform(w2v_prev, x)[..., 2] - view_z
        else:
            mv_z = mv[..., 2]
        view_z_prev = view_z + mv_z
        xv_prev_local = H.reconstruct_view_position(
            smb_uv, np.asarray(sc["frustum_prev"], F32), view_z_prev,
            float(sc["ortho_mode"]))
        x_prev = xv_prev_local @ w2v_prev[:3, :3] \
            + np.asarray(sc["camera_delta"], F32)[None, None, :]

    # Previous viewZ 4x4 rooted at bilinear origin - 1 (:157-176)
    rect_prev = np.asarray(sc["rect_size_prev"], F32)
    bil_origin, bil_f = H.get_bilinear_filter(smb_uv, rect_prev)
    x0 = bil_origin[..., 0].astype(np.int64) - 1
    y0 = bil_origin[..., 1].astype(np.int64) - 1
    z_taps = [[H.unpack_view_z(H.texel_fetch(prev_view_z, x0 + i, y0 + j),
                               float(sc["view_z_scale"]))
               for i in range(4)] for j in range(4)]

    # Previous normal avg over the center 2x2, in-range weighted (:178-204)
    center_taps = ((1, 1), (2, 1), (1, 2), (2, 2))
    smb_navg = np.zeros_like(n)
    wsum = np.zeros((h, w), F32)
    for (tx, ty) in center_taps:
        w_ = (z_taps[ty][tx] < sc["denoising_range"]).astype(F32)
        npv, _, _ = H.unpack_normal_roughness(
            H.texel_fetch(prev_normal_roughness, x0 + tx, y0 + ty))
        smb_navg = smb_navg + npv * w_[..., None]
        wsum = wsum + w_
    smb_navg = smb_navg / np.where(wsum == 0.0, 1.0, wsum)[..., None]
    smb_navg = H.rotate_vector(sc["world_prev_to_world"], smb_navg)

    # Parallax (:206-211)
    cam_delta = np.asarray(sc["camera_delta"], F32)[None, None, :]
    ortho = float(sc["ortho_mode"])
    uv1 = smb_uv if ortho == 0.0 else uv
    uv2 = uv if ortho == 0.0 else smb_uv
    p1 = H.get_screen_uv(sc["world_to_clip_prev"], x_prev + cam_delta)
    p2 = H.get_screen_uv(sc["world_to_clip"], x_prev - cam_delta)
    rect = np.asarray([w, h], F32)
    par1 = np.linalg.norm((p1 - uv1) * rect, axis=-1)
    par2 = np.linalg.norm((p2 - uv2) * rect, axis=-1)
    parallax_max = np.maximum(par1, par2)
    parallax_min = np.minimum(par1, par2)

    # Disocclusion threshold (:216-236)
    frustum_size = H.get_frustum_size(float(sc["min_rect_dim_mul_unproject"]), ortho,
                                      view_z)
    dis_thr = H.lerp(sc["disocclusion_threshold"] + sc["disocclusion_threshold_bonus"],
                     sc["disocclusion_threshold_alternate"]
                     + sc["disocclusion_threshold_bonus"], 0.0)
    small_par = H.linearstep(0.25, 0.0, parallax_max)
    dis_thr = dis_thr + 0.05 * small_par
    v = -x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-15)
    nov = np.abs(np.sum(n * v, -1))
    nov_strict = H.lerp(nov, 1.0, H.saturate(parallax_max / 30.0))
    base_thr = H.get_disocclusion_threshold(dis_thr, frustum_size, nov_strict)
    navg_ok = (np.sum(smb_navg * n_avg, -1)
               > REBLUR_ALMOST_ZERO_ANGLE - 0.25 * small_par).astype(F32)
    in4 = H.is_in_screen_bilinear(bil_origin, rect_prev)
    quad_thr = [base_thr * navg_ok * in4[..., q] - H.NRD_EPS for q in range(4)]

    # Plane-distance occlusion, 16 taps (:238-247)
    xv_prev = H.affine_transform(w2v_prev, x_prev)
    occ = [[None] * 4 for _ in range(4)]
    for j in range(4):
        for i in range(4):
            q = (1 if i >= 2 else 0) + (2 if j >= 2 else 0)
            occ[j][i] = (np.abs(z_taps[j][i] - xv_prev[..., 2])
                        <= quad_thr[q]).astype(F32)

    # materialID occlusion (:249-266)
    min_mat = min(float(dc["spec_min_material"]), float(dc["diff_min_material"]))
    for j in range(4):
        for i in range(4):
            mats = H.texel_fetch(prev_material, x0 + i, y0 + j)
            same = (np.maximum(material_id, min_mat)
                    == np.maximum(mats, min_mat)).astype(F32)
            occ[j][i] = occ[j][i] * same

    # 2x2 occlusion weights, CatRom allowance, fbits (:271-283)
    occ_c = np.stack([occ[ty][tx] for (tx, ty) in center_taps], -1)
    occ_weights = H.get_bilinear_custom_weights(bil_f, occ_c)
    corner = {(0, 0), (3, 0), (0, 3), (3, 3)}
    occ12 = sum(occ[j][i] for j in range(4) for i in range(4) if (i, j) not in corner)
    allow_catrom = occ12 > 11.5
    fbits = occ_c[..., 0] + occ_c[..., 1] * 2.0 + occ_c[..., 2] * 4.0 + occ_c[..., 3] * 8.0

    # Accumulation speed from prev internal data (:285-294)
    d_taps = H.gather_2x2(prev_diff_accum, bil_origin)
    diff_accum = H.apply_bilinear_custom_weights(*d_taps, occ_weights)
    s_taps = H.gather_2x2(prev_spec_accum, bil_origin)
    spec_accum = H.apply_bilinear_custom_weights(*s_taps, occ_weights)

    # Footprint quality (:296-305)
    vprev = cam_delta - x_prev
    vprev = vprev / np.maximum(np.linalg.norm(vprev, axis=-1, keepdims=True), 1e-15)
    nov_prev = np.abs(np.sum(n * vprev, -1))
    size_q = (nov_prev + 1e-3) / (nov + 1e-3)
    size_q = H.lerp(0.1, 1.0, H.saturate(size_q * size_q))
    fq = np.sum(occ_c * H.bilinear_weights(bil_f), -1)
    fq = np.sqrt(H.saturate(fq)) * size_q

    pixel_size = H.pixel_radius_to_world(float(sc["unproject"]), ortho, 1.0, view_z)

    return dict(uv=uv, view_z=view_z, n=n, roughness=roughness,
                material_id=material_id, n_avg=n_avg, xv=xv, x=x, x_prev=x_prev,
                smb_uv=smb_uv, bil_origin=bil_origin, bil_f=bil_f, occ_c=occ_c,
                occ_weights=occ_weights, allow_catrom=allow_catrom, fbits=fbits,
                diff_accum=diff_accum, spec_accum=spec_accum, fq=fq,
                smb_navg=smb_navg, parallax1=par1, parallax_max=parallax_max,
                parallax_min=parallax_min, frustum_size=frustum_size, nov=nov, v=v,
                dis_thr=dis_thr, pixel_size=pixel_size)


def ta_diffuse(sc, dc, view_z_in, normal_roughness, mv_in, prev_view_z,
               prev_normal_roughness, prev_diff_accum, prev_spec_accum, prev_material,
               diff_input, diff_history, diff_fast_history):
    """Returns dict(diff, fast, accum_speed, fbits, footprint_quality)."""
    h, w = view_z_in.shape
    sm = surface_motion(sc, dc, view_z_in, normal_roughness, mv_in, prev_view_z,
                        prev_normal_roughness, prev_diff_accum, prev_spec_accum,
                        prev_material)
    rect_prev = np.asarray(sc["rect_size_prev"], F32)
    diff_accum = sm["diff_accum"]
    fq = sm["fq"]
    fbits = sm["fbits"]
    smb_uv = sm["smb_uv"]
    occ_weights = sm["occ_weights"]
    allow_catrom = sm["allow_catrom"]

    # ---- diffuse accumulation (:826-930) ----
    diff_accum = diff_accum * H.lerp(fq, 1.0, 1.0 / (1.0 + diff_accum))
    diff_accum = np.minimum(diff_accum, dc["max_accumulated_frame_num"])

    sample_pos = H.saturate(smb_uv) * rect_prev
    smb_hist = H.catrom_with_bilinear_fallback(diff_history, sample_pos, allow_catrom,
                                               occ_weights)
    smb_fast = H.bilinear_custom(diff_fast_history, np.floor(sample_pos - 0.5),
                                 occ_weights)
    smb_hist = _clamp_negative_to_zero(smb_hist)

    nlas = 1.0 / (1.0 + diff_accum)
    diff_result = _mix_history_and_current(dc, smb_hist, diff_input, nlas)

    # Firefly suppressor (:890-905)
    max_rel = dc["firefly_suppressor_min_relative_scale"] \
        + FIREFLY_MAX_RELATIVE_INTENSITY / (diff_accum + 1.0)
    anti = diff_accum * dc["max_blur_radius"] * FIREFLY_RADIUS_SCALE
    anti = anti / (1.0 + anti)
    luma = _luma(diff_result)
    luma_cl = np.minimum(luma, _luma(smb_hist) * max_rel)
    luma_cl = H.lerp(luma, luma_cl, anti)
    diff_result = _change_luma(diff_result, luma_cl)

    # Fast history (:913-926)
    fast_accum = np.minimum(diff_accum, dc["max_fast_accumulated_frame_num"])
    fast_nlas = 1.0 / (1.0 + fast_accum)
    fast = H.lerp(smb_fast, _luma(diff_input), fast_nlas)
    fast_cl = np.minimum(fast, _luma(smb_hist) * max_rel * FIREFLY_FAST_RELATIVE_INTENSITY)
    fast = H.lerp(fast, fast_cl, anti)

    return dict(diff=diff_result, fast=fast, accum_speed=diff_accum, fbits=fbits,
                footprint_quality=fq)


# ---------------------------------------------------------------------------
# Temporal accumulation, specular slice (REBLUR_TemporalAccumulation.hlsli:306-830)
# ---------------------------------------------------------------------------

NRD_CURVATURE_Z_THRESHOLD = 0.1           # Common.hlsli:72
REBLUR_NORMAL_ULP = 0.75 / 255.0          # Config:81 = NRD_NORMAL_ENCODING_ERROR (10-bit)
REBLUR_ROUGHNESS_SENSITIVITY_IN_TA = H.NRD_ROUGHNESS_SENSITIVITY * 0.3  # Config:89
PREV_PREV_ITERS = 1                       # Config:83


def ta_specular(sc, dc, view_z_in, normal_roughness, mv_in, prev_view_z,
                prev_normal_roughness, prev_diff_accum, prev_spec_accum,
                prev_material, spec_input, spec_history, spec_fast_history,
                hit_dist_for_tracking_in, prev_spec_hitdist_for_tracking,
                has_prepass_hitdist=False):
    """Specular TA: curvature along motion, GetXvirtual, virtual-motion confidence
    cascade, smb/vmb blend, firefly. Assumes: no checkerboard (specHasData), no
    confidence input, no SH, R10G10B10A2 normals, REBLUR_USE_STF = 1.

    Returns dict(spec, fast, accum_speed, fbits, curvature, virtual_history_amount,
    hdt, surface_confidence, virtual_confidence)."""
    h, w = view_z_in.shape
    sm = surface_motion(sc, dc, view_z_in, normal_roughness, mv_in, prev_view_z,
                        prev_normal_roughness, prev_diff_accum, prev_spec_accum,
                        prev_material)
    uv = sm["uv"]
    view_z = sm["view_z"]
    n = sm["n"]
    roughness = sm["roughness"]
    x, x_prev, v = sm["x"], sm["x_prev"], sm["v"]
    nov = sm["nov"]
    smb_uv = sm["smb_uv"]
    frustum_size = sm["frustum_size"]
    pixel_size = sm["pixel_size"]
    rect = np.asarray([w, h], F32)
    rect_inv = 1.0 / rect
    rect_prev = np.asarray(sc["rect_size_prev"], F32)
    cam_delta = np.asarray(sc["camera_delta"], F32)[None, None, :]
    ortho = float(sc["ortho_mode"])
    frustum = np.asarray(sc["frustum"], F32)
    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]
    px_i = np.broadcast_to(xs, (h, w))
    py_i = np.broadcast_to(ys, (h, w))

    # ---- prelude (:63-131): 3x3 min hitDistForTracking + roughness moments ----
    hdt_src = np.where(hit_dist_for_tracking_in == 0.0, F32(H.NRD_INF),
                       hit_dist_for_tracking_in)
    hdt = hdt_src.copy()
    rough_m1 = np.zeros((h, w), F32)
    rough_m2 = np.zeros((h, w), F32)
    for j in range(-1, 2):
        for i in range(-1, 2):
            yc = np.clip(ys + j, 0, h - 1)
            xc = np.clip(xs + i, 0, w - 1)
            hdt = np.minimum(hdt, hdt_src[yc, xc])
            _, rs, _ = H.unpack_normal_roughness(normal_roughness[yc, xc])
            rsq = rs * rs
            rough_m1 = rough_m1 + rsq
            rough_m2 = rough_m2 + rsq * rsq
    rough_m1 /= 9.0
    rough_m2 /= 9.0
    roughness_sigma = H.get_std_dev(rough_m1, rough_m2)
    roughness_modified = H.get_modified_roughness_from_normal_variance(
        roughness, sm["n_avg"])

    hit_dist_normalization = H.hit_dist_normalization(view_z, dc["hit_dist_params"],
                                                      roughness)
    hdt = np.where(hdt == H.NRD_INF, 0.0, hdt)
    if not has_prepass_hitdist:
        hdt = hdt * hit_dist_normalization
    hdt_out = hdt

    rng_state = H.hash_init(px_i, py_i, int(sc["frame_index"]))  # :117

    # ---- accumulation speed (:325-331) ----
    fq = sm["fq"]
    smb_accum = sm["spec_accum"]
    smb_accum = smb_accum * H.lerp(fq, 1.0, 1.0 / (1.0 + smb_accum))
    smb_accum = np.minimum(smb_accum, dc["max_accumulated_frame_num"])

    spec = spec_input

    # ---- curvature estimation along predicted motion (:356-447) ----
    uv_zero_par = smb_uv if ortho == 0.0 else uv
    delta_uv = (uv_zero_par - H.get_screen_uv(sc["world_to_clip_prev"],
                                              x_prev + cam_delta)) * rect
    delta_uv = delta_uv / np.maximum(sm["parallax1"], 1.0 / 256.0)[..., None]

    def edge_point(du, dv):
        uv_e = uv + np.stack([np.full((h, w), du, F32) * rect_inv[0],
                              np.full((h, w), dv, F32) * rect_inv[1]], -1)
        xv_e = H.reconstruct_view_position(uv_e, frustum, np.ones((h, w), F32), ortho)
        x_e = H.rotate_vector(sc["view_to_world"], xv_e)
        if ortho == 0.0:
            v_e = -H.normalize(x_e)
            o = np.zeros_like(x_e)
        else:
            vvw = np.asarray(sc["view_vector_world"], F32)
            v_e = np.broadcast_to(vvw, x_e.shape)
            o = x_e
        ndv = np.sum(n * v_e, -1)
        t = np.sum((x - o) * n, -1) / np.where(np.abs(ndv) < 1e-9, F32(1e-9), ndv)
        return o + v_e * t[..., None]

    x10 = edge_point(1.0, 0.0)
    x01 = edge_point(0.0, 1.0)
    n10, _, _ = H.unpack_normal_roughness(
        normal_roughness[ys, np.clip(xs + 1, 0, w - 1)])
    n01, _, _ = H.unpack_normal_roughness(
        normal_roughness[np.clip(ys + 1, 0, h - 1), xs])

    wmix = np.abs(delta_uv) + 1.0 / 256.0
    wmix = wmix / np.sum(wmix, -1, keepdims=True)
    x_c = x10 * wmix[..., 0:1] + x01 * wmix[..., 1:2]
    n_c = H.normalize(n10 * wmix[..., 0:1] + n01 * wmix[..., 1:2])

    # High parallax - flattens surface on high motion (:404-431); silhouette fix off
    bayer = H.bayer4x4(px_i, py_i, int(sc["frame_index"]))
    delta_uv_len_fixed = sm["parallax_min"] * (
        1.0 + float(sc["framerate_scale"]) * bayer)
    motion_uv_high = uv + (delta_uv_len_fixed[..., None] * delta_uv) * rect_inv
    motion_uv_high = (np.floor(motion_uv_high * rect) + 0.5) * rect_inv

    use_high = (delta_uv_len_fixed > 1.0) \
        & (H.is_in_screen_nearest(motion_uv_high) > 0.0)
    z_high = H.unpack_view_z(H.sample_nearest(view_z_in, motion_uv_high),
                             float(sc["view_z_scale"]))
    xv_high = H.reconstruct_view_position(motion_uv_high, frustum, z_high, ortho)
    x_high = H.rotate_vector(sc["view_to_world"], xv_high)
    n_high, _, _ = H.unpack_normal_roughness(
        H.sample_nearest(normal_roughness, motion_uv_high))
    z_err = np.abs(z_high - view_z) / np.maximum(np.maximum(z_high, view_z), H.NRD_EPS)
    repl = use_high & (z_err < NRD_CURVATURE_Z_THRESHOLD)
    n_c = np.where(repl[..., None], n_high, n_c)
    x_c = np.where(repl[..., None], x_high, x_c)

    edge = x_c - x
    edge_len_sq = np.sum(edge * edge, -1)
    curvature = np.sum((n_c - n) * edge, -1) * H.positive_rcp(edge_len_sq)

    # ---- virtual motion coordinates (:449-457) ----
    x_virtual = H.get_xvirtual(hdt, curvature, x, x_prev, n, v, roughness)
    x_virtual_len = H.length(x_virtual)
    vmb_uv = H.get_screen_uv(sc["world_to_clip_prev"], x_virtual)
    cam_attached = (sm["material_id"]
                    == float(sc["camera_attached_reflection_material_id"]))
    vmb_uv = np.where(cam_attached[..., None], smb_uv, vmb_uv)
    vmb_delta = vmb_uv - smb_uv
    vmb_traveled = H.length(vmb_delta * rect)

    # ---- virtual motion: roughness (:459-470) ----
    vmb_origin, vmb_f = H.get_bilinear_filter(vmb_uv, rect_prev)
    ra, rb = H.get_relaxed_roughness_weight_params(
        roughness * roughness, dc["roughness_fraction"],
        REBLUR_ROUGHNESS_SENSITIVITY_IN_TA)
    par_sm = H.smoothstep(1.0, 0.0, sm["parallax_max"])
    rough_w = []
    for tap in H.gather_2x2(prev_normal_roughness, vmb_origin):
        _, r_t, _ = H.unpack_normal_roughness(tap)
        w_ = H.compute_non_exponential_weight_with_sigma(r_t * r_t, ra, rb,
                                                         roughness_sigma)
        rough_w.append(H.lerp(par_sm, 1.0, w_))
    rough_w4 = np.stack(rough_w, -1)
    conf_rough = np.sum(rough_w4 * H.bilinear_weights(vmb_f), -1)

    # ---- virtual motion: normal, parallax (:472-479) ----
    vmb_uv_s, rng_state = H.stochastic_bilinear_uv(vmb_uv, rect_prev, rng_state)
    vmb_nr_raw = H.sample_nearest(prev_normal_roughness, vmb_uv_s)
    vmb_n_raw, vmb_rough, _ = H.unpack_normal_roughness(vmb_nr_raw)
    vmb_n = H.rotate_vector(sc["world_prev_to_world"], vmb_n_raw)
    dfactor = H.get_specular_dominant_factor(nov, roughness)
    conf_normal = 1.0 / (1.0 + 0.5 * dfactor
                         * H.saturate(H.length(n - vmb_n) - REBLUR_NORMAL_ULP)
                         * vmb_traveled)
    smb_navg = np.where((fq == 0.0)[..., None], vmb_n, sm["smb_navg"])

    # ---- virtual motion: disocclusion (:481-501) ----
    vmb_thr = sm["dis_thr"] * frustum_size
    vmb_thr = vmb_thr * H.lerp(0.25, 1.0, nov)
    vmb_thr = vmb_thr * (np.sum(vmb_n * n, -1) > REBLUR_ALMOST_ZERO_ANGLE)
    vmb_thr = vmb_thr * (np.sum(vmb_n * smb_navg, -1) > REBLUR_ALMOST_ZERO_ANGLE)
    thr4 = vmb_thr[..., None] * H.is_in_screen_bilinear(vmb_origin, rect_prev) \
        - H.NRD_EPS

    vmb_z4 = np.stack([H.unpack_view_z(t, float(sc["view_z_scale"]))
                       for t in H.gather_2x2(prev_view_z, vmb_origin)], -1)
    vmb_vv = H.reconstruct_view_position(vmb_uv, np.asarray(sc["frustum_prev"], F32),
                                         np.ones((h, w), F32), 0.0)
    vmb_v = H.rotate_vector_inverse(sc["world_to_view_prev"], vmb_vv)
    nox_curr = np.sum(n * (x_prev - cam_delta), -1)
    zterm = vmb_z4 if ortho == 0.0 else ortho
    nox_prev = (n[..., 0:1] * vmb_v[..., 0:1] + n[..., 1:2] * vmb_v[..., 1:2]) \
        * zterm + n[..., 2:3] * vmb_v[..., 2:3] * vmb_z4
    vmb_plane_dist = np.abs(nox_prev - nox_curr[..., None])
    vmb_occ = (vmb_plane_dist <= thr4).astype(F32)
    vmb_occ = vmb_occ * (rough_w4 >= 0.5).astype(F32)

    # materialID (:503-519)
    mat4 = np.stack(H.gather_2x2(prev_material, vmb_origin), -1)
    min_mat = float(dc["spec_min_material"])
    vmb_occ = vmb_occ * (np.maximum(sm["material_id"], min_mat)[..., None]
                         == np.maximum(mat4, min_mat)).astype(F32)

    fbits = sm["fbits"] + vmb_occ[..., 0] * 16.0 + vmb_occ[..., 1] * 32.0 \
        + vmb_occ[..., 2] * 64.0 + vmb_occ[..., 3] * 128.0

    # ---- virtual motion: accumulation speed (:521-535) ----
    vmb_weights = H.get_bilinear_custom_weights(vmb_f, vmb_occ)
    a_taps = H.gather_2x2(prev_spec_accum, vmb_origin)
    vmb_accum = H.apply_bilinear_custom_weights(*a_taps, vmb_weights)
    vmb_fq = np.sum(vmb_occ * H.bilinear_weights(vmb_f), -1)
    vmb_fq = np.sqrt(H.saturate(vmb_fq))
    vmb_accum = vmb_accum * H.lerp(vmb_fq, 1.0, 1.0 / (1.0 + vmb_accum))
    vmb_allow_catrom = (np.sum(vmb_occ, -1) > 3.5) & sm["allow_catrom"]

    # ---- curvature/lobe angles (:537-560) ----
    curv_tan = pixel_size * np.abs(curvature)
    curv_tan = curv_tan * np.maximum(vmb_traveled / np.maximum(nov, 0.01), 1.0)
    curv_tan = curv_tan * 2.0
    curvature_angle = np.arctan(curv_tan)
    percent = H.NRD_MAX_PERCENT_OF_LOBE_VOLUME / (1.0 + vmb_accum)
    lobe_tan = H.get_specular_lobe_tan_half_angle(roughness_modified, percent)
    lobe_half_angle = np.maximum(np.arctan(lobe_tan), REBLUR_NORMAL_ULP)

    # normal confidence: lobe overlap (:562-565)
    w_n = H.get_encoding_aware_normal_weight(n, vmb_n, lobe_half_angle,
                                             curvature_angle, REBLUR_NORMAL_ULP)
    w_n = H.lerp(H.smoothstep(1.0, 0.0, vmb_traveled), 1.0, w_n)
    conf_normal = np.minimum(conf_normal, w_n)

    # virtual history amount (:567-570)
    amount = H.smoothstep(0.05, 0.95, dfactor) * conf_normal

    # ---- parallax-based confidence (:572-594) ----
    hdt_prev = H.sample_bilinear(prev_spec_hitdist_for_tracking, vmb_uv)
    x_virtual_prev = H.get_xvirtual(hdt_prev, curvature, x, x_prev, n, v, roughness)
    vmb_uv_prev = H.get_screen_uv(sc["world_to_clip_prev"], x_virtual_prev)
    vmb_uv_prev = np.where(cam_attached[..., None], smb_uv, vmb_uv_prev)
    pixel_size_at_xv = H.pixel_radius_to_world(float(sc["unproject"]), ortho, 1.0,
                                               x_virtual_len)
    r_par = (lobe_tan + curvature_angle) * np.minimum(hdt, hdt_prev) \
        / np.maximum(pixel_size_at_xv, 1e-15)
    d_par = H.length((vmb_uv_prev - vmb_uv) * rect)
    r_par = np.maximum(r_par, 0.1)
    conf_par = H.linearstep(r_par, 0.0, d_par)

    # ---- prev-prev normal & roughness tests (:596-625) ----
    step_taps = np.minimum(vmb_traveled * float(sc["framerate_scale"]), 2.0) \
        + vmb_traveled / PREV_PREV_ITERS
    inv_len = 1.0 / np.sqrt(np.maximum(np.sum(vmb_delta * vmb_delta, -1), 1e-30))
    vmb_dir = vmb_delta * inv_len[..., None] / rect_prev
    ra2, rb2 = H.get_relaxed_roughness_weight_params(
        vmb_rough * vmb_rough, dc["roughness_fraction"],
        REBLUR_ROUGHNESS_SENSITIVITY_IN_TA)
    for it in range(1, PREV_PREV_ITERS + 1):
        uv_pp = vmb_uv + vmb_dir * (it * step_taps)[..., None]
        uv_pp_s, rng_state = H.stochastic_bilinear_uv(uv_pp, rect_prev, rng_state)
        nr_pp = H.sample_nearest(prev_normal_roughness, uv_pp_s)
        n_pp, r_pp, _ = H.unpack_normal_roughness(nr_pp)
        wx = H.get_encoding_aware_normal_weight(
            vmb_n_raw, n_pp, lobe_half_angle,
            curvature_angle * (1.0 + it * step_taps), REBLUR_NORMAL_ULP)
        wy = H.compute_non_exponential_weight_with_sigma(r_pp * r_pp, ra2, rb2,
                                                         roughness_sigma)
        wx = H.lerp(1.0, wx, H.saturate(step_taps))  # REBLUR_USE_STF == 1
        wy = H.lerp(1.0, wy, H.saturate(step_taps))
        in_s = H.is_in_screen_nearest(uv_pp) > 0.0
        wx = np.where(in_s, wx, 1.0)
        wy = np.where(in_s, wy, 1.0)
        conf_normal = np.minimum(conf_normal, wx)
        conf_rough = np.minimum(conf_rough, wy)

    # ---- confidences (:627-633) ----
    conf_for_smb_relax = conf_normal * conf_rough
    virtual_confidence = conf_normal * conf_rough * conf_par
    amount = amount * conf_rough

    # ---- sample surface history (:635-631+) ----
    sample_pos = H.saturate(smb_uv) * rect_prev
    smb_hist = H.catrom_with_bilinear_fallback(spec_history, sample_pos,
                                               sm["allow_catrom"], sm["occ_weights"])
    smb_fast = H.bilinear_custom(spec_fast_history, np.floor(sample_pos - 0.5),
                                 sm["occ_weights"])

    # ---- surface history confidence (:637-655) ----
    a_ang = np.arctan(sm["parallax_max"] * pixel_size / np.maximum(H.length(x), 1e-15))
    nlas_smb = 1.0 / (1.0 + smb_accum)
    h_mix = H.lerp(smb_hist[..., 3], spec[..., 3], nlas_smb) * hit_dist_normalization
    tana0 = H.get_specular_lobe_tan_half_angle(roughness_modified,
                                               H.NRD_MAX_PERCENT_OF_LOBE_VOLUME)
    tana0 = tana0 * H.lerp(nov, 1.0, roughness_modified)
    tana0 = tana0 * nlas_smb
    tana0 = tana0 / (H.get_hit_dist_factor(h_mix, frustum_size) + H.NRD_EPS)
    a0 = np.maximum(np.arctan(tana0), REBLUR_NORMAL_ULP)
    surface_confidence = np.power(H.saturate(H.linearstep(a0, 0.0, a_ang)), 4.0)

    # ---- responsive accumulation (:657-671) ----
    resp = H.remap_roughness_to_responsive_factor(
        roughness, float(dc["responsive_accumulation_roughness_threshold"]))
    smc = H.get_spec_magic_curve(roughness_modified)
    fx = np.sum(n * H.normalize(smb_navg), -1)
    fy = np.sum(n * vmb_n, -1)
    power = H.lerp(32.0, 1.0, smc) * (1.0 - resp)
    fx = H.lerp(smc, 1.0, resp) * np.power(H.saturate(fx), power)
    fy = H.lerp(smc, 1.0, resp) * np.power(H.saturate(fy), power)
    max_resp_x = np.maximum(dc["max_accumulated_frame_num"] * fx,
                            dc["history_fix_frame_num"])
    max_resp_y = np.maximum(dc["max_accumulated_frame_num"] * fy,
                            dc["history_fix_frame_num"])

    # ---- max allowed frames + clamping (:673-689) ----
    smb_max = dc["max_accumulated_frame_num"] * surface_confidence
    smb_max = np.minimum(smb_max, max_resp_x)
    smb_boosted_max = np.maximum(
        smb_max, dc["history_fix_frame_num"] * (1.0 - conf_for_smb_relax))
    smb_accum_boosted = np.minimum(smb_accum, smb_boosted_max)
    vmb_max = dc["max_accumulated_frame_num"] * virtual_confidence
    vmb_max = np.minimum(vmb_max, max_resp_y)
    smb_accum = np.minimum(smb_accum, smb_max)
    vmb_accum = np.minimum(vmb_accum, vmb_max)

    # ---- fallback (new logic, REBLUR_USE_OLD_SMB_FALLBACK_LOGIC == 0, :691-706) ----
    magic = np.where(vmb_accum > smb_accum, F32(8.0), F32(0.5))
    amount = amount * (1.0 + (vmb_accum - smb_accum)
                       / (magic * np.maximum(vmb_accum, smb_accum) + 1.0))
    amount = H.saturate(amount)

    # ---- sample virtual history (:712-726) ----
    vmb_sample_pos = H.saturate(vmb_uv) * rect_prev
    vmb_hist = H.catrom_with_bilinear_fallback(spec_history, vmb_sample_pos,
                                               vmb_allow_catrom, vmb_weights)
    vmb_fast = H.bilinear_custom(spec_fast_history, np.floor(vmb_sample_pos - 0.5),
                                 vmb_weights)

    smb_hist = _clamp_negative_to_zero(smb_hist)
    vmb_hist = _clamp_negative_to_zero(vmb_hist)

    # ---- accumulation (:732-760) ----
    smb_nlas = 1.0 / (1.0 + smb_accum)
    vmb_nlas = 1.0 / (1.0 + vmb_accum)
    smb_spec = _mix_history_and_current(dc, smb_hist, spec, smb_nlas,
                                        roughness_modified)
    vmb_spec = _mix_history_and_current(dc, vmb_hist, spec, vmb_nlas,
                                        roughness_modified)
    spec_result = H.lerp(smb_spec, vmb_spec, amount[..., None])
    accum_speed = H.lerp(smb_accum_boosted, vmb_accum, amount)
    spec_hist_mix = H.lerp(smb_hist, vmb_hist, amount[..., None])

    # ---- firefly suppressor (:762-777) ----
    max_rel = dc["firefly_suppressor_min_relative_scale"] \
        + FIREFLY_MAX_RELATIVE_INTENSITY / (accum_speed + 1.0)
    anti = accum_speed * dc["max_blur_radius"] * FIREFLY_RADIUS_SCALE
    anti = anti / (1.0 + anti)
    luma = _luma(spec_result)
    luma_cl = np.minimum(luma, _luma(spec_hist_mix) * max_rel)
    luma_cl = H.lerp(luma, luma_cl, anti)
    spec_result = _change_luma(spec_result, luma_cl)

    # ---- fast history (:786-795) ----
    smb_fast_nlas = H.get_non_linear_accum_speed(
        smb_accum, dc["max_fast_accumulated_frame_num"], surface_confidence, True)
    vmb_fast_nlas = H.get_non_linear_accum_speed(
        vmb_accum, dc["max_fast_accumulated_frame_num"], virtual_confidence, True)
    smb_fast_r = H.lerp(smb_fast, _luma(spec), smb_fast_nlas)
    vmb_fast_r = H.lerp(vmb_fast, _luma(spec), vmb_fast_nlas)
    fast = H.lerp(smb_fast_r, vmb_fast_r, amount)
    fast_cl = np.minimum(fast, _luma(spec_hist_mix) * max_rel
                         * FIREFLY_FAST_RELATIVE_INTENSITY)
    fast = H.lerp(fast, fast_cl, anti)

    return dict(spec=spec_result, fast=fast, accum_speed=accum_speed, fbits=fbits,
                curvature=curvature, virtual_history_amount=amount, hdt=hdt_out,
                surface_confidence=surface_confidence,
                virtual_confidence=virtual_confidence)


# ---------------------------------------------------------------------------
# Temporal stabilization (REBLUR_TemporalStabilization.hlsli:93-367)
# ---------------------------------------------------------------------------


def _compute_antilag(sc, dc, history, avg, sigma, accum_speed):
    """ComputeAntilag, REBLUR_ANTILAG_MODE == 2 (REBLUR_Common.hlsli:244-274)."""
    s = sigma * dc["antilag_params"][0]
    magic = dc["antilag_params"][1] * float(sc["framerate_scale"]) ** 2
    hc = np.clip(history, avg - s, avg + s)
    d = np.abs(history - hc) / (np.maximum(history, hc) + H.NRD_EPS)
    return 1.0 / (1.0 + d * accum_speed / magic)


def _ta_params(sc, quality, accum_speed):
    """GetTemporalAccumulationParams (REBLUR_Common.hlsli:297-306)."""
    a = accum_speed * REBLUR_SAMPLES_PER_FRAME
    w_ = quality * a / (1.0 + a)
    return w_, 1.0 + 3.0 * float(sc["framerate_scale"]) * w_


def temporal_stabilization(sc, dc, view_z_in, normal_roughness, mv_in, data1_diff,
                           data1_spec, fbits, curvature, virtual_history_amount,
                           diff, spec, diff_luma_stab_history,
                           spec_luma_stab_history):
    """Diffuse+specular TS: 3x3 moments + RCRS, antilag, history clamp, accum-speed
    increment. No SH / checkerboard / MV patching (basecolor absent) / prepass hdt.

    Returns dict(diff, spec, diff_luma_stab, spec_luma_stab, data1_diff, data1_spec,
    diff_antilag, spec_antilag)."""
    h, w = view_z_in.shape
    uv = _pixel_uv(h, w)
    view_z = H.unpack_view_z(view_z_in, float(sc["view_z_scale"]))
    n, roughness, material_id = H.unpack_normal_roughness(normal_roughness)
    frustum = np.asarray(sc["frustum"], F32)
    ortho = float(sc["ortho_mode"])
    xv = H.reconstruct_view_position(uv, frustum, view_z, ortho)
    x = H.rotate_vector(sc["view_to_world"], xv)
    rect_prev = np.asarray(sc["rect_size_prev"], F32)

    # surface motion uv + Xprev (:51-71, same block as the TA prelude)
    mv = mv_in * np.asarray(sc["mv_scale"], F32)[None, None, :3]
    w2v_prev = np.asarray(sc["world_to_view_prev"], F32)
    if float(sc["mv_scale"][3]) != 0.0:
        x_prev = x + mv
        smb_uv = H.get_screen_uv(sc["world_to_clip_prev"], x_prev)
    else:
        smb_uv = uv + mv[..., :2]
        if float(sc["mv_scale"][2]) == 0.0:
            mv_z = H.affine_transform(w2v_prev, x)[..., 2] - view_z
        else:
            mv_z = mv[..., 2]
        xv_prev_local = H.reconstruct_view_position(
            smb_uv, np.asarray(sc["frustum_prev"], F32), view_z + mv_z, ortho)
        x_prev = xv_prev_local @ w2v_prev[:3, :3] \
            + np.asarray(sc["camera_delta"], F32)[None, None, :]

    # surface footprint from the TA's occlusion bits (:86-93)
    fb = fbits.astype(np.int64)
    smb_occ = np.stack([((fb >> b) & 1).astype(F32) for b in range(4)], -1)
    smb_origin, smb_f = H.get_bilinear_filter(smb_uv, rect_prev)
    smb_weights = H.get_bilinear_custom_weights(smb_f, smb_occ)
    smb_allow_catrom = np.sum(smb_occ, -1) > 3.5
    smb_quality = np.sqrt(H.saturate(np.sum(smb_occ * H.bilinear_weights(smb_f), -1)))

    ys = np.arange(h)[:, None]
    xs = np.arange(w)[None, :]

    def moments_rcrs(luma):
        m1 = luma.copy()
        m2 = luma * luma
        lmin = np.full_like(luma, H.NRD_INF)
        lmax = np.full_like(luma, -H.NRD_INF)
        for j in range(-1, 2):
            for i in range(-1, 2):
                if i == 0 and j == 0:
                    continue
                t = luma[np.clip(ys + j, 0, h - 1), np.clip(xs + i, 0, w - 1)]
                m1 = m1 + t
                m2 = m2 + t * t
                lmin = np.minimum(lmin, t)
                lmax = np.maximum(lmax, t)
        m1 /= 9.0
        m2 /= 9.0
        sigma = H.get_std_dev(m1, m2)
        rcrs = np.where(dc["max_blur_radius"] != 0.0, np.clip(luma, lmin, lmax),
                        luma)
        return m1, sigma, rcrs

    out = {}

    # ---- diffuse (:96-185) ----
    d_luma = _luma(diff)
    m1, sigma, luma_rcrs = moments_rcrs(d_luma)
    smb_pos = H.saturate(smb_uv) * rect_prev
    smb_hist = H.catrom_with_bilinear_fallback(diff_luma_stab_history, smb_pos,
                                               smb_allow_catrom, smb_weights)
    smb_hist = np.maximum(smb_hist, 0.0)
    antilag = _compute_antilag(sc, dc, smb_hist, m1, sigma, smb_quality * data1_diff)
    taw, sig_scale = _ta_params(sc, smb_quality, data1_diff)
    hw = taw * antilag
    hw = hw * (uv[..., 0] >= float(sc["split_screen"]))
    hw = hw * (smb_uv[..., 0] >= float(sc["split_screen_prev"]))
    hist_cl = np.clip(smb_hist, m1 - sigma * sig_scale, m1 + sigma * sig_scale)
    d_stab = H.lerp(luma_rcrs, hist_cl, np.minimum(hw, dc["stabilization_strength"]))
    out["diff"] = _change_luma(diff, d_stab)
    out["diff_luma_stab"] = d_stab
    out["diff_antilag"] = antilag
    d1 = data1_diff + 1.0
    out["data1_diff"] = H.lerp(np.minimum(d1, dc["history_fix_frame_num"]), d1,
                               antilag)

    # ---- specular (:188-364) ----
    s_luma = _luma(spec)
    m1, sigma, luma_rcrs = moments_rcrs(s_luma)
    hdt = spec[..., 3] * H.hit_dist_normalization(view_z, dc["hit_dist_params"],
                                                  roughness)
    v = -x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-15)
    x_virtual = H.get_xvirtual(hdt, curvature, x, x_prev, n, v, roughness)
    vmb_uv = H.get_screen_uv(sc["world_to_clip_prev"], x_virtual)
    cam_attached = material_id == float(sc["camera_attached_reflection_material_id"])
    vmb_uv = np.where(cam_attached[..., None], uv, vmb_uv)

    vmb_occ = np.stack([((fb >> b) & 1).astype(F32) for b in range(4, 8)], -1)
    vmb_origin, vmb_f = H.get_bilinear_filter(vmb_uv, rect_prev)
    vmb_weights = H.get_bilinear_custom_weights(vmb_f, vmb_occ)
    vmb_allow_catrom = np.sum(vmb_occ, -1) > 3.5
    vmb_quality = np.sqrt(H.saturate(np.sum(vmb_occ * H.bilinear_weights(vmb_f), -1)))

    smb_hist = H.catrom_with_bilinear_fallback(spec_luma_stab_history, smb_pos,
                                               smb_allow_catrom, smb_weights)
    vmb_pos = H.saturate(vmb_uv) * rect_prev
    vmb_hist = H.catrom_with_bilinear_fallback(spec_luma_stab_history, vmb_pos,
                                               vmb_allow_catrom, vmb_weights)
    smb_hist = np.maximum(smb_hist, 0.0)
    vmb_hist = np.maximum(vmb_hist, 0.0)
    spec_hist = H.lerp(smb_hist, vmb_hist, virtual_history_amount)
    quality = H.lerp(smb_quality, vmb_quality, virtual_history_amount)
    antilag = _compute_antilag(sc, dc, spec_hist, m1, sigma, quality * data1_spec)
    taw, sig_scale = _ta_params(sc, quality, data1_spec)
    hw = taw * antilag
    hw = hw * (uv[..., 0] >= float(sc["split_screen"]))
    hw = hw * np.where(virtual_history_amount != 1.0,
                       (smb_uv[..., 0] >= float(sc["split_screen_prev"])).astype(F32),
                       F32(1.0))
    hw = hw * np.where(virtual_history_amount != 0.0,
                       (vmb_uv[..., 0] >= float(sc["split_screen_prev"])).astype(F32),
                       F32(1.0))
    resp = H.remap_roughness_to_responsive_factor(
        roughness, float(dc["responsive_accumulation_roughness_threshold"]))
    smc = H.get_spec_magic_curve(roughness)
    acceleration = H.lerp(smc, 1.0, 0.5 + resp * 0.5)
    hw = hw * np.where(material_id == float(sc["strand_material_id"]), F32(0.5),
                       acceleration)
    spec_hist = np.clip(spec_hist, m1 - sigma * sig_scale, m1 + sigma * sig_scale)
    s_stab = H.lerp(luma_rcrs, spec_hist, np.minimum(hw, dc["stabilization_strength"]))
    out["spec"] = _change_luma(spec, s_stab)
    out["spec_luma_stab"] = s_stab
    out["spec_antilag"] = antilag
    d1 = data1_spec + 1.0
    out["data1_spec"] = H.lerp(np.minimum(d1, dc["history_fix_frame_num"]), d1,
                               antilag)
    return out
