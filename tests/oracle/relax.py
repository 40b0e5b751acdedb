"""Numpy parity oracle for the RELAX pillars (part 1): the a-trous wavelet filter.

Line-by-line transliteration of
  /root/reference/Shaders/Include/RELAX_Atrous.hlsli (whole kernel: relaxed weight
    params lines 32-118, random big-step offsets lines 122-128, the 3x3 tap loop
    lines 130-223, variance-propagating normalization lines 225-243)
  /root/reference/Shaders/Include/RELAX_Common.hlsli (GetCurrentWorldPosFromPixelPos,
    GetPlaneDistanceWeight_Atrous, GetSpecLobeTanHalfAngle, GetNormalWeightParams_ATrous,
    GetSpecularNormalWeight_ATrous, GetNormalWeightParam2)
in plain numpy. Host constants (sc/dc dicts) come from the engine's camera/settings
port. The RELAX temporal-accumulation oracle lives in relax_ta.py.

Assumptions encoded (and asserted by the driving test): no confidence inputs
(gHasHistoryConfidence = 0), non-SH, iterations > 0 (the AtrousSmem variance
estimation of iteration 0 is pinned by relax scene tests), all pixels within
denoisingRange, no sky.
"""

from __future__ import annotations

import numpy as np

from . import hlsl as H

F32 = np.float32
RELAX_NORMAL_ULP = 1.5 / 255.0          # RELAX_Config.hlsli:15
_G3 = (0.44198, 0.27901)                # kernelWeightGaussian3x3 (RELAX_Atrous.hlsli:120)
LUMA = np.array([0.2126, 0.7152, 0.0722], F32)  # _NRD_Luminance (NRD.hlsli:350-354)


# ---- Rng::Hash (ml.hlsli PCG; port matches nrdtpu/math.py:208-237) ----

def hash_init(px, py, frame_index):
    x = px.astype(np.uint32)
    y = py.astype(np.uint32)
    f = np.uint32(frame_index)
    with np.errstate(over="ignore"):
        state = (x * np.uint32(1597334677) ^ y * np.uint32(3812015801)
                 ^ f * np.uint32(2798796415))
        return state * np.uint32(747796405) + np.uint32(2891336453)


def hash_next(state):
    with np.errstate(over="ignore"):
        state = state * np.uint32(747796405) + np.uint32(2891336453)
        word = (((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state)
                * np.uint32(277803737))
        return state, (word >> np.uint32(22)) ^ word


def hash_float(state):
    state, u = hash_next(state)
    # uint -> [0, 1): top 24 bits (matches nrdtpu/math.py:228-231; the reference's
    # ml.hlsli is not vendored in /root/reference, so the engine's convention is
    # the parity target for the jitter offsets)
    return state, (u >> np.uint32(8)).astype(F32) * F32(1.0 / 16777216.0)


def hash_float2(state):
    state, a = hash_float(state)
    state, b = hash_float(state)
    return state, np.stack([a, b], -1)


# ---- RELAX_Common helpers ----

def world_pos_from_pixel_pos(sc, px, py, view_z, h, w):
    """GetCurrentWorldPosFromPixelPos (RELAX_Common.hlsli:66-73)."""
    cx = (px.astype(F32) + 0.5) / w * 2.0 - 1.0
    cy = (py.astype(F32) + 0.5) / h * 2.0 - 1.0
    fwd = np.asarray(sc["frustum_forward"], F32)
    right = np.asarray(sc["frustum_right"], F32)
    up = np.asarray(sc["frustum_up"], F32)
    base = (fwd[None, None, :] + right[None, None, :] * cx[..., None]
            - up[None, None, :] * cy[..., None])
    if float(sc["ortho_mode"]) == 0.0:
        return view_z[..., None] * base
    return (view_z[..., None] * fwd[None, None, :]
            + right[None, None, :] * cx[..., None]
            - up[None, None, :] * cy[..., None])


def get_spec_lobe_tan_half_angle(roughness, percent_of_volume=0.75):
    """GetSpecLobeTanHalfAngle (RELAX_Common.hlsli:112-120)."""
    r = H.saturate(roughness)
    p = percent_of_volume
    return r * r * p / (1.0 - p + H.NRD_EPS)


def get_normal_weight_param2(roughness, angle_fraction):
    """GetNormalWeightParam2 (RELAX_Common.hlsli:155-161)."""
    angle = np.arctan(get_spec_lobe_tan_half_angle(roughness, angle_fraction))
    return 1.0 / np.maximum(angle, RELAX_NORMAL_ULP)


def get_normal_weight_params_atrous(roughness, history_len, spec_reproj_conf,
                                    normal_edge_relax, lobe_fraction, lobe_slack):
    """GetNormalWeightParams_ATrous (RELAX_Common.hlsli:122-141)."""
    relaxation = H.saturate(history_len / 5.0)
    relaxation = relaxation * H.lerp(1.0, spec_reproj_conf, normal_edge_relax)
    f = 0.9 + 0.1 * relaxation
    angle = np.arctan(get_spec_lobe_tan_half_angle(roughness, lobe_fraction))
    angle = angle * (10.0 - 9.0 * relaxation)
    angle = angle + lobe_slack
    angle = np.minimum(np.pi * 0.5, angle)
    return angle, f


def get_specular_normal_weight_atrous(angle0, f0, n0, n, v0, v):
    """GetSpecularNormalWeight_ATrous (RELAX_Common.hlsli:143-152)."""
    cosa = np.minimum(np.sum(n0 * n, -1), np.sum(v0 * v, -1))
    a = H.acos_approx(cosa)
    a = H.smoothstep(0.0, angle0, a)
    return H.saturate(1.0 - a * f0)


def _fetch(img, px, py):
    """gIn[p] with clamp addressing; the shader zeroes the weight out of screen."""
    return H.texel_fetch(img, px, py)


def atrous(sc, dc, view_z_in, normal_roughness, history_length,
           spec_reproj_confidence, diff, spec, *, step_size: int):
    """RELAX_Atrous.hlsli, iterations >= 1 (non-SH, no confidence inputs).

    diff/spec: (h, w, 4) = (rgb illumination, variance). Returns dict with
    'diff'/'spec' filtered (rgb, variance)."""
    h, w = view_z_in.shape
    view_z = np.abs(view_z_in) * F32(sc["view_z_scale"])
    n_world, roughness, material_id = _unpack_nr3(normal_roughness)
    history_length = history_length.astype(F32)

    # weight strictness relaxation (:32-38)
    dlf = F32(dc["lobe_angle_fraction"]) / np.sqrt(F32(step_size))
    dlf = H.lerp(F32(0.99), dlf, H.saturate(history_length / 5.0))

    out = {}
    py, px = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    center_pos = world_pos_from_pixel_pos(sc, px, py, view_z, h, w)
    center_v = -H.normalize(center_pos)
    depth_threshold = F32(dc["depth_threshold"]) * (
        view_z if float(sc["ortho_mode"]) == 0.0 else np.ones_like(view_z))

    # random offsets at big steps (:122-128)
    if step_size > 4:
        state = hash_init(px, py, sc["frame_index"])
        _, rnd = hash_float2(state)
        offset = np.floor(step_size * 0.5 * (rnd - 0.5)).astype(np.int64)
    else:
        offset = np.zeros((h, w, 2), np.int64)

    # specular params (:41-87)
    if spec is not None:
        center_spec = spec
        center_spec_l = center_spec[..., :3] @ LUMA
        spec_phi_inv = 1.0 / np.maximum(
            1e-4, F32(dc["spec_phi_luminance"]) * np.sqrt(center_spec[..., 3]))
        ra, rb = H.get_roughness_weight_params(roughness,
                                               F32(dc["roughness_fraction"]))
        spec_lum_relax = (H.lerp(1.0, spec_reproj_confidence,
                                 F32(dc["luminance_edge_stopping_relaxation"]))
                          if step_size <= 4 else np.ones_like(view_z))
        spec_nwp_simpl = get_normal_weight_param2(np.ones_like(roughness), dlf)
        angle0, f0 = get_normal_weight_params_atrous(
            roughness, history_length, spec_reproj_confidence,
            F32(dc["normal_edge_stopping_relaxation"]),
            F32(dc["lobe_angle_fraction"]), F32(dc["spec_lobe_angle_slack"]))
        w0 = F32(_G3[0] * _G3[0])
        sum_w_spec = np.full((h, w), w0, F32)
        sum_spec = center_spec * np.stack(
            [np.full((h, w), w0, F32)] * 3 + [np.full((h, w), w0 * w0, F32)], -1)

    # diffuse params (:90-118)
    if diff is not None:
        center_diff = diff
        center_diff_l = center_diff[..., :3] @ LUMA
        diff_phi_inv = 1.0 / np.maximum(
            1e-4, F32(dc["diff_phi_luminance"]) * np.sqrt(center_diff[..., 3]))
        diff_nwp = get_normal_weight_param2(np.ones_like(roughness), dlf)
        w0 = F32(_G3[0] * _G3[0])
        sum_w_diff = np.full((h, w), w0, F32)
        sum_diff = center_diff * np.stack(
            [np.full((h, w), w0, F32)] * 3 + [np.full((h, w), w0 * w0, F32)], -1)

    for yy in range(-1, 2):
        for xx in range(-1, 2):
            if xx == 0 and yy == 0:
                continue
            p_x = px + offset[..., 0] + xx * step_size
            p_y = py + offset[..., 1] + yy * step_size
            is_inside = ((p_x >= 0) & (p_y >= 0) & (p_x < w) & (p_y < h)).astype(F32)
            kernel = F32(_G3[abs(xx)] * _G3[abs(yy)])

            ns, rs, ms = _unpack_nr3(_fetch(normal_roughness, p_x, p_y))
            zs = np.abs(_fetch(view_z_in, p_x, p_y)) * F32(sc["view_z_scale"])
            sample_pos = world_pos_from_pixel_pos(sc, p_x, p_y, zs, h, w)

            # geometry weight (:158-162)
            plane_dist = np.abs(np.sum((sample_pos - center_pos) * n_world, -1))
            geom_w = (plane_dist < depth_threshold).astype(F32) * kernel
            geom_w = geom_w * is_inside * (zs < F32(sc["denoising_range"]))

            if spec is not None:
                sample_v = -H.normalize(
                    sample_pos + F32(dc["roughness_edge_stopping_relaxation"])
                    * center_pos)
                angles = H.acos_approx(np.sum(n_world * ns, -1))
                nw_simpl = H.compute_weight(angles, spec_nwp_simpl, 0.0)
                nw_spec = get_specular_normal_weight_atrous(
                    angle0, f0, n_world, ns, center_v, sample_v)
                rw_spec = H.compute_weight(rs, ra, rb)
                w_ = geom_w * (nw_spec * rw_spec
                               if float(dc["roughness_edge_stopping_enabled"]) != 0
                               else nw_simpl)
                w_ = w_ * _compare_materials(ms, material_id,
                                             dc["spec_min_material"])
                live = w_ > 1e-4        # (:179)
                s = _fetch(center_spec, p_x, p_y)
                sl = s[..., :3] @ LUMA
                lw = np.minimum(F32(dc["spec_max_luminance_relative_difference"]),
                                np.abs(center_spec_l - sl) * spec_phi_inv)
                lw = lw * spec_lum_relax
                w_ = np.where(live, w_ * np.exp(-lw), 0.0)
                sum_w_spec = sum_w_spec + w_
                sum_spec = sum_spec + s * np.stack([w_, w_, w_, w_ * w_], -1)

            if diff is not None:
                angled = H.acos_approx(np.sum(n_world * ns, -1))
                nw_diff = H.compute_weight(angled, diff_nwp, 0.0)
                w_ = geom_w * nw_diff
                w_ = w_ * _compare_materials(ms, material_id,
                                             dc["diff_min_material"])
                live = w_ > 1e-4        # (:207)
                s = _fetch(center_diff, p_x, p_y)
                sl = s[..., :3] @ LUMA
                lw = np.minimum(F32(dc["diff_max_luminance_relative_difference"]),
                                np.abs(center_diff_l - sl) * diff_phi_inv)
                w_ = np.where(live, w_ * np.exp(-lw), 0.0)
                sum_w_diff = sum_w_diff + w_
                sum_diff = sum_diff + s * np.stack([w_, w_, w_, w_ * w_], -1)

    if spec is not None:
        out["spec"] = sum_spec / np.stack(
            [sum_w_spec, sum_w_spec, sum_w_spec, sum_w_spec * sum_w_spec], -1)
    if diff is not None:
        out["diff"] = sum_diff / np.stack(
            [sum_w_diff, sum_w_diff, sum_w_diff, sum_w_diff * sum_w_diff], -1)
    return out


def _unpack_nr3(p):
    """NRD_FrontEnd_UnpackNormalAndRoughness with material id."""
    n = H._oct_decode(p[..., 0], p[..., 1])
    return n, p[..., 2], p[..., 3] * 3.0


def _compare_materials(m0, m1, min_material):
    """CompareMaterials (Common.hlsli:123-128)."""
    return (np.maximum(m0, min_material) == np.maximum(m1, min_material)).astype(F32)


# ===========================================================================
# TemporalAccumulation (RELAX_TemporalAccumulation.hlsli, full kernel)
# ===========================================================================
#
# Assumptions (asserted by the driving test): non-SH, no confidence inputs,
# no disocclusion-threshold mix input, both checkerboards off (diff/specHasData
# = true), material ids never match gStrandMaterialID /
# gCameraAttachedReflectionMaterialID sentinels, rect == resource,
# all pixels in range, no sky.

RELAX_MAX_ACCUM_FRAME_NUM = 255.0       # RELAX_Config.hlsli:17
NRD_CURVATURE_Z_THRESHOLD = 0.1         # Common.hlsli:72


def _unpack_prev_nr(packed):
    """UnpackPrevNormalRoughness (RGBA8 unorm storage)."""
    n = H.normalize(packed[..., :3] * 2.0 - 1.0)
    return n, packed[..., 3]


def _world_pos_from_clip(sc, clip_xy, view_z, prev=False):
    """GetCurrentWorldPosFromClipSpaceXY / GetPreviousWorldPos... (RELAX_Common:75-97)."""
    pre = "prev_" if prev else ""
    fwd = np.asarray(sc[pre + "frustum_forward"], F32)
    right = np.asarray(sc[pre + "frustum_right"], F32)
    up = np.asarray(sc[pre + "frustum_up"], F32)
    base = (fwd[None, None, :] + right[None, None, :] * clip_xy[..., 0:1]
            - up[None, None, :] * clip_xy[..., 1:2])
    if float(sc["ortho_mode"]) == 0.0:
        return view_z[..., None] * base
    return (view_z[..., None] * fwd[None, None, :]
            + right[None, None, :] * clip_xy[..., 0:1]
            - up[None, None, :] * clip_xy[..., 1:2])


def _compute_parallax_in_pixels(x, uv_zero_parallax, world_to_clip, rect):
    """ComputeParallaxInPixels (Common.hlsli:319-332)."""
    uv = H.get_screen_uv(world_to_clip, x)
    return H.length((uv - uv_zero_parallax) * rect)


def _is_reprojection_tap_valid(cur_pos, prev_pos, cur_normal, threshold):
    """isReprojectionTapValid (RELAX TA :15-22)."""
    d = np.abs(np.sum((cur_pos - prev_pos) * cur_normal, -1))
    return (d <= threshold).astype(F32)


def _apply_thin_lens(o, curvature):
    """ApplyThinLensEquation (Common.hlsli) 1/F = 1/O + 1/I with F from curvature."""
    return o / (2.0 * curvature * o + 1.0)


def _bicubic_or_bilinear(img, sample_pos, use_bicubic, custom_w):
    return H.catrom_with_bilinear_fallback(img, sample_pos, use_bicubic, custom_w)


def temporal_accumulation(sc, dc, view_z_in, normal_roughness, mv_in, diff, spec,
                          state):
    """RELAX TA main (RELAX_TemporalAccumulation.hlsli:367-929), diffuse+specular.

    state: dict of prev planes named as the engine's
    (diff/spec_illum_prev, diff/spec_responsive_prev, reflection_hit_t,
    history_length, normal_roughness_prev (RGBA8 floats), material_id_prev,
    view_z_prev). Returns dict: diff, diff_fast, spec, spec_fast,
    history_length, reflection_hit_t, spec_reprojection_confidence."""
    h, w = view_z_in.shape
    uv = _pixel_uv(h, w)
    py_i, px_i = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    rect = np.asarray([w, h], F32)
    rect_inv = 1.0 / rect
    rect_prev = np.asarray(sc["rect_size_prev"], F32)
    view_z = np.abs(view_z_in) * F32(sc["view_z_scale"])
    ortho = float(sc["ortho_mode"])
    n, roughness, material_id = _unpack_nr3(normal_roughness)

    # current position / view vector (:392-398)
    x = world_pos_from_pixel_pos(sc, px_i, py_i, view_z, h, w)
    fwd = np.asarray(sc["frustum_forward"], F32)
    view_vec = x if ortho == 0.0 else view_z[..., None] * (
        fwd / np.linalg.norm(fwd))[None, None, :]
    v = -H.normalize(view_vec)
    nov = np.abs(np.sum(n * v, -1))

    # previous position + smb uv (:399-415)
    mv = mv_in * np.asarray(sc["mv_scale"], F32)[None, None, :3]
    if sc["mv_scale"][3] == 0.0:
        smb_uv = uv + mv[..., :2]
        if sc["mv_scale"][2] == 0.0:
            mv_z = H.affine_transform(sc["world_to_view_prev"], x)[..., 2] - view_z
        else:
            mv_z = mv[..., 2]
        x_prev = _world_pos_from_clip(sc, smb_uv * 2.0 - 1.0, view_z + mv_z,
                                      prev=True) \
            + np.asarray(sc["camera_delta"], F32)[None, None, :]
    else:
        x_prev = x + mv
        smb_uv = H.get_screen_uv(sc["world_to_clip_prev"], x_prev)

    # 3x3 min hitT + averaged normal (:432-453)
    n_avg = np.zeros_like(n)
    if spec is not None:
        hit_src = spec[..., 3]
        min_hit = np.where(hit_src == 0.0, H.NRD_INF, hit_src)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            ns = _unpack_nr3(_fetch(normal_roughness,
                                    np.clip(px_i + dx, 0, w - 1),
                                    np.clip(py_i + dy, 0, h - 1)))[0]
            n_avg = n_avg + ns
            if spec is not None and not (dx == 0 and dy == 0):
                t = _fetch(hit_src, np.clip(px_i + dx, 0, w - 1),
                           np.clip(py_i + dy, 0, h - 1))
                min_hit = np.minimum(min_hit, np.where(t == 0.0, H.NRD_INF, t))
    n_avg = n_avg / 9.0
    n_avg_unit = H.normalize(n_avg)
    if spec is not None:
        roughness_modified = H.get_modified_roughness_from_normal_variance(
            roughness, n_avg)

    # parallax (:470-477)
    cam_delta = np.asarray(sc["camera_delta"], F32)[None, None, :]
    parallax1 = _compute_parallax_in_pixels(
        x_prev + cam_delta, smb_uv if ortho == 0.0 else uv,
        sc["world_to_clip_prev"], rect)
    parallax2 = _compute_parallax_in_pixels(
        x_prev - cam_delta, uv if ortho == 0.0 else smb_uv,
        sc["world_to_clip"], rect)
    parallax_max = np.maximum(parallax1, parallax2)
    parallax_min = np.minimum(parallax1, parallax2)
    pixel_size = H.pixel_radius_to_world(sc["unproject"], ortho, 1.0, view_z)

    # disocclusion threshold (:479-486): no strand / no mix input
    disocclusion_threshold = F32(sc["disocclusion_threshold"]
                                 + sc["disocclusion_threshold_bonus"])

    # ---- loadSurfaceMotionBasedPrevData (:30-218) ----
    prev_pixel_pos = smb_uv * rect_prev
    bilinear_origin = np.floor(prev_pixel_pos - 0.5)
    bilinear_frac = (prev_pixel_pos - 0.5) - bilinear_origin
    frustum_size = pixel_size * min(w, h)
    slope_scale = 1.0 / H.lerp(H.lerp(0.05, 1.0, nov), 1.0,
                               H.saturate(parallax_max / 30.0))
    base_thr = H.saturate(disocclusion_threshold * slope_scale) * frustum_size
    in_screen4 = H.is_in_screen_bilinear(bilinear_origin, rect_prev)
    quad_thr = [base_thr * in_screen4[..., q] - H.NRD_EPS for q in range(4)]

    xv_prev_z = H.affine_transform(sc["world_to_view_prev"], x_prev)[..., 2]
    x0 = bilinear_origin[..., 0].astype(np.int64) - 1
    y0 = bilinear_origin[..., 1].astype(np.int64) - 1
    min_material = min(float(dc["spec_min_material"]), float(dc["diff_min_material"]))
    CORNERS = ((0, 0), (3, 0), (0, 3), (3, 3))
    occ = [[None] * 4 for _ in range(4)]
    for j in range(4):
        for i in range(4):
            q = (1 if i >= 2 else 0) + (2 if j >= 2 else 0)
            zt = np.abs(_fetch(state["view_z_prev"], x0 + i, y0 + j)) \
                * F32(sc["view_z_scale"])
            ok = (np.abs(zt - xv_prev_z) <= quad_thr[q]).astype(F32)
            mt = _fetch(state["material_id_prev"], x0 + i, y0 + j)
            ok = ok * _compare_materials(material_id, mt, min_material)
            occ[j][i] = ok
    occ12 = sum(occ[j][i] for j in range(4) for i in range(4)
                if (i, j) not in CORNERS)
    bicubic_valid = (occ12 > 11.5).astype(F32)
    bilinear_valid = np.stack([occ[1][1], occ[1][2], occ[2][1], occ[2][2]], -1)

    # prev flat normal, backface check (:124-135)
    center_uv = (bilinear_origin + 1.0) / rect_prev
    prev_nr_bilin = H.sample_bilinear(state["normal_roughness_prev"], center_uv)
    prev_normal_flat = _unpack_prev_nr(prev_nr_bilin)[0]
    prev_normal_flat = H.rotate_vector(sc["world_prev_to_world"], prev_normal_flat)
    backface = np.sum(n_avg_unit * prev_normal_flat, -1) < 0.0
    bilinear_valid = np.where(backface[..., None], 0.0, bilinear_valid)
    bicubic_valid = np.where(backface, 0.0, bicubic_valid)

    custom_w = H.get_bilinear_custom_weights(bilinear_frac, bilinear_valid)
    use_bicubic = bicubic_valid > 0.0
    sample_pos = smb_uv * rect_prev
    any_valid = np.any(bilinear_valid > 0.0, -1)
    smb_found = np.where(any_valid, np.where(use_bicubic, 2.0, 1.0), 0.0)
    footprint_quality = np.where(use_bicubic, 1.0, np.sum(custom_w, -1))
    footprint_quality = np.where(any_valid, footprint_quality, 0.0)

    # history length (:191-199)
    len_taps = [_fetch(state["history_length"], x0 + 1 + dx, y0 + 1 + dy)
                for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))]
    history_length = H.apply_bilinear_custom_weights(
        len_taps[0], len_taps[1], len_taps[2], len_taps[3], custom_w)
    history_length = np.minimum(history_length + 1.0, RELAX_MAX_ACCUM_FRAME_NUM)

    # footprint-quality refinements (:544-576)
    if ortho == 0.0:
        v_prev = -H.normalize(x_prev - cam_delta)
    else:
        pfwd = np.asarray(sc["prev_frustum_forward"], F32)
        v_prev = np.broadcast_to(-pfwd / np.linalg.norm(pfwd), x.shape)
    nov_prev = np.abs(np.sum(n * v_prev, -1))
    size_quality = (nov_prev + 1e-3) / (nov + 1e-3)
    size_quality = size_quality ** 4
    footprint_quality = footprint_quality * H.lerp(
        0.1, 1.0, H.saturate(size_quality + abs(ortho)))
    history_length = np.where(
        footprint_quality < 1.0,
        np.maximum(history_length * np.sqrt(footprint_quality), 1.0),
        history_length)
    if float(sc["reset_history"]) != 0.0:
        history_length = np.ones_like(history_length)
    max_frames = 1.0 + max(float(dc["diff_max_accumulated_frame_num"]),
                           float(dc["spec_max_accumulated_frame_num"]))
    history_length = np.minimum(history_length, max_frames)

    out = {"history_length": history_length}

    # ---- diffuse accumulation (:580-621), diffHasData = true ----
    if diff is not None:
        prev_diff = np.maximum(_bicubic_or_bilinear(
            state["diff_illum_prev"], sample_pos, use_bicubic, custom_w), 0.0)
        prev_diff_resp = np.maximum(_bicubic_or_bilinear(
            state["diff_responsive_prev"], sample_pos, use_bicubic, custom_w), 0.0)
        found = smb_found > 0.0
        alpha = np.where(found, np.maximum(
            1.0 / (F32(dc["diff_max_accumulated_frame_num"]) + 1.0),
            1.0 / history_length), 1.0)
        alpha_resp = np.where(found, np.maximum(
            1.0 / (F32(dc["diff_max_fast_accumulated_frame_num"]) + 1.0),
            1.0 / history_length), 1.0)
        m1 = diff[..., :3] @ LUMA
        diff_and_m2 = np.concatenate([diff[..., :3], (m1 * m1)[..., None]], -1)
        out["diff"] = H.lerp(prev_diff, diff_and_m2, alpha[..., None])
        out["diff_fast"] = np.concatenate(
            [H.lerp(prev_diff_resp[..., :3], diff[..., :3], alpha_resp[..., None]),
             np.zeros((h, w, 1), F32)], -1)

    # ---- specular accumulation (:627-929), specHasData = true ----
    if spec is not None:
        spec_frames = np.minimum(F32(dc["spec_max_accumulated_frame_num"]),
                                 history_length)
        spec_resp_frames = np.minimum(F32(dc["spec_max_fast_accumulated_frame_num"]),
                                      history_length)
        hit_dist = np.where(min_hit == H.NRD_INF, 0.0, min_hit)

        # curvature along motion (:645-723)
        uv_zero_par = smb_uv if ortho == 0.0 else uv
        delta_uv = (uv_zero_par - H.get_screen_uv(sc["world_to_clip_prev"],
                                                  x_prev + cam_delta)) * rect
        delta_uv = delta_uv / np.maximum(parallax1, 1.0 / 256.0)[..., None]

        def edge_point(du, dv):
            clip_xy = (uv + np.asarray([du, dv], F32) * rect_inv) * 2.0 - 1.0
            x_e = _world_pos_from_clip(sc, clip_xy, np.ones((h, w), F32))
            if ortho == 0.0:
                v_e = H.normalize(-x_e)
                o = np.zeros_like(x_e)
            else:
                v_e = np.broadcast_to(fwd, x_e.shape)
                o = x_e
            ndv = np.sum(n * v_e, -1)
            t = np.sum((x - o) * n, -1) / np.where(np.abs(ndv) < 1e-9,
                                                   F32(1e-9), ndv)
            return o + v_e * t[..., None]

        x10 = edge_point(1.0, 0.0)
        x01 = edge_point(0.0, 1.0)
        n10 = _unpack_nr3(_fetch(normal_roughness,
                                 np.clip(px_i + 1, 0, w - 1), py_i))[0]
        n01 = _unpack_nr3(_fetch(normal_roughness, px_i,
                                 np.clip(py_i + 1, 0, h - 1)))[0]
        wmix = np.abs(delta_uv) + 1.0 / 256.0
        wmix = wmix / np.sum(wmix, -1, keepdims=True)
        x_c = x10 * wmix[..., 0:1] + x01 * wmix[..., 1:2]
        n_c = H.normalize(n10 * wmix[..., 0:1] + n01 * wmix[..., 1:2])

        # high parallax flattening (:685-705), silhouette fix off
        bayer = H.bayer4x4(px_i, py_i, int(sc["frame_index"]))
        delta_uv_len_fixed = parallax_min * (
            1.0 + F32(sc["framerate_scale"]) * bayer)
        motion_uv_high = uv + (delta_uv_len_fixed[..., None] * delta_uv) * rect_inv
        motion_uv_high = (np.floor(motion_uv_high * rect) + 0.5) * rect_inv
        use_high = (delta_uv_len_fixed > 1.0) \
            & (H.is_in_screen_nearest(motion_uv_high) > 0.0)
        z_high = np.abs(H.sample_nearest(view_z_in, motion_uv_high)) \
            * F32(sc["view_z_scale"])
        x_high = _world_pos_from_clip(sc, motion_uv_high * 2.0 - 1.0, z_high)
        n_high = _unpack_nr3(H.sample_nearest(normal_roughness, motion_uv_high))[0]
        z_err = np.abs(z_high - view_z) / np.maximum(np.maximum(z_high, view_z),
                                                     H.NRD_EPS)
        repl = use_high & (z_err < NRD_CURVATURE_Z_THRESHOLD)
        n_c = np.where(repl[..., None], n_high, n_c)
        x_c = np.where(repl[..., None], x_high, x_c)

        edge = x_c - x
        edge_len_sq = np.sum(edge * edge, -1)
        curvature = np.sum((n_c - n) * edge, -1) * H.positive_rcp(edge_len_sq)

        hit_dist_focused = _apply_thin_lens(hit_dist, curvature)

        # ---- loadVirtualMotionBasedPrevData (:223-348) ----
        virtual_view = H.normalize(view_vec) * hit_dist_focused[..., None]
        prev_virtual_pos = x_prev + virtual_view
        vmb_uv = H.get_screen_uv(sc["world_to_clip_prev"], prev_virtual_pos)
        # no camera-attached material in the test scene
        prev_virtual_pixel = vmb_uv * rect_prev
        vmb_origin = np.floor(prev_virtual_pixel - 0.5)
        vmb_frac = (prev_virtual_pixel - 0.5) - vmb_origin
        x_cam = x - cam_delta  # world centered at prev camera (:265)
        vmb_thr = disocclusion_threshold * (view_z if ortho == 0.0
                                            else np.ones_like(view_z))
        vmb_in4 = H.is_in_screen_bilinear(vmb_origin, rect_prev)
        vx0 = vmb_origin[..., 0].astype(np.int64)
        vy0 = vmb_origin[..., 1].astype(np.int64)
        vmb_valid = []
        for k, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            zt = np.abs(_fetch(state["view_z_prev"], vx0 + dx, vy0 + dy)) \
                * F32(sc["view_z_scale"])
            clip_xy = ((np.stack([(vx0 + dx).astype(F32), (vy0 + dy).astype(F32)],
                                 -1) + 0.5) / rect_prev) * 2.0 - 1.0
            prev_tap_pos = _world_pos_from_clip(sc, clip_xy, zt, prev=True)
            thr_k = vmb_thr * vmb_in4[..., k] - H.NRD_EPS
            okv = _is_reprojection_tap_valid(x_cam, prev_tap_pos, n, thr_k)
            mt = _fetch(state["material_id_prev"], vx0 + dx, vy0 + dy)
            okv = okv * _compare_materials(material_id, mt,
                                           float(dc["spec_min_material"]))
            vmb_valid.append(okv)
        vmb_valid4 = np.stack(vmb_valid, -1)
        vmb_any = np.any(vmb_valid4 > 0.0, -1)
        vmb_custom_w = H.get_bilinear_custom_weights(vmb_frac, vmb_valid4)
        vmb_bicubic = use_bicubic & np.all(vmb_valid4 > 0.0, -1)

        prev_spec_vmb = np.maximum(_bicubic_or_bilinear(
            state["spec_illum_prev"], prev_virtual_pixel, vmb_bicubic,
            vmb_custom_w), 0.0)
        prev_spec_vmb_resp = np.maximum(_bicubic_or_bilinear(
            state["spec_responsive_prev"], prev_virtual_pixel, vmb_bicubic,
            vmb_custom_w), 0.0)
        prev_hit_t_vmb = np.maximum(
            0.001, H.sample_bilinear(state["reflection_hit_t"], vmb_uv))
        prev_nr_vmb = H.sample_bilinear(state["normal_roughness_prev"], vmb_uv)
        prev_normal_vmb, prev_rough_vmb = _unpack_prev_nr(prev_nr_vmb)
        prev_normal_vmb = H.rotate_vector(sc["world_prev_to_world"],
                                          prev_normal_vmb)
        # "any valid" applies the fetched values; else defaults (:276-285)
        prev_spec_vmb = np.where(vmb_any[..., None], prev_spec_vmb, 0.0)
        prev_spec_vmb_resp = np.where(vmb_any[..., None], prev_spec_vmb_resp, 0.0)
        prev_normal_vmb = np.where(vmb_any[..., None], prev_normal_vmb, n)
        prev_rough_vmb = np.where(vmb_any, prev_rough_vmb, 0.0)
        prev_hit_t_vmb = np.where(vmb_any, prev_hit_t_vmb,
                                  F32(sc["denoising_range"]))
        vmb_found = np.all(vmb_valid4 > 0.0, -1).astype(F32)

        # amount of virtual motion (:777-784)
        d4 = H.get_specular_dominant_direction(n, v, roughness_modified)
        virtual_amount = vmb_found * d4[..., 3]
        virtual_amount = virtual_amount * (1.0 if ortho == 0.0 else 0.75)
        virtual_amount = virtual_amount * (
            np.sum(prev_normal_vmb * n_avg, -1) > 0.0).astype(F32)

        # curvature angle (:786-793)
        uv_diff = vmb_uv - smb_uv
        uv_diff_len = H.length(uv_diff * rect)
        tan_curvature = np.abs(curvature * pixel_size)
        tan_curvature = tan_curvature * np.maximum(
            uv_diff_len / np.maximum(nov, 0.01), 1.0)
        curvature_angle = np.arctan(tan_curvature)

        # normal weight for vmb (:795-798)
        lobe_half_angle = np.maximum(
            np.arctan(get_spec_lobe_tan_half_angle(roughness_modified)),
            RELAX_NORMAL_ULP)
        normal_weight = H.get_encoding_aware_normal_weight(
            n, prev_normal_vmb, lobe_half_angle, curvature_angle,
            RELAX_NORMAL_ULP, remap=True)
        virtual_amount = virtual_amount * H.lerp(
            1.0 - H.saturate(uv_diff_len), 1.0, normal_weight)

        # roughness weight for vmb (:800-805)
        rra, rrb = H.get_relaxed_roughness_weight_params(
            roughness * roughness, F32(dc["roughness_fraction"]))
        virtual_rough_w = H.compute_weight(prev_rough_vmb * prev_rough_vmb,
                                           rra, rrb)
        virtual_rough_w = H.lerp(1.0 - H.saturate(uv_diff_len), 1.0,
                                 virtual_rough_w)
        if ortho == 0.0:
            virtual_amount = virtual_amount * virtual_rough_w
        spec_vmb_confidence = virtual_rough_w * 0.9 + 0.1

        # "looking back" 1-2 frames (:807-824)
        uv_diff_n = uv_diff / np.maximum(H.length(uv_diff)[..., None], H.NRD_EPS)
        uv_diff_n = uv_diff_n / rect_prev
        uv_diff_n = uv_diff_n * (H.saturate(uv_diff_len / 0.1)
                                 + uv_diff_len / 2.0)[..., None]
        back_uv1 = vmb_uv + 1.0 * uv_diff_n
        back_uv2 = vmb_uv + 2.0 * uv_diff_n
        back_nr1 = H.sample_bilinear(state["normal_roughness_prev"], back_uv1)
        back_nr2 = H.sample_bilinear(state["normal_roughness_prev"], back_uv2)
        bn1, br1 = _unpack_prev_nr(back_nr1)
        bn2, br2 = _unpack_prev_nr(back_nr2)
        bn1 = H.rotate_vector(sc["world_prev_to_world"], bn1)
        bn2 = H.rotate_vector(sc["world_prev_to_world"], bn2)
        ppw = np.where(H.is_in_screen_nearest(back_uv1) > 0.0,
                       H.get_encoding_aware_normal_weight(
                           prev_normal_vmb, bn1, lobe_half_angle,
                           curvature_angle * 2.0, RELAX_NORMAL_ULP, remap=True),
                       1.0)
        ppw = ppw * np.where(H.is_in_screen_nearest(back_uv2) > 0.0,
                             H.get_encoding_aware_normal_weight(
                                 prev_normal_vmb, bn2, lobe_half_angle,
                                 curvature_angle * 3.0, RELAX_NORMAL_ULP,
                                 remap=True),
                             1.0)
        virtual_amount = virtual_amount * (0.33 + 0.67 * ppw)
        spec_vmb_confidence = spec_vmb_confidence * (0.33 + 0.67 * ppw)
        rw = H.compute_weight(br1 * br1, rra, rrb)
        rw = rw * H.compute_weight(br2 * br2, rra, rrb)
        if ortho == 0.0:
            virtual_amount = virtual_amount * (rw * 0.9 + 0.1)

        # hit-dist confidence (:826-836)
        prev_hit_t_smb_taps = [_fetch(state["reflection_hit_t"],
                                      x0 + 1 + dx, y0 + 1 + dy)
                               for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))]
        prev_hit_t_smb = H.apply_bilinear_custom_weights(
            prev_hit_t_smb_taps[0], prev_hit_t_smb_taps[1],
            prev_hit_t_smb_taps[2], prev_hit_t_smb_taps[3], custom_w)
        prev_hit_t_smb = np.maximum(0.001, prev_hit_t_smb)
        smc = H.get_spec_magic_curve(roughness_modified)
        hit_dist_c = H.lerp(spec[..., 3], prev_hit_t_smb, smc)
        hit_dist1 = _apply_thin_lens(hit_dist_c, curvature)
        hit_dist2 = _apply_thin_lens(prev_hit_t_vmb, curvature)
        max_dist = np.maximum(hit_dist1, hit_dist2)
        d_hit_t = np.abs(hit_dist1 - hit_dist2)
        d_mult = H.lerp(20.0, 0.0, smc)
        vhd_conf = 1.0 - H.saturate(d_mult * d_hit_t / (view_z + max_dist))
        vhd_conf = H.lerp(vhd_conf, 1.0, smc)

        # virtual UV discrepancy (:838-860)
        x_virtual = H.get_xvirtual(hit_dist, curvature, x, x_prev, n, v, roughness)
        x_virtual_len = H.length(x_virtual)
        hit_dist_prev = prev_spec_vmb_resp[..., 3]
        prev_virtual = H.get_xvirtual(hit_dist_prev, curvature, x, x_prev, n, v,
                                      roughness)
        prev_virtual_len = H.length(prev_virtual)
        vmb_uv_test = H.get_screen_uv(sc["world_to_clip_prev"], prev_virtual)
        lobe_tan = get_spec_lobe_tan_half_angle(roughness, 0.6)
        lobe_tan = np.maximum(lobe_tan, 0.5 * rect_inv[0])
        unproj1 = np.minimum(hit_dist, hit_dist_prev) / H.pixel_radius_to_world(
            sc["unproject"], ortho, 1.0,
            np.maximum(x_virtual_len, prev_virtual_len))
        lobe_radius_px = lobe_tan * unproj1
        delta_par_px = H.length((vmb_uv_test - vmb_uv) * rect)
        vhd_conf = vhd_conf * H.smoothstep(lobe_radius_px + 0.25, 0.0,
                                           delta_par_px)

        # smb confidence + alphas (:862-887)
        spec_smb_confidence = (smb_found > 0).astype(F32) \
            * H.get_encoding_aware_normal_weight(
                v, v_prev, lobe_half_angle * nov / F32(sc["framerate_scale"]),
                0.0, 0.0)
        spec_smb_alpha = np.maximum(1.0 - spec_smb_confidence,
                                    1.0 / (1.0 + spec_frames))
        spec_smb_resp_alpha = np.maximum(spec_smb_alpha,
                                         1.0 / (1.0 + spec_resp_frames))

        prev_spec_smb = np.maximum(_bicubic_or_bilinear(
            state["spec_illum_prev"], sample_pos, use_bicubic, custom_w), 0.0)
        prev_spec_smb_resp = np.maximum(_bicubic_or_bilinear(
            state["spec_responsive_prev"], sample_pos, use_bicubic, custom_w), 0.0)

        m1s = spec[..., :3] @ LUMA
        spec_m2 = m1s * m1s
        acc_smb_rgb = H.lerp(prev_spec_smb[..., :3], spec[..., :3],
                             spec_smb_alpha[..., None])
        acc_smb_hit = H.lerp(prev_hit_t_smb, spec[..., 3],
                             np.maximum(spec_smb_alpha, 0.1))
        acc_smb_m2 = H.lerp(prev_spec_smb[..., 3], spec_m2, spec_smb_alpha)
        acc_smb_resp = H.lerp(prev_spec_smb_resp[..., :3], spec[..., :3],
                              spec_smb_resp_alpha[..., None])

        spec_vmb_alpha = np.maximum(1.0 - spec_vmb_confidence,
                                    1.0 / (1.0 + spec_frames))
        spec_vmb_resp_alpha = np.maximum(1.0 - spec_vmb_confidence * vhd_conf,
                                         1.0 / (1.0 + spec_resp_frames))
        spec_vmb_hit_alpha = np.maximum(1.0 - spec_vmb_confidence * vhd_conf,
                                        1.0 / (1.0 + spec_frames))
        acc_vmb_rgb = H.lerp(prev_spec_vmb[..., :3], spec[..., :3],
                             spec_vmb_alpha[..., None])
        acc_vmb_hit = H.lerp(prev_hit_t_vmb, spec[..., 3],
                             np.maximum(spec_vmb_hit_alpha, 0.1))
        acc_vmb_m2 = H.lerp(prev_spec_vmb[..., 3], spec_m2, spec_vmb_alpha)
        acc_vmb_resp = H.lerp(prev_spec_vmb_resp[..., :3], spec[..., :3],
                              spec_vmb_resp_alpha[..., None])

        # fallback + final blends (:906-929)
        virtual_amount = virtual_amount * H.saturate(
            spec_vmb_confidence / (spec_smb_confidence + H.NRD_EPS))
        acc_hit_t = H.lerp(acc_smb_hit, acc_vmb_hit, virtual_amount)
        acc_rgb = H.lerp(acc_smb_rgb, acc_vmb_rgb, virtual_amount[..., None])
        acc_resp = H.lerp(acc_smb_resp, acc_vmb_resp, virtual_amount[..., None])
        acc_m2 = H.lerp(acc_smb_m2, acc_vmb_m2, virtual_amount)
        spec_history_confidence = H.lerp(spec_smb_confidence,
                                         spec_vmb_confidence, virtual_amount)
        acc_m2 = np.where(acc_m2 == 0.0,
                          F32(dc["spec_variance_boost"])
                          * (1.0 - spec_history_confidence), acc_m2)

        out["spec"] = np.concatenate([acc_rgb, acc_m2[..., None]], -1)
        out["spec_fast"] = np.concatenate([acc_resp, hit_dist[..., None]], -1)
        out["reflection_hit_t"] = acc_hit_t
        out["spec_reprojection_confidence"] = spec_history_confidence
    return out


def _pixel_uv(h, w):
    x = (np.arange(w, dtype=F32) + 0.5) / w
    y = (np.arange(h, dtype=F32) + 0.5) / h
    return np.stack(np.meshgrid(x, y), -1)


# ===========================================================================
# HistoryClamping (RELAX_HistoryClamping.hlsli, full kernel)
# ===========================================================================

RELAX_ANTILAG_ACCELERATION_AMOUNT_SCALE = 10.0      # RELAX_Config.hlsli:18


def history_clamping(sc, dc, view_z_in, noisy_diff, noisy_spec, diff_slow,
                     spec_slow, diff_resp, spec_resp, history_length):
    """RELAX_HistoryClamping.hlsli:52-330: 5x5 validity-weighted YCoCg color box,
    clamp, history-fix passthrough, antilag acceleration + history reset,
    2nd-moment correction. Returns dict diff/spec (slow) + diff/spec_fast."""
    h, w = view_z_in.shape
    view_z = np.abs(view_z_in) * F32(sc["view_z_scale"])
    is_valid = (view_z < F32(sc["denoising_range"])).astype(F32)
    history_length = history_length.astype(F32)
    out = {}

    def run(noisy, slow, resp, is_spec):
        resp_ycocg = H.linear_to_ycocg(resp[..., :3])
        m1 = np.zeros((h, w, 3), F32)
        m2 = np.zeros((h, w, 3), F32)
        nm1 = np.zeros((h, w, 3), F32)
        nm2 = np.zeros((h, w), F32)
        sum_w = np.zeros((h, w), F32)
        for dy in range(-2, 3):
            for dx in range(-2, 3):
                w_ = OSHIFT(is_valid, dy, dx)
                s_y = OSHIFT(resp_ycocg, dy, dx)
                s_n = OSHIFT(noisy[..., :3], dy, dx)
                nl = s_n @ LUMA
                m1 += np.where(w_[..., None] != 0.0, s_y, 0.0)
                m2 += np.where(w_[..., None] != 0.0, s_y * s_y, 0.0)
                nm1 += np.where(w_[..., None] != 0.0, s_n, 0.0)
                nm2 += np.where(w_ != 0.0, nl * nl, 0.0)
                sum_w += w_
        m1 /= sum_w[..., None]
        m2 /= sum_w[..., None]
        nm1 /= sum_w[..., None]
        nm2 /= sum_w
        sigma = np.sqrt(np.maximum(0.0, m2 - m1 * m1))
        cmin = m1 - F32(dc["color_box_sigma_scale"]) * sigma
        cmax = m1 + F32(dc["color_box_sigma_scale"]) * sigma
        cmin = np.minimum(cmin, resp_ycocg)
        cmax = np.maximum(cmax, resp_ycocg)

        slow_ycocg = H.linear_to_ycocg(slow[..., :3])
        fastmax = F32(dc[("spec" if is_spec else "diff")
                         + "_max_fast_accumulated_frame_num"])
        slowmax = F32(dc[("spec" if is_spec else "diff")
                         + "_max_accumulated_frame_num"])
        clamped_ycocg = (np.clip(slow_ycocg, cmin, cmax)
                         if fastmax < slowmax else slow_ycocg)
        clamped = H.ycocg_to_linear(clamped_ycocg)

        fix = history_length <= F32(dc["history_fix_frame_num"])
        resp_center = H.ycocg_to_linear(resp_ycocg)
        out_slow_rgb = np.where(fix[..., None], resp_center, clamped)
        out_resp_rgb = resp_center.copy()
        out_slow_a = slow[..., 3]
        out_resp_a = resp[..., 3] if is_spec else np.zeros((h, w), F32)

        denom = resp_ycocg[..., 0] - slow_ycocg[..., 0]
        num = clamped_ycocg[..., 0] - slow_ycocg[..., 0]
        clamping_factor = np.where(num == 0.0, 0.0,
                                   H.saturate(num / np.where(denom == 0.0,
                                                             F32(1.0), denom)))
        clamping_factor = np.where(fix, 1.0, clamping_factor)

        scale = (0.33 if is_spec else 1.0) * RELAX_ANTILAG_ACCELERATION_AMOUNT_SCALE
        hist_diff_l = scale * F32(dc["history_acceleration_amount"]) \
            * np.abs(resp_center - slow[..., :3]) @ LUMA
        hist_diff_l = hist_diff_l * clamping_factor
        hist_diff_l = np.where(fix, 0.0, hist_diff_l)

        dist = nm1 - resp_center
        dist_l = np.abs(dist) @ LUMA
        accel = np.where(dist_l[..., None] == 0.0, 0.0,
                         dist * (hist_diff_l / np.where(dist_l == 0.0, F32(1.0),
                                                        dist_l))[..., None])
        accel_l = np.abs(accel) @ LUMA
        ratio = np.where(accel_l == 0.0, 0.0,
                         dist_l / np.where(accel_l == 0.0, F32(1.0), accel_l))
        accel = np.where((ratio < 1.0)[..., None], accel * ratio[..., None], accel)
        accel = np.where((ratio <= 0.0)[..., None], 0.0, accel)

        out_slow_rgb = out_slow_rgb + accel
        out_resp_rgb = out_resp_rgb + accel

        # history reset possibility
        slow_l = slow[..., :3] @ LUMA
        noisy_l = nm1 @ LUMA
        t_sigma = F32(dc["history_reset_temporal_sigma_scale"]) * np.sqrt(
            np.maximum(0.0, nm2 - noisy_l * noisy_l))
        s_sigma = F32(dc["history_reset_spatial_sigma_scale"]) * sigma[..., 0]
        reset_scale = 0.5 if is_spec else 1.0     # (:222 vs :329)
        reset = reset_scale * F32(dc["history_reset_amount"]) * np.maximum(
            0.0, np.abs(slow_l - noisy_l) - s_sigma - t_sigma) \
            / (1e-6 + np.maximum(slow_l, noisy_l) + s_sigma + t_sigma)
        reset = H.saturate(reset)

        out_slow_rgb = H.lerp(out_slow_rgb, noisy[..., :3], reset[..., None])
        out_resp_rgb = H.lerp(out_resp_rgb, noisy[..., :3], reset[..., None])

        # 2nd moment correction (slow history .a)
        out_l = out_slow_rgb @ LUMA
        out_slow_a = np.maximum(0.0, out_slow_a + (out_l * out_l
                                                   - slow_l * slow_l))
        return (np.concatenate([out_slow_rgb, out_slow_a[..., None]], -1),
                np.concatenate([out_resp_rgb, out_resp_a[..., None]], -1))

    if noisy_diff is not None:
        out["diff"], out["diff_fast"] = run(noisy_diff, diff_slow, diff_resp,
                                            False)
    if noisy_spec is not None:
        out["spec"], out["spec_fast"] = run(noisy_spec, spec_slow, spec_resp,
                                            True)
    return out


def OSHIFT(img, dy, dx):
    return _shift_clamp(img, dy, dx)


def _shift_clamp(img, dy, dx):
    h, w = img.shape[:2]
    ys = np.clip(np.arange(h) + dy, 0, h - 1)
    xs = np.clip(np.arange(w) + dx, 0, w - 1)
    return img[np.ix_(ys, xs)]
