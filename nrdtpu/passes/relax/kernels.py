"""RELAX pass kernels - TPU rebuilds of Shaders/Include/RELAX_*.hlsli.

SVGF-style a-trous wavelet denoiser tuned for RTXDI signals. Pipeline
(Source/Relax.cpp:182-293): ClassifyTiles -> [HitDistRecon] -> PrePass -> TemporalAccumulation
-> HistoryFix -> HistoryClamping -> [AntiFirefly] -> A-trous x N -> [SplitScreen].

Signal layout: illumination is (h, w, 4) = (rgb, 2nd-moment-of-luma | variance | hitT
depending on stage), exactly the reference texture semantics. World positions are
camera-relative, reconstructed from the frustum right/up/forward vectors
(RELAX_Common.hlsli:72-97) rather than REBLUR's frustum-rect encoding.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import frontend as fe
from ... import math as nm
from ... import vec3 as v3
from ...frontend import NRD_EPS, NRD_FP16_MAX, NRD_INF
from ...ops import resample, stencil, tiles
from ..reblur.kernels import uv_to_mv_pix as _uv2mv

RELAX_NORMAL_ULP = 1.5 / 255.0
RELAX_MAX_ACCUM_FRAME_NUM = 255.0
RELAX_ANTILAG_ACCELERATION_AMOUNT_SCALE = 10.0
NRD_CURVATURE_Z_THRESHOLD = 0.1


# ---------------------------------------------------------------------------
# Common helpers (RELAX_Common.hlsli)
# ---------------------------------------------------------------------------


def unpack_view_z(sc, z):
    return jnp.abs(z) * sc["view_z_scale"]


def unpack_nr(sc, packed, config):
    return fe.unpack_normal_roughness(packed, config.normal_encoding,
                                      config.roughness_encoding)


def pack_prev_normal_roughness(normal, roughness):
    """PackPrevNormalRoughness + RGBA8 quantization (RELAX stores prev normals in RGBA8)."""
    p = jnp.concatenate([normal * 0.5 + 0.5, roughness[..., None]], -1)
    return nm.quantize_unorm(p, 8)


def unpack_prev_normal_roughness(packed):
    n = nm.safe_normalize(packed[..., :3] * 2.0 - 1.0)
    return n, packed[..., 3]


def world_pos_from_uv3(sc, u, v_, view_z, prev: bool = False):
    """world_pos_from_uv on uv planes -> V3 (see vec3.py for why)."""
    pre = "prev_" if prev else ""
    cx = u * 2.0 - 1.0
    cy = v_ * 2.0 - 1.0
    fwd = sc[pre + "frustum_forward"]
    right = sc[pre + "frustum_right"]
    up = sc[pre + "frustum_up"]
    is_persp = sc["ortho_mode"] == 0.0

    def comp(i):
        base = right[i] * cx - up[i] * cy
        return jnp.where(is_persp, view_z * (fwd[i] + base), view_z * fwd[i] + base)

    return v3.V3(comp(0), comp(1), comp(2))


def world_pos_from_uv(sc, uv, view_z, prev: bool = False):
    """GetCurrentWorldPosFromClipSpaceXY (RELAX_Common.hlsli:72-97); uv y-down in [0,1]."""
    pre = "prev_" if prev else ""
    clip_x = uv[..., 0] * 2.0 - 1.0
    clip_y = uv[..., 1] * 2.0 - 1.0  # y-down uv -> clipSpaceXY.y as used with "-gFrustumUp"
    fwd = sc[pre + "frustum_forward"][None, None, :]
    right = sc[pre + "frustum_right"][None, None, :]
    up = sc[pre + "frustum_up"][None, None, :]
    # NOTE: the shaders compute clipSpaceXY from pixel pos with y down and use "- up * y".
    persp = view_z[..., None] * (fwd + right * clip_x[..., None] - up * clip_y[..., None])
    ortho = view_z[..., None] * fwd + right * clip_x[..., None] - up * clip_y[..., None]
    return jnp.where(sc["ortho_mode"] == 0.0, persp, ortho)


def get_plane_distance_weight(center_pos, center_normal, center_view_z, sample_pos,
                              threshold):
    """GetPlaneDistanceWeight (RELAX_Common.hlsli:99-105)."""
    d = jnp.abs(nm.dot(sample_pos - center_pos, center_normal))
    return (d / center_view_z <= threshold).astype(jnp.float32)


def get_plane_distance_weight_atrous(center_pos, center_normal, sample_pos, threshold):
    d = jnp.abs(nm.dot(sample_pos - center_pos, center_normal))
    return (d < threshold).astype(jnp.float32)


def get_spec_lobe_tan_half_angle(roughness, percent_of_volume=0.75):
    """RELAX's legacy GetSpecLobeTanHalfAngle (RELAX_Common.hlsli:107-115)."""
    r = nm.saturate(roughness)
    p = percent_of_volume
    return r * r * p / (1.0 - p + NRD_EPS)


def get_normal_weight_param2(roughness, angle_fraction):
    angle = jnp.arctan(get_spec_lobe_tan_half_angle(roughness, angle_fraction))
    return 1.0 / jnp.maximum(angle, RELAX_NORMAL_ULP)


def get_normal_weight_params_atrous(roughness, history_len, spec_reproj_confidence,
                                    normal_edge_stopping_relaxation, lobe_angle_fraction,
                                    lobe_angle_slack):
    """GetNormalWeightParams_ATrous (RELAX_Common.hlsli:117-137). Returns (angle, f)."""
    relaxation = nm.saturate(history_len / 5.0)
    relaxation = relaxation * nm.lerp(1.0, spec_reproj_confidence,
                                      normal_edge_stopping_relaxation)
    f = 0.9 + 0.1 * relaxation
    angle = jnp.arctan(get_spec_lobe_tan_half_angle(roughness, lobe_angle_fraction))
    angle = angle * (10.0 - 9.0 * relaxation)
    angle = angle + lobe_angle_slack
    angle = jnp.minimum(nm.PI * 0.5, angle)
    return angle, f


def get_specular_normal_weight_atrous(angle0, f0, n0, n, v0, v):
    """GetSpecularNormalWeight_ATrous (RELAX_Common.hlsli:139-148)."""
    cosa = jnp.minimum(nm.dot(n0, n), nm.dot(v0, v))
    a = nm.acos_approx(cosa)
    a = nm.smoothstep(0.0, angle0, a)
    return nm.saturate(1.0 - a * f0)


def get_bilateral_weight(z, zc):
    return nm.linearstep(0.03, 0.0, jnp.abs(z - zc) / jnp.maximum(jnp.maximum(z, zc), 1e-15))


# ---------------------------------------------------------------------------
# ClassifyTiles - same as REBLUR (sky-only map)
# ---------------------------------------------------------------------------


@jax.named_scope("RELAX/classify_tiles")
def classify_tiles(sc, view_z):
    return tiles.classify_sky_tiles(unpack_view_z(sc, view_z), sc["denoising_range"])


def dead_mask(sc, tile_map, view_z):
    h, w = view_z.shape
    sky = tiles.tile_upsample_nearest(tile_map, h, w)
    return jnp.logical_or(sky > 0.0, unpack_view_z(sc, view_z) > sc["denoising_range"])


# ---------------------------------------------------------------------------
# PrePass (RELAX_PrePass.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("RELAX/pre_pass")
def pre_pass(sc, dc, diff, spec, view_z_in, normal_roughness, config,
             diff_sh=None, spec_sh=None, pallas: bool = False):
    """Poisson spatial reuse; specular also re-estimates min hitT. Checkerboard off.

    Returns (diff_out, spec_out, diff_sh_out, spec_sh_out). Any of diff/spec may be None.
    """
    view_z = unpack_view_z(sc, view_z_in)
    h, w = view_z.shape
    uv = resample.pixel_uv_grid(h, w)
    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)
    x = world_pos_from_uv(sc, uv, view_z)
    rotator = sc["rotator_pre"]
    rect = sc["rect_size"][None, None, :]
    frustum_size = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"],
                                            min(config.rect_size), view_z)

    def run_channel(signal, sh, is_spec):
        hit = signal[..., 3]
        if is_spec:
            hit = jnp.maximum(0.0, jnp.minimum(sc["denoising_range"], hit))
            signal = jnp.concatenate([signal[..., :3], hit[..., None]], -1)
            view_vec = jnp.where(sc["ortho_mode"] == 0.0, nm.normalize(-x),
                                 sc["frustum_forward"][None, None, :])
            d4 = nm.get_specular_dominant_direction(n, view_vec, roughness)
            nod = jnp.abs(nm.dot(n, d4[..., :3]))
            hd = jnp.where(hit == 0.0, 1.0, hit)
            hit_dist_factor = nm.get_hit_dist_factor(hd * nod, frustum_size)
            smc = nm.get_spec_magic_curve(roughness)
            blur_radius = dc["spec_blur_radius"] * hit_dist_factor * smc
            lobe_tan = nm.get_specular_lobe_tan_half_angle(roughness)
            lobe_radius = hd * nod * lobe_tan
            min_blur = lobe_radius / nm.pixel_radius_to_world(
                sc["unproject"], sc["ortho_mode"], 1.0, view_z + hd * d4[..., 3])
            blur_radius = jnp.minimum(blur_radius, min_blur)
            nwp = get_normal_weight_param2(roughness, 0.5 * dc["lobe_angle_fraction"])
            ha, hb = nm.get_hit_distance_weight_params(hit, 1.0 / 9.0, roughness)
            ra, rb = nm.get_roughness_weight_params(roughness, dc["roughness_fraction"])
            min_hd_weight = jnp.where(hit == 0.0, 1.0, dc["min_hit_distance_weight"] * smc)
            min_hit = jnp.where(hit == 0.0, NRD_INF, hit)
            radius_disabled = dc["spec_blur_radius"] <= 0.0
        else:
            hd = jnp.where(hit == 0.0, 1.0, hit)
            hit_dist_factor = nm.get_hit_dist_factor(hd, frustum_size)
            blur_radius = dc["diff_blur_radius"] * hit_dist_factor
            nwp = get_normal_weight_param2(jnp.ones_like(roughness),
                                           0.25 * dc["lobe_angle_fraction"])
            ha, hb = nm.get_hit_distance_weight_params(hit, 1.0 / 9.0)
            min_hd_weight = dc["min_hit_distance_weight"]
            min_hit = None
            radius_disabled = dc["diff_blur_radius"] <= 0.0
        blur_radius = jnp.where(hit == 0.0, jnp.maximum(blur_radius, 1.0), blur_radius)

        if pallas:
            from ...kernels.relax_pallas import relax_prepass_taps_pallas

            dts = jnp.where(sc["ortho_mode"] == 0.0, view_z, 1.0)
            kw = {}
            if is_spec:
                kw = dict(ra=ra, rb=rb, roughness=roughness)
            res = relax_prepass_taps_pallas(
                sc, dc, config, is_spec=is_spec, signal=signal, view_z_in=view_z_in,
                normal_roughness=normal_roughness, blur_radius=blur_radius,
                thr_eff=dc["depth_threshold"] * dts, nwp=nwp, ha=ha, hb=hb,
                min_hd_weight=min_hd_weight, hit=hit, material_id=material_id,
                n=n, x=x, sh=sh, **kw)
            out, out_sh = res if sh is not None else (res, None)
            out = jnp.where(radius_disabled, signal, out)
            out = jnp.clip(out, 0.0, NRD_FP16_MAX)
            if out_sh is not None:
                out_sh = jnp.where(radius_disabled, sh, out_sh)
                out_sh = jnp.clip(out_sh, -NRD_FP16_MAX, NRD_FP16_MAX)
            return out, out_sh

        acc = signal
        acc_sh = sh
        wsum = jnp.ones_like(view_z)
        min_material = dc["spec_min_material"] if is_spec else dc["diff_min_material"]
        depth_threshold_scale = jnp.where(sc["ortho_mode"] == 0.0, view_z, 1.0)
        for tap in nm.POISSON_8:  # RELAX_PrePass.hlsli:12 taps g_Poisson8
            off = nm.rotate_vector2(jnp.broadcast_to(rotator, uv.shape[:2] + (4,)),
                                    jnp.broadcast_to(jnp.asarray(tap[:2]), uv.shape))
            uv_s = (jnp.floor(uv * rect + off * blur_radius[..., None]) + 0.5) / rect
            ns_p = resample.sample_nearest(normal_roughness, uv_s)
            ns, rs, ms = unpack_nr(sc, ns_p, config)
            zs = unpack_view_z(sc, resample.sample_nearest(view_z_in, uv_s))
            xs = world_pos_from_uv(sc, uv_s, zs)

            w_ = resample.is_in_screen_nearest(uv_s)
            w_ = w_ * (zs < sc["denoising_range"]).astype(jnp.float32)
            if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                w_ = w_ * (jnp.maximum(material_id, min_material)
                           == jnp.maximum(ms, min_material)).astype(jnp.float32)
            if is_spec:
                w_ = w_ * nm.compute_weight(rs, ra, rb)
            angle = nm.acos_approx(nm.dot(n, ns))
            w_ = w_ * nm.compute_weight(angle, nwp, 0.0)
            pd = jnp.abs(nm.dot(xs - x, n))
            w_ = w_ * (pd / depth_threshold_scale <= dc["depth_threshold"]).astype(
                jnp.float32)

            s = resample.sample_nearest(signal, uv_s)
            s = jnp.where((w_ == 0.0)[..., None], 0.0, s)
            w_ = w_ * nm.lerp(min_hd_weight, 1.0,
                              nm.compute_exponential_weight(s[..., 3], ha, hb))
            w_ = w_ * nm.get_gaussian_weight(float(tap[2]))

            if is_spec:
                d = nm.length(xs - x)
                t = s[..., 3] / (hit + d + NRD_EPS)
                w_ = w_ * nm.lerp(nm.saturate(t), 1.0, nm.linearstep(0.5, 1.0, roughness))
                min_hit = jnp.where(
                    jnp.logical_and(w_ != 0.0, s[..., 3] != 0.0),
                    jnp.minimum(min_hit, jnp.where(s[..., 3] == 0.0, NRD_INF, s[..., 3])),
                    min_hit)

            wsum = wsum + w_
            if is_spec:
                acc = acc + jnp.concatenate([s[..., :3] * w_[..., None],
                                             jnp.zeros_like(s[..., 3:])], -1)
            else:
                acc = acc + s * w_[..., None]
            if acc_sh is not None:
                sh_s = resample.sample_nearest(sh, uv_s)
                sh_s = jnp.where((w_ == 0.0)[..., None], 0.0, sh_s)
                acc_sh = acc_sh + sh_s * w_[..., None]

        if is_spec:
            out_rgb = acc[..., :3] / wsum[..., None]
            out_hit = jnp.where(min_hit == NRD_INF, 0.0, min_hit)
            out = jnp.concatenate([out_rgb, out_hit[..., None]], -1)
        else:
            out = acc / wsum[..., None]
        out_sh = acc_sh / wsum[..., None] if acc_sh is not None else None
        out = jnp.where(radius_disabled, signal, out)
        if out_sh is not None:
            out_sh = jnp.where(radius_disabled, sh, out_sh)
        out = jnp.clip(out, 0.0, NRD_FP16_MAX)
        if out_sh is not None:
            out_sh = jnp.clip(out_sh, -NRD_FP16_MAX, NRD_FP16_MAX)
        return out, out_sh

    diff_out = diff_sh_out = spec_out = spec_sh_out = None
    if diff is not None:
        diff_out, diff_sh_out = run_channel(diff, diff_sh, False)
    if spec is not None:
        spec_out, spec_sh_out = run_channel(spec, spec_sh, True)
    return diff_out, spec_out, diff_sh_out, spec_sh_out


# ---------------------------------------------------------------------------
# TemporalAccumulation (RELAX_TemporalAccumulation.hlsli)
# ---------------------------------------------------------------------------


def _bicubic_or_bilinear(img, sample_pos, use_bicubic, custom_weights):
    return resample.sample_catrom(img, sample_pos, use_bicubic, custom_weights)


@jax.named_scope("RELAX/temporal_accumulation")
def temporal_accumulation(sc, dc, view_z_in, normal_roughness, mv_in, diff, spec,
                          state, config, diff_confidence=None, spec_confidence=None,
                          dt_mix=None, diff_sh=None, spec_sh=None,
                          pallas: bool = False, has_data=True):
    """Port of the RELAX TA. Returns a dict of outputs.

    state planes: diff/spec_illum_prev (slow rgb+m2), diff/spec_responsive_prev,
    reflection_hit_t, history_length, normal_roughness_prev (packed), material_id_prev,
    view_z_prev, [diff/spec_sh_prev, diff/spec_sh_responsive_prev].
    """
    has_diff = diff is not None
    has_spec = spec is not None
    view_z = unpack_view_z(sc, view_z_in)
    h, w = view_z.shape
    uv = resample.pixel_uv_grid(h, w)
    # plane-wise V3 math for the hot glue (see vec3.py)
    from ..reblur.kernels import unpack_nr3
    n3, roughness, material_id = unpack_nr3(sc, normal_roughness, config)
    u_p, v_p = uv[..., 0], uv[..., 1]
    x3 = world_pos_from_uv3(sc, u_p, v_p, view_z)
    is_persp = sc["ortho_mode"] == 0.0
    fwd_n = nm.normalize(sc["frustum_forward"])
    view_vec3 = v3.where(is_persp, x3,
                         v3.V3(view_z * fwd_n[0], view_z * fwd_n[1], view_z * fwd_n[2]))
    v_3 = -v3.normalize(view_vec3)
    nov = jnp.abs(v3.dot(n3, v_3))
    n = n3.arr()
    v = v_3.arr()
    rect = sc["rect_size"][None, None, :]
    rect_prev = sc["rect_size_prev"][None, None, :]
    rw_, rh_ = sc["rect_size"][0], sc["rect_size"][1]

    # previous position / smb uv (lines 398-415)
    mvs = sc["mv_scale"]
    mv0 = mv_in[..., 0] * mvs[0]
    mv1 = mv_in[..., 1] * mvs[1]
    mv2 = mv_in[..., 2] * mvs[2]
    smb_u_scr = u_p + mv0
    smb_v_scr = v_p + mv1
    w2v_prev = jnp.asarray(sc["world_to_view_prev"])
    mv_z_computed = v3.affine(w2v_prev, x3).z - view_z
    mv_z = jnp.where(sc["mv_scale"][2] == 0.0, mv_z_computed, mv2)
    cd = sc["camera_delta"]
    cd3 = v3.V3(cd[0], cd[1], cd[2])
    x_prev_screen3 = world_pos_from_uv3(sc, smb_u_scr, smb_v_scr, view_z + mv_z,
                                        prev=True) + cd3
    x_prev_world3 = x3 + v3.V3(mv0, mv1, mv2)
    smb_u_wld, smb_v_wld = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]),
                                            x_prev_world3)
    is_world_mv = sc["mv_scale"][3] != 0.0
    xp3 = v3.where(is_world_mv, x_prev_world3, x_prev_screen3)
    smb_u = jnp.where(is_world_mv, smb_u_wld, smb_u_scr)
    smb_v = jnp.where(is_world_mv, smb_v_wld, smb_v_scr)
    x = x3.arr()
    x_prev = xp3.arr()
    uv_smb = jnp.stack([smb_u, smb_v], -1)

    # 3x3: min spec hitT + averaged normal (lines 432-453)
    if not pallas:
        n_avg = jnp.zeros_like(n)
        if has_spec:
            hit_src = spec[..., 3]
            min_hit = jnp.where(hit_src == 0.0, NRD_INF, hit_src)
        for dy, dx in stencil.offsets_square(1):
            ns, _, _ = unpack_nr(sc, stencil.shifted(normal_roughness, dy, dx), config)
            n_avg = n_avg + ns
            if has_spec and not (dy == 0 and dx == 0):
                t = stencil.shifted(hit_src, dy, dx)
                min_hit = jnp.minimum(min_hit, jnp.where(t == 0.0, NRD_INF, t))
        n_avg = n_avg / 9.0
        n_avg_unit = nm.normalize(n_avg)

    if has_spec and not pallas:
        roughness_modified = jnp.sqrt(nm.saturate(
            roughness * roughness + nm.saturate(1.0 - nm.length(n_avg) ** 2)
            / jnp.maximum(nm.length(n_avg) * (3.0 - nm.length(n_avg) ** 2), 1e-15)))

    # parallax (lines 470-477)
    cam_delta = sc["camera_delta"][None, None, :]
    zp1_u = jnp.where(is_persp, smb_u, u_p)
    zp1_v = jnp.where(is_persp, smb_v, v_p)
    zp2_u = jnp.where(is_persp, u_p, smb_u)
    zp2_v = jnp.where(is_persp, v_p, smb_v)
    p1u, p1v = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), xp3 + cd3)
    p2u, p2v = v3.get_screen_uv(jnp.asarray(sc["world_to_clip"]), xp3 - cd3)
    p1_uv = jnp.stack([p1u, p1v], -1)
    d1x = (p1u - zp1_u) * rw_
    d1y = (p1v - zp1_v) * rh_
    d2x = (p2u - zp2_u) * rw_
    d2y = (p2v - zp2_v) * rh_
    parallax1 = jnp.sqrt(d1x * d1x + d1y * d1y)
    parallax2 = jnp.sqrt(d2x * d2x + d2y * d2y)
    parallax_max = jnp.maximum(parallax1, parallax2)
    parallax_min = jnp.minimum(parallax1, parallax2)
    pixel_size = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"], 1.0, view_z)

    # disocclusion threshold (lines 479-486)
    mix_ = jnp.where(material_id == sc["strand_material_id"],
                     fe.get_normalized_strand_thickness(sc["strand_thickness"], pixel_size),
                     0.0)
    if dt_mix is not None:
        mix_ = dt_mix
    disocclusion_threshold = nm.lerp(
        sc["disocclusion_threshold"] + sc["disocclusion_threshold_bonus"],
        sc["disocclusion_threshold_alternate"] + sc["disocclusion_threshold_bonus"], mix_)

    # ---- loadSurfaceMotionBasedPrevData (lines 30-218) ----
    bilinear_origin, bilinear_frac = nm.bilinear_filter(uv_smb, rect_prev)
    frustum_size = pixel_size * min(config.rect_size)
    slope_scale = 1.0 / nm.lerp(nm.lerp(0.05, 1.0, nov), 1.0,
                                nm.saturate(parallax_max / 30.0))
    base_thr = nm.saturate(disocclusion_threshold * slope_scale) * frustum_size

    xv_prev_z_p = (x_prev @ w2v_prev[:3, :3].T + w2v_prev[:3, 3])[..., 2]
    smb_bundle = None
    if pallas:
        from ...kernels.relax_pallas import relax_smb_resolve

        smb_mvy, smb_mvx = _uv2mv(uv_smb, h, w, sc["rect_size_prev"])
        hist_planes = []
        bil_planes = []
        if has_diff:
            hist_planes += [state["diff_illum_prev"][..., c] for c in range(4)]
            hist_planes += [state["diff_responsive_prev"][..., c] for c in range(4)]
            if diff_sh is not None:
                bil_planes += [state["diff_sh_prev"][..., c] for c in range(4)]
                bil_planes += [state["diff_sh_responsive_prev"][..., c]
                               for c in range(4)]
        if has_spec:
            hist_planes += [state["spec_illum_prev"][..., c] for c in range(4)]
            hist_planes += [state["spec_responsive_prev"][..., c] for c in range(4)]
            if spec_sh is not None:
                bil_planes += [state["spec_sh_prev"][..., c] for c in range(4)]
                bil_planes += [state["spec_sh_responsive_prev"][..., c]
                               for c in range(4)]
        smb_bundle = relax_smb_resolve(
            sc, dc, config, mv_pix_y=smb_mvy, mv_pix_x=smb_mvx,
            xv_prev_z=xv_prev_z_p, base_thr=base_thr, material_id=material_id,
            cur_nr_packed=normal_roughness,
            cur_spec_hit=spec[..., 3] if has_spec else None,
            prev_view_z=state["view_z_prev"], prev_mat=state["material_id_prev"],
            prev_hl=state["history_length"],
            prev_ht=state.get("reflection_hit_t"),
            prev_nr_packed=state["normal_roughness_prev"],
            hist_planes=hist_planes, has_spec=has_spec, bil_planes=bil_planes)
        n_avg = smb_bundle["n_avg"]
        n_avg_unit = smb_bundle["n_avg_unit"]
        if has_spec:
            min_hit = smb_bundle["min_hit"]
            roughness_modified = jnp.sqrt(nm.saturate(
                roughness * roughness + nm.saturate(1.0 - nm.length(n_avg) ** 2)
                / jnp.maximum(nm.length(n_avg) * (3.0 - nm.length(n_avg) ** 2),
                              1e-15)))
        use_bicubic = smb_bundle["bicubic_valid"]
        any_valid = smb_bundle["any_valid"]
        sample_pos = uv_smb * rect_prev
        custom_w = None
        smb_found = jnp.where(any_valid, jnp.where(use_bicubic, 2.0, 1.0), 0.0)
        footprint_quality = jnp.where(use_bicubic, 1.0, smb_bundle["custom_wsum"])
        footprint_quality = jnp.where(any_valid, footprint_quality, 0.0)
    if pallas:
        history_length = jnp.minimum(smb_bundle["history_length"] + 1.0,
                                     RELAX_MAX_ACCUM_FRAME_NUM)
        x0 = y0 = None
        out = {}
    else:
        in_screen4 = resample.is_in_screen_bilinear(bilinear_origin,
                                                    sc["rect_size_prev"])
        quad_thr = [base_thr * in_screen4[..., q] - NRD_EPS for q in range(4)]

        z_taps = [[None] * 4 for _ in range(4)]
        mat_taps = [[None] * 4 for _ in range(4)]
        x0 = bilinear_origin[..., 0].astype(jnp.int32) - 1
        y0 = bilinear_origin[..., 1].astype(jnp.int32) - 1
        for j in range(4):
            for i in range(4):
                z_taps[j][i] = unpack_view_z(
                    sc, resample.texel_fetch(state["view_z_prev"], x0 + i, y0 + j))
                mat_taps[j][i] = resample.texel_fetch(state["material_id_prev"],
                                                      x0 + i, y0 + j)

        xv_prev_z = xv_prev_z_p
        CORNERS = ((0, 0), (3, 0), (0, 3), (3, 3))
        min_material = jnp.minimum(dc["spec_min_material"], dc["diff_min_material"])
        occ = [[None] * 4 for _ in range(4)]
        for j in range(4):
            for i in range(4):
                q = (1 if i >= 2 else 0) + (2 if j >= 2 else 0)
                ok = (jnp.abs(z_taps[j][i] - xv_prev_z)
                      <= quad_thr[q]).astype(jnp.float32)
                if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                    ok = ok * (jnp.maximum(material_id, min_material)
                               == jnp.maximum(mat_taps[j][i],
                                              min_material)).astype(jnp.float32)
                occ[j][i] = ok
        occ12 = sum(occ[j][i] for j in range(4) for i in range(4)
                    if (i, j) not in CORNERS)
        bicubic_valid = (occ12 > 11.5).astype(jnp.float32)
        bilinear_valid = jnp.stack([occ[1][1], occ[1][2], occ[2][1], occ[2][2]], -1)

        # prev flat normal via bilinear at footprint center (lines 124-135)
        center_uv = (bilinear_origin + 1.0) / sc["resource_size"][None, None, :] \
            if "resource_size" in sc else (bilinear_origin + 1.0) / rect_prev
        prev_nr_bilin = resample.sample_bilinear(state["normal_roughness_prev"],
                                                 center_uv)
        prev_normal_flat, _ = unpack_prev_normal_roughness(prev_nr_bilin)
        prev_normal_flat = prev_normal_flat @ jnp.asarray(
            sc["world_prev_to_world"])[:3, :3].T
        backface = nm.dot(n_avg_unit, prev_normal_flat) < 0.0
        bilinear_valid = jnp.where(backface[..., None], 0.0, bilinear_valid)
        bicubic_valid = jnp.where(backface, 0.0, bicubic_valid)

        custom_w = nm.get_bilinear_custom_weights(bilinear_frac, bilinear_valid)
        use_bicubic = bicubic_valid > 0.0
        sample_pos = uv_smb * rect_prev

        any_valid = jnp.any(bilinear_valid > 0.0, -1)
        smb_found = jnp.where(any_valid, jnp.where(use_bicubic, 2.0, 1.0), 0.0)
        footprint_quality = jnp.where(use_bicubic, 1.0, jnp.sum(custom_w, -1))
        footprint_quality = jnp.where(any_valid, footprint_quality, 0.0)

        out = {}

        # history length (lines 191-199)
        len_taps = [resample.texel_fetch(state["history_length"],
                                         x0 + 1 + dx, y0 + 1 + dy)
                    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))]
        history_length = nm.apply_bilinear_custom_weights(
            len_taps[0][..., None], len_taps[1][..., None], len_taps[2][..., None],
            len_taps[3][..., None], custom_w)[..., 0]
        history_length = jnp.minimum(history_length + 1.0, RELAX_MAX_ACCUM_FRAME_NUM)

    # footprint quality refinements (lines 547-562)
    v_prev = jnp.where(sc["ortho_mode"] == 0.0,
                       -nm.normalize(x_prev - cam_delta),
                       -nm.normalize(sc["prev_frustum_forward"])[None, None, :])
    nov_prev = jnp.abs(nm.dot(n, v_prev))
    size_quality = (nov_prev + 1e-3) / (nov + 1e-3)
    size_quality = size_quality ** 4
    footprint_quality = footprint_quality * nm.lerp(
        0.1, 1.0, nm.saturate(size_quality + jnp.abs(sc["ortho_mode"])))
    history_length = jnp.where(footprint_quality < 1.0,
                               jnp.maximum(history_length * jnp.sqrt(footprint_quality), 1.0),
                               history_length)
    history_length = jnp.where(sc["reset_history"] != 0.0, 1.0, history_length)
    max_frames = 1.0 + jnp.maximum(dc["diff_max_accumulated_frame_num"],
                                   dc["spec_max_accumulated_frame_num"])
    history_length = jnp.minimum(history_length, max_frames)
    out["history_length"] = history_length

    # ---- diffuse accumulation (lines 580-621) ----
    if has_diff:
        dmax = dc["diff_max_accumulated_frame_num"]
        dmax_fast = dc["diff_max_fast_accumulated_frame_num"]
        if diff_confidence is not None:
            dmax = dmax * diff_confidence
            dmax_fast = dmax_fast * diff_confidence
        if pallas:
            prev_diff = jnp.stack(smb_bundle["hist"][0:4], -1)
            prev_diff_resp = jnp.stack(smb_bundle["hist"][4:8], -1)
        else:
            prev_diff = _bicubic_or_bilinear(state["diff_illum_prev"], sample_pos,
                                             use_bicubic, custom_w)
            prev_diff_resp = _bicubic_or_bilinear(state["diff_responsive_prev"],
                                                  sample_pos, use_bicubic, custom_w)
        prev_diff = jnp.maximum(prev_diff, 0.0)
        prev_diff_resp = jnp.maximum(prev_diff_resp, 0.0)
        found = smb_found > 0.0
        alpha = jnp.where(found, jnp.maximum(1.0 / (dmax + 1.0), 1.0 / history_length), 1.0)
        alpha_resp = jnp.where(found, jnp.maximum(1.0 / (dmax_fast + 1.0),
                                                  1.0 / history_length), 1.0)
        if not (isinstance(has_data, bool) and has_data):
            # checkerboard accumulation slowdown (RELAX TA :597-607)
            nd = jnp.logical_and(jnp.logical_not(has_data), history_length > 1.0)
            cb_f = 1.0 - sc["checkerboard_resolve_accum_speed"]
            alpha = jnp.where(nd, alpha * cb_f, alpha)
            alpha_resp = jnp.where(nd, alpha_resp * cb_f, alpha_resp)
        m1 = nm.luminance(diff[..., :3])
        diff_and_m2 = jnp.concatenate([diff[..., :3], (m1 * m1)[..., None]], -1)
        out["diff"] = nm.lerp(prev_diff, diff_and_m2, alpha[..., None])
        out["diff_fast"] = jnp.concatenate([
            nm.lerp(prev_diff_resp[..., :3], diff[..., :3], alpha_resp[..., None]),
            jnp.zeros_like(m1)[..., None]], -1)
        if diff_sh is not None:
            if pallas:
                prev_sh = jnp.stack(smb_bundle["bil"][0:4], -1)
                prev_sh_resp = jnp.stack(smb_bundle["bil"][4:8], -1)
            else:
                prev_sh = resample.bilinear_custom(state["diff_sh_prev"],
                                                   bilinear_origin, custom_w)
                prev_sh_resp = resample.bilinear_custom(
                    state["diff_sh_responsive_prev"], bilinear_origin, custom_w)
            out["diff_sh"] = nm.lerp(prev_sh, diff_sh, alpha[..., None])
            out["diff_sh_fast"] = nm.lerp(prev_sh_resp, diff_sh, alpha_resp[..., None])

    # ---- specular accumulation (lines 625-929) ----
    if has_spec:
        smax = dc["spec_max_accumulated_frame_num"]
        smax_fast = dc["spec_max_fast_accumulated_frame_num"]
        if spec_confidence is not None:
            smax = smax * spec_confidence
            smax_fast = smax_fast * spec_confidence
        spec_frames = jnp.minimum(smax, history_length)
        spec_resp_frames = jnp.minimum(smax_fast, history_length)

        hit_dist = jnp.where(min_hit == NRD_INF, 0.0, min_hit)

        # curvature (lines 642-723) - same construction as REBLUR; plane-wise V3
        uvzp_u = jnp.where(is_persp, smb_u, u_p)
        uvzp_v = jnp.where(is_persp, smb_v, v_p)
        inv_par = 1.0 / jnp.maximum(parallax1, 1.0 / 256.0)
        dux = (uvzp_u - p1u) * rw_ * inv_par
        duy = (uvzp_v - p1v) * rh_ * inv_par
        riw_, rih_ = sc["rect_size_inv"][0], sc["rect_size_inv"][1]
        mat_occ_enc = config.normal_encoding.name == "R10_G10_B10_A2_UNORM"

        def edge_point(du_, dv_):
            xe = world_pos_from_uv3(sc, u_p + du_ * riw_, v_p + dv_ * rih_,
                                    jnp.ones_like(view_z))
            ffn = sc["frustum_forward"]
            ve = v3.where(is_persp, v3.normalize(-xe),
                          v3.V3.full_like(view_z, ffn[0], ffn[1], ffn[2]))
            o = v3.where(is_persp, v3.V3.full_like(view_z, 0.0, 0.0, 0.0), xe)
            ndv = v3.dot(n3, ve)
            t = v3.dot(x3 - o, n3) / jnp.where(jnp.abs(ndv) < 1e-9, 1e-9, ndv)
            return o + ve * t

        x10 = edge_point(1.0, 0.0)
        x01 = edge_point(0.0, 1.0)
        nr01 = stencil.shifted(normal_roughness, 0, 1)
        nr10 = stencil.shifted(normal_roughness, 1, 0)
        if mat_occ_enc:
            n10 = v3.decode_oct_raw(nr01[..., 0], nr01[..., 1])
            n01 = v3.decode_oct_raw(nr10[..., 0], nr10[..., 1])
        else:
            n10 = v3.V3.of(unpack_nr(sc, nr01, config)[0])
            n01 = v3.V3.of(unpack_nr(sc, nr10, config)[0])
        wmx = jnp.abs(dux) + 1.0 / 256.0
        wmy = jnp.abs(duy) + 1.0 / 256.0
        wnorm = 1.0 / (wmx + wmy)
        wmx = wmx * wnorm
        wmy = wmy * wnorm
        x_edge = x10 * wmx + x01 * wmy
        n_edge = v3.normalize(n10 * wmx + n01 * wmy)

        pixel_pos = resample.pixel_pos_grid(h, w)
        bayer = nm.bayer4x4((pixel_pos[..., 0], pixel_pos[..., 1]), sc["frame_index"])
        dulf = parallax_min * (1.0 + sc["framerate_scale"] * bayer)
        mu = (jnp.floor((u_p + dulf * dux * riw_) * rw_) + 0.5) * riw_
        mv_ = (jnp.floor((v_p + dulf * duy * rih_) * rh_) + 0.5) * rih_
        in_screen_high = ((mu > 0.0) & (mu < 1.0) & (mv_ > 0.0)
                          & (mv_ < 1.0)).astype(jnp.float32)
        motion_uv_high = jnp.stack([mu, mv_], -1)
        if pallas:
            from ...kernels.reblur_pallas import nearest_resolve

            hmvy, hmvx = _uv2mv(motion_uv_high, h, w,
                                jnp.asarray([w, h], jnp.float32))
            (zh_raw, nh0, nh1), high_valid = nearest_resolve(
                [view_z_in, normal_roughness[..., 0], normal_roughness[..., 1]],
                hmvy, hmvx)
            z_high = unpack_view_z(sc, zh_raw)
            n_high = v3.decode_oct(nh0, nh1)
            in_screen_high = in_screen_high * high_valid
        else:
            z_high = unpack_view_z(sc, resample.sample_nearest(view_z_in,
                                                               motion_uv_high))
            nr_high = resample.sample_nearest(normal_roughness, motion_uv_high)
            if mat_occ_enc:
                n_high = v3.decode_oct_raw(nr_high[..., 0], nr_high[..., 1])
            else:
                n_high = v3.V3.of(unpack_nr(sc, nr_high, config)[0])
        x_high = world_pos_from_uv3(sc, mu, mv_, z_high)
        z_err = jnp.abs(z_high - view_z) / jnp.maximum(jnp.maximum(z_high, view_z), 1e-15)
        rep = jnp.logical_and(z_err < NRD_CURVATURE_Z_THRESHOLD,
                              jnp.logical_and(dulf > 1.0, in_screen_high > 0.0))
        x_edge = v3.where(rep, x_high, x_edge)
        n_edge = v3.where(rep, n_high, n_edge)
        edge = x_edge - x3
        edge_len_sq = v3.dot(edge, edge)
        curvature = v3.dot(n_edge - n3, edge) / jnp.maximum(edge_len_sq, 1e-15)
        curvature = jnp.where(edge_len_sq < 1e-15, 0.0, curvature)

        hit_dist_focused = nm.apply_thin_lens_equation(hit_dist, curvature)

        # ---- loadVirtualMotionBasedPrevData (lines 222-348) ----
        vvn3 = v3.normalize(view_vec3)
        prev_virtual_pos3 = xp3 + vvn3 * hit_dist_focused
        vmb_u_, vmb_v_ = v3.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]),
                                          prev_virtual_pos3)
        is_cam_attached = material_id == sc["camera_attached_reflection_material_id"]
        vmb_u_ = jnp.where(is_cam_attached, smb_u, vmb_u_)
        vmb_v_ = jnp.where(is_cam_attached, smb_v, vmb_v_)
        uv_vmb = jnp.stack([vmb_u_, vmb_v_], -1)

        vmb_origin, vmb_frac = nm.bilinear_filter(uv_vmb, rect_prev)
        x_minus_delta = x - cam_delta
        vmb_thr_base = disocclusion_threshold * jnp.where(sc["ortho_mode"] == 0.0,
                                                          view_z, 1.0)
        if pallas:
            from ...kernels.relax_pallas import relax_vmb_resolve

            vmvy, vmvx = _uv2mv(uv_vmb, h, w, sc["rect_size_prev"])
            vmb_bundle = relax_vmb_resolve(
                sc, dc, config, mv_pix_y=vmvy, mv_pix_x=vmvx, n=n,
                x_minus_delta=x_minus_delta, thr_base=vmb_thr_base,
                material_id=material_id, smb_bicubic=use_bicubic,
                prev_view_z=state["view_z_prev"], prev_mat=state["material_id_prev"],
                prev_ht=state["reflection_hit_t"],
                prev_nr_packed=state["normal_roughness_prev"],
                spec_illum_prev=state["spec_illum_prev"],
                spec_resp_prev=state["spec_responsive_prev"],
                sh_prev=state.get("spec_sh_prev") if spec_sh is not None else None,
                sh_resp_prev=(state.get("spec_sh_responsive_prev")
                              if spec_sh is not None else None))
            vmb_any = vmb_bundle["any"]
            vmb_all = vmb_bundle["all"]
            vmb_found = vmb_all.astype(jnp.float32)
            prev_spec_vmb = jnp.maximum(vmb_bundle["spec_vmb"], 0.0)
            prev_spec_vmb_resp = jnp.maximum(vmb_bundle["spec_vmb_resp"], 0.0)
            prev_hit_t_vmb = jnp.maximum(0.001, vmb_bundle["hit_t"])
            prev_normal_vmb, prev_roughness_vmb = unpack_prev_normal_roughness(
                vmb_bundle["nr_packed"])
        else:
            in_screen_vmb = resample.is_in_screen_bilinear(vmb_origin,
                                                           sc["rect_size_prev"])
            vmb_valid = []
            vx0 = vmb_origin[..., 0].astype(jnp.int32)
            vy0 = vmb_origin[..., 1].astype(jnp.int32)
            uv_grid_prev = None
            for tap_idx, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                zp = unpack_view_z(sc, resample.texel_fetch(state["view_z_prev"],
                                                            vx0 + dx, vy0 + dy))
                tap_uv = (jnp.stack([(vx0 + dx).astype(jnp.float32),
                                     (vy0 + dy).astype(jnp.float32)], -1)
                          + 0.5) / rect_prev
                xp = world_pos_from_uv(sc, tap_uv, zp, prev=True)
                thr = vmb_thr_base * in_screen_vmb[..., tap_idx] - NRD_EPS
                ok = (jnp.abs(nm.dot(x_minus_delta - xp, n)) <= thr).astype(jnp.float32)
                mp = resample.texel_fetch(state["material_id_prev"], vx0 + dx, vy0 + dy)
                if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                    ok = ok * (jnp.maximum(material_id, dc["spec_min_material"])
                               == jnp.maximum(mp, dc["spec_min_material"]))                         .astype(jnp.float32)
                vmb_valid.append(ok)
            vmb_valid4 = jnp.stack(vmb_valid, -1)
            vmb_any = jnp.any(vmb_valid4 > 0.0, -1)
            vmb_all = jnp.all(vmb_valid4 > 0.0, -1)
            vmb_found = vmb_all.astype(jnp.float32)

            vmb_custom_w = nm.get_bilinear_custom_weights(vmb_frac, vmb_valid4)
            vmb_use_bicubic = jnp.logical_and(use_bicubic, vmb_all)
            vmb_sample_pos = uv_vmb * rect_prev

            prev_spec_vmb = _bicubic_or_bilinear(state["spec_illum_prev"],
                                                 vmb_sample_pos, vmb_use_bicubic,
                                                 vmb_custom_w)
            prev_spec_vmb = jnp.maximum(prev_spec_vmb, 0.0)
            prev_spec_vmb_resp = _bicubic_or_bilinear(state["spec_responsive_prev"],
                                                      vmb_sample_pos, vmb_use_bicubic,
                                                      vmb_custom_w)
            prev_spec_vmb_resp = jnp.maximum(prev_spec_vmb_resp, 0.0)
            prev_hit_t_vmb = resample.sample_bilinear(state["reflection_hit_t"],
                                                      uv_vmb
                                                      * sc["resolution_scale_prev"]
                                                      [None, None, :])
            prev_hit_t_vmb = jnp.maximum(0.001, prev_hit_t_vmb)
            prev_nr_vmb = resample.sample_bilinear(state["normal_roughness_prev"],
                                                   uv_vmb
                                                   * sc["resolution_scale_prev"]
                                                   [None, None, :])
            prev_normal_vmb, prev_roughness_vmb = unpack_prev_normal_roughness(
                prev_nr_vmb)
        prev_normal_vmb = prev_normal_vmb @ jnp.asarray(sc["world_prev_to_world"])[:3, :3].T
        prev_normal_vmb = jnp.where(vmb_any[..., None], prev_normal_vmb, n)
        prev_roughness_vmb = jnp.where(vmb_any, prev_roughness_vmb, 0.0)
        prev_hit_t_vmb = jnp.where(vmb_any, prev_hit_t_vmb, sc["denoising_range"])
        prev_spec_vmb = jnp.where(vmb_any[..., None], prev_spec_vmb, 0.0)
        prev_spec_vmb_resp = jnp.where(vmb_any[..., None], prev_spec_vmb_resp, 0.0)

        # surface-motion specular history (from the smb loader)
        if pallas:
            hofs = 8 if has_diff else 0
            prev_spec_smb = jnp.stack(smb_bundle["hist"][hofs:hofs + 4], -1)
            prev_spec_smb_resp = jnp.stack(smb_bundle["hist"][hofs + 4:hofs + 8], -1)
            prev_hit_t_smb = smb_bundle["reflection_hit_t"]
        else:
            prev_spec_smb = _bicubic_or_bilinear(state["spec_illum_prev"], sample_pos,
                                                 use_bicubic, custom_w)
            prev_spec_smb_resp = _bicubic_or_bilinear(state["spec_responsive_prev"],
                                                      sample_pos, use_bicubic, custom_w)
            ht_taps = [resample.texel_fetch(state["reflection_hit_t"],
                                            x0 + 1 + dx, y0 + 1 + dy)
                       for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1))]
            prev_hit_t_smb = nm.apply_bilinear_custom_weights(
                ht_taps[0][..., None], ht_taps[1][..., None], ht_taps[2][..., None],
                ht_taps[3][..., None], custom_w)[..., 0]
        prev_spec_smb = jnp.maximum(prev_spec_smb, 0.0)
        prev_spec_smb_resp = jnp.maximum(prev_spec_smb_resp, 0.0)
        prev_hit_t_smb = jnp.maximum(0.001, prev_hit_t_smb)

        # virtual history amount (lines 766-813)
        d4 = nm.get_specular_dominant_direction(n, v, roughness_modified)
        virtual_amount = vmb_found * d4[..., 3]
        virtual_amount = virtual_amount * jnp.where(sc["ortho_mode"] == 0.0, 1.0, 0.75)
        virtual_amount = virtual_amount * (nm.dot(prev_normal_vmb, n_avg)
                                           > 0.0).astype(jnp.float32)

        uv_diff = uv_vmb - uv_smb
        uv_diff_px = nm.length(uv_diff * rect)
        tan_curv = jnp.abs(curvature * pixel_size)
        tan_curv = tan_curv * jnp.maximum(uv_diff_px / jnp.maximum(nov, 0.01), 1.0)
        curvature_angle = jnp.arctan(tan_curv)

        lobe_half_angle = jnp.maximum(
            jnp.arctan(get_spec_lobe_tan_half_angle(roughness_modified)), RELAX_NORMAL_ULP)
        normal_weight = nm.get_encoding_aware_normal_weight(
            n, prev_normal_vmb, lobe_half_angle, curvature_angle, RELAX_NORMAL_ULP,
            remap=True)
        virtual_amount = virtual_amount * nm.lerp(1.0 - nm.saturate(uv_diff_px), 1.0,
                                                  normal_weight)

        ra, rb = nm.get_relaxed_roughness_weight_params(roughness * roughness,
                                                        dc["roughness_fraction"])
        vrw = nm.compute_weight(prev_roughness_vmb * prev_roughness_vmb, ra, rb)
        vrw = nm.lerp(1.0 - nm.saturate(uv_diff_px), 1.0, vrw)
        virtual_amount = virtual_amount * jnp.where(sc["ortho_mode"] == 0.0, vrw, 1.0)
        spec_vmb_confidence = vrw * 0.9 + 0.1

        # looking back 1-2 frames (lines 796-813)
        uv_dir = uv_diff * nm.rsqrt_safe(jnp.sum(uv_diff * uv_diff, -1, keepdims=True))
        uv_dir = uv_dir / rect_prev
        uv_dir = uv_dir * (nm.saturate(uv_diff_px / 0.1) + uv_diff_px / 2.0)[..., None]
        ppw = jnp.ones_like(view_z)
        rw = jnp.ones_like(view_z)
        for k in (1.0, 2.0):
            back_uv = uv_vmb + k * uv_dir
            if pallas:
                from ...kernels.reblur_pallas import bilinear_resolve

                bmvy, bmvx = _uv2mv(back_uv, h, w, sc["rect_size_prev"])
                b_planes, b_valid = bilinear_resolve(
                    sc, [state["normal_roughness_prev"][..., c] for c in range(4)],
                    bmvy, bmvx)
                b_nr = jnp.stack(b_planes, -1)
                bn, br = unpack_prev_normal_roughness(b_nr)
                bn = bn @ jnp.asarray(sc["world_prev_to_world"])[:3, :3].T
                in_s = (resample.is_in_screen_nearest(back_uv) * b_valid) > 0.0
            else:
                b_nr = resample.sample_bilinear(state["normal_roughness_prev"],
                                                back_uv * sc["resolution_scale_prev"]
                                                [None, None, :])
                bn, br = unpack_prev_normal_roughness(b_nr)
                bn = bn @ jnp.asarray(sc["world_prev_to_world"])[:3, :3].T
                in_s = resample.is_in_screen_nearest(back_uv) > 0.0
            wk = nm.get_encoding_aware_normal_weight(prev_normal_vmb, bn, lobe_half_angle,
                                                     curvature_angle * (k + 1.0),
                                                     RELAX_NORMAL_ULP, remap=True)
            ppw = ppw * jnp.where(in_s, wk, 1.0)
            rw = rw * nm.compute_weight(br * br, ra, rb)
        virtual_amount = virtual_amount * (0.33 + 0.67 * ppw)
        spec_vmb_confidence = spec_vmb_confidence * (0.33 + 0.67 * ppw)
        virtual_amount = virtual_amount * jnp.where(sc["ortho_mode"] == 0.0,
                                                    rw * 0.9 + 0.1, 1.0)

        # hit distance confidence (lines 815-843)
        smc = nm.get_spec_magic_curve(roughness_modified)
        hit_dist_c = nm.lerp(spec[..., 3], prev_hit_t_smb, smc)
        hd1 = nm.apply_thin_lens_equation(hit_dist_c, curvature)
        hd2 = nm.apply_thin_lens_equation(prev_hit_t_vmb, curvature)
        max_dist = jnp.maximum(hd1, hd2)
        d_hit = jnp.abs(hd1 - hd2)
        mult = nm.lerp(20.0, 0.0, smc)
        vhd_conf = 1.0 - nm.saturate(mult * d_hit / (view_z + max_dist))
        vhd_conf = nm.lerp(vhd_conf, 1.0, smc)

        from ..reblur.kernels import get_xvirtual
        xv1 = get_xvirtual(sc, hit_dist, curvature, x, x_prev, n, v, roughness)
        xv1_len = nm.length(xv1)
        hdt_prev = prev_spec_vmb_resp[..., 3]
        xv2 = get_xvirtual(sc, hdt_prev, curvature, x, x_prev, n, v, roughness)
        xv2_len = nm.length(xv2)
        uv_vmb_test = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), xv2)
        uv_vmb_test = jnp.where(is_cam_attached[..., None], uv_smb, uv_vmb_test)
        lobe_tan2 = jnp.maximum(get_spec_lobe_tan_half_angle(roughness, 0.6),
                                0.5 * sc["rect_size_inv"][0])
        unproj1 = jnp.minimum(hit_dist, hdt_prev) / jnp.maximum(
            nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"], 1.0,
                                     jnp.maximum(xv1_len, xv2_len)), 1e-15)
        lobe_radius_px = lobe_tan2 * unproj1
        delta_par_px = nm.length((uv_vmb_test - uv_vmb) * rect)
        vhd_conf = vhd_conf * nm.smoothstep(lobe_radius_px + 0.25, 0.0, delta_par_px)

        # surface motion confidence (lines 845-852)
        spec_smb_confidence = (smb_found > 0).astype(jnp.float32) \
            * nm.get_encoding_aware_normal_weight(
                v, v_prev, lobe_half_angle * nov / sc["framerate_scale"],
                jnp.zeros_like(nov), 0.0)
        spec_smb_alpha = jnp.maximum(1.0 - spec_smb_confidence,
                                     1.0 / (1.0 + spec_frames))
        spec_smb_resp_alpha = jnp.maximum(spec_smb_alpha, 1.0 / (1.0 + spec_resp_frames))
        if not (isinstance(has_data, bool) and has_data):
            # checkerboard accumulation slowdown, smb half (RELAX TA :858-863)
            cbra = sc["checkerboard_resolve_accum_speed"]
            nd = jnp.logical_and(jnp.logical_not(has_data), parallax_max < 0.5)
            f_smb = 1.0 - cbra * (smb_found > 0).astype(jnp.float32)
            spec_smb_alpha = jnp.where(nd, spec_smb_alpha * f_smb, spec_smb_alpha)
            spec_smb_resp_alpha = jnp.where(nd, spec_smb_resp_alpha * f_smb,
                                            spec_smb_resp_alpha)

        m1s = nm.luminance(spec[..., :3])
        spec_m2 = m1s * m1s
        acc_smb_rgb = nm.lerp(prev_spec_smb[..., :3], spec[..., :3],
                              spec_smb_alpha[..., None])
        acc_smb_hit = nm.lerp(prev_hit_t_smb, spec[..., 3],
                              jnp.maximum(spec_smb_alpha, 0.1))
        acc_smb_m2 = nm.lerp(prev_spec_smb[..., 3], spec_m2, spec_smb_alpha)
        acc_smb_resp = nm.lerp(prev_spec_smb_resp[..., :3], spec[..., :3],
                               spec_smb_resp_alpha[..., None])

        spec_vmb_alpha = jnp.maximum(1.0 - spec_vmb_confidence,
                                     1.0 / (1.0 + spec_frames))
        spec_vmb_resp_alpha = jnp.maximum(1.0 - spec_vmb_confidence * vhd_conf,
                                          1.0 / (1.0 + spec_resp_frames))
        spec_vmb_hit_alpha = jnp.maximum(1.0 - spec_vmb_confidence * vhd_conf,
                                         1.0 / (1.0 + spec_frames))
        if not (isinstance(has_data, bool) and has_data):
            # checkerboard accumulation slowdown, vmb half (RELAX TA :881-887)
            cbra = sc["checkerboard_resolve_accum_speed"]
            nd = jnp.logical_and(jnp.logical_not(has_data), parallax_max < 0.5)
            f_vmb = 1.0 - cbra * vmb_found
            spec_vmb_alpha = jnp.where(nd, spec_vmb_alpha * f_vmb, spec_vmb_alpha)
            spec_vmb_resp_alpha = jnp.where(nd, spec_vmb_resp_alpha * f_vmb,
                                            spec_vmb_resp_alpha)
            spec_vmb_hit_alpha = jnp.where(nd, spec_vmb_hit_alpha * f_vmb,
                                           spec_vmb_hit_alpha)
        acc_vmb_rgb = nm.lerp(prev_spec_vmb[..., :3], spec[..., :3],
                              spec_vmb_alpha[..., None])
        acc_vmb_hit = nm.lerp(prev_hit_t_vmb, spec[..., 3],
                              jnp.maximum(spec_vmb_hit_alpha, 0.1))
        acc_vmb_m2 = nm.lerp(prev_spec_vmb[..., 3], spec_m2, spec_vmb_alpha)
        acc_vmb_resp = nm.lerp(prev_spec_vmb_resp[..., :3], spec[..., :3],
                               spec_vmb_resp_alpha[..., None])

        virtual_amount = virtual_amount * nm.saturate(
            spec_vmb_confidence / (spec_smb_confidence + NRD_EPS))

        acc_hit_t = nm.lerp(acc_smb_hit, acc_vmb_hit, virtual_amount)
        acc_rgb = nm.lerp(acc_smb_rgb, acc_vmb_rgb, virtual_amount[..., None])
        acc_resp = nm.lerp(acc_smb_resp, acc_vmb_resp, virtual_amount[..., None])
        acc_m2 = nm.lerp(acc_smb_m2, acc_vmb_m2, virtual_amount)

        spec_history_confidence = nm.lerp(spec_smb_confidence, spec_vmb_confidence,
                                          virtual_amount)
        acc_m2 = jnp.where(acc_m2 == 0.0,
                           dc["spec_variance_boost"] * (1.0 - spec_history_confidence),
                           acc_m2)

        out["spec"] = jnp.concatenate([acc_rgb, acc_m2[..., None]], -1)
        out["spec_fast"] = jnp.concatenate([acc_resp, hit_dist[..., None]], -1)
        out["reflection_hit_t"] = acc_hit_t
        out["spec_reprojection_confidence"] = spec_history_confidence
        if spec_sh is not None:
            if pallas:
                bofs = 8 if (has_diff and diff_sh is not None) else 0
                prev_sh_smb = jnp.stack(smb_bundle["bil"][bofs:bofs + 4], -1)
                prev_sh_smb_resp = jnp.stack(smb_bundle["bil"][bofs + 4:bofs + 8], -1)
                prev_sh_vmb = vmb_bundle["sh_vmb"]
                prev_sh_vmb_resp = vmb_bundle["sh_vmb_resp"]
            else:
                prev_sh_smb = resample.bilinear_custom(state["spec_sh_prev"],
                                                       bilinear_origin, custom_w)
                prev_sh_smb_resp = resample.bilinear_custom(
                    state["spec_sh_responsive_prev"], bilinear_origin, custom_w)
                prev_sh_vmb = resample.bilinear_custom(state["spec_sh_prev"],
                                                       vmb_origin, vmb_custom_w)
                prev_sh_vmb_resp = resample.bilinear_custom(
                    state["spec_sh_responsive_prev"], vmb_origin, vmb_custom_w)
            acc_sh_smb = nm.lerp(prev_sh_smb, spec_sh, spec_smb_alpha[..., None])
            acc_sh_smb_resp = nm.lerp(prev_sh_smb_resp, spec_sh,
                                      spec_smb_resp_alpha[..., None])
            acc_sh_vmb = nm.lerp(prev_sh_vmb, spec_sh, spec_vmb_alpha[..., None])
            acc_sh_vmb_resp = nm.lerp(prev_sh_vmb_resp, spec_sh,
                                      spec_vmb_resp_alpha[..., None])
            sh_acc = nm.lerp(acc_sh_smb, acc_sh_vmb, virtual_amount[..., None])
            sh_resp = nm.lerp(acc_sh_smb_resp, acc_sh_vmb_resp, virtual_amount[..., None])
            out["spec_sh"] = jnp.concatenate([sh_acc[..., :3],
                                              roughness_modified[..., None]], -1)
            out["spec_sh_fast"] = sh_resp

    return out


# ---------------------------------------------------------------------------
# HistoryFix (RELAX_HistoryFix.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("RELAX/history_fix")
def history_fix(sc, dc, view_z_in, normal_roughness, history_length, diff, spec, config,
                diff_sh=None, spec_sh=None, pallas: bool = False):
    """Sparse 5x5 cross-bilateral reconstruction of the RESPONSIVE history after
    disocclusion. Returns (diff_out, spec_out, diff_sh_out, spec_sh_out)."""
    view_z = unpack_view_z(sc, view_z_in)
    h, w = view_z.shape
    uv = resample.pixel_uv_grid(h, w)
    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)
    x = world_pos_from_uv(sc, uv, view_z)
    depth_threshold = dc["depth_threshold"] * jnp.where(sc["ortho_mode"] == 0.0,
                                                        view_z, 1.0)
    cv = -nm.normalize(x)

    angle0, f0 = get_normal_weight_params_atrous(
        roughness, jnp.full_like(roughness, 5.0), jnp.ones_like(roughness), 0.0,
        dc["lobe_angle_fraction"], dc["spec_lobe_angle_slack"])

    stride = jnp.floor(dc["history_fix_base_pixel_stride"] / (1.0 + history_length) + 0.5)
    apply_fix = jnp.logical_and(history_length <= dc["history_fix_frame_num"],
                                dc["history_fix_frame_num"] != 1.0)

    if pallas:
        from ...kernels.relax_pallas import relax_history_fix_pallas

        kw = {}
        if spec is not None:
            kw = dict(angle0=angle0, f0=f0)
        d_fix, s_fix, dsh_fix, ssh_fix = relax_history_fix_pallas(
            sc, dc, config, stride=stride, thr_eff=depth_threshold, n=n, x=x, cv=cv,
            material_id=material_id, view_z_in=view_z_in,
            normal_roughness=normal_roughness, diff=diff, spec=spec,
            apply_fix=apply_fix, diff_sh=diff_sh, spec_sh=spec_sh, **kw)
        outs_p = []
        for fixed, orig in ((d_fix, diff), (s_fix, spec),
                            (dsh_fix, diff_sh), (ssh_fix, spec_sh)):
            outs_p.append(None if orig is None
                          else jnp.where(apply_fix[..., None], fixed, orig))
        return outs_p[0], outs_p[1], outs_p[2], outs_p[3]

    pos_grid = resample.pixel_pos_grid(h, w).astype(jnp.float32)

    diff_acc = diff
    spec_acc = spec
    diff_sh_acc = diff_sh
    spec_sh_acc = spec_sh
    diff_wsum = jnp.ones_like(view_z)
    spec_wsum = jnp.ones_like(view_z)

    for j in range(-2, 3):
        for i in range(-2, 3):
            if i == 0 and j == 0:
                continue
            pos = pos_grid + jnp.asarray([i, j], jnp.float32) * stride[..., None]
            inside = jnp.logical_and(
                jnp.logical_and(pos[..., 0] >= 0, pos[..., 0] < w),
                jnp.logical_and(pos[..., 1] >= 0, pos[..., 1] < h)).astype(jnp.float32)
            px = jnp.clip(pos[..., 0], 0, w - 1).astype(jnp.int32)
            py = jnp.clip(pos[..., 1], 0, h - 1).astype(jnp.int32)
            ns, _, ms = unpack_nr(sc, resample.texel_fetch(normal_roughness, px, py),
                                  config)
            zs = unpack_view_z(sc, resample.texel_fetch(view_z_in, px, py))
            uv_s = (jnp.stack([px.astype(jnp.float32), py.astype(jnp.float32)], -1)
                    + 0.5) / sc["rect_size"][None, None, :]
            xs = world_pos_from_uv(sc, uv_s, zs)
            gw = get_plane_distance_weight_atrous(x, n, xs, depth_threshold)
            if diff is not None:
                dw = gw * jnp.power(jnp.maximum(0.01, nm.dot(n, ns)),
                                    jnp.maximum(dc["history_fix_edge_stopping_normal_power"],
                                                0.01))
                dw = dw * inside
                if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                    dw = dw * (jnp.maximum(ms, dc["diff_min_material"])
                               == jnp.maximum(material_id,
                                              dc["diff_min_material"])).astype(jnp.float32)
                s = resample.texel_fetch(diff, px, py)
                diff_acc = diff_acc + jnp.where((dw > 1e-4)[..., None], s * dw[..., None],
                                                0.0)
                diff_wsum = diff_wsum + jnp.where(dw > 1e-4, dw, 0.0)
                if diff_sh is not None:
                    sh_s = resample.texel_fetch(diff_sh, px, py)
                    diff_sh_acc = diff_sh_acc + jnp.where((dw > 1e-4)[..., None],
                                                          sh_s * dw[..., None], 0.0)
            if spec is not None:
                sv = -nm.normalize(xs + dc["roughness_edge_stopping_relaxation"] * x)
                sw = gw * get_specular_normal_weight_atrous(angle0, f0, n, ns, cv, sv)
                sw = sw * inside
                if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                    sw = sw * (jnp.maximum(ms, dc["spec_min_material"])
                               == jnp.maximum(material_id,
                                              dc["spec_min_material"])).astype(jnp.float32)
                s = resample.texel_fetch(spec, px, py)
                spec_acc = spec_acc + jnp.where((sw > 1e-4)[..., None], s * sw[..., None],
                                                0.0)
                spec_wsum = spec_wsum + jnp.where(sw > 1e-4, sw, 0.0)
                if spec_sh is not None:
                    sh_s = resample.texel_fetch(spec_sh, px, py)
                    spec_sh_acc = spec_sh_acc + jnp.where((sw > 1e-4)[..., None],
                                                          sh_s * sw[..., None], 0.0)

    outs = []
    for acc, wsum, orig in ((diff_acc, diff_wsum, diff), (spec_acc, spec_wsum, spec)):
        if orig is None:
            outs.append(None)
            continue
        fixed = acc / wsum[..., None]
        outs.append(jnp.where(apply_fix[..., None], fixed, orig))
    sh_outs = []
    for acc, wsum, orig in ((diff_sh_acc, diff_wsum, diff_sh),
                            (spec_sh_acc, spec_wsum, spec_sh)):
        if orig is None:
            sh_outs.append(None)
            continue
        fixed = acc / wsum[..., None]
        sh_outs.append(jnp.where(apply_fix[..., None], fixed, orig))
    return outs[0], outs[1], sh_outs[0], sh_outs[1]


# ---------------------------------------------------------------------------
# HistoryClamping (RELAX_HistoryClamping.hlsli)
# ---------------------------------------------------------------------------


@jax.named_scope("RELAX/history_clamping")
def history_clamping(sc, dc, view_z_in, noisy_diff, noisy_spec, diff_slow, spec_slow,
                     diff_resp, spec_resp, history_length, config,
                     diff_sh=None, spec_sh=None, diff_sh_fast=None, spec_sh_fast=None,
                     pallas: bool = False):
    """Sigma color-box clamp of slow history to responsive history + antilag
    (acceleration + reset). Returns dict of updated histories.

    pallas=True runs the 5x5 validity-weighted moments in kernels/relax_pallas;
    everything else is elementwise."""
    view_z = unpack_view_z(sc, view_z_in)
    is_valid = (view_z < sc["denoising_range"]).astype(jnp.float32)

    out = {"history_length": history_length}

    pallas_moments = None
    if pallas:
        from ...kernels.relax_pallas import relax_clamp_moments_pallas

        sig_planes = []
        if noisy_diff is not None:
            sig_planes.append((nm.linear_to_ycocg(diff_resp[..., :3]),
                               noisy_diff[..., :3]))
        if noisy_spec is not None:
            sig_planes.append((nm.linear_to_ycocg(spec_resp[..., :3]),
                               noisy_spec[..., :3]))
        pallas_moments = iter(relax_clamp_moments_pallas(is_valid, sig_planes))

    def run(noisy, slow, resp, sh, sh_fast, is_spec):
        # 5x5 moments of responsive (YCoCg) + noisy (lines 95-140)
        resp_ycocg = nm.linear_to_ycocg(resp[..., :3])
        if pallas_moments is not None:
            m1, m2, nm1, nm2 = next(pallas_moments)
        else:
            m1 = jnp.zeros_like(resp_ycocg)
            m2 = jnp.zeros_like(resp_ycocg)
            nm1 = jnp.zeros_like(resp_ycocg)
            nm2 = jnp.zeros_like(view_z)
            wsum = jnp.zeros_like(view_z)
            for dy, dx in stencil.offsets_square(2):
                w_ = stencil.shifted(is_valid, dy, dx)
                ry = stencil.shifted(resp_ycocg, dy, dx)
                nz = stencil.shifted(noisy[..., :3], dy, dx)
                m1 = m1 + ry * w_[..., None]
                m2 = m2 + ry * ry * w_[..., None]
                nl = nm.luminance(nz)
                nm1 = nm1 + nz * w_[..., None]
                nm2 = nm2 + nl * nl * w_
                wsum = wsum + w_
            wsum = jnp.maximum(wsum, 1.0)
            m1 = m1 / wsum[..., None]
            m2 = m2 / wsum[..., None]
            nm1 = nm1 / wsum[..., None]
            nm2 = nm2 / wsum
        sigma = jnp.sqrt(jnp.maximum(0.0, m2 - m1 * m1))
        cmin = m1 - dc["color_box_sigma_scale"] * sigma
        cmax = m1 + dc["color_box_sigma_scale"] * sigma
        cmin = jnp.minimum(cmin, resp_ycocg)
        cmax = jnp.maximum(cmax, resp_ycocg)

        slow_ycocg = nm.linear_to_ycocg(slow[..., :3])
        fast_enabled = (dc[("spec" if is_spec else "diff")
                           + "_max_fast_accumulated_frame_num"]
                        < dc[("spec" if is_spec else "diff")
                             + "_max_accumulated_frame_num"])
        clamped_ycocg = jnp.where(fast_enabled, jnp.clip(slow_ycocg, cmin, cmax),
                                  slow_ycocg)
        clamped = nm.ycocg_to_linear(clamped_ycocg)

        in_fix = history_length <= dc["history_fix_frame_num"]
        out_slow_rgb = jnp.where(in_fix[..., None], resp[..., :3], clamped)
        out_resp_rgb = resp[..., :3]

        denom = resp_ycocg[..., 0] - slow_ycocg[..., 0]
        clamping_factor = jnp.where(
            (clamped_ycocg[..., 0] - slow_ycocg[..., 0]) == 0.0, 0.0,
            nm.saturate((clamped_ycocg[..., 0] - slow_ycocg[..., 0])
                        / jnp.where(jnp.abs(denom) < 1e-15, 1e-15, denom)))
        clamping_factor = jnp.where(in_fix, 1.0, clamping_factor)

        scale = 0.33 if is_spec else 1.0
        hist_diff_l = scale * RELAX_ANTILAG_ACCELERATION_AMOUNT_SCALE \
            * dc["history_acceleration_amount"] \
            * nm.luminance(jnp.abs(out_resp_rgb - slow[..., :3]))
        hist_diff_l = hist_diff_l * clamping_factor
        hist_diff_l = jnp.where(in_fix, 0.0, hist_diff_l)

        dist = nm1 - out_resp_rgb
        dist_l = nm.luminance(jnp.abs(dist))
        accel = jnp.where((dist_l == 0.0)[..., None], 0.0,
                          dist * (hist_diff_l / jnp.maximum(dist_l, 1e-15))[..., None])
        accel_l = nm.luminance(jnp.abs(accel))
        ratio = jnp.where(accel_l == 0.0, 0.0, dist_l / jnp.maximum(accel_l, 1e-15))
        accel = jnp.where((ratio < 1.0)[..., None], accel * ratio[..., None], accel)
        accel = jnp.where((ratio <= 0.0)[..., None], 0.0, accel)

        out_slow_rgb = out_slow_rgb + accel
        out_resp_rgb = out_resp_rgb + accel

        # history reset (antilag reset)
        slow_l = nm.luminance(slow[..., :3])
        noisy_l = nm.luminance(nm1)
        t_sigma = dc["history_reset_temporal_sigma_scale"] * jnp.sqrt(
            jnp.maximum(0.0, nm2 - noisy_l * noisy_l))
        s_sigma = dc["history_reset_spatial_sigma_scale"] * sigma[..., 0]
        reset_scale = 0.5 if is_spec else 1.0
        reset = reset_scale * dc["history_reset_amount"] * jnp.maximum(
            0.0, jnp.abs(slow_l - noisy_l) - s_sigma - t_sigma) / (
            1e-6 + jnp.maximum(slow_l, noisy_l) + s_sigma + t_sigma)
        reset = nm.saturate(reset)
        out_slow_rgb = nm.lerp(out_slow_rgb, noisy[..., :3], reset[..., None])
        out_resp_rgb = nm.lerp(out_resp_rgb, noisy[..., :3], reset[..., None])

        # 2nd moment correction
        out_l = nm.luminance(out_slow_rgb)
        m2corr = out_l * out_l - slow_l * slow_l
        out_m2 = jnp.maximum(0.0, slow[..., 3] + m2corr)

        out_slow = jnp.concatenate([out_slow_rgb, out_m2[..., None]], -1)
        out_resp = jnp.concatenate([out_resp_rgb, resp[..., 3:]], -1)
        sh_out = sh_fast_out = None
        if sh is not None:
            sh_out = nm.lerp(sh, sh_fast, clamping_factor[..., None])
            sh_fast_out = sh_fast
        return out_slow, out_resp, sh_out, sh_fast_out

    if noisy_diff is not None:
        out["diff_slow"], out["diff_resp"], out["diff_sh"], out["diff_sh_fast"] = run(
            noisy_diff, diff_slow, diff_resp, diff_sh, diff_sh_fast, False)
    if noisy_spec is not None:
        out["spec_slow"], out["spec_resp"], out["spec_sh"], out["spec_sh_fast"] = run(
            noisy_spec, spec_slow, spec_resp, spec_sh, spec_sh_fast, True)
    return out


# ---------------------------------------------------------------------------
# AntiFirefly (RELAX_AntiFirefly.hlsli) - cross-bilateral RCRS over 3x3
# ---------------------------------------------------------------------------


def anti_firefly(sc, dc, view_z_in, normal_roughness, diff, spec, config,
                 pallas: bool = False):
    """Replace the center with the min/max-luminance neighbor when it's an outlier."""
    n_all, _, material_id = unpack_nr(sc, normal_roughness, config)

    if pallas:
        from ...kernels.relax_pallas import relax_antifirefly_pallas

        sig_rgbs = []
        if diff is not None:
            sig_rgbs.append((diff[..., :3], "diff_min_material"))
        if spec is not None:
            sig_rgbs.append((spec[..., :3], "spec_min_material"))
        filtered = relax_antifirefly_pallas(sc, dc, config, material_id, sig_rgbs)
        k = 0
        diff_out = spec_out = None
        if diff is not None:
            diff_out = jnp.concatenate([filtered[k], diff[..., 3:]], -1)
            k += 1
        if spec is not None:
            spec_out = jnp.concatenate([filtered[k], spec[..., 3:]], -1)
        return diff_out, spec_out

    def run(signal, min_material):
        luma = nm.luminance(signal[..., :3])
        best_max_l = jnp.full_like(luma, -1.0)
        best_min_l = jnp.full_like(luma, 1e6)
        best_max_rgb = signal[..., :3]
        best_min_rgb = signal[..., :3]
        for dy, dx in stencil.offsets_square(1, exclude_center=True):
            s = stencil.shifted(signal[..., :3], dy, dx)
            sl = nm.luminance(s)
            ms = stencil.shifted(material_id, dy, dx)
            if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                ok = (jnp.maximum(ms, min_material)
                      == jnp.maximum(material_id, min_material))
            else:
                ok = jnp.ones_like(sl, bool)
            gt = jnp.logical_and(ok, sl > best_max_l)
            best_max_l = jnp.where(gt, sl, best_max_l)
            best_max_rgb = jnp.where(gt[..., None], s, best_max_rgb)
            lt = jnp.logical_and(ok, sl < best_min_l)
            best_min_l = jnp.where(lt, sl, best_min_l)
            best_min_rgb = jnp.where(lt[..., None], s, best_min_rgb)
        rgb = signal[..., :3]
        rgb = jnp.where((luma > best_max_l)[..., None], best_max_rgb, rgb)
        rgb = jnp.where((luma < best_min_l)[..., None], best_min_rgb, rgb)
        return jnp.concatenate([rgb, signal[..., 3:]], -1)

    diff_out = run(diff, dc["diff_min_material"]) if diff is not None else None
    spec_out = run(spec, dc["spec_min_material"]) if spec is not None else None
    return diff_out, spec_out


# ---------------------------------------------------------------------------
# A-trous (RELAX_AtrousSmem.hlsli + RELAX_Atrous.hlsli)
# ---------------------------------------------------------------------------

_G3 = (0.44198, 0.27901)


def atrous(sc, dc, view_z_in, normal_roughness, history_length, spec_reproj_confidence,
           diff, spec, config, *, step_size: int, is_first: bool, is_last: bool,
           diff_confidence=None, spec_confidence=None, diff_sh=None, spec_sh=None,
           sh_mode: bool = False, pallas: bool = False):
    """One a-trous wavelet iteration.

    is_first: iteration 0 - 3x3 gaussian variance prefilter + spatial variance estimation
    fallback for short histories (AtrousSmem). Signals are (rgb, variance-or-2nd-moment).
    """
    view_z = unpack_view_z(sc, view_z_in)
    h, w = view_z.shape
    uv = resample.pixel_uv_grid(h, w)
    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)
    x = world_pos_from_uv(sc, uv, view_z)
    cv = -nm.normalize(x)
    depth_threshold = dc["depth_threshold"] * jnp.where(sc["ortho_mode"] == 0.0,
                                                        view_z, 1.0)
    rect_inv = sc["rect_size_inv"][None, None, :]

    # lobe fraction relaxation (RELAX_Atrous.hlsli:32-38)
    if is_first:
        diffuse_lobe_fraction = dc["lobe_angle_fraction"]
    else:
        base = 1.0 if sh_mode else dc["lobe_angle_fraction"]
        diffuse_lobe_fraction = base / (step_size ** 0.5)
        diffuse_lobe_fraction = nm.lerp(0.99, diffuse_lobe_fraction,
                                        nm.saturate(history_length / 5.0))

    spec_lobe_fraction = dc["lobe_angle_fraction"]
    spec_lum_relax = jnp.ones_like(view_z)
    if step_size <= 4 or is_first:
        spec_lum_relax = nm.lerp(1.0, spec_reproj_confidence,
                                 dc["luminance_edge_stopping_relaxation"]) \
            if spec_reproj_confidence is not None else spec_lum_relax
    diff_lum_relax = jnp.ones_like(view_z)
    dlf = diffuse_lobe_fraction
    dlf_simplified = diffuse_lobe_fraction
    if spec_confidence is not None:
        r0 = nm.saturate(dc["confidence_driven_relaxation_multiplier"]
                         * (1.0 - spec_confidence))
        rr = nm.saturate(r0 * dc["confidence_driven_normal_edge_stopping_relaxation"])
        dlf_simplified = nm.lerp(diffuse_lobe_fraction, 1.0, rr)
        spec_lobe_fraction = nm.lerp(spec_lobe_fraction, 1.0, rr)
        rl = nm.saturate(r0 * dc["confidence_driven_luminance_edge_stopping_relaxation"])
        spec_lum_relax = spec_lum_relax * (1.0 - rl)
    if diff_confidence is not None:
        r0 = nm.saturate(dc["confidence_driven_relaxation_multiplier"]
                         * (1.0 - diff_confidence))
        rr = nm.saturate(r0 * dc["confidence_driven_normal_edge_stopping_relaxation"])
        dlf = nm.lerp(dlf, 1.0, rr)
        rl = nm.saturate(r0 * dc["confidence_driven_luminance_edge_stopping_relaxation"])
        diff_lum_relax = 1.0 - rl

    diff_nwp = get_normal_weight_param2(jnp.ones_like(roughness), dlf)
    spec_nwp_simpl = get_normal_weight_param2(jnp.ones_like(roughness), dlf_simplified)
    ra, rb = nm.get_roughness_weight_params(roughness, dc["roughness_fraction"])
    angle0, f0 = get_normal_weight_params_atrous(
        roughness, history_length,
        spec_reproj_confidence if spec_reproj_confidence is not None
        else jnp.ones_like(view_z),
        dc["normal_edge_stopping_relaxation"], spec_lobe_fraction,
        dc["spec_lobe_angle_slack"])

    use_variance_estimation = is_first

    if pallas:
        from ...kernels.relax_pallas import relax_atrous_pallas

        nwp_sve = get_normal_weight_param2(jnp.ones_like(roughness),
                                           dc["lobe_angle_fraction"])
        jitter = None
        if not is_first and step_size > 4:
            from ...kernels.relax_pallas import atrous_block

            bh_, bw_ = atrous_block(h, w, step_size)
            gh_, gw_ = -(-h // bh_), -(-w // bw_)
            gy = jnp.arange(gh_, dtype=jnp.int32)[:, None] * jnp.ones((1, gw_), jnp.int32)
            gx = jnp.arange(gw_, dtype=jnp.int32)[None, :] * jnp.ones((gh_, 1), jnp.int32)
            st = nm.hash_init((gy, gx), sc["frame_index"])
            _, rnd = nm.hash_float2(st)
            jit = jnp.floor(step_size * 0.5 * (rnd - 0.5)).astype(jnp.int32)
            jitter = (jit[..., 1], jit[..., 0])
        hl = history_length if history_length is not None else jnp.zeros_like(view_z)
        d_out, s_out, dsh_out, ssh_out = relax_atrous_pallas(
            sc, dc, config, step_size=step_size, is_first=is_first,
            view_z_in=view_z_in, normal_roughness=normal_roughness,
            history_length=hl, diff=diff, spec=spec,
            depth_threshold=depth_threshold, n=n, x=x, cv=cv,
            material_id=material_id, diff_nwp=diff_nwp,
            diff_lum_relax=jnp.broadcast_to(jnp.asarray(diff_lum_relax, jnp.float32),
                                            view_z.shape),
            nwp_sve=nwp_sve,
            spec_nwp_simpl=spec_nwp_simpl if spec is not None else None,
            ra=ra if spec is not None else None,
            rb=rb if spec is not None else None,
            angle0=angle0 if spec is not None else None,
            f0=f0 if spec is not None else None,
            spec_lum_relax=jnp.broadcast_to(jnp.asarray(spec_lum_relax, jnp.float32),
                                            view_z.shape) if spec is not None else None,
            jitter=jitter, diff_sh=diff_sh, spec_sh=spec_sh)
        results = {}
        for which, sig_out, sh_out in (("diff", d_out, dsh_out),
                                       ("spec", s_out, ssh_out)):
            if sig_out is None:
                continue
            if is_last and sh_mode:
                sig_out = jnp.concatenate([nm.linear_to_ycocg(sig_out[..., :3]),
                                           sig_out[..., 3:]], -1)
            results[which] = sig_out
            if sh_out is not None:
                results[which + "_sh"] = sh_out
        return results

    if is_first:
        # write-throughs for the recurrent G-buffer (AtrousSmem lines 120-141) are done by
        # the denoiser wrapper; here: 3x3 gaussian variance prefilter
        def prefilter_var(signal):
            kern = ((0.25, 0.125), (0.125, 0.0625))
            acc = jnp.zeros_like(signal)
            for dy, dx in stencil.offsets_square(1):
                k = kern[abs(dx)][abs(dy)]
                acc = acc + stencil.shifted(signal, dy, dx) * k
            m1 = nm.luminance(acc[..., :3])
            return jnp.maximum(0.0, acc[..., 3] - m1 * m1)

        diff_var = prefilter_var(diff) if diff is not None else None
        spec_var = prefilter_var(spec) if spec is not None else None
    else:
        diff_var = diff[..., 3] if diff is not None else None
        spec_var = spec[..., 3] if spec is not None else None

    # random offset jitter for big steps (RELAX_Atrous.hlsli:122-128)
    offset = jnp.zeros_like(uv)
    if not is_first and step_size > 4:
        pixel_pos = resample.pixel_pos_grid(h, w)
        state = nm.hash_init((pixel_pos[..., 0], pixel_pos[..., 1]), sc["frame_index"])
        _, rnd = nm.hash_float2(state)
        offset = jnp.floor(step_size * 0.5 * (rnd - 0.5))

    def taps_loop(center_signal, center_var, sh, is_spec, lum_relax):
        # iteration 0 (AtrousSmem) accumulates (rgb, 2nd moment) with plain weights and
        # derives variance at the end (RELAX_AtrousSmem.hlsli:293-356); later iterations
        # carry variance in .a and propagate it with w^2 (RELAX_Atrous.hlsli:186,213)
        phi_inv = 1.0 / jnp.maximum(1e-4, (dc["spec_phi_luminance"] if is_spec
                                           else dc["diff_phi_luminance"])
                                    * jnp.sqrt(center_var))
        center_l = nm.luminance(center_signal[..., :3])
        w0 = _G3[0] * _G3[0]
        wsum = jnp.full_like(view_z, w0)
        if is_first:
            acc = center_signal * w0
        else:
            acc = center_signal * jnp.stack(
                [jnp.full_like(view_z, w0)] * 3 + [jnp.full_like(view_z, w0 * w0)], -1)
        acc_sh = sh * w0 if sh is not None else None
        max_rel = dc["spec_max_luminance_relative_difference"] if is_spec \
            else dc["diff_max_luminance_relative_difference"]
        min_material = dc["spec_min_material"] if is_spec else dc["diff_min_material"]
        for yy in range(-1, 2):
            for xx in range(-1, 2):
                if xx == 0 and yy == 0:
                    continue
                kern = _G3[abs(xx)] * _G3[abs(yy)]
                duv = (jnp.asarray([xx, yy], jnp.float32) * step_size + offset) * rect_inv
                uv_s = uv + duv
                inside = resample.is_in_screen_nearest(uv_s)
                zs = unpack_view_z(sc, resample.sample_nearest(view_z_in, uv_s))
                ns, rs, ms = unpack_nr(sc, resample.sample_nearest(normal_roughness, uv_s),
                                       config)
                xs = world_pos_from_uv(sc, uv_s, zs)
                gw = get_plane_distance_weight_atrous(x, n, xs, depth_threshold) * kern
                gw = gw * inside * (zs < sc["denoising_range"]).astype(jnp.float32)
                angle = nm.acos_approx(nm.dot(n, ns))
                if is_spec and not use_variance_estimation:
                    sv = -nm.normalize(xs + dc["roughness_edge_stopping_relaxation"] * x)
                    nw = get_specular_normal_weight_atrous(angle0, f0, n, ns, cv, sv)
                    nw_simpl = nm.compute_weight(angle, spec_nwp_simpl, 0.0)
                    rw = nm.compute_weight(rs, ra, rb)
                    w_ = gw * jnp.where(dc["roughness_edge_stopping_enabled"] != 0,
                                        nw * rw, nw_simpl)
                else:
                    w_ = gw * nm.compute_weight(angle, diff_nwp, 0.0)
                if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                    w_ = w_ * (jnp.maximum(ms, min_material)
                               == jnp.maximum(material_id, min_material)).astype(
                        jnp.float32)
                s = resample.sample_nearest(center_signal_src, uv_s)
                sl = nm.luminance(s[..., :3])
                lw = jnp.minimum(max_rel, jnp.abs(center_l - sl) * phi_inv) * lum_relax
                w_ = w_ * jnp.exp(-lw)
                wsum = wsum + w_
                if is_first:
                    acc = acc + s * w_[..., None]
                else:
                    acc = acc + s * jnp.stack([w_, w_, w_, w_ * w_], -1)
                if acc_sh is not None:
                    sh_s = resample.sample_nearest(sh_src, uv_s)
                    acc_sh = acc_sh + sh_s * w_[..., None]
        if is_first:
            out = acc / wsum[..., None]
            m1 = nm.luminance(out[..., :3])
            var = jnp.maximum(0.0, out[..., 3] - m1 * m1)
            out = jnp.concatenate([out[..., :3], var[..., None]], -1)
        else:
            out = acc / jnp.stack([wsum, wsum, wsum, wsum * wsum], -1)
        out_sh = acc_sh / wsum[..., None] if acc_sh is not None else None
        return out, out_sh

    results = {}
    for which, signal, var, sh, conf in (
            ("diff", diff, diff_var, diff_sh, None),
            ("spec", spec, spec_var, spec_sh, None)):
        if signal is None:
            continue
        is_spec = which == "spec"
        center_signal_src = signal
        sh_src = sh
        filtered, filtered_sh = taps_loop(signal, var, sh, is_spec,
                                          spec_lum_relax if is_spec else diff_lum_relax)

        if is_first:
            # spatial variance estimation fallback for short histories (lines 362-470)
            nwp_sve = get_normal_weight_param2(jnp.ones_like(roughness),
                                               dc["lobe_angle_fraction"])
            swsum = jnp.zeros_like(view_z)
            s_rgb = jnp.zeros_like(signal[..., :3])
            s_m1 = jnp.zeros_like(view_z)
            s_m2 = jnp.zeros_like(view_z)
            s_sh = jnp.zeros_like(sh) if sh is not None else None
            min_material = dc["spec_min_material"] if is_spec else dc["diff_min_material"]
            for dy, dx in stencil.offsets_square(2):
                ns, _, ms = unpack_nr(sc, stencil.shifted(normal_roughness, dy, dx),
                                      config)
                angle = nm.acos_approx(nm.dot(n, ns))
                w_ = nm.compute_weight(angle, nwp_sve, 0.0)
                if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                    w_ = w_ * (jnp.maximum(ms, min_material)
                               == jnp.maximum(material_id, min_material)).astype(
                        jnp.float32)
                s = stencil.shifted(signal, dy, dx)
                sl = nm.luminance(s[..., :3])
                swsum = swsum + w_
                s_rgb = s_rgb + s[..., :3] * w_[..., None]
                s_m1 = s_m1 + sl * w_
                s_m2 = s_m2 + s[..., 3] * w_
                if s_sh is not None:
                    s_sh = s_sh + stencil.shifted(sh, dy, dx) * w_[..., None]
            swsum = jnp.maximum(swsum, 1e-6)
            s_rgb = s_rgb / swsum[..., None]
            s_m1 = s_m1 / swsum
            s_m2 = s_m2 / swsum
            boost = jnp.maximum(1.0, 4.0 / (history_length + 1.0))
            s_var = jnp.maximum(0.0, s_m2 - s_m1 * s_m1) * boost
            sve = jnp.concatenate([s_rgb, s_var[..., None]], -1)
            use_atrous = history_length >= dc["history_threshold"]
            filtered = jnp.where(use_atrous[..., None], filtered, sve)
            if filtered_sh is not None:
                sve_sh = s_sh / swsum[..., None]
                filtered_sh = jnp.where(use_atrous[..., None], filtered_sh, sve_sh)

        if is_last and sh_mode:
            filtered = jnp.concatenate([nm.linear_to_ycocg(filtered[..., :3]),
                                        filtered[..., 3:]], -1)
        results[which] = filtered
        if filtered_sh is not None:
            results[which + "_sh"] = filtered_sh
    return results


def split_screen(sc, view_z_in, noisy, out_signal, sh_mode: bool = False):
    h, w = view_z_in.shape
    view_z = unpack_view_z(sc, view_z_in)
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    s = noisy
    if sh_mode:
        s = jnp.concatenate([nm.linear_to_ycocg(s[..., :3]), s[..., 3:]], -1)
    s = s * (view_z < sc["denoising_range"]).astype(jnp.float32)[..., None]
    show = (u[None, :, None] <= sc["split_screen"])
    return jnp.where(show, s, out_signal)
