"""REBLUR pass kernels - TPU rebuilds of Shaders/Include/REBLUR_*.hlsli.

This module implements the REBLUR pass set as pure jnp image functions:
  classify_tiles, hit_dist_reconstruction, pre_pass, temporal_accumulation, history_fix,
  spatial_blur (BLUR / POST_BLUR modes), temporal_stabilization, split_screen.

Shader permutations (239 compiled variants in the reference) become static python flags that
specialize under jit. The 4x4 gather dance of the HLSL (GatherRed + .wzxy swizzles,
REBLUR_TemporalAccumulation.hlsli:152-176) is re-derived here as an explicit 4x4 tap grid
rooted at (bilinear_origin - 1); see `gather_4x4`.

Deliberate divergences (SURVEY.md §7.3.5):
  - R16_UINT internal-data packing is stored as 3 quantized planes (same bit depths);
  - stochastic texture filtering (REBLUR_USE_STF) uses the same PCG hash family but not
    bit-identical random streams;
  - f16 curvature round-trip of Data2 is emulated via f32->f16->f32 cast.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import frontend as fe
from ... import math as nm
from ...frontend import NRD_EPS, NRD_INF
from ...ops import resample, stencil, tiles
from . import common as C


# ---------------------------------------------------------------------------
# Small helpers
# ---------------------------------------------------------------------------


def unpack_view_z(sc, z):
    return jnp.abs(z) * sc["view_z_scale"]


def gather_4x4(img, bilinear_origin):
    """16 taps of the 4x4 grid rooted at (bilinear_origin - 1). Returns taps[j][i]."""
    x0 = bilinear_origin[..., 0].astype(jnp.int32) - 1
    y0 = bilinear_origin[..., 1].astype(jnp.int32) - 1
    return [[resample.texel_fetch(img, x0 + i, y0 + j) for i in range(4)] for j in range(4)]


def gather_2x2_at(img, bilinear_origin):
    x0 = bilinear_origin[..., 0].astype(jnp.int32)
    y0 = bilinear_origin[..., 1].astype(jnp.int32)
    return [resample.texel_fetch(img, x0 + dx, y0 + dy) for dy, dx in
            ((0, 0), (0, 1), (1, 0), (1, 1))]


CENTER_TAPS = ((1, 1), (2, 1), (1, 2), (2, 2))            # bilinear 2x2 inside the 4x4
CORNER_TAPS = ((0, 0), (3, 0), (0, 3), (3, 3))
QUAD_OF_CENTER_TAP = (0, 1, 2, 3)


def unpack_nr(sc, packed, config):
    return fe.unpack_normal_roughness(packed, config.normal_encoding,
                                      config.roughness_encoding)


# ---------------------------------------------------------------------------
# ClassifyTiles (REBLUR_ClassifyTiles.cs.hlsl:22-55)
# ---------------------------------------------------------------------------


def classify_tiles(sc, view_z):
    return tiles.classify_sky_tiles(unpack_view_z(sc, view_z), sc["denoising_range"])


def sky_pixel_mask(sc, tile_map, view_z):
    """Combined early-out mask: sky tile or beyond denoising range (1 = skip)."""
    h, w = view_z.shape
    sky = tiles.tile_upsample_nearest(tile_map, h, w)
    return jnp.logical_or(sky > 0.0, unpack_view_z(sc, view_z) > sc["denoising_range"])


# ---------------------------------------------------------------------------
# TemporalAccumulation (REBLUR_TemporalAccumulation.hlsli) - diffuse core
# ---------------------------------------------------------------------------


def surface_motion_reprojection(sc, dc, view_z_in, normal_roughness, mv_in, prev_view_z,
                                prev_normal_roughness, prev_internal, config,
                                disocclusion_threshold_mix=None):
    """The shared surface-motion machinery of TA (lines 131-305).

    Returns a dict with everything both the diffuse and specular halves consume.
    prev_internal: dict(diff_accum, spec_accum, material_id) planes.
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)

    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)

    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    v2w = jnp.asarray(sc["view_to_world"])
    x = xv @ v2w[:3, :3].T  # RotateVector (translation is 0, camera-relative)

    # Navg over the 2x2 at offsets {-1, 0} (lines 70-97); unnormalized
    n_avg = jnp.zeros_like(n)
    for dy, dx in ((-1, -1), (-1, 0), (0, -1), (0, 0)):
        ns, _, _ = unpack_nr(sc, stencil.shifted(normal_roughness, dy, dx), config)
        n_avg = n_avg + ns
    n_avg = n_avg / 4.0

    # previous position / surface motion uv (lines 131-150)
    mv = mv_in * sc["mv_scale"][None, None, :3]
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

    rect_prev = sc["rect_size_prev"][None, None, :]
    bilinear_origin, bilinear_frac = nm.bilinear_filter(smb_pixel_uv, rect_prev)

    # 4x4 prev viewZ (lines 152-176)
    z_taps = gather_4x4(prev_view_z, bilinear_origin)
    z_taps = [[unpack_view_z(sc, t) for t in row] for row in z_taps]

    # prev normal average over center 2x2, weighted by in-range (lines 178-204)
    nr_taps = gather_2x2_at(prev_normal_roughness, bilinear_origin)
    smb_navg = jnp.zeros_like(n)
    wsum = jnp.zeros_like(view_z)
    for tap_idx, (tx, ty) in enumerate(CENTER_TAPS):
        w_ = (z_taps[ty][tx] < sc["denoising_range"]).astype(jnp.float32)
        npv, _, _ = unpack_nr(sc, nr_taps[tap_idx], config)
        smb_navg = smb_navg + npv * w_[..., None]
        wsum = wsum + w_
    smb_navg = smb_navg / jnp.where(wsum == 0.0, 1.0, wsum)[..., None]
    smb_navg = smb_navg @ jnp.asarray(sc["world_prev_to_world"])[:3, :3].T

    # parallax (lines 206-211)
    cam_delta = sc["camera_delta"][None, None, :]
    uv_zp1 = jnp.where(sc["ortho_mode"] == 0.0, smb_pixel_uv, uv)
    uv_zp2 = jnp.where(sc["ortho_mode"] == 0.0, uv, smb_pixel_uv)
    p1_uv = nm.get_screen_uv(jnp.asarray(sc["world_to_clip_prev"]), x_prev + cam_delta)
    p2_uv = nm.get_screen_uv(jnp.asarray(sc["world_to_clip"]), x_prev - cam_delta)
    rect = sc["rect_size"][None, None, :]
    parallax1 = nm.length((p1_uv - uv_zp1) * rect)
    parallax2 = nm.length((p2_uv - uv_zp2) * rect)
    parallax_max = jnp.maximum(parallax1, parallax2)
    parallax_min = jnp.minimum(parallax1, parallax2)

    # disocclusion threshold (lines 213-234)
    pixel_size = nm.pixel_radius_to_world(sc["unproject"], sc["ortho_mode"], 1.0, view_z)
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)

    mix_ = jnp.where(material_id == sc["strand_material_id"],
                     fe.get_normalized_strand_thickness(sc["strand_thickness"], pixel_size),
                     0.0)
    if disocclusion_threshold_mix is not None:
        mix_ = disocclusion_threshold_mix
    disocclusion_threshold = nm.lerp(sc["disocclusion_threshold"]
                                     + sc["disocclusion_threshold_bonus"],
                                     sc["disocclusion_threshold_alternate"]
                                     + sc["disocclusion_threshold_bonus"], mix_)

    small_parallax = nm.linearstep(0.25, 0.0, parallax_max)
    disocclusion_threshold = disocclusion_threshold + 0.05 * small_parallax

    v = C.get_view_vector(sc, x)
    nov = jnp.abs(nm.dot(n, v))
    nov_strict = nm.lerp(nov, 1.0, nm.saturate(parallax_max / 30.0))
    base_threshold = nm.get_disocclusion_threshold(disocclusion_threshold, frustum_size,
                                                   nov_strict)
    navg_ok = (nm.dot(smb_navg, n_avg)
               > C.REBLUR_ALMOST_ZERO_ANGLE - 0.25 * small_parallax).astype(jnp.float32)
    in_screen4 = resample.is_in_screen_bilinear(bilinear_origin, sc["rect_size_prev"])
    quad_threshold = [base_threshold * navg_ok * in_screen4[..., q] - NRD_EPS
                      for q in range(4)]

    # plane distance occlusion for all 16 taps (lines 236-245)
    xv_prev = x_prev @ w2v_prev[:3, :3].T + w2v_prev[:3, 3]
    occ = [[None] * 4 for _ in range(4)]
    for j in range(4):
        for i in range(4):
            q = (1 if i >= 2 else 0) + (2 if j >= 2 else 0)
            plane_dist = jnp.abs(z_taps[j][i] - xv_prev[..., 2])
            occ[j][i] = (plane_dist <= quad_threshold[q]).astype(jnp.float32)

    # materialID occlusion (lines 247-269); internal data taps
    mat_taps = gather_4x4(prev_internal["material_id"], bilinear_origin)
    if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
        min_material = jnp.minimum(dc["spec_min_material"], dc["diff_min_material"])
        for j in range(4):
            for i in range(4):
                same = (jnp.maximum(material_id, min_material)
                        == jnp.maximum(mat_taps[j][i], min_material)).astype(jnp.float32)
                occ[j][i] = occ[j][i] * same

    # 2x2 occlusion weights + fbits (lines 271-278)
    occ_center = jnp.stack([occ[ty][tx] for tx, ty in CENTER_TAPS], -1)
    occlusion_weights = nm.get_bilinear_custom_weights(bilinear_frac, occ_center)
    occ12_sum = sum(occ[j][i] for j in range(4) for i in range(4)
                    if (i, j) not in CORNER_TAPS)
    allow_catrom = occ12_sum > 11.5

    fbits = (occ_center[..., 0] * 1.0 + occ_center[..., 1] * 2.0
             + occ_center[..., 2] * 4.0 + occ_center[..., 3] * 8.0)

    # accumulation speed (lines 280-294)
    diff_taps = gather_2x2_at(prev_internal["diff_accum"], bilinear_origin)
    spec_taps = gather_2x2_at(prev_internal["spec_accum"], bilinear_origin)
    diff_accum_speed = nm.apply_bilinear_custom_weights(
        diff_taps[0][..., None], diff_taps[1][..., None], diff_taps[2][..., None],
        diff_taps[3][..., None], occlusion_weights)[..., 0]
    spec_accum_speed = nm.apply_bilinear_custom_weights(
        spec_taps[0][..., None], spec_taps[1][..., None], spec_taps[2][..., None],
        spec_taps[3][..., None], occlusion_weights)[..., 0]

    # footprint quality (lines 296-305)
    smb_vprev = C.get_view_vector_prev(sc, x_prev)
    nov_prev = jnp.abs(nm.dot(n, smb_vprev))
    size_quality = (nov_prev + 1e-3) / (nov + 1e-3)
    size_quality = size_quality * size_quality
    size_quality = nm.lerp(0.1, 1.0, nm.saturate(size_quality))

    bw = nm.bilinear_weights(bilinear_frac)
    footprint_quality = jnp.sum(occ_center * bw, -1)
    footprint_quality = jnp.sqrt(nm.saturate(footprint_quality)) * size_quality

    return dict(
        uv=uv, view_z=view_z, n=n, roughness=roughness, material_id=material_id,
        x=x, xv=xv, v=v, nov=nov, n_avg=n_avg, smb_navg=smb_navg,
        x_prev=x_prev, xv_prev=xv_prev, smb_pixel_uv=smb_pixel_uv,
        parallax_max=parallax_max, parallax_min=parallax_min,
        pixel_size=pixel_size, frustum_size=frustum_size,
        occlusion_weights=occlusion_weights, allow_catrom=allow_catrom, fbits=fbits,
        diff_accum_speed=diff_accum_speed, spec_accum_speed=spec_accum_speed,
        footprint_quality=footprint_quality, bilinear_origin=bilinear_origin,
        smb_vprev=smb_vprev,
    )


def sample_history(history, smb_pixel_uv, rect_size_prev, occlusion_weights, allow_catrom):
    """CatRom-13-tap with bilinear-custom-weights fallback on the history plane."""
    sample_pos = nm.saturate(smb_pixel_uv) * rect_size_prev[None, None, :]
    return resample.sample_catrom(history, sample_pos, allow_catrom, occlusion_weights)


def sample_history_bilinear(history, smb_pixel_uv, rect_size_prev, occlusion_weights):
    """_BilinearFilterWithCustomWeights_Color on the fast-history plane."""
    sample_pos = nm.saturate(smb_pixel_uv) * rect_size_prev[None, None, :]
    origin = jnp.floor(sample_pos - 0.5)
    return resample.bilinear_custom(history, origin, occlusion_weights)


def temporal_accumulation_diffuse(sc, dc, sm, diff_input, diff_history, diff_fast_history,
                                  config, diff_confidence=None, *, occlusion: bool,
                                  directional: bool = False, diff_sh_input=None,
                                  diff_sh_history=None):
    """Diffuse half of TA (lines 826-930). Returns (diff_out, fast_out, accum_speed_out[,sh])."""
    diff_accum_speed = sm["diff_accum_speed"]

    diff_history_confidence = sm["footprint_quality"]
    if diff_confidence is not None:
        diff_history_confidence = diff_history_confidence * diff_confidence

    diff_accum_speed = diff_accum_speed * nm.lerp(diff_history_confidence, 1.0,
                                                  1.0 / (1.0 + diff_accum_speed))
    diff_accum_speed = jnp.minimum(diff_accum_speed, dc["max_accumulated_frame_num"])

    # checkerboard is not yet supported -> every pixel has data
    diff_has_data = True

    smb_diff_history = sample_history(diff_history, sm["smb_pixel_uv"],
                                      sc["rect_size_prev"], sm["occlusion_weights"],
                                      sm["allow_catrom"])
    smb_diff_fast = sample_history_bilinear(diff_fast_history, sm["smb_pixel_uv"],
                                            sc["rect_size_prev"], sm["occlusion_weights"])
    smb_diff_history = C.clamp_negative_to_zero(smb_diff_history, occlusion, directional)

    diff_nlas = 1.0 / (1.0 + diff_accum_speed)
    diff_result = C.mix_history_and_current(dc, smb_diff_history, diff_input, diff_nlas,
                                            jnp.ones_like(diff_nlas), occlusion or directional)
    sh_result = None
    if diff_sh_input is not None:
        smb_sh = sample_history_bilinear(diff_sh_history, sm["smb_pixel_uv"],
                                         sc["rect_size_prev"], sm["occlusion_weights"])
        sh_result = C.mix_history_and_current(dc, smb_sh, diff_sh_input, diff_nlas,
                                              jnp.ones_like(diff_nlas), False)

    # firefly suppressor (lines 888-903)
    if not occlusion and not directional:
        max_rel = (dc["firefly_suppressor_min_relative_scale"]
                   + C.REBLUR_FIREFLY_SUPPRESSOR_MAX_RELATIVE_INTENSITY
                   / (diff_accum_speed + 1.0))
        antifirefly = diff_accum_speed * dc["max_blur_radius"] \
            * C.REBLUR_FIREFLY_SUPPRESSOR_RADIUS_SCALE
        antifirefly = antifirefly / (1.0 + antifirefly)
        luma = C.get_luma(diff_result, False)
        luma_clamped = jnp.minimum(luma, C.get_luma(smb_diff_history, False) * max_rel)
        luma_clamped = nm.lerp(luma, luma_clamped, antifirefly)
        diff_result = C.change_luma(diff_result, luma_clamped, False)
        if sh_result is not None:
            scale = C.get_luma_scale(nm.length(sh_result[..., :3]), luma_clamped)
            sh_result = jnp.concatenate(
                [sh_result[..., :3] * scale[..., None], sh_result[..., 3:]], -1)

    # fast history (lines 911-924)
    fast_accum_speed = jnp.minimum(diff_accum_speed, dc["max_fast_accumulated_frame_num"])
    fast_nlas = 1.0 / (1.0 + fast_accum_speed)
    fast_result = nm.lerp(smb_diff_fast, C.get_luma(diff_input, occlusion or directional),
                          fast_nlas)
    if not occlusion and not directional:
        fast_clamped = jnp.minimum(
            fast_result, C.get_luma(smb_diff_history, False) * max_rel
            * C.REBLUR_FIREFLY_SUPPRESSOR_FAST_RELATIVE_INTENSITY)
        fast_result = nm.lerp(fast_result, fast_clamped, antifirefly)

    return diff_result, fast_result, diff_accum_speed, sh_result


# ---------------------------------------------------------------------------
# HistoryFix (REBLUR_HistoryFix.hlsli) - diffuse path
# ---------------------------------------------------------------------------


def history_fix(sc, dc, view_z_in, normal_roughness, data1_diff, data1_spec, signal,
                fast_history, config, *, is_diffuse: bool, occlusion: bool,
                anti_firefly: bool = False, sh=None, directional: bool = False):
    """Sparse 5x5-no-corners history reconstruction + fast-history color clamping.

    signal: (h, w, c) output of TA; fast_history: (h, w). Returns (signal_out, fast_out[,sh]).
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    w2v = jnp.asarray(sc["world_to_view"])
    nv = n @ w2v[:3, :3].T

    frame_num = data1_diff if is_diffuse else data1_spec
    stride = dc["history_fix_base_pixel_stride"] / (2.0 + frame_num)
    if is_diffuse:
        stride = stride * (frame_num < dc["history_fix_frame_num"]).astype(jnp.float32)
    else:
        smc = nm.get_spec_magic_curve(roughness)
        stride = stride * (frame_num < dc["history_fix_frame_num"]).astype(jnp.float32)
        stride = stride * nm.lerp(0.5, 1.0, smc)
    stride = jnp.floor(stride)

    nlas = 1.0 / (1.0 + frame_num)
    enc_err = nm.normal_encoding_error(int(config.normal_encoding))
    normal_weight_param = nm.get_normal_weight_param(
        nlas, dc["lobe_angle_fraction"],
        roughness if not is_diffuse else jnp.ones_like(roughness), enc_err)
    ga, gb = nm.get_geometry_weight_params(dc["plane_dist_sensitivity"], frustum_size,
                                           xv, nv, nlas)
    if not is_diffuse:
        ra, rb = nm.get_relaxed_roughness_weight_params(
            roughness * roughness, jnp.sqrt(dc["roughness_fraction"]))

    hit_dist_scale = fe.get_hit_distance_normalization(
        view_z, dc["hit_dist_params"][None, None, :],
        jnp.ones_like(roughness) if is_diffuse else roughness)
    hit_dist = C.extract_hit_dist(signal) * hit_dist_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, frustum_size)
    ha, hb = nm.get_hit_distance_weight_params(
        hit_dist_factor, nlas, jnp.ones_like(roughness) if is_diffuse else roughness)

    sum_ = 1.0 + frame_num
    acc = signal * sum_[..., None]
    acc_sh = sh * sum_[..., None] if sh is not None else None

    # the reconstruction taps are at DYNAMIC stride -> gather at computed positions
    pos_grid = resample.pixel_pos_grid(h, w).astype(jnp.float32)
    rect_size_inv = sc["rect_size_inv"][None, None, :]
    min_material = dc["diff_min_material"] if is_diffuse else dc["spec_min_material"]

    for j in range(-2, 3):
        for i in range(-2, 3):
            if i == 0 and j == 0:
                continue
            if abs(i) + abs(j) == 4:
                continue
            uv_s = uv + jnp.asarray([i, j], jnp.float32) * stride[..., None] * rect_size_inv
            pos = pos_grid + jnp.asarray([i, j], jnp.float32) * stride[..., None]
            px = jnp.clip(pos[..., 0], 0, w - 1).astype(jnp.int32)
            py = jnp.clip(pos[..., 1], 0, h - 1).astype(jnp.int32)

            zs = unpack_view_z(sc, resample.texel_fetch(view_z_in, px, py))
            ns_packed = resample.texel_fetch(normal_roughness, px, py)
            ns, rs, ms = unpack_nr(sc, ns_packed, config)

            angle = nm.acos_approx(nm.dot(ns, n))
            xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                               sc["ortho_mode"])
            w_ = resample.is_in_screen_nearest(uv_s)
            w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
            if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                w_ = w_ * (jnp.maximum(material_id, min_material)
                           == jnp.maximum(ms, min_material)).astype(jnp.float32)
            w_ = w_ * nm.compute_exponential_weight(angle, normal_weight_param, 0.0)
            if not is_diffuse:
                w_ = w_ * nm.compute_exponential_weight(rs * rs, ra, rb)
            d1 = resample.texel_fetch(data1_diff if is_diffuse else data1_spec, px, py)
            w_ = w_ * (1.0 + d1)

            s = resample.texel_fetch(signal, px, py)
            s = jnp.where((w_ == 0.0)[..., None], 0.0, s)
            hs = C.extract_hit_dist(s) * hit_dist_scale
            hs_factor = nm.get_hit_dist_factor(hs, frustum_size)
            w_ = w_ * nm.compute_exponential_weight(hs_factor, ha, hb)

            if not is_diffuse:
                # low-roughness hitT guide (lines 349-352)
                d = jnp.abs(hit_dist - hs) / (jnp.maximum(hit_dist, hs) + 0.001)
                b = nm.linearstep(0.03, 0.05, roughness)
                w_ = w_ * nm.smoothstep(0.2 + b, 0.05 + b, d)

            sum_ = sum_ + w_
            acc = acc + s * w_[..., None]
            if acc_sh is not None:
                sh_s = resample.texel_fetch(sh, px, py)
                sh_s = jnp.where((w_ == 0.0)[..., None], 0.0, sh_s)
                acc_sh = acc_sh + sh_s * w_[..., None]

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    reconstructed = acc * inv[..., None]
    if acc_sh is not None:
        acc_sh = acc_sh * inv[..., None]
    use_fix = (stride != 0.0)
    signal_out = jnp.where(use_fix[..., None], reconstructed, signal)
    sh_out = jnp.where(use_fix[..., None], acc_sh, sh) if sh is not None else None

    # local variance over 3x3 fast history + fast history adjustments (lines 169-244)
    occ_like = occlusion or directional
    center = fast_history
    f = nm.saturate(frame_num / (dc["history_fix_frame_num"] + NRD_EPS))
    if not is_diffuse:
        f = nm.lerp(1.0, f, nm.get_spec_magic_curve(roughness))
    fast_out = nm.lerp(C.get_luma(signal_out, occ_like), center, f)

    m1 = jnp.zeros_like(center)
    m2 = jnp.zeros_like(center)
    for dy, dx in stencil.offsets_square(1):
        t = stencil.shifted(fast_history, dy, dx)
        m1 = m1 + t
        m2 = m2 + t * t
    m1 = m1 / 9.0
    m2 = m2 / 9.0
    sigma = nm.get_std_dev(m1, m2) * C.color_clamping_sigma_scale(occ_like)

    luma = C.get_luma(signal_out, occ_like)

    if anti_firefly:
        r = C.REBLUR_ANTI_FIREFLY_FILTER_RADIUS
        am1 = jnp.zeros_like(center)
        am2 = jnp.zeros_like(center)
        cnt = 0
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if abs(dy) <= 1 and abs(dx) <= 1:
                    continue
                t = stencil.shifted(fast_history, dy, dx)
                am1 = am1 + t
                am2 = am2 + t * t
                cnt += 1
        am1 = am1 / cnt
        am2 = am2 / cnt
        asig = nm.get_std_dev(am1, am2) * C.REBLUR_ANTI_FIREFLY_SIGMA_SCALE
        luma = jnp.clip(luma, am1 - asig, am1 + asig)

    luma_clamped = jnp.clip(luma, m1 - sigma, m1 + sigma)
    fast_enabled = (dc["max_fast_accumulated_frame_num"]
                    < dc["max_accumulated_frame_num"]).astype(jnp.float32)
    luma = nm.lerp(luma_clamped, luma, 1.0 / (1.0 + fast_enabled * frame_num * 2.0))

    signal_out = C.change_luma(signal_out, luma, occlusion, directional)
    if sh_out is not None:
        scale = C.get_luma_scale(nm.length(sh_out[..., :3]), luma)
        sh_out = jnp.concatenate([sh_out[..., :3] * scale[..., None], sh_out[..., 3:]], -1)
    return signal_out, fast_out, sh_out


# ---------------------------------------------------------------------------
# Spatial blur (REBLUR_Blur.hlsli + REBLUR_Common_DiffuseSpatialFilter.hlsli)
# ---------------------------------------------------------------------------

BLUR = 1
POST_BLUR = 2


def diffuse_spatial_filter(sc, dc, mode, signal, view_z_in, normal_roughness, data1,
                           config, sh=None, *, occlusion: bool, directional: bool = False):
    """Adaptive-radius 8-tap Poisson blur (screen-space sampling path).

    mode: BLUR or POST_BLUR. Returns (signal_out[, sh_out]).
    """
    h, w = view_z_in.shape
    uv = resample.pixel_uv_grid(h, w)
    view_z = unpack_view_z(sc, view_z_in)
    n, roughness, material_id = unpack_nr(sc, normal_roughness, config)
    w2v = jnp.asarray(sc["world_to_view"])
    nv = n @ w2v[:3, :3].T
    xv = nm.reconstruct_view_position(uv, sc["frustum"][None, None, :], view_z,
                                      sc["ortho_mode"])
    vv = C.get_view_vector_view_space(sc, xv)
    nov = jnp.abs(nm.dot(nv, vv))
    frustum_size = nm.get_frustum_size(sc["min_rect_dim_mul_unproject"], sc["ortho_mode"],
                                       view_z)
    rotator = sc["rotator"] if mode == BLUR else sc["rotator_post"]

    fraction_scale = C.REBLUR_BLUR_FRACTION_SCALE if mode == BLUR \
        else C.REBLUR_POST_BLUR_FRACTION_SCALE
    radius_scale = 1.0 if mode == BLUR else C.REBLUR_POST_BLUR_RADIUS_SCALE

    hit_dist_scale = fe.get_hit_distance_normalization(
        view_z, dc["hit_dist_params"][None, None, :], jnp.ones_like(roughness))
    hit_dist = C.extract_hit_dist(signal) * hit_dist_scale
    hit_dist_factor = nm.get_hit_dist_factor(hit_dist, frustum_size)

    boost = 1.0 - C.get_fade_based_on_accumulated_frames(dc, data1)
    boost = boost * (1.0 - jnp.power(nm.saturate(1.0 - nov), 5.0))
    nlas = 1.0 / (1.0 + C.REBLUR_SAMPLES_PER_FRAME * (1.0 - boost) * data1)

    blur_radius = dc["max_blur_radius"] * jnp.sqrt(nm.saturate(hit_dist_factor * nlas))
    blur_radius = blur_radius * radius_scale
    blur_radius = jnp.maximum(blur_radius, dc["min_blur_radius"])

    enc_err = nm.normal_encoding_error(int(config.normal_encoding))
    ga, gb = nm.get_geometry_weight_params(dc["plane_dist_sensitivity"], frustum_size,
                                           xv, nv, nlas)
    normal_weight_param = nm.get_normal_weight_param(
        nlas, dc["lobe_angle_fraction"], jnp.ones_like(roughness), enc_err) / fraction_scale
    ha, hb = nm.get_hit_distance_weight_params(C.extract_hit_dist(signal), nlas)
    min_hit_dist_weight = dc["min_hit_distance_weight"] * fraction_scale
    if not occlusion:
        min_hit_dist_weight = min_hit_dist_weight * jnp.sqrt(nlas)

    # screen-space sampling (REBLUR_USE_SCREEN_SPACE_SAMPLING_FOR_DIFFUSE == 1)
    skew = nm.lerp(1.0 - jnp.abs(nv[..., :2]), 1.0, nov[..., None])
    skew = skew / jnp.max(skew, -1, keepdims=True)
    skew = skew * sc["rect_size_inv"][None, None, :] * blur_radius[..., None]
    scaled_rotator = nm.scale_rotator(jnp.broadcast_to(rotator, uv.shape[:2] + (4,)), skew)

    rect = sc["rect_size"][None, None, :]
    sum_ = jnp.ones_like(view_z)
    acc = signal
    acc_sh = sh
    min_material = dc["diff_min_material"]

    for tap in nm.SPECIAL_8:
        offset = jnp.asarray(tap[:2])
        uv_s = uv + nm.rotate_vector2(scaled_rotator, jnp.broadcast_to(offset, uv.shape))
        uv_s = (jnp.floor(uv_s * rect) + 0.5) / rect  # snap to pixel center

        zs = unpack_view_z(sc, resample.sample_nearest(view_z_in, uv_s))
        ns, rs, ms = unpack_nr(sc, resample.sample_nearest(normal_roughness, uv_s), config)

        angle = nm.acos_approx(nm.dot(n, ns))
        xvs = nm.reconstruct_view_position(uv_s, sc["frustum"][None, None, :], zs,
                                           sc["ortho_mode"])
        w_ = resample.is_in_screen_nearest(uv_s)
        w_ = w_ * nm.compute_weight(nm.dot(nv, xvs), ga, gb)
        if config.normal_encoding.name == "R10_G10_B10_A2_UNORM":
            w_ = w_ * (jnp.maximum(material_id, min_material)
                       == jnp.maximum(ms, min_material)).astype(jnp.float32)
        w_ = w_ * nm.compute_weight(angle, normal_weight_param, 0.0)

        s = resample.sample_nearest(signal, uv_s)
        s = jnp.where((w_ == 0.0)[..., None], 0.0, s)
        w_ = w_ * nm.lerp(min_hit_dist_weight, 1.0,
                          nm.compute_exponential_weight(C.extract_hit_dist(s), ha, hb))
        w_ = w_ * nm.get_gaussian_weight(float(tap[2]))

        sum_ = sum_ + w_
        acc = acc + s * w_[..., None]
        if acc_sh is not None:
            sh_s = resample.sample_nearest(sh, uv_s)
            sh_s = jnp.where((w_ == 0.0)[..., None], 0.0, sh_s)
            acc_sh = acc_sh + sh_s * w_[..., None]

    inv = 1.0 / jnp.maximum(sum_, 1e-15)
    out = acc * inv[..., None]
    out_sh = acc_sh * inv[..., None] if acc_sh is not None else None
    return out, out_sh


# ---------------------------------------------------------------------------
# SplitScreen (REBLUR_SplitScreen.hlsli)
# ---------------------------------------------------------------------------


def split_screen(sc, noisy_input, view_z_in, out_signal):
    h, w = view_z_in.shape
    view_z = unpack_view_z(sc, view_z_in)
    u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    noisy = noisy_input * (view_z < sc["denoising_range"]).astype(jnp.float32)[..., None]
    show_input = (u[None, :, None] <= sc["split_screen"])
    return jnp.where(show_input, noisy, out_signal)
