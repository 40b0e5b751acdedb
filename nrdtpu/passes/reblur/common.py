"""REBLUR shared helpers - port of Shaders/Include/REBLUR_Common.hlsli + REBLUR_Config.hlsli.

Signal convention: REBLUR_TYPE is (h, w, 4) (YCoCg + normHitDist) for radiance variants and
(h, w, 1) (normHitDist) for occlusion variants; REBLUR code below is written against the
channel-count-agnostic helpers, with `hit` always the LAST channel.

Internal data storage: the reference packs (diffAccum 6b, specAccum 6b, materialID 4b) into
R16_UINT (REBLUR_Common.hlsli:13-31). We store three planes quantized to the same bit-depths
on write, so accumulation-speed dynamics match the reference's quantized feedback loop.
"""

from __future__ import annotations

import jax.numpy as jnp

from ... import math as nm

# REBLUR_Config.hlsli:52-98
REBLUR_ACCUMSPEED_BITS = 6
REBLUR_MATERIALID_BITS = 4
REBLUR_MAX_ACCUM_FRAME_NUM = (1 << REBLUR_ACCUMSPEED_BITS) - 1  # 63
REBLUR_MAX_MATERIALID_NUM = (1 << REBLUR_MATERIALID_BITS) - 1

REBLUR_PRE_BLUR_FRACTION_SCALE = 2.0
REBLUR_PRE_BLUR_NON_LINEAR_ACCUM_SPEED = 1.0 / (1.0 + 10.0)
REBLUR_BLUR_FRACTION_SCALE = 1.0
REBLUR_POST_BLUR_FRACTION_SCALE = 0.5
REBLUR_POST_BLUR_RADIUS_SCALE = 2.0

REBLUR_ALMOST_ZERO_ANGLE = float(jnp.cos(jnp.deg2rad(89.0)))
REBLUR_VIRTUAL_MOTION_PREV_PREV_WEIGHT_ITERATION_NUM = 1
REBLUR_FIREFLY_SUPPRESSOR_MAX_RELATIVE_INTENSITY = 38.0
REBLUR_FIREFLY_SUPPRESSOR_RADIUS_SCALE = 0.1
REBLUR_FIREFLY_SUPPRESSOR_FAST_RELATIVE_INTENSITY = 4.0
REBLUR_ANTI_FIREFLY_FILTER_RADIUS = 4
REBLUR_ANTI_FIREFLY_SIGMA_SCALE = 2.0
REBLUR_ROUGHNESS_SENSITIVITY_IN_TA = nm.NRD_ROUGHNESS_SENSITIVITY * 0.3
REBLUR_SAMPLES_PER_FRAME = 1.0
REBLUR_MAX_PERCENT_OF_LOBE_VOLUME_FOR_PRE_PASS = 0.3
NRD_CURVATURE_Z_THRESHOLD = 0.1            # Common.hlsli:72
NRD_MAX_ALLOWED_VIRTUAL_MOTION_ACCELERATION = 15.0
NRD_DISOCCLUSION_THRESHOLD = 0.02


def color_clamping_sigma_scale(occlusion: bool) -> float:
    return 1.0 if occlusion else 2.0


# ---------------------------------------------------------------------------
# Internal data quantization (REBLUR_Common.hlsli:13-31)
# ---------------------------------------------------------------------------


def quantize_accum_speed(a):
    """6-bit UNORM round-trip of accumSpeed/63 - matches R16_UINT feedback precision."""
    return jnp.round(nm.saturate(a / REBLUR_MAX_ACCUM_FRAME_NUM)
                     * REBLUR_MAX_ACCUM_FRAME_NUM)


def quantize_material_id(m):
    return jnp.round(jnp.clip(m, 0, REBLUR_MAX_MATERIALID_NUM))


# ---------------------------------------------------------------------------
# Misc (REBLUR_Common.hlsli:82-131)
# ---------------------------------------------------------------------------


def get_view_vector(sc, x_world):
    """GetViewVector (world space): normalize(-X) for perspective (camera at origin)."""
    return jnp.where(sc["ortho_mode"] == 0.0, nm.normalize(-x_world),
                     sc["view_vector_world"][None, None, :])


def get_view_vector_view_space(sc, xv):
    return jnp.where(sc["ortho_mode"] == 0.0, nm.normalize(-xv),
                     jnp.asarray([0.0, 0.0, -1.0], jnp.float32))


def get_view_vector_prev(sc, x_prev):
    return jnp.where(sc["ortho_mode"] == 0.0,
                     nm.normalize(sc["camera_delta"][None, None, :] - x_prev),
                     sc["view_vector_world_prev"][None, None, :])


def get_min_allowed_limit_for_hit_dist_non_linear_accum_speed(dc, roughness):
    """REBLUR_Common.hlsli:94-102."""
    frame_num = 0.5 * nm.get_spec_magic_curve(roughness) * dc["max_accumulated_frame_num"]
    return 1.0 / (1.0 + frame_num)


def get_fade_based_on_accumulated_frames(dc, accum_speed):
    """REBLUR_Common.hlsli:104-110."""
    a = dc["history_fix_frame_num"] * 2.0 / 3.0 + 1e-6
    b = dc["history_fix_frame_num"] * 4.0 / 3.0 + 2e-6
    return nm.linearstep(a, b, accum_speed)


def get_non_linear_accum_speed(sc, accum_speed, max_accum_speed, confidence, has_data):
    """GetNonLinearAccumSpeed (REBLUR_Common.hlsli:112-124), confidence-non-linear variant.

    has_data: bool array or python bool.
    """
    nlas = jnp.maximum(1.0 - confidence, 1.0 / (1.0 + jnp.minimum(accum_speed,
                                                                  max_accum_speed)))
    no_data_scale = nm.lerp(1.0 - sc["checkerboard_resolve_accum_speed"], 1.0, nlas)
    if isinstance(has_data, bool):
        return nlas if has_data else nlas * no_data_scale
    return jnp.where(has_data, nlas, nlas * no_data_scale)


def remap_roughness_to_responsive_factor(dc, roughness):
    """REBLUR_Common.hlsli:126-131."""
    amount = (roughness + nm.EPS) / (dc["responsive_accumulation_roughness_threshold"]
                                     + nm.EPS)
    return nm.smoothstep01(amount)


# ---------------------------------------------------------------------------
# Signal helpers (REBLUR_Common.hlsli:133-242); signals are (h, w, c), hit = last channel
# ---------------------------------------------------------------------------


def extract_hit_dist(signal):
    return signal[..., -1]


def get_luma(signal, occlusion: bool):
    """GetLuma: YCoCg .x for radiance, hitDist for occlusion."""
    if occlusion:
        return signal[..., -1]
    return signal[..., 0]


def get_luma_scale(curr_luma, new_luma):
    return (new_luma + nm.EPS) / (curr_luma + nm.EPS)


def change_luma(signal, new_luma, occlusion: bool, directional: bool = False):
    if occlusion and not directional:
        return new_luma[..., None]
    if directional:
        scale = get_luma_scale(signal[..., 3], new_luma)
        return jnp.concatenate([signal[..., :3] * scale[..., None], new_luma[..., None]], -1)
    scale = get_luma_scale(get_luma(signal, False), new_luma)
    return jnp.concatenate([signal[..., :3] * scale[..., None], signal[..., 3:]], -1)


def clamp_negative_to_zero(signal, occlusion: bool, directional: bool = False):
    """ClampNegativeToZero (REBLUR_Common.hlsli:168-240)."""
    hit = nm.saturate(signal[..., -1:])
    if occlusion and not directional:
        return hit
    if directional:
        scale = get_luma_scale(signal[..., 3:4], hit)
        return jnp.concatenate([signal[..., :3] * scale, hit], -1)
    rgb = nm.linear_to_ycocg(nm.ycocg_to_linear(signal[..., :3]))
    return jnp.concatenate([rgb, hit], -1)


def mix_history_and_current(dc, history, current, f, roughness, occlusion: bool):
    """MixHistoryAndCurrent (REBLUR_Common.hlsli:152-207)."""
    min_limit = get_min_allowed_limit_for_hit_dist_non_linear_accum_speed(dc, roughness)
    f_hit = jnp.maximum(f, min_limit)
    if occlusion:
        return nm.lerp(history, current, f_hit[..., None])
    out_rgb = nm.lerp(history[..., :3], current[..., :3], f[..., None])
    out_hit = nm.lerp(history[..., 3], current[..., 3], f_hit)
    return jnp.concatenate([out_rgb, out_hit[..., None]], -1)


def compute_antilag(sc, dc, history, avg, sigma, accum_speed):
    """ComputeAntilag mode 2 (REBLUR_Common.hlsli:244-274)."""
    s = sigma * dc["antilag_params"][0]
    magic = dc["antilag_params"][1] * sc["framerate_scale"] * sc["framerate_scale"]
    hc = jnp.clip(history, avg - s, avg + s)
    d = jnp.abs(history - hc) / (jnp.maximum(history, hc) + nm.EPS)
    return 1.0 / (1.0 + d * accum_speed / magic)


def get_kernel_basis(d, n):
    """GetKernelBasis (REBLUR_Common.hlsli:278-293)."""
    t, b = nm.get_basis(n)
    dn = jnp.abs(nm.dot(d, n))
    r = nm.reflect(-d, n)
    t2 = nm.normalize(jnp.cross(n, r))
    b2 = jnp.cross(r, t2)
    use_refl = (dn < 0.999)[..., None]
    return jnp.where(use_refl, t2, t), jnp.where(use_refl, b2, b)


def get_temporal_accumulation_params(sc, is_in_screen_mul_footprint_quality, accum_speed):
    """REBLUR_Common.hlsli:297-306. Returns (w, sigma_scale)."""
    a = accum_speed * REBLUR_SAMPLES_PER_FRAME
    w = is_in_screen_mul_footprint_quality * a / (1.0 + a)
    return w, 1.0 + 3.0 * sc["framerate_scale"] * w


def get_modified_roughness_from_normal_variance(roughness, n_avg_unnormalized):
    """Filtering::GetModifiedRoughnessFromNormalVariance (MathLib; vMF fit, Frostbite
    s2013_pbs_rad_notes p.20): widen roughness by the normal variance of the 2x2 footprint."""
    l = nm.length(n_avg_unnormalized)
    kappa = nm.saturate(1.0 - l * l) / jnp.maximum(l * (3.0 - l * l), 1e-15)
    return jnp.sqrt(nm.saturate(roughness * roughness + kappa))


def cb_expand(sig_half, w_full):
    """Expand a half-width checkerboard input to full resolution: full-res pixel x
    reads half-res texel x >> 1, exactly like the reference's `pos.x >>= 1` reads
    (REBLUR_PrePass.hlsli:62-64). Works for (h, w/2) and (h, w/2, c)."""
    rep = jnp.repeat(sig_half, 2, axis=1)
    return rep[:, :w_full]
