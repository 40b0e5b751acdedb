"""Numpy transliteration of the reference's shared shader helpers.

This is the PARITY ORACLE's support library: every function below is written
line-by-line from the HLSL in /root/reference (file:line cited per function), in
plain numpy, independent of nrdtpu's JAX implementations. The oracle exists so a
formula change in any REBLUR pillar fails a 40 dB test instead of a loose scene
floor (BASELINE.md's stated success metric).

ml (MathLib) primitives are NOT vendored in the reference tree (fetched by its
CMake); for those (AcosApprox, GetSpecularLobeTanHalfAngle) we use the same
closed forms nrdtpu/math.py documents - the divergence surface vs NVIDIA's
private fits is bounded and identical on both sides of the comparison.

Image convention matches the engine: (H, W[, C]) float32, pixel (x, y) at
[y, x], uv in [0,1]^2 with texel centers at (i + 0.5) / size.
"""

from __future__ import annotations

import numpy as np

F32 = np.float32
NRD_EPS = 1e-6
NRD_INF = 1e6
PI = float(np.pi)

# Common.hlsli:68-74
NRD_CATROM_SHARPNESS = 0.5
NRD_EXP_WEIGHT_DEFAULT_SCALE = 3.0
NRD_MAX_PERCENT_OF_LOBE_VOLUME = 0.75
NRD_ROUGHNESS_SENSITIVITY = 0.01


def saturate(x):
    return np.clip(x, 0.0, 1.0)


def lerp(a, b, t):
    return a + (b - a) * t


def smoothstep(a, b, x):
    t = saturate((x - a) / (b - a))
    return t * t * (3.0 - 2.0 * t)


def smoothstep01(x):
    x = saturate(x)
    return x * x * (3.0 - 2.0 * x)


def linearstep(a, b, x):
    return saturate((x - a) / (b - a))


def positive_rcp(x):
    return 1.0 / np.maximum(x, NRD_EPS)


def get_std_dev(m1, m2):
    """GetStdDev (Common.hlsli:227)."""
    return np.sqrt(np.abs(m2 - m1 * m1))


def acos_approx(x):
    """Math::AcosApprox - same closed form as nrdtpu/math.py:69 (ml not vendored)."""
    x = np.clip(x, -1.0, 1.0)
    res = np.sqrt(saturate(1.0 - np.abs(x))) * (PI / 2.0)
    return np.where(x >= 0.0, res, PI - res)


def pow5(x):
    """BRDF::Pow5 - the Fresnel form (1-x)^5 (public MathLib convention)."""
    t = saturate(1.0 - x)
    return t * t * t * t * t


# ---------------------------------------------------------------------------
# geometry (ml Geometry:: subset used by the REBLUR kernels)
# ---------------------------------------------------------------------------


def reconstruct_view_position(uv, frustum, z, ortho_mode=0.0):
    """Geometry::ReconstructViewPosition.

    frustum = (x0, y0, dx, dy) such that clip-space ray dir = (x0 + u*dx, y0 + v*dy, 1).
    Perspective (ortho_mode == 0): Xv = dir * z; ortho: Xv.xy = dir, Xv.z = z.
    """
    s = np.abs(ortho_mode) + z * (1.0 - np.abs(ortho_mode))
    x = (frustum[0] + uv[..., 0] * frustum[2]) * s
    y = (frustum[1] + uv[..., 1] * frustum[3]) * s
    return np.stack([x, y, np.broadcast_to(z, x.shape)], -1).astype(F32)


def rotate_vector(m, v):
    """Geometry::RotateVector - 3x3 part of a 4x4 row-major matrix applied to v."""
    return v @ np.asarray(m)[:3, :3].T


def rotate_vector_inverse(m, v):
    """Geometry::RotateVectorInverse - transpose(3x3) applied to v."""
    return v @ np.asarray(m)[:3, :3]


def affine_transform(m, v):
    m = np.asarray(m)
    return v @ m[:3, :3].T + m[:3, 3]


def get_screen_uv(world_to_clip, x):
    """Geometry::GetScreenUv: project, perspective divide, y flip, to [0,1]."""
    m = np.asarray(world_to_clip)
    clip = x @ m[:3, :3].T + m[:3, 3]
    w = x @ m[3, :3].T + m[3, 3]
    xy = clip[..., :2] / np.maximum(np.abs(w), NRD_EPS)[..., None] * np.sign(w)[..., None]
    u = xy[..., 0] * 0.5 + 0.5
    v = 0.5 - xy[..., 1] * 0.5
    return np.stack([u, v], -1)


def rotate_vector2(rotator, v):
    """Geometry::RotateVector(float4 rotator, float2 v)."""
    x = v[..., 0] * rotator[..., 0] + v[..., 1] * rotator[..., 2]
    y = v[..., 0] * rotator[..., 1] + v[..., 1] * rotator[..., 3]
    return np.stack(np.broadcast_arrays(x, y), -1)


def scale_rotator(rotator, scale):
    """Geometry::ScaleRotator."""
    return np.stack([rotator[..., 0] * scale[..., 0], rotator[..., 1] * scale[..., 1],
                     rotator[..., 2] * scale[..., 0], rotator[..., 3] * scale[..., 1]], -1)


# ---------------------------------------------------------------------------
# NRD.hlsli codec pieces (the front-end contract)
# ---------------------------------------------------------------------------


def _oct_decode(px, py):
    """_NRD_DecodeUnitVector unsigned octahedral (NRD.hlsli:327-345)."""
    fx = px * 2.0 - 1.0
    fy = py * 2.0 - 1.0
    nz = 1.0 - np.abs(fx) - np.abs(fy)
    t = saturate(-nz)
    nx = fx + np.where(fx >= 0.0, -t, t)
    ny = fy + np.where(fy >= 0.0, -t, t)
    n = np.stack([nx, ny, nz], -1)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-15)


def unpack_normal_roughness(p):
    """NRD_FrontEnd_UnpackNormalAndRoughness, R10G10B10A2 encoding (NRD.hlsli:600-628)."""
    n = _oct_decode(p[..., 0], p[..., 1])
    return n, p[..., 2], p[..., 3] * 3.0


def unpack_view_z(z, view_z_scale=1.0):
    return np.abs(z) * view_z_scale


def hit_dist_normalization(view_z, hit_dist_params, roughness):
    """_REBLUR_GetHitDistanceNormalization (NRD.hlsli:520-523)."""
    A, B, C, D = [float(v) for v in hit_dist_params]
    return (A + np.abs(view_z) * B) * lerp(1.0, C, saturate(np.exp2(D * roughness * roughness)))


def ycocg_to_linear(c):
    """_NRD_YCoCgToLinear (NRD.hlsli:365-375)."""
    y, co, cg = c[..., 0], c[..., 1], c[..., 2]
    t = y - cg
    g = y + cg
    r = t + co
    b = t - co
    return np.maximum(np.stack([r, g, b], -1), 0.0)


def linear_to_ycocg(c):
    """_NRD_LinearToYCoCg (NRD.hlsli:356-363)."""
    r, g, b = c[..., 0], c[..., 1], c[..., 2]
    y = 0.25 * r + 0.5 * g + 0.25 * b
    co = 0.5 * r - 0.5 * b
    cg = -0.25 * r + 0.5 * g - 0.25 * b
    return np.stack([y, co, cg], -1)


# ---------------------------------------------------------------------------
# Common.hlsli runtime helpers
# ---------------------------------------------------------------------------


def get_frustum_size(min_rect_dim_mul_unproject, ortho_mode, view_z):
    """GetFrustumSize (Common.hlsli:242-248)."""
    return min_rect_dim_mul_unproject * lerp(view_z, 1.0, np.abs(ortho_mode))


def get_hit_dist_factor(hit_dist, frustum_size):
    """GetHitDistFactor (Common.hlsli:250-253)."""
    return saturate(hit_dist / frustum_size)


def pixel_radius_to_world(unproject, ortho_mode, pixel_radius, view_z):
    """PixelRadiusToWorld (ml/Common): radius * unproject * lerp(viewZ, 1, |ortho|)."""
    return pixel_radius * unproject * lerp(view_z, 1.0, np.abs(ortho_mode))


def is_in_screen_nearest(uv):
    """IsInScreenNearest (Common.hlsli:280-283)."""
    return (np.all(uv > 0.0, -1) & np.all(uv < 1.0, -1)).astype(F32)


def is_in_screen_bilinear(origin, rect_size):
    """IsInScreenBilinear (Common.hlsli:287-295): (00, 10, 01, 11) tap validity."""
    px, py = origin[..., 0], origin[..., 1]

    def ok(p, r):
        return ((p >= 0.0) & (p < r)).astype(F32)

    x0, x1 = ok(px, rect_size[0]), ok(px + 1.0, rect_size[0])
    y0, y1 = ok(py, rect_size[1]), ok(py + 1.0, rect_size[1])
    return np.stack([x0 * y0, x1 * y0, x0 * y1, x1 * y1], -1)


def get_specular_lobe_tan_half_angle(roughness, percent_of_volume):
    """ImportanceSampling::GetSpecularLobeTanHalfAngle (ml; same closed form as math.py)."""
    m = roughness * roughness
    return m * np.sqrt(percent_of_volume / np.maximum(1.0 - percent_of_volume, NRD_EPS))


def get_normal_weight_param(non_linear_accum_speed, lobe_angle_fraction, roughness=1.0,
                            encoding_error=0.75 / 255.0):
    """GetNormalWeightParam (Common.hlsli:486-499)."""
    percent = NRD_MAX_PERCENT_OF_LOBE_VOLUME * lerp(
        lobe_angle_fraction, 1.0, non_linear_accum_speed)
    angle = np.arctan(get_specular_lobe_tan_half_angle(roughness, percent))
    return 1.0 / np.maximum(angle, encoding_error)


def get_geometry_weight_params(plane_dist_sensitivity, frustum_size, xv, nv,
                               non_linear_accum_speed):
    """GetGeometryWeightParams (Common.hlsli:501-508)."""
    a = 1.0 / (plane_dist_sensitivity * frustum_size)
    b = np.sum(nv * xv, -1) * a
    return a, -b


def get_spec_magic_curve(roughness, power=0.25):
    """GetSpecMagicCurve (Common.hlsli:311-317)."""
    f = 1.0 - np.exp2(-200.0 * roughness * roughness)
    return f * np.power(saturate(roughness), power)


def get_hit_distance_weight_params(hit_dist, non_linear_accum_speed, roughness=1.0):
    """GetHitDistanceWeightParams (Common.hlsli:510-521)."""
    smc = get_spec_magic_curve(roughness)
    norm = lerp(0.0005, 1.0, np.minimum(non_linear_accum_speed, smc))
    a = 1.0 / norm
    return a, -hit_dist * a


def exp_approx(x):
    """ExpApprox (Common.hlsli:546-551): rcp(x^2 - x + 1), negative x only."""
    return 1.0 / (x * x - x + 1.0)


def compute_exponential_weight(x, px, py, use_exp_approx=False):
    """ComputeExponentialWeight (Common.hlsli:554-555).

    nrdtpu documents using the hardware exp instead of ExpApprox (math.py:620);
    the oracle defaults to the same so the comparison isolates FORMULA drift; pass
    use_exp_approx=True for the reference's exact rational fit.
    """
    t = -NRD_EXP_WEIGHT_DEFAULT_SCALE * np.abs(x * px + py)
    return exp_approx(t) if use_exp_approx else np.exp(t)


def compute_weight(x, px, py):
    """ComputeNonExponentialWeight (Common.hlsli:559-560)."""
    return smoothstep(1.0, 0.0, np.abs(x * px + py))


def get_gaussian_weight(r):
    """GetGaussianWeight (Common.hlsli:571-574)."""
    return np.exp(-0.66 * r * r)


def get_disocclusion_threshold(disocclusion_threshold, frustum_size, nov):
    """GetDisocclusionThreshold (Common.hlsli:593-596)."""
    return frustum_size * saturate(disocclusion_threshold / np.maximum(0.01, nov))


# ---------------------------------------------------------------------------
# texture addressing (D3D sampler semantics)
# ---------------------------------------------------------------------------


def texel_fetch(img, x, y):
    """Clamp-addressed integer fetch; x, y int arrays."""
    h, w = img.shape[:2]
    return img[np.clip(y, 0, h - 1), np.clip(x, 0, w - 1)]


def sample_nearest(img, uv):
    h, w = img.shape[:2]
    x = np.floor(uv[..., 0] * w).astype(np.int64)
    y = np.floor(uv[..., 1] * h).astype(np.int64)
    return texel_fetch(img, x, y)


def get_bilinear_filter(uv, tex_size):
    """Filtering::GetBilinearFilter: (origin, fraction)."""
    pos = uv * np.asarray(tex_size, F32) - 0.5
    origin = np.floor(pos)
    return origin, pos - origin


def bilinear_weights(f):
    fx, fy = f[..., 0], f[..., 1]
    return np.stack([(1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy], -1)


def get_bilinear_custom_weights(f, custom):
    """Filtering::GetBilinearCustomWeights."""
    return bilinear_weights(f) * custom


def apply_bilinear_custom_weights(s00, s10, s01, s11, w, normalize=True):
    """Filtering::ApplyBilinearCustomWeights."""
    taps = [s00, s10, s01, s11]
    chan = taps[0].ndim == w[..., 0].ndim + 1
    out = sum(t * (w[..., k][..., None] if chan else w[..., k])
              for k, t in enumerate(taps))
    if normalize:
        ws = np.sum(w, -1)
        if chan:
            ws = ws[..., None]
        out = np.where(ws < 0.0001, 0.0, out / np.where(ws < 0.0001, 1.0, ws))
    return out


def gather_2x2(img, origin):
    x0 = origin[..., 0].astype(np.int64)
    y0 = origin[..., 1].astype(np.int64)
    return (texel_fetch(img, x0, y0), texel_fetch(img, x0 + 1, y0),
            texel_fetch(img, x0, y0 + 1), texel_fetch(img, x0 + 1, y0 + 1))


def bilinear_custom(img, origin, weights):
    """_BilinearFilterWithCustomWeights_Color (Common.hlsli:648-656)."""
    s00, s10, s01, s11 = gather_2x2(img, origin)
    return apply_bilinear_custom_weights(s00, s10, s01, s11, weights)


def _sample_bilinear_clamp(img, uv, size):
    """gLinearClamp SampleLevel at uv (in [0,1] of a size-(w,h) texture)."""
    pos = uv * np.asarray(size, F32) - 0.5
    origin = np.floor(pos)
    f = pos - origin
    s00, s10, s01, s11 = gather_2x2(img, origin)
    w = bilinear_weights(f)
    chan = img.ndim == 3
    return sum(t * (w[..., k][..., None] if chan else w[..., k])
               for k, t in enumerate((s00, s10, s01, s11)))


def catrom_with_bilinear_fallback(img, sample_pos, use_bicubic, bilinear_custom_weights):
    """_BicubicFilterNoCornersWithFallbackToBilinear... (Common.hlsli:602-646).

    sample_pos in pixels of img; 5 bilinear sub-taps when bicubic, custom-weight
    bilinear otherwise. Renormalizes; returns 0 where the weight sum < 1e-4.
    """
    h, w_ = img.shape[:2]
    size = np.asarray([w_, h], F32)
    inv = 1.0 / size
    center = np.floor(sample_pos - 0.5) + 0.5
    f = saturate(sample_pos - center)
    c = NRD_CATROM_SHARPNESS
    w0 = f * (f * (-c * f + 2.0 * c) - c)
    w1 = f * (f * ((2.0 - c) * f - (3.0 - c))) + 1.0
    w2 = f * (f * (-(2.0 - c) * f + (3.0 - 2.0 * c)) + c)
    w3 = f * (f * (c * f - c))
    w12 = w1 + w2
    tc = w2 / w12
    wx = w12[..., 0] * w0[..., 1]
    wy = w0[..., 0] * w12[..., 1]
    wz = w12[..., 0] * w12[..., 1]
    ww = w3[..., 0] * w12[..., 1]
    w4 = w12[..., 0] * w3[..., 1]

    ub = use_bicubic
    ubc = ub[..., None]
    w_taps = [np.where(ub, wx, bilinear_custom_weights[..., 0]),
              np.where(ub, wy, bilinear_custom_weights[..., 1]),
              np.where(ub, wz, bilinear_custom_weights[..., 2]),
              np.where(ub, ww, bilinear_custom_weights[..., 3])]
    w4 = np.where(ub, w4, 0.0)
    wsum = sum(w_taps) + w4

    cx = center[..., 0]
    cy = center[..., 1]
    tcx = tc[..., 0]
    tcy = tc[..., 1]
    uv01 = [np.stack([np.where(ub, cx + tcx, cx), np.where(ub, cy - 1.0, cy)], -1),
            np.stack([np.where(ub, cx - 1.0, cx + 1.0), np.where(ub, cy + tcy, cy)], -1)]
    uv23 = [np.stack([np.where(ub, cx + tcx, cx), np.where(ub, cy + tcy, cy + 1.0)], -1),
            np.stack([np.where(ub, cx + 2.0, cx + 1.0), np.where(ub, cy + tcy, cy + 1.0)], -1)]
    uv4 = np.stack([np.where(ub, cx + tcx, cx + f[..., 0]),
                    np.where(ub, cy + 2.0, cy + f[..., 1])], -1)

    chan = img.ndim == 3

    def tap(uv, wk):
        s = _sample_bilinear_clamp(img, uv * inv, size)
        return s * (wk[..., None] if chan else wk)

    out = tap(uv01[0], w_taps[0]) + tap(uv01[1], w_taps[1]) \
        + tap(uv23[0], w_taps[2]) + tap(uv23[1], w_taps[3]) + tap(uv4, w4)
    ws = wsum[..., None] if chan else wsum
    return np.where(np.abs(ws) < 0.0001, 0.0, out / np.where(np.abs(ws) < 0.0001, 1.0, ws))


# Common.hlsli:181-192 - REBLUR's blur taps (REBLUR_POISSON_SAMPLES = g_Special8,
# REBLUR_Config.hlsli:64-68)
SQ2_4 = 0.25 * np.sqrt(2.0)
G_SPECIAL8 = np.array([
    [-1.0, 0.0, 1.0], [0.0, 1.0, 1.0], [1.0, 0.0, 1.0], [0.0, -1.0, 1.0],
    [-SQ2_4, SQ2_4, 0.5], [SQ2_4, SQ2_4, 0.5],
    [SQ2_4, -SQ2_4, 0.5], [-SQ2_4, -SQ2_4, 0.5]], np.float32)


# ---------------------------------------------------------------------------
# specular TA helpers (round-4 oracle extension)
# ---------------------------------------------------------------------------


def normalize(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-15)


def length(v):
    return np.linalg.norm(v, axis=-1)


def reflect(i, n):
    return i - 2.0 * np.sum(i * n, -1, keepdims=True) * n


def rotate_vector_inverse(m, v):
    """Geometry::RotateVectorInverse: row-vector times M (M^T @ v)."""
    return v @ np.asarray(m, F32)[:3, :3]


def get_specular_dominant_factor(nov, roughness):
    """_NRD_GetSpecularDominantFactor (NRD.hlsli:386-392), G2-preintegrated fit."""
    a = 0.298475 * np.log(39.4115 - 39.0029 * roughness)
    return saturate(np.power(saturate(1.0 - nov), 10.8649) * (1.0 - a) + a)


def get_specular_dominant_direction(n, v, roughness):
    """ImportanceSampling::GetSpecularDominantDirection (G2). (..., 4): xyz dir, w factor."""
    nov = np.abs(np.sum(n * v, -1))
    f = get_specular_dominant_factor(nov, roughness)
    r = reflect(-v, n)
    d = normalize(lerp(n, r, f[..., None]))
    return np.concatenate([d, f[..., None]], -1)


def get_basis(n):
    """Geometry::GetBasis - branchless ONB (Duff et al. 2017). Returns (T, B)."""
    z = n[..., 2]
    sign = np.where(z >= 0.0, F32(1.0), F32(-1.0))
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = np.stack([1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b,
                  -sign * n[..., 0]], -1)
    bt = np.stack([b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]], -1)
    return t.astype(F32), bt.astype(F32)


def get_xvirtual(hit_dist, curvature, x, x_prev, n, v, roughness):
    """GetXvirtual, NRD_USE_SPECULAR_MOTION_V2 == 1 (Common.hlsli:411-461)."""
    d4 = get_specular_dominant_direction(n, v, roughness)
    d, dw = d4[..., :3], d4[..., 3]
    reflection_ray = d * hit_dist[..., None]
    t, b = get_basis(n)
    o = np.stack([np.sum(t * reflection_ray, -1), np.sum(b * reflection_ray, -1),
                  np.sum(n * reflection_ray, -1)], -1)
    oz = -o[..., 2]
    mag = 1.0 / (2.0 * curvature * oz - 1.0)
    f = length(x)
    f = f * (1.0 - np.abs(np.sum(n * v, -1)))
    f = f * np.maximum(curvature, 0.0)
    mag = mag / (1.0 + f)
    iw_len = length(o * mag[..., None])
    closeness = saturate(iw_len / (hit_dist + NRD_EPS))
    origin = lerp(x_prev, x, (closeness * dw)[..., None])
    return origin - v * (iw_len * dw)[..., None]


def get_relaxed_roughness_weight_params(m, fraction=1.0, sensitivity=NRD_ROUGHNESS_SENSITIVITY):
    """GetRelaxedRoughnessWeightParams (Common.hlsli:531-540); m = roughness^2."""
    a = 1.0 / lerp(sensitivity, 1.0, lerp(m * m, m, fraction))
    return a, -m * a


def compute_non_exponential_weight_with_sigma(x, px, py, sigma):
    """ComputeNonExponentialWeightWithSigma (Common.hlsli:562-563)."""
    return smoothstep(1.0, 0.0, np.abs(x * px + py) - sigma * px)


def get_modified_roughness_from_normal_variance(roughness, n_avg_unnormalized):
    """Filtering::GetModifiedRoughnessFromNormalVariance (MathLib vMF fit)."""
    l = length(n_avg_unnormalized)
    kappa = saturate(1.0 - l * l) / np.maximum(l * (3.0 - l * l), 1e-15)
    return np.sqrt(saturate(roughness * roughness + kappa))


def remap_roughness_to_responsive_factor(roughness, threshold):
    """RemapRoughnessToResponsiveFactor (REBLUR_Common.hlsli:126-131)."""
    return smoothstep01((roughness + NRD_EPS) / (threshold + NRD_EPS))


def get_non_linear_accum_speed(accum_speed, max_accum_speed, confidence, has_data,
                               checkerboard_resolve_accum_speed=0.0):
    """GetNonLinearAccumSpeed (REBLUR_Common.hlsli:112-124), confidence-non-linear."""
    nlas = np.maximum(1.0 - confidence,
                      1.0 / (1.0 + np.minimum(accum_speed, max_accum_speed)))
    no_data = nlas * lerp(1.0 - checkerboard_resolve_accum_speed, 1.0, nlas)
    return np.where(has_data, nlas, no_data)


def pow01(x, p):
    return np.power(saturate(x), p)


def bayer4x4(px, py, frame_index):
    """Sequence::Bayer4x4 closed form; temporal term matches nrdtpu math.py:152-183
    (documented divergence there: NVIDIA's private temporal interleave not reproduced)."""
    px = np.asarray(px, np.int64) & 3
    py = np.asarray(py, np.int64) & 3
    pxy = px ^ py
    m = ((pxy & 1) << 3) | ((py & 1) << 2) | (((pxy >> 1) & 1) << 1) | ((py >> 1) & 1)
    f = int(frame_index) & 15
    rev = ((f & 1) << 3) | ((f & 2) << 1) | ((f & 4) >> 1) | ((f & 8) >> 3)
    return (((m + rev) & 15).astype(F32)) / 16.0


def hash_init(px, py, frame_index):
    """Rng::Hash::Initialize (PCG, matches math.py:196-206 port)."""
    x = np.asarray(px, np.uint32)
    y = np.asarray(py, np.uint32)
    f = np.uint32(frame_index)
    with np.errstate(over="ignore"):
        state = (x * np.uint32(1597334677)) ^ (y * np.uint32(3812015801)) \
            ^ (f * np.uint32(2798796415))
        return state * np.uint32(747796405) + np.uint32(2891336453)


def hash_next(state):
    with np.errstate(over="ignore"):
        state = state * np.uint32(747796405) + np.uint32(2891336453)
        word = ((state >> ((state >> np.uint32(28)) + np.uint32(4))) ^ state) \
            * np.uint32(277803737)
    return state, (word >> np.uint32(22)) ^ word


def hash_float2(state):
    state, a = hash_next(state)
    state, b = hash_next(state)
    fa = (a >> np.uint32(8)).astype(F32) * F32(1.0 / 16777216.0)
    fb = (b >> np.uint32(8)).astype(F32) * F32(1.0 / 16777216.0)
    return state, np.stack(np.broadcast_arrays(fa, fb), -1)


def stochastic_bilinear_uv(uv, tex_size, state):
    """StochasticBilinear (Common.hlsli:359-372), R10G10B10A2 path.

    The shader inits Rng ONCE (TA :117) and each call consumes the next two draws,
    so the per-pixel `state` threads through sequential calls. Returns (uv, state)."""
    state, rnd = hash_float2(state)
    origin, f = get_bilinear_filter(uv, tex_size)
    origin = origin + (rnd < f).astype(F32)
    return (origin + 0.5) / np.asarray(tex_size, F32), state


def get_encoding_aware_normal_weight(n_curr, n_prev, max_angle, curvature_angle,
                                     threshold_angle, remap=False):
    """GetEncodingAwareNormalWeight (Common.hlsli:578-589)."""
    cosa = np.sum(n_curr * n_prev, -1)
    angle = acos_approx(cosa)
    w = smoothstep01(1.0 - (angle - curvature_angle - threshold_angle) / max_angle)
    if remap:   # RELAX: mitigates RGBA8 prev-normal imprecision (:584-586)
        w = smoothstep(0.05, 0.95, w)
    return w


def sample_bilinear(img, uv):
    """Linear-clamp sampler at arbitrary uv."""
    h, w = img.shape[:2]
    return _sample_bilinear_clamp(img, uv, np.asarray([w, h], F32))


def get_roughness_weight_params(roughness, fraction,
                                sensitivity=NRD_ROUGHNESS_SENSITIVITY):
    """GetRoughnessWeightParams (Common.hlsli:523-529)."""
    a = 1.0 / lerp(sensitivity, 1.0, saturate(roughness * fraction))
    return a, -(roughness * a)
