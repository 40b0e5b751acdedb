"""Application-facing pack/unpack contract - port of `Shaders/Include/NRD.hlsli`.

Every function mirrors its HLSL counterpart (cited per function) so that scene inputs encoded
for the reference drive this engine identically. Radiance images are (..., 3), packed signals
(..., 4); all math is jnp and jit-safe.

Encoding-parity: the optional `quantized=True` paths emulate the UNORM texture quantization of
the corresponding storage format so round-trip tests can bound codec error exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import math as nm
from .settings import NormalEncoding, RoughnessEncoding

NRD_FP16_MAX = 65504.0
NRD_EPS = 1e-6
NRD_INF = 1e6
NRD_ROUGHNESS_EPS = float(jnp.sqrt(jnp.sqrt(jnp.float32(NRD_EPS))))
NRD_MATERIAL_FACTOR_MIN_SCALE = 0.02
NRD_ROUGHNESS_FACTOR_MIN_SCALE = 0.1
NRD_REJITTER_VIEWZ_THRESHOLD = 0.01


# ---------------------------------------------------------------------------
# Normal / roughness / materialID codec (NRD.hlsli:598-667)
# ---------------------------------------------------------------------------


def pack_normal_roughness(n, roughness, material_id=0.0,
                          normal_encoding=NormalEncoding.R10_G10_B10_A2_UNORM,
                          roughness_encoding=RoughnessEncoding.LINEAR,
                          quantized=False):
    """NRD_FrontEnd_PackNormalAndRoughness (NRD.hlsli:640-667). Returns (..., 4)."""
    if roughness_encoding == RoughnessEncoding.SQRT_LINEAR:
        roughness = jnp.sqrt(nm.saturate(roughness))
    elif roughness_encoding == RoughnessEncoding.SQ_LINEAR:
        roughness = roughness * roughness

    material_id = jnp.broadcast_to(jnp.asarray(material_id, jnp.float32), jnp.shape(roughness))

    if normal_encoding == NormalEncoding.R10_G10_B10_A2_UNORM:
        xy = nm.encode_unit_vector(n, signed=False)
        p = jnp.stack(
            [xy[..., 0], xy[..., 1], roughness, nm.saturate(material_id / 3.0)], axis=-1)
        if quantized:
            p = jnp.concatenate([
                nm.quantize_unorm(p[..., :3], 10), nm.quantize_unorm(p[..., 3:], 2)], axis=-1)
    else:
        # best-fit scaling (NRD.hlsli:656); NaN-safe for garbage (sky) inputs
        n = n / jnp.maximum(jnp.max(jnp.abs(n), axis=-1, keepdims=True), 1e-15)
        signed = normal_encoding in (NormalEncoding.RGBA8_SNORM, NormalEncoding.RGBA16_SNORM)
        if not signed:
            n = n * 0.5 + 0.5
        p = jnp.concatenate([n, roughness[..., None]], axis=-1)
        if quantized:
            bits = 8 if normal_encoding in (NormalEncoding.RGBA8_UNORM,
                                            NormalEncoding.RGBA8_SNORM) else 16
            p = nm.quantize_snorm(p, bits) if signed else nm.quantize_unorm(p, bits)
    return p


def unpack_normal_roughness(p,
                            normal_encoding=NormalEncoding.R10_G10_B10_A2_UNORM,
                            roughness_encoding=RoughnessEncoding.LINEAR):
    """NRD_FrontEnd_UnpackNormalAndRoughness (NRD.hlsli:600-628).

    Returns (normal (...,3), roughness (...,), material_id (...,)).
    """
    if normal_encoding == NormalEncoding.R10_G10_B10_A2_UNORM:
        n = nm.decode_unit_vector(p[..., :2], signed=False, do_normalize=False)
        roughness = p[..., 2]
        material_id = p[..., 3] * 3.0
    else:
        n = p[..., :3]
        if normal_encoding in (NormalEncoding.RGBA8_UNORM, NormalEncoding.RGBA16_UNORM):
            n = n * 2.0 - 1.0
        roughness = p[..., 3]
        material_id = jnp.zeros_like(roughness)

    n = nm.safe_normalize(n)

    if roughness_encoding == RoughnessEncoding.SQRT_LINEAR:
        roughness = roughness * roughness
    elif roughness_encoding == RoughnessEncoding.SQ_LINEAR:
        roughness = jnp.sqrt(nm.saturate(roughness))
    return n, roughness, material_id


# ---------------------------------------------------------------------------
# Material de-modulation (NRD.hlsli:669-687)
# ---------------------------------------------------------------------------


def environment_term_rtg(rf0, nov, roughness):
    """_NRD_EnvironmentTerm_Rtg (NRD.hlsli:490-517) - preintegrated GGX env BRDF fit."""
    m = nm.saturate(roughness * roughness)
    x1, xn, xz, xw = 1.0, nov, nov * nov, nov * nov * nov
    y1, ym, yz, yw = 1.0, m, m * m, m * m * m

    def dot2(mat, a, b):
        return mat[0][0] * a[0] * b[0] + mat[0][1] * a[0] * b[1] + \
            mat[1][0] * a[1] * b[0] + mat[1][1] * a[1] * b[1]

    def dot3(mat, a, b):
        s = 0.0
        for i in range(3):
            for j in range(3):
                s = s + mat[i][j] * a[i] * b[j]
        return s

    m1 = ((0.99044, -1.28514), (1.29678, -0.755907))
    m2 = ((1.0, 2.92338, 59.4188), (20.3225, -27.0302, 222.592), (121.563, 626.13, 316.627))
    m3 = ((0.0365463, 3.32707), (9.0632, -9.04756))
    m4 = ((1.0, 3.59685, -1.36772), (9.04401, -16.3174, 9.22949), (5.56589, 19.7886, -20.2123))

    bias = dot2(m1, (x1, xn), (y1, ym)) / jnp.maximum(
        dot3(m2, (x1, xn, xw), (y1, ym, yw)), NRD_EPS)
    scale = dot2(m3, (x1, xn), (y1, ym)) / jnp.maximum(
        dot3(m4, (x1, xz, xw), (y1, ym, yw)), NRD_EPS)
    return nm.saturate(rf0 * scale[..., None] + bias[..., None])


def material_factors(n, v, albedo, rf0, roughness):
    """NRD_MaterialFactors (NRD.hlsli:676-687). Returns (diffFactor, specFactor)."""
    nov = jnp.abs(nm.dot(n, v))
    fenv = environment_term_rtg(rf0, nov, roughness)
    diff = (1.0 - fenv) * albedo
    diff = nm.lerp(NRD_MATERIAL_FACTOR_MIN_SCALE, 1.0, diff)
    spec = fenv * nm.lerp(NRD_ROUGHNESS_FACTOR_MIN_SCALE, 1.0, roughness[..., None])
    spec = nm.lerp(NRD_MATERIAL_FACTOR_MIN_SCALE, 1.0, spec)
    return diff, spec


# ---------------------------------------------------------------------------
# Hit distance normalization (NRD.hlsli:519-523, 722-727, 1146-1151)
# ---------------------------------------------------------------------------


def get_hit_distance_normalization(view_z, hit_dist_params, roughness=1.0):
    """_REBLUR_GetHitDistanceNormalization (NRD.hlsli:520-523)."""
    a, b, c, d = (hit_dist_params[..., 0], hit_dist_params[..., 1],
                  hit_dist_params[..., 2], hit_dist_params[..., 3])
    return (a + jnp.abs(view_z) * b) * nm.lerp(
        1.0, c, nm.saturate(jnp.exp2(d * roughness * roughness)))


def reblur_get_norm_hit_dist(hit_dist, view_z, hit_dist_params, roughness=1.0):
    """REBLUR_FrontEnd_GetNormHitDist (NRD.hlsli:722-727)."""
    f = get_hit_distance_normalization(view_z, hit_dist_params, roughness)
    return nm.saturate(hit_dist / f)


def reblur_get_hit_dist(norm_hit_dist, view_z, hit_dist_params, roughness=1.0):
    """REBLUR_GetHitDist (NRD.hlsli:1146-1151)."""
    return norm_hit_dist * get_hit_distance_normalization(view_z, hit_dist_params, roughness)


# ---------------------------------------------------------------------------
# Sanitization helpers (NRD.hlsli:526-534)
# ---------------------------------------------------------------------------


def _sanitize(x, lo, hi):
    bad = jnp.logical_not(jnp.isfinite(x))
    return jnp.where(bad, 0.0, jnp.clip(x, lo, hi))


# ---------------------------------------------------------------------------
# REBLUR front-end (NRD.hlsli:717-781)
# ---------------------------------------------------------------------------


def reblur_pack_radiance_hitdist(radiance, norm_hit_dist, sanitize=True):
    """REBLUR_FrontEnd_PackRadianceAndNormHitDist (NRD.hlsli:732-743)."""
    if sanitize:
        radiance = _sanitize(radiance, 0.0, NRD_FP16_MAX)
        norm_hit_dist = _sanitize(norm_hit_dist, 0.0, 1.0)
    ycocg = nm.linear_to_ycocg(radiance)
    return jnp.concatenate([ycocg, norm_hit_dist[..., None]], axis=-1)


def reblur_pack_sh(radiance, norm_hit_dist, direction, sanitize=True):
    """REBLUR_FrontEnd_PackSh (NRD.hlsli:748-766). Returns (sh0, sh1)."""
    if sanitize:
        radiance = _sanitize(radiance, 0.0, NRD_FP16_MAX)
        norm_hit_dist = _sanitize(norm_hit_dist, 0.0, 1.0)
        direction = _sanitize(direction, -1.0, 1.0)
    ycocg = nm.linear_to_ycocg(radiance)
    sh0 = jnp.concatenate([ycocg, norm_hit_dist[..., None]], axis=-1)
    c1 = direction * ycocg[..., 0:1]
    sh1 = jnp.concatenate([c1, jnp.zeros_like(c1[..., :1])], axis=-1)
    return sh0, sh1


def reblur_pack_directional_occlusion(direction, norm_hit_dist, sanitize=True):
    """REBLUR_FrontEnd_PackDirectionalOcclusion (NRD.hlsli:770-781)."""
    if sanitize:
        direction = _sanitize(direction, -1.0, 1.0)
        norm_hit_dist = _sanitize(norm_hit_dist, 0.0, 1.0)
    c1 = direction * norm_hit_dist[..., None]
    return jnp.concatenate([c1, norm_hit_dist[..., None]], axis=-1)


# ---------------------------------------------------------------------------
# RELAX front-end (NRD.hlsli:783-818)
# ---------------------------------------------------------------------------


def relax_pack_radiance_hitdist(radiance, hit_dist, sanitize=True):
    """RELAX_FrontEnd_PackRadianceAndHitDist (NRD.hlsli:789-798)."""
    if sanitize:
        radiance = _sanitize(radiance, 0.0, NRD_FP16_MAX)
        hit_dist = _sanitize(hit_dist, 0.0, NRD_FP16_MAX)
    return jnp.concatenate([radiance, hit_dist[..., None]], axis=-1)


def relax_pack_sh(radiance, hit_dist, direction, sanitize=True):
    """RELAX_FrontEnd_PackSh (NRD.hlsli:802-818). Returns (sh0, sh1)."""
    if sanitize:
        radiance = _sanitize(radiance, 0.0, NRD_FP16_MAX)
        hit_dist = _sanitize(hit_dist, 0.0, NRD_FP16_MAX)
        direction = _sanitize(direction, -1.0, 1.0)
    sh0 = jnp.concatenate([radiance, hit_dist[..., None]], axis=-1)
    c1 = direction * nm.luminance(radiance)[..., None]
    sh1 = jnp.concatenate([c1, jnp.zeros_like(c1[..., :1])], axis=-1)
    return sh0, sh1


# ---------------------------------------------------------------------------
# SIGMA front-end (NRD.hlsli:820-855)
# ---------------------------------------------------------------------------


def sigma_pack_penumbra_directional(distance_to_occluder, tan_of_light_angular_radius):
    """SIGMA_FrontEnd_PackPenumbra, directional light (NRD.hlsli:828-834)."""
    penumbra_radius = distance_to_occluder * tan_of_light_angular_radius * 0.5
    return jnp.where(distance_to_occluder >= NRD_FP16_MAX, NRD_FP16_MAX,
                     jnp.minimum(penumbra_radius, 32768.0))


def sigma_pack_penumbra_local(distance_to_occluder, distance_to_light, light_size):
    """SIGMA_FrontEnd_PackPenumbra, local light (NRD.hlsli:837-845)."""
    penumbra_size = light_size * distance_to_occluder / jnp.maximum(
        distance_to_light - distance_to_occluder, NRD_EPS)
    return jnp.where(distance_to_occluder >= NRD_FP16_MAX, NRD_FP16_MAX,
                     jnp.minimum(penumbra_size * 0.5, 32768.0))


def sigma_pack_translucency(distance_to_occluder, translucency):
    """SIGMA_FrontEnd_PackTranslucency (NRD.hlsli:848-855)."""
    x = (distance_to_occluder >= NRD_FP16_MAX).astype(jnp.float32)
    return jnp.concatenate([x[..., None], nm.saturate(translucency)], axis=-1)


# ---------------------------------------------------------------------------
# Back-ends (NRD.hlsli:857-931)
# ---------------------------------------------------------------------------


def reblur_unpack_radiance_hitdist(data):
    """REBLUR_BackEnd_UnpackRadianceAndNormHitDist (NRD.hlsli:863-868)."""
    rgb = nm.ycocg_to_linear(data[..., :3])
    return jnp.concatenate([rgb, data[..., 3:4]], axis=-1)


def relax_unpack_radiance(color):
    """RELAX_BackEnd_UnpackRadiance (NRD.hlsli:903-906) - identity."""
    return color


def sigma_unpack_shadow(shadow):
    """SIGMA_BackEnd_UnpackShadow macro (NRD.hlsli:931) - stored as sqrt."""
    return shadow * shadow


# ---------------------------------------------------------------------------
# SG / SH resolve suite (NRD.hlsli:536-592, 933-1133)
# ---------------------------------------------------------------------------


class SG(NamedTuple):
    """NRD_SG (NRD.hlsli:541-549)."""

    c0: jnp.ndarray        # (...,)
    chroma: jnp.ndarray    # (..., 2)
    norm_hit_dist: jnp.ndarray
    c1: jnp.ndarray        # (..., 3)
    sharpness: jnp.ndarray


def sg_create(radiance, direction, norm_hit_dist) -> SG:
    """_NRD_SG_Create (NRD.hlsli:551-563)."""
    ycocg = nm.linear_to_ycocg(radiance)
    c0 = ycocg[..., 0]
    return SG(c0=c0, chroma=ycocg[..., 1:3], norm_hit_dist=norm_hit_dist,
              c1=direction * c0[..., None], sharpness=jnp.zeros_like(c0))


def reblur_unpack_sh(sh0, sh1) -> SG:
    """REBLUR_BackEnd_UnpackSh (NRD.hlsli:872-882); also RELAX_BackEnd_UnpackSh."""
    return SG(c0=sh0[..., 0], chroma=sh0[..., 1:3], norm_hit_dist=sh0[..., 3],
              c1=sh1[..., :3], sharpness=sh1[..., 3])


relax_unpack_sh = reblur_unpack_sh


def reblur_unpack_directional_occlusion(data) -> SG:
    """REBLUR_BackEnd_UnpackDirectionalOcclusion (NRD.hlsli:885-895)."""
    c0 = data[..., 3]
    return SG(c0=c0, chroma=jnp.zeros(data.shape[:-1] + (2,), data.dtype),
              norm_hit_dist=c0, c1=data[..., :3], sharpness=jnp.zeros_like(c0))


def _sg_extract_direction(sg: SG):
    return sg.c1 / jnp.maximum(nm.length(sg.c1, keepdims=True), NRD_EPS)


def _sg_integral_approx(c0, sharpness):
    return 2.0 * nm.PI * (c0 / sharpness)


def _sg_inner_product(a_c0, a_dir, a_sharp, b_c0, b_dir, b_sharp):
    """_NRD_SG_InnerProduct (NRD.hlsli:582-592)."""
    d = nm.length(a_sharp[..., None] * a_dir + b_sharp[..., None] * b_dir)
    c = jnp.exp(d - a_sharp - b_sharp)
    c = c * (1.0 - jnp.exp(-2.0 * d))
    c = c / jnp.maximum(d, NRD_EPS)
    return nm.PI * nm.saturate(2.0 * c * a_c0) * b_c0


def sg_extract_color(sg: SG):
    """NRD_SG_ExtractColor (NRD.hlsli:937-940)."""
    return nm.ycocg_to_linear(
        jnp.concatenate([sg.c0[..., None], sg.chroma], axis=-1))


def sg_resolve_diffuse(sg: SG, n):
    """NRD_SG_ResolveDiffuse (NRD.hlsli:957-1007), the #if 1 numeric-integration fit."""
    sharpness = 4.0
    c0k = 0.36
    c1k = 1.0 / (4.0 * c0k)
    e = float(jnp.exp(-sharpness))
    e2 = e * e
    r = 1.0 / sharpness
    scale = 1.0 + 2.0 * e2 - r
    bias = (e - e2) * r - e2

    nol = nm.dot(n, _sg_extract_direction(sg))
    x = jnp.sqrt(nm.saturate(1.0 - scale))
    x0 = c0k * nol
    x1 = c1k * x
    nn = x0 + x1
    y = jnp.where(jnp.abs(x0) <= x1, nn * nn / jnp.maximum(x, NRD_EPS), nm.saturate(nol))
    yy = scale * y + bias
    yy = yy * _sg_integral_approx(sg.c0, jnp.full_like(sg.c0, sharpness))
    return nm.ycocg_to_linear_corrected(yy, sg.c0, sg.chroma)


def sg_resolve_specular(sg: SG, n, v, roughness):
    """NRD_SG_ResolveSpecular (NRD.hlsli:1009-1055)."""
    roughness = jnp.maximum(roughness, NRD_ROUGHNESS_EPS)
    sg_sharp = jnp.full_like(sg.c0, 2.0)

    h = nm.normalize(_sg_extract_direction(sg) + v)
    h = nm.normalize(nm.lerp(n, h, roughness[..., None]))

    m = roughness * roughness
    m2 = m * m

    ndf_c0 = 1.0 / (nm.PI * m2) * nm.lerp(1.0, 0.75 * 2.0 * nm.PI, m2)
    ndf_sharp = 2.0 / jnp.maximum(m2, NRD_EPS)

    warped_dir = nm.reflect(-v, h)
    warped_sharp = ndf_sharp / jnp.maximum(4.0 * jnp.abs(nm.dot(h, v)), NRD_EPS)

    nov = jnp.abs(nm.dot(n, v))
    nol = nm.saturate(nm.dot(n, warped_dir))

    warped_c0 = ndf_c0 * nol * _geometry_term(roughness, nol, nov)

    y = _sg_inner_product(warped_c0, warped_dir, warped_sharp,
                          sg.c0, _sg_extract_direction(sg), sg_sharp)
    return nm.ycocg_to_linear_corrected(y, sg.c0, sg.chroma)


def sh_resolve_diffuse(sh: SG, n):
    """NRD_SH_ResolveDiffuse (NRD.hlsli:1117-1122)."""
    y = nm.dot(n, sh.c1) + 0.5 * sh.c0
    return nm.ycocg_to_linear_corrected(y, sh.c0, sh.chroma)


def sh_resolve_specular(sh: SG, n, v, roughness):
    """NRD_SH_ResolveSpecular (NRD.hlsli:1124-1133)."""
    nov = jnp.abs(nm.dot(n, v))
    f = nm.get_specular_dominant_factor(nov, roughness)
    d = nm.normalize(nm.lerp(n, nm.reflect(-v, n), f[..., None]))
    y = nm.dot(d, sh.c1) + 0.5 * sh.c0
    return nm.ycocg_to_linear_corrected(y, sh.c0, sh.chroma)


# ---------------------------------------------------------------------------
# BRDF terms for NRD_SG_ReJitter (NRD.hlsli:407-488, 1057-1111)
# ---------------------------------------------------------------------------


def _pow5(x):
    return jnp.power(nm.saturate(1.0 - x), 5.0)


def _fresnel_term(rf0, vonh):
    return rf0 + (1.0 - rf0) * _pow5(vonh)


def _distribution_term(roughness, noh):
    m = roughness * roughness
    m2 = m * m
    t = (noh * m2 - noh) * noh + 1.0
    a = m / t
    return a * a / nm.PI


def _geometry_term(roughness, nol, nov):
    m = roughness * roughness
    m2 = m * m
    a = nol + jnp.sqrt(nm.saturate((nol - m2 * nol) * nol + m2))
    b = nov + jnp.sqrt(nm.saturate((nov - m2 * nov) * nov + m2))
    return 1.0 / jnp.maximum(a * b, NRD_EPS)


def _diffuse_term(roughness, nol, nov, voh):
    m = roughness * roughness
    f = 2.0 * voh * voh * m - 0.5
    fdv = f * _pow5(nov) + 1.0
    fdl = f * _pow5(nol) + 1.0
    return fdv * fdl / nm.PI


def compute_brdfs(ld, ls, n, v, rf0, roughness):
    """_NRD_ComputeBrdfs (NRD.hlsli:453-488). Returns (diff, spec)."""
    nov = jnp.abs(nm.dot(n, v))

    h = nm.normalize(ld + v)
    nol = nm.saturate(nm.dot(n, ld))
    voh = nm.saturate(nm.dot(v, h))
    f = _fresnel_term(rf0, voh)
    kdiff = _diffuse_term(roughness, nol, nov, voh)
    diff = (1.0 - f) * kdiff * nol

    h = nm.normalize(ls + v)
    h = nm.normalize(nm.lerp(n, h, roughness[..., None]))
    nol = nm.saturate(nm.dot(n, ls))
    noh = nm.saturate(nm.dot(n, h))
    voh = nm.saturate(nm.dot(v, h))
    f = _fresnel_term(rf0, voh)
    d = _distribution_term(roughness, noh)
    g = _geometry_term(roughness, nol, nov)
    spec = f * d * g * nol
    return diff, spec


def sg_rejitter(diff_sg: SG, spec_sg: SG, rf0, v, roughness,
                z, ze, zw, zn, zs, n, ne, nw, nn, ns):
    """NRD_SG_ReJitter (NRD.hlsli:1064-1111). Returns (..., 2) jacobian (diff, spec)."""
    roughness = jnp.maximum(roughness, NRD_ROUGHNESS_EPS)
    rf0l = nm.luminance(rf0)
    ld = _sg_extract_direction(diff_sg)
    ls = _sg_extract_direction(spec_sg)
    smc = nm.get_spec_magic_curve_nrd(roughness)
    ls = nm.normalize(nm.lerp(v, ls, smc[..., None]))

    cd, cs_ = compute_brdfs(ld, ls, n, v, rf0l, roughness)
    ad, as_ = compute_brdfs(ld, ls, ne, v, rf0l, roughness)
    for nb in (nn, nw, ns):
        d2, s2 = compute_brdfs(ld, ls, nb, v, rf0l, roughness)
        ad, as_ = ad + d2, as_ + s2

    nov = jnp.abs(nm.dot(n, v))
    z_threshold = NRD_REJITTER_VIEWZ_THRESHOLD * jnp.abs(z) / (nov * 0.95 + 0.05)

    def ok(zx, nx):
        return jnp.logical_and(jnp.abs(zx - z) < z_threshold, nm.dot(nx, n) > 0.0)

    total = (ok(ze, ne).astype(jnp.int32) + ok(zn, nn).astype(jnp.int32)
             + ok(zw, nw).astype(jnp.int32) + ok(zs, ns).astype(jnp.int32))

    fd = (cd * 4.0 + NRD_EPS) / (ad + NRD_EPS)
    fs = (cs_ * 4.0 + NRD_EPS) / (as_ + NRD_EPS)
    f = jnp.stack(jnp.broadcast_arrays(fd, fs), axis=-1)
    f = jnp.clip(f, 1.0 / nm.PI, nm.PI)
    return jnp.where((total != 4)[..., None], jnp.ones_like(f), f)


def is_valid_radiance(radiance):
    """NRD_IsValidRadiance (NRD.hlsli:1140-1144)."""
    return jnp.all(jnp.isfinite(radiance), axis=-1)


def get_normalized_strand_thickness(strand_thickness, pixel_size):
    """NRD_GetNormalizedStrandThickness (NRD.hlsli:1158-1161)."""
    return pixel_size / (pixel_size + strand_thickness)
