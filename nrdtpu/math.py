"""Math foundation for the TPU-native NRD rebuild.

Re-derives the subset of NVIDIA's "MathLib" (the external `ml.hlsli` dependency of the
reference, fetched by /root/reference/CMakeLists.txt:120-129) that the denoisers are built on:
low-discrepancy sequences, 2D rotators, color codecs, octahedral unit-vector codec, filtering
weights (bilinear / Catmull-Rom), GGX lobe helpers and small numeric utilities.

Everything here is written against `jax.numpy` and is shape-polymorphic: scalars or arrays of
any broadcastable shape work. All angles are radians. All functions are pure and jit-safe.

Where the upstream MathLib implementation is not part of the reference tree, the function is
re-derived from the published math (papers / standard formulas); deliberate divergences from
NVIDIA MathLib bit-patterns are documented per-function.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Constants
# ---------------------------------------------------------------------------

PI = float(np.pi)
FP16_MAX = 65504.0
EPS = 1e-6
INF = 1e6

# ---------------------------------------------------------------------------
# Small numeric utilities
# ---------------------------------------------------------------------------


def saturate(x):
    return jnp.clip(x, 0.0, 1.0)


def lerp(a, b, t):
    return a + (b - a) * t


def rcp(x):
    return 1.0 / x


def smoothstep01(x):
    """Hermite smoothstep of already-clamped argument: x*x*(3-2x) on saturate(x)."""
    x = saturate(x)
    return x * x * (3.0 - 2.0 * x)


def smoothstep(a, b, x):
    """Matches HLSL smoothstep(a, b, x); also supports a > b (reversed ramp)."""
    t = saturate((x - a) / (b - a))
    return t * t * (3.0 - 2.0 * t)


def linearstep(a, b, x):
    return saturate((x - a) / (b - a))


def pow01(x, y):
    """Math::Pow01 - pow of a saturated base (avoids NaNs for tiny negatives).

    Static small/quarter exponents decompose into integer_pow / sqrt chains so
    the function lowers inside Pallas kernels (Mosaic has no generic powf)."""
    x = saturate(x)
    if isinstance(y, (int, float)):
        f = float(y)
        if f == int(f) and 1.0 <= f <= 8.0:
            return x ** int(f)
        if f == 0.25:
            return jnp.sqrt(jnp.sqrt(x))
        if f == 0.5:
            return jnp.sqrt(x)
    return jnp.power(x, y)


def acos_approx(x):
    """Math::AcosApprox - cheap acos approximation used in normal weights.

    Uses the classic |x|-polynomial approximation: acos(x) ~= sqrt(1-|x|) * (pi/2 - pi/2*...)
    MathLib uses `sqrt(1 - x) * (PI/2 + x*(-0.175394 + ...))`-style fits; we use
    `sqrt(2*(1-x))`-free form accurate to ~1e-2 rad which is enough for weighting.
    """
    x = jnp.clip(x, -1.0, 1.0)
    res = jnp.sqrt(saturate(1.0 - jnp.abs(x))) * (PI / 2.0)
    return jnp.where(x >= 0.0, res, PI - res)


def exp_approx(x):
    """ExpApprox from Common.hlsli:548-549 - rcp(x*x - x + 1), valid for x <= 0."""
    return 1.0 / (x * x - x + 1.0)


def rsqrt_safe(x):
    return jax.lax.rsqrt(jnp.maximum(x, 1e-15))


def safe_normalize(v, axis=-1):
    """_NRD_SafeNormalize (NRD.hlsli:321-324)."""
    return v * jax.lax.rsqrt(jnp.sum(v * v, axis=axis, keepdims=True) + 1e-9)


def normalize(v, axis=-1):
    return v * jax.lax.rsqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=True), 1e-15))


def length(v, axis=-1, keepdims=False):
    return jnp.sqrt(jnp.maximum(jnp.sum(v * v, axis=axis, keepdims=keepdims), 0.0))


def dot(a, b, axis=-1, keepdims=False):
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def reflect(i, n, axis=-1):
    """HLSL reflect: i - 2*dot(n,i)*n."""
    return i - 2.0 * dot(n, i, axis=axis, keepdims=True) * n


def get_std_dev(m1, m2):
    """GetStdDev macro (Common.hlsli:227)."""
    return jnp.sqrt(jnp.abs(m2 - m1 * m1))


# ---------------------------------------------------------------------------
# Low-discrepancy sequences (MathLib Sequence::* re-derivations)
# ---------------------------------------------------------------------------

_GOLDEN_CONJ = 0.6180339887498949  # 1/phi - standard Weyl increment


def weyl1d(seed: float, n) -> jnp.ndarray:
    """Sequence::Weyl1D - additive recurrence x_n = frac(seed + n / phi).

    The reference host uses it to derive per-frame kernel rotator angles
    (/root/reference/Source/InstanceImpl.cpp:340-348).
    """
    n = jnp.asarray(n, jnp.float32)
    return jnp.mod(jnp.asarray(seed, jnp.float32) + n * _GOLDEN_CONJ, 1.0)


# Standard 4x4 Bayer ordered-dither matrix (values 0..15).
_BAYER4 = np.array(
    [
        [0, 8, 2, 10],
        [12, 4, 14, 6],
        [3, 11, 1, 9],
        [15, 7, 13, 5],
    ],
    dtype=np.int32,
)


def _reverse_bits_4(x):
    x = jnp.asarray(x, jnp.uint32) & 0xF
    r = ((x & 1) << 3) | ((x & 2) << 1) | ((x & 4) >> 1) | ((x & 8) >> 3)
    return r


def bayer4x4(pixel_pos, frame_index) -> jnp.ndarray:
    """Sequence::Bayer4x4 - ordered-dither value in [0; 1).

    `pixel_pos` is (..., 2) int array (x, y) or a tuple (x, y). Temporal variation adds the
    bit-reversed frame index so consecutive frames interleave maximally, matching the intent of
    the MathLib sequence (used at InstanceImpl.cpp:344 and REBLUR blur rotators). The exact
    bit pattern of NVIDIA's private implementation is not reproduced; the sequence has the same
    distribution properties.
    """
    if isinstance(pixel_pos, (tuple, list)):
        px, py = pixel_pos
    else:
        px, py = pixel_pos[..., 0], pixel_pos[..., 1]
    px = jnp.asarray(px, jnp.int32) & 3
    py = jnp.asarray(py, jnp.int32) & 3
    # closed form of the 4x4 Bayer matrix (bit-exact vs the table; see test_math):
    # M(x, y) = ((x^y)&1)<<3 | (y&1)<<2 | (((x^y)>>1)&1)<<1 | ((y>>1)&1).
    # A table gather here costs ~40 ms at 1440p on TPU (XLA gather) - arithmetic is free.
    pxy = px ^ py
    base = (((pxy & 1) << 3) | ((py & 1) << 2) | (((pxy >> 1) & 1) << 1)
            | ((py >> 1) & 1)).astype(jnp.uint32)
    t = _reverse_bits_4(frame_index)
    return ((base + t) & 15).astype(jnp.float32) / 16.0


def checkerboard(pixel_pos, frame_index) -> jnp.ndarray:
    """Sequence::CheckerBoard - 0/1 checker pattern that flips every frame.

    Matches the contract in NRDSettings.h:33-44: even frame has BLACK at (0,0).
    Returns uint32 0 or 1 (1 = white cell on even frames at (0,0)... see tests).
    """
    if isinstance(pixel_pos, (tuple, list)):
        px, py = pixel_pos
    else:
        px, py = pixel_pos[..., 0], pixel_pos[..., 1]
    v = (jnp.asarray(px, jnp.int32) + jnp.asarray(py, jnp.int32) + jnp.asarray(frame_index, jnp.int32)) & 1
    return v.astype(jnp.uint32)


# ---------------------------------------------------------------------------
# Hash RNG (Rng::Hash equivalent; PCG-based)
# ---------------------------------------------------------------------------


def hash_init(pixel_pos, frame_index):
    """Rng::Hash::Initialize equivalent - returns a per-pixel uint32 state."""
    if isinstance(pixel_pos, (tuple, list)):
        px, py = pixel_pos
    else:
        px, py = pixel_pos[..., 0], pixel_pos[..., 1]
    x = jnp.asarray(px, jnp.uint32)
    y = jnp.asarray(py, jnp.uint32)
    f = jnp.asarray(frame_index, jnp.uint32)
    state = x * jnp.uint32(1597334677) ^ y * jnp.uint32(3812015801) ^ f * jnp.uint32(2798796415)
    return state * jnp.uint32(747796405) + jnp.uint32(2891336453)


def hash_next(state):
    """One PCG step; returns (new_state, uint32 random)."""
    state = state * jnp.uint32(747796405) + jnp.uint32(2891336453)
    word = ((state >> ((state >> 28) + jnp.uint32(4))) ^ state) * jnp.uint32(277803737)
    return state, (word >> 22) ^ word


def hash_float(state):
    """Returns (new_state, float in [0, 1))."""
    state, bits = hash_next(state)
    return state, (bits >> 8).astype(jnp.float32) * (1.0 / 16777216.0)


def hash_float2(state):
    state, a = hash_float(state)
    state, b = hash_float(state)
    return state, jnp.stack(jnp.broadcast_arrays(a, b), axis=-1)


# ---------------------------------------------------------------------------
# 2D rotators (Geometry::GetRotator / CombineRotators / RotateVector)
# ---------------------------------------------------------------------------
# A rotator is a packed 2x2 matrix (ca, sa, -sa, ca) stored as a 4-vector; rotate(v) applies
#   [ca -sa; sa ca] @ v. Combination is rotor (complex) multiplication; scaling the rotator
# scales the result (used by NRD_RANDOM rotator mode, Common.hlsli:268-274).


def get_rotator(angle):
    ca = jnp.cos(angle)
    sa = jnp.sin(angle)
    return jnp.stack(jnp.broadcast_arrays(ca, sa, -sa, ca), axis=-1)


def combine_rotators(r0, r1):
    """Compose two rotators (angle addition, magnitude multiplication)."""
    ca = r0[..., 0] * r1[..., 0] - r0[..., 1] * r1[..., 1]
    sa = r0[..., 1] * r1[..., 0] + r0[..., 0] * r1[..., 1]
    return jnp.stack(jnp.broadcast_arrays(ca, sa, -sa, ca), axis=-1)


def scale_rotator(rotator, scale):
    """Geometry::ScaleRotator - per-output-axis scaling of a rotator.

    scale (..., 2); output x gets scale[0], output y gets scale[1] under rotate_vector2.
    """
    return jnp.stack([
        rotator[..., 0] * scale[..., 0],
        rotator[..., 1] * scale[..., 1],
        rotator[..., 2] * scale[..., 0],
        rotator[..., 3] * scale[..., 1],
    ], axis=-1)


def rotate_vector2(rotator, v):
    """Apply rotator to (..., 2) vector."""
    x = v[..., 0] * rotator[..., 0] + v[..., 1] * rotator[..., 2]
    y = v[..., 0] * rotator[..., 1] + v[..., 1] * rotator[..., 3]
    return jnp.stack(jnp.broadcast_arrays(x, y), axis=-1)


def get_basis(n):
    """Geometry::GetBasis - branchless ONB from a unit normal (Duff et al. 2017).

    Returns (T, B) tangent/bitangent, each shaped like n (..., 3).
    """
    z = n[..., 2]
    sign = jnp.where(z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + z)
    b = n[..., 0] * n[..., 1] * a
    t = jnp.stack(
        jnp.broadcast_arrays(1.0 + sign * n[..., 0] * n[..., 0] * a, sign * b, -sign * n[..., 0]),
        axis=-1,
    )
    bt = jnp.stack(jnp.broadcast_arrays(b, sign + n[..., 1] * n[..., 1] * a, -n[..., 1]), axis=-1)
    return t, bt


def rotate_vector_by_basis(t, b, n, v):
    """world -> local: rows of the basis matrix are (t, b, n)."""
    return jnp.stack(
        jnp.broadcast_arrays(dot(t, v), dot(b, v), dot(n, v)),
        axis=-1,
    )


def rotate_vector_by_basis_inverse(t, b, n, v):
    """local -> world."""
    return (
        t * v[..., 0:1] + b * v[..., 1:2] + n * v[..., 2:3]
    )


# ---------------------------------------------------------------------------
# Color codecs (NRD.hlsli:350-383)
# ---------------------------------------------------------------------------

_LUMA = np.array([0.2126, 0.7152, 0.0722], dtype=np.float32)


def luminance(rgb):
    """_NRD_Luminance (NRD.hlsli:350-354)."""
    return dot(rgb, jnp.asarray(_LUMA))


def linear_to_ycocg(rgb):
    """_NRD_LinearToYCoCg (NRD.hlsli:356-363)."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.25 * r + 0.5 * g + 0.25 * b
    co = 0.5 * r - 0.5 * b
    cg = -0.25 * r + 0.5 * g - 0.25 * b
    return jnp.stack(jnp.broadcast_arrays(y, co, cg), axis=-1)


def ycocg_to_linear(ycocg):
    """_NRD_YCoCgToLinear (NRD.hlsli:365-375)."""
    y, co, cg = ycocg[..., 0], ycocg[..., 1], ycocg[..., 2]
    t = y - cg
    g = y + cg
    r = t + co
    b = t - co
    return jnp.maximum(jnp.stack(jnp.broadcast_arrays(r, g, b), axis=-1), 0.0)


def ycocg_to_linear_corrected(y, y0, cocg):
    """_NRD_YCoCgToLinear_Corrected (NRD.hlsli:377-383)."""
    y = jnp.maximum(y, 0.0)
    cocg = cocg * ((y + EPS) / (y0 + EPS))[..., None]
    return ycocg_to_linear(jnp.concatenate([y[..., None], cocg], axis=-1))


# ---------------------------------------------------------------------------
# Octahedral unit-vector codec (NRD.hlsli:327-347)
# ---------------------------------------------------------------------------


def encode_unit_vector(v, signed: bool):
    """_NRD_EncodeUnitVector - 3D unit vector -> 2D octahedral coords.

    NaN-safe for zero vectors: texture formats in the reference are UNORM and can never hold
    NaN, so the packed representation here must stay finite for garbage inputs too.
    """
    v = v / jnp.maximum(jnp.sum(jnp.abs(v), axis=-1, keepdims=True), 1e-15)
    sgn = jnp.where(v[..., :2] >= 0.0, 1.0, -1.0)
    oct_wrap = (1.0 - jnp.abs(v[..., 1::-1])) * sgn
    xy = jnp.where(v[..., 2:3] >= 0.0, v[..., :2], oct_wrap)
    return xy if signed else xy * 0.5 + 0.5


def decode_unit_vector(p, signed: bool, do_normalize: bool = True):
    """_NRD_DecodeUnitVector - 2D octahedral coords -> 3D unit vector."""
    p = p if signed else p * 2.0 - 1.0
    z = 1.0 - jnp.abs(p[..., 0]) - jnp.abs(p[..., 1])
    t = saturate(-z)
    sgn = jnp.where(p >= 0.0, 1.0, -1.0)
    xy = p - t[..., None] * sgn
    n = jnp.concatenate([xy, z[..., None]], axis=-1)
    return normalize(n) if do_normalize else n


# ---------------------------------------------------------------------------
# Quantization (UNORM/SNORM emulation for encoding-parity with texture formats)
# ---------------------------------------------------------------------------


def quantize_unorm(x, bits: int):
    scale = float((1 << bits) - 1)
    return jnp.round(saturate(x) * scale) / scale


def quantize_snorm(x, bits: int):
    scale = float((1 << (bits - 1)) - 1)
    return jnp.round(jnp.clip(x, -1.0, 1.0) * scale) / scale


def f32_to_f16_bits(x):
    """Round-trip through IEEE fp16 (for Data2 curvature packing parity)."""
    return x.astype(jnp.float16).astype(jnp.float32)


# ---------------------------------------------------------------------------
# Filtering weights (MathLib Filtering::*)
# ---------------------------------------------------------------------------


def bilinear_filter(uv, tex_size):
    """Filtering::GetBilinearFilter.

    `uv` in [0,1] texture coords, `tex_size` (..., 2) or 2-tuple. Returns (origin, weights):
    origin = integer coords of the top-left texel of the 2x2 footprint (float),
    weights = fractional position (fx, fy) inside the footprint.
    """
    tex_size = jnp.asarray(tex_size, jnp.float32)
    pos = uv * tex_size - 0.5
    origin = jnp.floor(pos)
    f = pos - origin
    return origin, f


def bilinear_weights(f):
    """2x2 weights from fractional offsets f (..., 2), order: (00, 10, 01, 11)."""
    fx, fy = f[..., 0], f[..., 1]
    w00 = (1.0 - fx) * (1.0 - fy)
    w10 = fx * (1.0 - fy)
    w01 = (1.0 - fx) * fy
    w11 = fx * fy
    return jnp.stack(jnp.broadcast_arrays(w00, w10, w01, w11), axis=-1)


def get_bilinear_custom_weights(f, custom):
    """Filtering::GetBilinearCustomWeights: bilinear weights modulated per tap.

    f: fractional offsets (..., 2); custom: (..., 4) per-tap validity/occlusion.
    """
    return bilinear_weights(f) * custom


def apply_bilinear_custom_weights(s00, s10, s01, s11, w, normalize_result=True):
    """Filtering::ApplyBilinearCustomWeights - weighted sum of 4 taps with renormalization."""
    out = s00 * w[..., 0:1] + s10 * w[..., 1:2] + s01 * w[..., 2:3] + s11 * w[..., 3:4]
    if normalize_result:
        wsum = jnp.sum(w, axis=-1, keepdims=True)
        out = jnp.where(wsum < 0.0001, 0.0, out / jnp.where(wsum < 0.0001, 1.0, wsum))
    return out


def catmull_rom_weights(f, sharpness: float = 0.5):
    """Catmull-Rom weights per axis for the 13-tap no-corners filter.

    Port of `_BicubicFilterNoCornersWithFallbackToBilinear..._Init` (Common.hlsli:602-629).
    Given fractional offset f (...,), returns (w0, w1, w2, w3) per axis.
    """
    c = sharpness
    w0 = f * (f * (-c * f + 2.0 * c) - c)
    w1 = f * (f * ((2.0 - c) * f - (3.0 - c))) + 1.0
    w2 = f * (f * (-(2.0 - c) * f + (3.0 - 2.0 * c)) + c)
    w3 = f * (f * (c * f - c))
    return w0, w1, w2, w3


# ---------------------------------------------------------------------------
# GGX / specular lobe helpers (MathLib ImportanceSampling::* re-derivations)
# ---------------------------------------------------------------------------


def get_specular_dominant_factor(nov, roughness):
    """_NRD_GetSpecularDominantFactor (NRD.hlsli:386-392), G2-preintegrated fit."""
    a = 0.298475 * jnp.log(39.4115 - 39.0029 * roughness)
    return saturate(jnp.power(saturate(1.0 - nov), 10.8649) * (1.0 - a) + a)


def get_specular_dominant_direction(n, v, roughness):
    """ImportanceSampling::GetSpecularDominantDirection (G2 variant).

    Returns (..., 4): xyz = normalized dominant direction, w = dominant factor.
    Used by GetXvirtual (Common.hlsli:411-461).
    """
    nov = jnp.abs(dot(n, v))
    f = get_specular_dominant_factor(nov, roughness)
    r = reflect(-v, n)
    d = normalize(lerp(n, r, f[..., None]))
    return jnp.concatenate([d, f[..., None]], axis=-1)


def get_specular_lobe_tan_half_angle(roughness, percent_of_volume=0.75):
    """ImportanceSampling::GetSpecularLobeTanHalfAngle.

    GGX NDF importance sampling CDF inversion: for a fraction `p` of sampled NDF volume,
    tan(theta) = m * sqrt(p / (1 - p)) with m = roughness^2.
    """
    m = roughness * roughness
    return m * jnp.sqrt(percent_of_volume / jnp.maximum(1.0 - percent_of_volume, EPS))


def get_spec_magic_curve(roughness, power: float = 0.25):
    """GetSpecMagicCurve (Common.hlsli:311-317)."""
    f = 1.0 - jnp.exp2(-200.0 * roughness * roughness)
    return f * pow01(roughness, power)


def get_spec_magic_curve_nrd(roughness):
    """_NRD_GetSpecMagicCurve (NRD.hlsli:402-405) - the front-end variant."""
    return 1.0 - jnp.exp2(-30.0 * roughness * roughness)


def apply_thin_lens_equation(o, curvature):
    """ApplyThinLensEquation (Common.hlsli:404-409)."""
    return o / (2.0 * curvature * o + 1.0)


# ---------------------------------------------------------------------------
# Sampling kernels (Common.hlsli:170-192) - (x, y, weight-arg) triples
# ---------------------------------------------------------------------------

_S3 = float(np.sqrt(3.0))
_S2 = float(np.sqrt(2.0))

SPECIAL_6 = np.array([
    (-0.50 * _S3, -0.50, 1.0),
    (0.00, 1.00, 1.0),
    (0.50 * _S3, -0.50, 1.0),
    (0.00, -0.30, 0.3),
    (0.15 * _S3, 0.15, 0.3),
    (-0.15 * _S3, 0.15, 0.3),
], np.float32)

SPECIAL_8 = np.array([
    (-1.00, 0.00, 1.0),
    (0.00, 1.00, 1.0),
    (1.00, 0.00, 1.0),
    (0.00, -1.00, 1.0),
    (-0.25 * _S2, 0.25 * _S2, 0.5),
    (0.25 * _S2, 0.25 * _S2, 0.5),
    (0.25 * _S2, -0.25 * _S2, 0.5),
    (-0.25 * _S2, -0.25 * _S2, 0.5),
], np.float32)

# True Poisson disk, 8 samples, min distance 0.5 (Poisson.hlsli:41-52; .z = |.xy|).
# Used where the reference taps g_Poisson8 (RELAX_PrePass.hlsli:12) - blue-noise-ish
# coverage without the axis/diagonal aliasing of the special sets.
POISSON_8 = np.array([
    (-0.4706069, -0.4427112, 0.6461146),
    (-0.9057375, 0.3003471, 0.9542373),
    (-0.3487388, 0.4037880, 0.5335386),
    (0.1023042, 0.6439373, 0.6520134),
    (0.5699277, 0.3513750, 0.6695386),
    (0.2939128, -0.1131226, 0.3149309),
    (0.7836658, -0.4208784, 0.8895339),
    (0.1564120, -0.8198990, 0.8346850),
], np.float32)


def get_kernel_sample_coordinates(m_to_clip, offset, x, t, b, rotator=None):
    """GetKernelSampleCoordinates (Common.hlsli:465-482): world-space kernel tap -> uv.

    offset: (2,) or (3,) static tap; x, t, b: (..., 3); returns (..., 2) uv (y-down).
    """
    ox, oy = offset[0], offset[1]
    if rotator is not None:
        rx = ox * rotator[..., 0] + oy * rotator[..., 2]
        ry = ox * rotator[..., 1] + oy * rotator[..., 3]
    else:
        rx, ry = ox, oy
    p = x + t * rx[..., None] + b * ry[..., None]
    clip = projective_transform(m_to_clip, p)
    z = jnp.where(jnp.abs(clip[..., 3]) < 1e-15, 1e-15, clip[..., 3])
    u = clip[..., 0] / z * 0.5 + 0.5
    v = 0.5 - clip[..., 1] / z * 0.5
    return jnp.stack(jnp.broadcast_arrays(u, v), axis=-1)


# ---------------------------------------------------------------------------
# Weight machinery (Common.hlsli:484-598)
# ---------------------------------------------------------------------------

NRD_EXP_WEIGHT_DEFAULT_SCALE = 3.0
NRD_ROUGHNESS_SENSITIVITY = 0.01
NRD_MAX_PERCENT_OF_LOBE_VOLUME = 0.75


def normal_encoding_error(normal_encoding: int) -> float:
    """NRD_NORMAL_ENCODING_ERROR (Common.hlsli:76-85)."""
    if normal_encoding < 2:  # RGBA8
        return 1.50 / 255.0
    if normal_encoding == 2:  # R10G10B10A2
        return 0.75 / 255.0
    return 0.50 / 255.0  # RGBA16


def atan_approx(x):
    """Full-range atan via an odd minimax polynomial on [0, 1] + range reduction.

    Max error ~1e-5 rad. Exists because Mosaic (Pallas TPU) has no atan
    lowering - this is the kernel-safe atan for in-kernel weight-parameter
    math (kernels/reblur_band.py computes stage params in VMEM)."""
    ax = jnp.abs(x)
    hi = ax > 1.0
    a = jnp.where(hi, 1.0 / jnp.maximum(ax, 1e-30), ax)
    s = a * a
    p = a * (0.99988660 + s * (-0.33029950 + s * (0.18014100 + s * (
        -0.08513300 + s * 0.02083510))))
    r = jnp.where(hi, (np.pi / 2.0) - p, p)
    return jnp.where(x < 0.0, -r, r)


def get_normal_weight_param(non_linear_accum_speed, lobe_angle_fraction, roughness=1.0,
                            encoding_error: float = 0.75 / 255.0):
    """GetNormalWeightParam (Common.hlsli:486-499). Returns 1/angle.

    atan_approx (not jnp.arctan) so the SAME function is usable inside Pallas
    kernels and on the XLA path (error ~1e-5 rad, far below the 40 dB oracle
    tolerance)."""
    percent_of_volume = NRD_MAX_PERCENT_OF_LOBE_VOLUME * lerp(
        lobe_angle_fraction, 1.0, non_linear_accum_speed)
    tan_half = get_specular_lobe_tan_half_angle(roughness, percent_of_volume)
    angle = atan_approx(tan_half)
    angle = jnp.maximum(angle, encoding_error)
    return 1.0 / angle


def get_geometry_weight_params(plane_dist_sensitivity, frustum_size, xv, nv,
                               non_linear_accum_speed=0.0):
    """GetGeometryWeightParams (Common.hlsli:501-508). Returns (a, b) with w=f(|d*a+b|)."""
    norm = plane_dist_sensitivity * frustum_size
    a = 1.0 / norm
    b = dot(nv, xv) * a
    return a, -b


def get_hit_distance_weight_params(hit_dist, non_linear_accum_speed, roughness=1.0):
    """GetHitDistanceWeightParams (Common.hlsli:510-521)."""
    smc = get_spec_magic_curve(roughness)
    norm = lerp(0.0005, 1.0, jnp.minimum(non_linear_accum_speed, smc))
    a = 1.0 / norm
    b = hit_dist * a
    return a, -b


def get_roughness_weight_params(roughness, fraction, sensitivity=NRD_ROUGHNESS_SENSITIVITY):
    """GetRoughnessWeightParams (Common.hlsli:523-529)."""
    a = 1.0 / lerp(sensitivity, 1.0, saturate(roughness * fraction))
    b = roughness * a
    return a, -b


def get_relaxed_roughness_weight_params(m, fraction=1.0, sensitivity=NRD_ROUGHNESS_SENSITIVITY):
    """GetRelaxedRoughnessWeightParams (Common.hlsli:531-540); m = roughness^2."""
    a = 1.0 / lerp(sensitivity, 1.0, lerp(m * m, m, fraction))
    b = m * a
    return a, -b


def compute_exponential_weight(x, px, py):
    """ComputeExponentialWeight (Common.hlsli:554-555).

    The reference uses ExpApprox (a rational fit of e^x chosen because GPU exp is a
    multi-instruction sequence); TPU VPUs have a pipelined hardware transcendental
    unit, so the true exponential is both cheaper and closer to the formula's intent.
    Documented divergence: exp(x) instead of 1/(x^2-x+1)."""
    return jnp.exp(-NRD_EXP_WEIGHT_DEFAULT_SCALE * jnp.abs(x * px + py))


def compute_non_exponential_weight(x, px, py):
    """ComputeNonExponentialWeight (Common.hlsli:559-560): SmoothStep(1, 0, |x*px+py|)."""
    return smoothstep(1.0, 0.0, jnp.abs(x * px + py))


def compute_non_exponential_weight_with_sigma(x, px, py, sigma):
    """ComputeNonExponentialWeightWithSigma (Common.hlsli:562-563)."""
    return smoothstep(1.0, 0.0, jnp.abs(x * px + py) - sigma * px)


compute_weight = compute_non_exponential_weight  # NRD_USE_EXPONENTIAL_WEIGHTS == 0 default


def get_gaussian_weight(r):
    """GetGaussianWeight (Common.hlsli:571-574); r normalized to 1."""
    return jnp.exp(-0.66 * r * r)


def get_encoding_aware_normal_weight(n_curr, n_prev, max_angle, curvature_angle,
                                     threshold_angle=0.0, remap=False):
    """GetEncodingAwareNormalWeight (Common.hlsli:578-589)."""
    cosa = dot(n_curr, n_prev)
    angle = acos_approx(cosa)
    w = smoothstep01(1.0 - (angle - curvature_angle - threshold_angle) / max_angle)
    if remap:
        w = smoothstep(0.05, 0.95, w)
    return w


def get_disocclusion_threshold(disocclusion_threshold, frustum_size, nov):
    """GetDisocclusionThreshold (Common.hlsli:593-596)."""
    return frustum_size * saturate(disocclusion_threshold / jnp.maximum(0.01, nov))


# ---------------------------------------------------------------------------
# Frustum / projection helpers (Common.hlsli:237-253)
# ---------------------------------------------------------------------------


def pixel_radius_to_world(unproject, ortho_mode, pixel_radius, view_z):
    return pixel_radius * unproject * lerp(view_z, 1.0, jnp.abs(ortho_mode))


def get_frustum_size(min_rect_dim_mul_unproject, ortho_mode, view_z):
    return min_rect_dim_mul_unproject * lerp(view_z, 1.0, jnp.abs(ortho_mode))


def get_hit_dist_factor(hit_dist, frustum_size):
    return saturate(hit_dist / frustum_size)


# ---------------------------------------------------------------------------
# Geometry transforms (MathLib Geometry::*)
# ---------------------------------------------------------------------------


def affine_transform(m, p):
    """Apply 4x4 column-vector matrix to a point (w=1). p: (..., 3), m: (4, 4)."""
    return p @ m[:3, :3].T + m[:3, 3]


def rotate_vector(m, v):
    """Apply rotation part only (w=0)."""
    return v @ m[:3, :3].T


def projective_transform(m, p):
    """Full homogeneous transform; returns (..., 4)."""
    ones = jnp.ones(p.shape[:-1] + (1,), p.dtype)
    ph = jnp.concatenate([p, ones], axis=-1)
    return ph @ m.T


def reverse_bits4(x):
    """Math::ReverseBits4 - reverse the low 4 bits (used for trail scaling)."""
    x = jnp.asarray(x, jnp.int32) & 15
    x = ((x & 5) << 1) | ((x & 10) >> 1)
    x = ((x & 3) << 2) | ((x & 12) >> 2)
    return x.astype(jnp.float32)


def get_screen_uv(m_world_to_clip, x):
    """Geometry::GetScreenUv - world position -> [0,1]^2 uv (y down)."""
    clip = projective_transform(m_world_to_clip, x)
    xy = clip[..., :2] / jnp.where(jnp.abs(clip[..., 3:4]) < 1e-15, 1e-15, clip[..., 3:4])
    u = xy[..., 0] * 0.5 + 0.5
    v = 0.5 - xy[..., 1] * 0.5
    return jnp.stack(jnp.broadcast_arrays(u, v), axis=-1)


def reconstruct_view_position(uv, frustum, view_z, ortho_mode=0.0):
    """Geometry::ReconstructViewPosition.

    frustum = (x0, y0, dx, dy): view-space xy per unit z at uv=(0,0) and the uv->xy scale,
    as produced by camera.decompose_projection. uv is y-down. For ortho projections
    (ortho_mode = -1) the frustum already holds absolute view-space extents.
    """
    xy = uv * frustum[..., 2:4] + frustum[..., 0:2]
    scale = lerp(view_z[..., None], 1.0, jnp.abs(ortho_mode))
    xy = xy * scale
    return jnp.concatenate([xy, view_z[..., None]], axis=-1)


def get_view_vector_from_uv(uv, frustum, ortho_mode=0.0):
    """Unit view vector (from camera, +z forward) through uv."""
    p = reconstruct_view_position(uv, frustum, jnp.ones(uv.shape[:-1], uv.dtype), ortho_mode)
    return normalize(p)
