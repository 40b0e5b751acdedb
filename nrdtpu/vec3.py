"""Plane-wise 3-vectors: (H, W) component planes instead of (H, W, 3) arrays.

Why this exists: on TPU, XLA lays out an (H, W, 3) array with the size-3 axis minor,
which lands it on the 128-lane dimension - every elementwise op runs at ~3/128 lane
utilization and the channel reductions (dot/normalize) break fusion. Measured at
1440p: eight normalize+dot+lerp rounds cost 2.7 ms on (H, W, 3) vs ~0.1 ms as three
separate (H, W) planes (bench note in ARCHITECTURE.md par.5). The denoiser pass glue
does hundreds of such ops per frame, so every hot vector quantity is carried as a V3
of planes and only converted at kernel/pytree boundaries.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class V3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- construction / conversion ------------------------------------------------
    @staticmethod
    def of(a):
        """From an (..., 3) array (or a length-3 constant vector)."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def full_like(ref, vx, vy, vz):
        o = jnp.zeros_like(ref)
        return V3(o + vx, o + vy, o + vz)

    def arr(self):
        """To an (..., 3) array (kernel/pytree boundary only)."""
        return jnp.stack([self.x, self.y, self.z], -1)

    # -- arithmetic ---------------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)


def dot(a: V3, b: V3):
    return a.x * b.x + a.y * b.y + a.z * b.z


def length(a: V3):
    return jnp.sqrt(dot(a, a))


def normalize(a: V3, eps=1e-15):
    inv = jax.lax.rsqrt(jnp.maximum(dot(a, a), eps))
    return V3(a.x * inv, a.y * inv, a.z * inv)


def lerp(a: V3, b: V3, t):
    return V3(a.x + (b.x - a.x) * t, a.y + (b.y - a.y) * t, a.z + (b.z - a.z) * t)


def where(cond, a: V3, b: V3):
    return V3(jnp.where(cond, a.x, b.x), jnp.where(cond, a.y, b.y),
              jnp.where(cond, a.z, b.z))


def cross(a: V3, b: V3):
    return V3(a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x)


def rotate(m, v: V3):
    """(3x3 or 4x4 row-major matrix) @ v - rotation part only."""
    return V3(m[0, 0] * v.x + m[0, 1] * v.y + m[0, 2] * v.z,
              m[1, 0] * v.x + m[1, 1] * v.y + m[1, 2] * v.z,
              m[2, 0] * v.x + m[2, 1] * v.y + m[2, 2] * v.z)


def rotate_inv(m, v: V3):
    """m^T @ v (inverse of a pure rotation)."""
    return V3(m[0, 0] * v.x + m[1, 0] * v.y + m[2, 0] * v.z,
              m[0, 1] * v.x + m[1, 1] * v.y + m[2, 1] * v.z,
              m[0, 2] * v.x + m[1, 2] * v.y + m[2, 2] * v.z)


def affine(m, v: V3):
    """(m @ [v, 1]).xyz for a row-major 4x4."""
    r = rotate(m, v)
    return V3(r.x + m[0, 3], r.y + m[1, 3], r.z + m[2, 3])


def reflect(i: V3, n: V3):
    d = 2.0 * dot(n, i)
    return V3(i.x - d * n.x, i.y - d * n.y, i.z - d * n.z)


def get_basis(n: V3):
    """Geometry::GetBasis, plane-wise (Duff et al. branchless ONB)."""
    sign = jnp.where(n.z >= 0.0, 1.0, -1.0)
    a = -1.0 / (sign + n.z)
    b = n.x * n.y * a
    t = V3(1.0 + sign * n.x * n.x * a, sign * b, -sign * n.x)
    bt = V3(b, sign + n.y * n.y * a, -n.y)
    return t, bt


def reconstruct_view_position(u, v, frustum, view_z, ortho_mode=0.0):
    """Geometry::ReconstructViewPosition on uv planes -> view-space V3."""
    sx = u * frustum[2] + frustum[0]
    sy = v * frustum[3] + frustum[1]
    scale = view_z + (1.0 - view_z) * jnp.abs(ortho_mode)
    return V3(sx * scale, sy * scale, view_z)


def get_screen_uv(m, p: V3):
    """Geometry::GetScreenUv on a world-position V3 -> (u, v) planes.

    m: 4x4 world-to-clip (row-major, column-vector convention like nm helpers)."""
    cx = m[0, 0] * p.x + m[0, 1] * p.y + m[0, 2] * p.z + m[0, 3]
    cy = m[1, 0] * p.x + m[1, 1] * p.y + m[1, 2] * p.z + m[1, 3]
    cw = m[3, 0] * p.x + m[3, 1] * p.y + m[3, 2] * p.z + m[3, 3]
    inv = 1.0 / jnp.where(jnp.abs(cw) < 1e-15, 1e-15, cw)
    return cx * inv * 0.5 + 0.5, 0.5 - cy * inv * 0.5


def get_specular_dominant_direction(n: V3, v: V3, roughness, dominant_factor_fn):
    """ImportanceSampling::GetSpecularDominantDirection; returns (V3 dir, factor)."""
    nov = jnp.abs(dot(n, v))
    f = dominant_factor_fn(nov, roughness)
    r = reflect(V3(-v.x, -v.y, -v.z), n)
    d = normalize(lerp(n, r, f))
    return d, f


def decode_oct(px, py):
    """_NRD_DecodeUnitVector (unsigned octahedral) on planes -> normalized V3."""
    qx = px * 2.0 - 1.0
    qy = py * 2.0 - 1.0
    z = 1.0 - jnp.abs(qx) - jnp.abs(qy)
    t = jnp.clip(-z, 0.0, 1.0)
    nx = qx - t * jnp.where(qx >= 0.0, 1.0, -1.0)
    ny = qy - t * jnp.where(qy >= 0.0, 1.0, -1.0)
    return normalize(V3(nx, ny, z))


def decode_oct_raw(px, py):
    """NRD_FrontEnd_UnpackNormalAndRoughness normal decode on planes.

    Octahedral decode followed by _NRD_SafeNormalize (NRD.hlsli:604,619) - the
    normalize is load-bearing: without it |n| can drop to ~0.7 near octahedron
    edges, deflating every dot-product-based weight (caught by tests/oracle)."""
    qx = px * 2.0 - 1.0
    qy = py * 2.0 - 1.0
    z = 1.0 - jnp.abs(qx) - jnp.abs(qy)
    t = jnp.clip(-z, 0.0, 1.0)
    nx = qx - t * jnp.where(qx >= 0.0, 1.0, -1.0)
    ny = qy - t * jnp.where(qy >= 0.0, 1.0, -1.0)
    inv = jax.lax.rsqrt(jnp.maximum(nx * nx + ny * ny + z * z, 1e-15))
    return V3(nx * inv, ny * inv, z * inv)
