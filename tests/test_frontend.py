"""Round-trip and property tests for the NRD front-end/back-end contract (frontend.py)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdtpu import frontend as fe
from nrdtpu import math as nm
from nrdtpu.settings import NormalEncoding, RoughnessEncoding


def rng(seed=0):
    return np.random.default_rng(seed)


def random_normals(n, seed=0):
    v = rng(seed).normal(size=(n, 3)).astype(np.float32)
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


class TestNormalRoughnessCodec:
    @pytest.mark.parametrize("ne", list(NormalEncoding))
    @pytest.mark.parametrize("re_", list(RoughnessEncoding))
    def test_roundtrip(self, ne, re_):
        n = random_normals(256)
        r = rng(1).uniform(0, 1, (256,)).astype(np.float32)
        p = fe.pack_normal_roughness(jnp.asarray(n), jnp.asarray(r),
                                     normal_encoding=ne, roughness_encoding=re_)
        n2, r2, mid = fe.unpack_normal_roughness(p, ne, re_)
        cos = np.sum(np.asarray(n2) * n, -1)
        assert cos.min() > 0.9999
        np.testing.assert_allclose(np.asarray(r2), r, atol=2e-3)
        np.testing.assert_allclose(np.asarray(mid), 0, atol=1e-6)

    def test_material_id_roundtrip_r10g10b10a2(self):
        n = random_normals(64)
        r = rng(2).uniform(0, 1, (64,)).astype(np.float32)
        for mid in (0.0, 1.0, 2.0, 3.0):
            p = fe.pack_normal_roughness(jnp.asarray(n), jnp.asarray(r), material_id=mid,
                                         quantized=True)
            _, _, mid2 = fe.unpack_normal_roughness(p)
            np.testing.assert_allclose(np.asarray(mid2), mid, atol=1e-5)

    def test_quantized_roundtrip_bounded_error(self):
        n = random_normals(1024, seed=3)
        r = rng(3).uniform(0, 1, (1024,)).astype(np.float32)
        p = fe.pack_normal_roughness(jnp.asarray(n), jnp.asarray(r), quantized=True)
        n2, r2, _ = fe.unpack_normal_roughness(p)
        angle = np.degrees(np.arccos(np.clip(np.sum(np.asarray(n2) * n, -1), -1, 1)))
        assert angle.max() < 0.5
        np.testing.assert_allclose(np.asarray(r2), r, atol=1.0 / 1023)


class TestReblurFrontend:
    def test_radiance_roundtrip(self):
        radiance = rng(4).uniform(0, 100, (128, 3)).astype(np.float32)
        hit = rng(4).uniform(0, 1, (128,)).astype(np.float32)
        packed = fe.reblur_pack_radiance_hitdist(jnp.asarray(radiance), jnp.asarray(hit))
        out = fe.reblur_unpack_radiance_hitdist(packed)
        np.testing.assert_allclose(np.asarray(out[..., :3]), radiance, rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out[..., 3]), hit, atol=1e-6)

    def test_sanitize_kills_nan_inf(self):
        radiance = jnp.array([[np.nan, 1.0, 2.0], [np.inf, 0.0, 0.0], [1.0, 2.0, 3.0]])
        hit = jnp.array([0.5, np.nan, 0.25])
        packed = fe.reblur_pack_radiance_hitdist(radiance, hit, sanitize=True)
        assert np.isfinite(np.asarray(packed)).all()

    def test_norm_hit_dist(self):
        params = jnp.array([3.0, 0.1, 20.0, -25.0])
        # diffuse (roughness=1): f ~= A + z*B
        f = float(fe.get_hit_distance_normalization(jnp.float32(10.0), params, jnp.float32(1.0)))
        np.testing.assert_allclose(f, 3.0 + 10.0 * 0.1, rtol=1e-4)
        # mirror (roughness=0): f scaled by C
        f0 = float(fe.get_hit_distance_normalization(jnp.float32(10.0), params, jnp.float32(0.0)))
        np.testing.assert_allclose(f0, (3.0 + 1.0) * 20.0, rtol=1e-4)
        # roundtrip
        hd = jnp.float32(2.0)
        norm = fe.reblur_get_norm_hit_dist(hd, 10.0, params, 0.5)
        back = fe.reblur_get_hit_dist(norm, 10.0, params, 0.5)
        np.testing.assert_allclose(float(back), 2.0, rtol=1e-5)

    def test_pack_sh_extracts_back(self):
        radiance = rng(5).uniform(0, 10, (64, 3)).astype(np.float32)
        direction = random_normals(64, seed=5)
        hit = rng(5).uniform(0, 1, (64,)).astype(np.float32)
        sh0, sh1 = fe.reblur_pack_sh(jnp.asarray(radiance), jnp.asarray(hit),
                                     jnp.asarray(direction))
        sg = fe.reblur_unpack_sh(sh0, sh1)
        np.testing.assert_allclose(np.asarray(fe.sg_extract_color(sg)), radiance,
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sg.norm_hit_dist), hit, atol=1e-6)
        # direction comes back normalized where c0 > 0
        d = np.asarray(fe._sg_extract_direction(sg))
        cos = np.sum(d * direction, -1)
        assert cos.min() > 0.999

    def test_directional_occlusion_pack(self):
        direction = random_normals(32, seed=6)
        hit = rng(6).uniform(0.1, 1, (32,)).astype(np.float32)
        packed = fe.reblur_pack_directional_occlusion(jnp.asarray(direction), jnp.asarray(hit))
        sg = fe.reblur_unpack_directional_occlusion(packed)
        np.testing.assert_allclose(np.asarray(sg.norm_hit_dist), hit, atol=1e-6)


class TestSigmaFrontend:
    def test_penumbra_directional(self):
        # tan(light radius) = 0.02, occluder at 10 -> penumbra radius = 0.1
        p = float(fe.sigma_pack_penumbra_directional(jnp.float32(10.0), jnp.float32(0.02)))
        np.testing.assert_allclose(p, 0.1, rtol=1e-6)
        # miss -> FP16_MAX sentinel
        p = float(fe.sigma_pack_penumbra_directional(jnp.float32(fe.NRD_FP16_MAX), 0.02))
        assert p == fe.NRD_FP16_MAX

    def test_shadow_unpack_is_square(self):
        np.testing.assert_allclose(float(fe.sigma_unpack_shadow(jnp.float32(0.5))), 0.25)

    def test_translucency_pack(self):
        t = fe.sigma_pack_translucency(jnp.float32(fe.NRD_FP16_MAX), jnp.array([0.5, 0.2, 0.1]))
        np.testing.assert_allclose(np.asarray(t), [1.0, 0.5, 0.2, 0.1], atol=1e-6)


class TestSGResolve:
    def test_sh_resolve_diffuse_ambient(self):
        """For an SG from radiance L with direction = N, resolve returns ~1.5x L luminance."""
        n = jnp.array([0.0, 0.0, 1.0])
        radiance = jnp.array([2.0, 2.0, 2.0])
        sg = fe.sg_create(radiance, n, jnp.float32(1.0))
        out = np.asarray(fe.sh_resolve_diffuse(sg, n))
        # Y = dot(N, c1) + 0.5*c0 = c0 * 1.5; colors stay gray
        assert abs(out[0] - out[1]) < 1e-5 and abs(out[1] - out[2]) < 1e-5
        np.testing.assert_allclose(out, 3.0, rtol=1e-4)

    def test_sg_resolve_diffuse_positive_and_directional(self):
        n = jnp.array([0.0, 0.0, 1.0])
        radiance = jnp.array([1.0, 1.0, 1.0])
        sg_aligned = fe.sg_create(radiance, n, jnp.float32(1.0))
        sg_opposed = fe.sg_create(radiance, -n, jnp.float32(1.0))
        front = float(nm.luminance(fe.sg_resolve_diffuse(sg_aligned, n)))
        back = float(nm.luminance(fe.sg_resolve_diffuse(sg_opposed, n)))
        assert front > back >= 0.0

    def test_sg_resolve_specular_peaks_at_mirror(self):
        n = jnp.array([0.0, 0.0, 1.0])
        v = nm.normalize(jnp.array([0.4, 0.0, 0.9]))
        r = nm.reflect(-v, n)
        radiance = jnp.array([1.0, 1.0, 1.0])
        roughness = jnp.float32(0.3)
        on_mirror = float(nm.luminance(fe.sg_resolve_specular(
            fe.sg_create(radiance, r, jnp.float32(1.0)), n, v, roughness)))
        off_mirror = float(nm.luminance(fe.sg_resolve_specular(
            fe.sg_create(radiance, nm.normalize(jnp.array([-0.8, 0.0, 0.6])),
                         jnp.float32(1.0)), n, v, roughness)))
        assert on_mirror > off_mirror

    def test_rejitter_is_identity_on_flat_geometry(self):
        n = jnp.array([0.0, 0.0, 1.0])
        v = jnp.array([0.0, 0.0, 1.0])
        sg = fe.sg_create(jnp.array([1.0, 1.0, 1.0]), n, jnp.float32(1.0))
        z = jnp.float32(10.0)
        f = fe.sg_rejitter(sg, sg, jnp.array([0.04, 0.04, 0.04]), v, jnp.float32(0.5),
                           z, z, z, z, z, n, n, n, n, n)
        np.testing.assert_allclose(np.asarray(f), 1.0, atol=1e-5)


class TestMaterialFactors:
    def test_factors_bounded_and_sane(self):
        n = jnp.array([0.0, 0.0, 1.0])
        v = jnp.array([0.0, 0.0, 1.0])
        albedo = jnp.array([0.8, 0.4, 0.2])
        rf0 = jnp.array([0.04, 0.04, 0.04])
        diff, spec = fe.material_factors(n, v, albedo, rf0, jnp.float32(0.5))
        assert (np.asarray(diff) > 0).all() and (np.asarray(diff) <= 1).all()
        assert (np.asarray(spec) > 0).all() and (np.asarray(spec) <= 1).all()
        # dielectric: diffuse factor dominates
        assert float(nm.luminance(diff)) > float(nm.luminance(spec))
