"""Property tests for the math foundation (codecs, sequences, filters, GGX helpers)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdtpu import math as nm


def rng(seed=0):
    return np.random.default_rng(seed)


class TestCodecs:
    def test_ycocg_roundtrip(self):
        rgb = jnp.asarray(rng().uniform(0, 10, (64, 3)).astype(np.float32))
        back = nm.ycocg_to_linear(nm.linear_to_ycocg(rgb))
        np.testing.assert_allclose(back, rgb, rtol=1e-5, atol=1e-5)

    def test_luminance_matches_bt709(self):
        assert abs(float(nm.luminance(jnp.array([1.0, 1.0, 1.0]))) - 1.0) < 1e-6

    @pytest.mark.parametrize("signed", [True, False])
    def test_oct_roundtrip(self, signed):
        v = rng(1).normal(size=(256, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        enc = nm.encode_unit_vector(jnp.asarray(v), signed=signed)
        dec = np.asarray(nm.decode_unit_vector(enc, signed=signed))
        cos = np.sum(dec * v, axis=-1)
        assert cos.min() > 0.99999

    def test_oct_roundtrip_quantized_10bit(self):
        v = rng(2).normal(size=(1024, 3)).astype(np.float32)
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        enc = nm.quantize_unorm(nm.encode_unit_vector(jnp.asarray(v), signed=False), 10)
        dec = np.asarray(nm.decode_unit_vector(enc, signed=False))
        angle = np.arccos(np.clip(np.sum(dec * v, axis=-1), -1, 1))
        assert np.degrees(angle.max()) < 0.5  # 10-bit oct is accurate to < 0.5 degrees

    def test_ycocg_corrected_identity_when_y_unchanged(self):
        rgb = jnp.asarray(rng(3).uniform(0.1, 5, (16, 3)).astype(np.float32))
        ycocg = nm.linear_to_ycocg(rgb)
        back = nm.ycocg_to_linear_corrected(ycocg[..., 0], ycocg[..., 0], ycocg[..., 1:])
        np.testing.assert_allclose(back, rgb, rtol=1e-4, atol=1e-4)


class TestSequences:
    def test_weyl_distribution(self):
        vals = np.asarray(nm.weyl1d(0.0, jnp.arange(4096)))
        assert ((vals >= 0) & (vals < 1)).all()
        hist, _ = np.histogram(vals, bins=16, range=(0, 1))
        assert hist.min() > 200  # equidistributed

    def test_bayer_covers_all_16_values_over_space(self):
        x, y = np.meshgrid(np.arange(4), np.arange(4))
        vals = np.asarray(nm.bayer4x4((jnp.asarray(x), jnp.asarray(y)), 0))
        assert len(np.unique(np.round(vals * 16))) == 16

    def test_bayer_covers_all_16_values_over_time(self):
        vals = [float(nm.bayer4x4((0, 0), f)) for f in range(16)]
        assert len(set(np.round(np.array(vals) * 16))) == 16

    def test_checkerboard_flips_per_frame_and_pixel(self):
        assert int(nm.checkerboard((0, 0), 0)) != int(nm.checkerboard((0, 0), 1))
        assert int(nm.checkerboard((0, 0), 0)) != int(nm.checkerboard((1, 0), 0))
        assert int(nm.checkerboard((0, 0), 0)) == int(nm.checkerboard((1, 1), 0))


class TestRotators:
    def test_rotate_by_90(self):
        r = nm.get_rotator(jnp.float32(np.pi / 2))
        v = nm.rotate_vector2(r, jnp.array([1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(v), [0.0, 1.0], atol=1e-6)

    def test_combine_is_angle_addition(self):
        a, b = 0.3, 1.1
        r = nm.combine_rotators(nm.get_rotator(jnp.float32(a)), nm.get_rotator(jnp.float32(b)))
        expected = nm.get_rotator(jnp.float32(a + b))
        np.testing.assert_allclose(np.asarray(r), np.asarray(expected), atol=1e-6)

    def test_basis_is_orthonormal(self):
        n = rng(4).normal(size=(128, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        t, b = nm.get_basis(jnp.asarray(n))
        t, b = np.asarray(t), np.asarray(b)
        np.testing.assert_allclose(np.sum(t * n, -1), 0, atol=1e-5)
        np.testing.assert_allclose(np.sum(b * n, -1), 0, atol=1e-5)
        np.testing.assert_allclose(np.sum(t * b, -1), 0, atol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(t, axis=-1), 1, atol=1e-5)
        # (t, b, n) is right-handed: cross(t, b) == n
        np.testing.assert_allclose(np.cross(t, b), n, atol=1e-5)


class TestFiltering:
    def test_bilinear_filter_at_texel_center(self):
        origin, f = nm.bilinear_filter(jnp.array([0.5 / 4, 0.5 / 4]), (4.0, 4.0))
        np.testing.assert_allclose(np.asarray(origin), [0, 0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(f), [0, 0], atol=1e-6)

    def test_bilinear_weights_sum_to_one(self):
        f = jnp.asarray(rng(5).uniform(0, 1, (32, 2)).astype(np.float32))
        w = nm.bilinear_weights(f)
        np.testing.assert_allclose(np.asarray(w).sum(-1), 1, atol=1e-6)

    def test_catrom_weights_partition_of_unity(self):
        f = jnp.linspace(0, 1, 33)
        w0, w1, w2, w3 = nm.catmull_rom_weights(f)
        np.testing.assert_allclose(np.asarray(w0 + w1 + w2 + w3), 1.0, atol=1e-6)

    def test_catrom_interpolates_linear_ramp(self):
        # CatRom exactly reproduces linear functions
        f = jnp.float32(0.3)
        w0, w1, w2, w3 = nm.catmull_rom_weights(f)
        val = w0 * (-1.0) + w1 * 0.0 + w2 * 1.0 + w3 * 2.0
        np.testing.assert_allclose(float(val), 0.3, atol=1e-6)


class TestGGX:
    def test_dominant_direction_limits(self):
        n = jnp.array([0.0, 0.0, 1.0])
        v = nm.normalize(jnp.array([0.5, 0.0, 0.8]))
        # roughness 1 -> dominant factor ~1 -> direction ~N
        d_rough = nm.get_specular_dominant_direction(n, v, jnp.float32(1.0))
        assert float(nm.dot(d_rough[:3], n)) > 0.99
        # roughness 0 -> direction ~mirror reflection
        d_smooth = nm.get_specular_dominant_direction(n, v, jnp.float32(0.0))
        r = nm.reflect(-v, n)
        assert float(nm.dot(d_smooth[:3], r)) > 0.99

    def test_lobe_half_angle_monotonic_in_roughness(self):
        r = jnp.linspace(0.01, 1.0, 16)
        t = np.asarray(nm.get_specular_lobe_tan_half_angle(r))
        assert (np.diff(t) > 0).all()

    def test_spec_magic_curve_range(self):
        r = jnp.linspace(0, 1, 64)
        c = np.asarray(nm.get_spec_magic_curve(r))
        assert c[0] == 0.0 and c[-1] <= 1.0 and (np.diff(c) >= -1e-6).all()

    def test_thin_lens(self):
        # flat mirror (curvature 0): image at object distance
        assert float(nm.apply_thin_lens_equation(jnp.float32(2.0), jnp.float32(0.0))) == 2.0


class TestWeights:
    def test_non_exponential_weight_is_one_at_reference(self):
        a, b = nm.get_roughness_weight_params(jnp.float32(0.5), 0.15)
        assert float(nm.compute_non_exponential_weight(jnp.float32(0.5), a, b)) == 1.0

    def test_weight_falls_off(self):
        a, b = nm.get_roughness_weight_params(jnp.float32(0.5), 0.15)
        w_near = float(nm.compute_non_exponential_weight(jnp.float32(0.52), a, b))
        w_far = float(nm.compute_non_exponential_weight(jnp.float32(0.9), a, b))
        assert w_near > w_far
        assert w_far == 0.0

    def test_exp_approx_close_to_exp(self):
        x = np.linspace(-2, 0, 64)
        approx = np.asarray(nm.exp_approx(jnp.asarray(x, jnp.float32)))
        np.testing.assert_allclose(approx, np.exp(x), atol=0.12)

    def test_acos_approx(self):
        x = np.linspace(-1, 1, 101)
        approx = np.asarray(nm.acos_approx(jnp.asarray(x, jnp.float32)))
        np.testing.assert_allclose(approx, np.arccos(x), atol=0.07)


class TestGeometry:
    def test_screen_uv_center(self):
        # identity world_to_clip with w=z: point on the optical axis -> uv (0.5, 0.5)
        m = jnp.asarray(np.array([[1, 0, 0, 0], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 1, 0]],
                                 np.float32))
        uv = nm.get_screen_uv(m, jnp.array([0.0, 0.0, 5.0]))
        np.testing.assert_allclose(np.asarray(uv), [0.5, 0.5], atol=1e-6)

    def test_reconstruct_view_position_perspective(self):
        # frustum for 90 deg fov square: x0=-1, y0=1, dx=2, dy=-2
        frustum = jnp.array([-1.0, 1.0, 2.0, -2.0])
        p = nm.reconstruct_view_position(jnp.array([0.5, 0.5]), frustum, jnp.float32(3.0))
        np.testing.assert_allclose(np.asarray(p), [0, 0, 3], atol=1e-6)
        p = nm.reconstruct_view_position(jnp.array([1.0, 0.0]), frustum, jnp.float32(2.0))
        np.testing.assert_allclose(np.asarray(p), [2, 2, 2], atol=1e-6)
