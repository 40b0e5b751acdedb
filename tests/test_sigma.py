"""Tests for the SIGMA shadow denoiser family."""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdtpu import frontend as fe
from nrdtpu.engine import Engine
from nrdtpu.settings import Denoiser, ResourceType, SigmaSettings
from nrdtpu.utils.scene import SceneGenerator, SceneSpec

SIZE = (128, 96)  # (w, h)


@pytest.fixture(scope="module")
def scene():
    return SceneGenerator(SceneSpec(size=SIZE), camera_mode="static")


def sigma_inputs(gen, fd):
    penumbra = np.asarray(fe.sigma_pack_penumbra_directional(
        jnp.asarray(fd.dist_to_occluder), gen.spec.light_tan_angular_radius))
    return {
        ResourceType.IN_PENUMBRA: penumbra,
        ResourceType.IN_VIEWZ: fd.view_z,
        ResourceType.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
        ResourceType.IN_MV: fd.mv,
    }


def run_frames(gen, n_frames, settings=None, denoiser=Denoiser.SIGMA_SHADOW,
               extra_inputs=None):
    eng = Engine({0: denoiser}, resource_size=SIZE)
    if settings is not None:
        eng.set_denoiser_settings(0, settings)
    out = None
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        pool = sigma_inputs(gen, fd)
        if extra_inputs:
            pool.update(extra_inputs(fd))
        out = eng.denoise([0], pool)
    return np.asarray(out[ResourceType.OUT_SHADOW_TRANSLUCENCY]), eng


class TestSigmaShadow:
    def test_runs_and_is_finite(self, scene):
        out, _ = run_frames(scene, 2)
        assert out.shape == (SIZE[1], SIZE[0], 1)
        assert np.isfinite(out).all()
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_fully_lit_stays_lit(self):
        gen = SceneGenerator(SceneSpec(size=SIZE, spheres=()), camera_mode="static")
        out, _ = run_frames(gen, 3)
        fd = gen.frame(0)
        shadow = fe.sigma_unpack_shadow(out[..., 0])
        lit_mask = (fd.hit_mask > 0) & (fd.shadow_clean > 0.5)
        assert np.asarray(shadow)[lit_mask].min() > 0.99

    def test_umbra_core_stays_dark_and_edges_soften(self, scene):
        out, _ = run_frames(scene, 4)
        fd = scene.frame(3)
        shadow = np.asarray(fe.sigma_unpack_shadow(out[..., 0]))
        hard = fd.shadow_clean  # 0/1 analytic hard shadow

        # deep umbra: pixels whose 5x5 neighborhood is fully occluded stay dark
        from scipy import ndimage  # noqa - fallback below if unavailable
        core = (ndimage.minimum_filter(1.0 - hard, size=9) > 0.5) & (fd.hit_mask > 0)
        if core.any():
            assert shadow[core].max() < 0.15

        # the denoised result must contain more intermediate (penumbra) values than input
        edge_in = ((hard > 0.05) & (hard < 0.95)).sum()
        edge_out = ((shadow > 0.05) & (shadow < 0.95) & (fd.hit_mask > 0)).sum()
        assert edge_out > edge_in

    def test_history_length_grows_on_static_camera(self, scene):
        _, eng = run_frames(scene, 10)
        hist_len = np.asarray(eng.get_state(0)["history_len"])
        fd = scene.frame(0)
        geom = fd.hit_mask > 0
        # the dominant geometry pixels should saturate at SIGMA_MAX_ACCUM_FRAME_NUM
        assert np.median(hist_len[geom]) == 7.0

    def test_no_stabilization_when_disabled(self, scene):
        out, eng = run_frames(scene, 3, settings=SigmaSettings(maxStabilizedFrameNum=0))
        assert np.isfinite(out).all()

    def test_split_screen(self, scene):
        eng = Engine({0: Denoiser.SIGMA_SHADOW}, resource_size=SIZE)
        fd = scene.frame(0)
        fd.common_settings.splitScreen = 0.5
        eng.set_common_settings(fd.common_settings)
        pool = sigma_inputs(scene, fd)
        out = np.asarray(eng.denoise([0], pool)[ResourceType.OUT_SHADOW_TRANSLUCENCY])
        # left half shows the hard input shadow (0 or 1 exactly, within viewZ range)
        left = out[:, : SIZE[0] // 2, 0]
        assert np.logical_or(np.abs(left) < 1e-6, np.abs(left - 1.0) < 1e-6).all()


class TestSigmaShadowTranslucency:
    def test_translucency_channels_flow_through(self, scene):
        def extra(fd):
            translucency = np.broadcast_to(
                np.array([0.3, 0.6, 0.2], np.float32), fd.view_z.shape + (3,))
            packed = np.asarray(fe.sigma_pack_translucency(
                jnp.asarray(fd.dist_to_occluder), jnp.asarray(translucency)))
            return {ResourceType.IN_TRANSLUCENCY: packed}

        out, _ = run_frames(scene, 3, denoiser=Denoiser.SIGMA_SHADOW_TRANSLUCENCY,
                            extra_inputs=extra)
        assert out.shape == (SIZE[1], SIZE[0], 4)
        assert np.isfinite(out).all()
        shadow = fe.sigma_unpack_shadow(out)
        # in lit regions, translucency channels follow the packed input colors
        fd = scene.frame(2)
        lit = (fd.shadow_clean > 0.5) & (fd.hit_mask > 0)
        s = np.asarray(shadow)
        assert s[..., 0][lit].mean() > 0.8
