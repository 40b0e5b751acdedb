"""End-to-end tests for the REFERENCE denoiser + Engine API (first full slice)."""

import numpy as np
import pytest

from nrdtpu.engine import Engine, psnr
from nrdtpu.settings import (
    AccumulationMode,
    Denoiser,
    ReferenceSettings,
    ResourceType,
)
from nrdtpu.utils.scene import SceneGenerator, SceneSpec


@pytest.fixture(scope="module")
def scene():
    return SceneGenerator(SceneSpec(size=(96, 64), noise=0.5), camera_mode="static")


def make_engine(size=(96, 64)):
    return Engine({0: Denoiser.REFERENCE}, resource_size=size)


class TestReferenceAccumulation:
    def test_converges_to_clean_on_static_camera(self, scene):
        eng = make_engine()
        clean = None
        out = None
        for i in range(64):
            fd = scene.frame(i)
            clean = fd.diff_clean
            eng.set_common_settings(fd.common_settings)
            signal = np.concatenate([fd.diff_noisy, fd.diff_hit_dist[..., None]], -1)
            out = eng.denoise([0], {ResourceType.IN_SIGNAL: signal})
        result = np.asarray(out[ResourceType.OUT_SIGNAL])[..., :3]
        noisy_psnr = psnr(scene.frame(63).diff_noisy, clean)
        accum_psnr = psnr(result, clean)
        # variance drops ~1/N -> ~18 dB improvement at N=64
        assert accum_psnr > noisy_psnr + 12.0, (noisy_psnr, accum_psnr)

    def test_accumulation_matches_running_mean(self, scene):
        """lerp(history, x, 1/(1+n)) with n growing = exact running mean."""
        eng = make_engine()
        signals = []
        out = None
        for i in range(8):
            fd = scene.frame(i)
            eng.set_common_settings(fd.common_settings)
            signal = np.concatenate([fd.diff_noisy, fd.diff_hit_dist[..., None]], -1)
            signals.append(signal)
            out = eng.denoise([0], {ResourceType.IN_SIGNAL: signal})
        expected = np.mean(signals, axis=0)
        np.testing.assert_allclose(np.asarray(out[ResourceType.OUT_SIGNAL]), expected,
                                   rtol=1e-4, atol=1e-5)

    def test_camera_move_resets_accumulation(self):
        gen = SceneGenerator(SceneSpec(size=(96, 64), noise=0.5), camera_mode="strafe")
        eng = make_engine()
        out = None
        for i in range(4):
            fd = gen.frame(i)
            eng.set_common_settings(fd.common_settings)
            signal = np.concatenate([fd.diff_noisy, fd.diff_hit_dist[..., None]], -1)
            out = eng.denoise([0], {ResourceType.IN_SIGNAL: signal})
        # camera moves every frame -> matrices change -> accumSpeed stays 1 -> output == input
        np.testing.assert_allclose(np.asarray(out[ResourceType.OUT_SIGNAL]), signal,
                                   rtol=1e-5, atol=1e-6)

    def test_restart_mode_resets(self, scene):
        eng = make_engine()
        for i in range(4):
            fd = scene.frame(i)
            eng.set_common_settings(fd.common_settings)
            signal = np.concatenate([fd.diff_noisy, fd.diff_hit_dist[..., None]], -1)
            eng.denoise([0], {ResourceType.IN_SIGNAL: signal})
        fd = scene.frame(4)
        fd.common_settings.accumulationMode = AccumulationMode.RESTART
        eng.set_common_settings(fd.common_settings)
        signal = np.concatenate([fd.diff_noisy, fd.diff_hit_dist[..., None]], -1)
        out = eng.denoise([0], {ResourceType.IN_SIGNAL: signal})
        np.testing.assert_allclose(np.asarray(out[ResourceType.OUT_SIGNAL]), signal,
                                   rtol=1e-5, atol=1e-6)

    def test_max_accumulated_frame_num_caps_weight(self, scene):
        eng = make_engine()
        eng.set_denoiser_settings(0, ReferenceSettings(maxAccumulatedFrameNum=3))
        outs = []
        for i in range(10):
            fd = scene.frame(i)
            eng.set_common_settings(fd.common_settings)
            signal = np.concatenate([fd.diff_noisy, fd.diff_hit_dist[..., None]], -1)
            outs.append(np.asarray(
                eng.denoise([0], {ResourceType.IN_SIGNAL: signal})[ResourceType.OUT_SIGNAL]))
        # after the cap, accumSpeed = 1/4: exponential moving average, never a frozen mean
        delta_last = np.abs(outs[-1] - outs[-2]).mean()
        assert delta_last > 1e-5

    def test_split_screen_shows_input_left(self, scene):
        eng = make_engine()
        fd = scene.frame(0)
        fd.common_settings.splitScreen = 0.5
        eng.set_common_settings(fd.common_settings)
        signal = np.concatenate([fd.diff_noisy, fd.diff_hit_dist[..., None]], -1)
        out = np.asarray(eng.denoise([0], {ResourceType.IN_SIGNAL: signal})
                         [ResourceType.OUT_SIGNAL])
        np.testing.assert_allclose(out[:, :48], signal[:, :48], atol=1e-6)


class TestSceneGenerator:
    def test_mv_is_zero_for_static_camera(self, scene):
        fd = scene.frame(1)
        assert np.abs(fd.mv[fd.hit_mask > 0][:, :2]).max() < 1e-5

    def test_mv_reprojects_correctly_when_strafing(self):
        gen = SceneGenerator(SceneSpec(size=(128, 96)), camera_mode="strafe")
        fd = gen.frame(3)
        h, w = fd.view_z.shape
        # pick an interior geometry pixel and verify uv+mv lands on the same world point
        ys, xs = np.nonzero(fd.hit_mask[8:-8, 8:-8])
        y, x = ys[100] + 8, xs[100] + 8
        uv = np.array([(x + 0.5) / w, (y + 0.5) / h])
        uv_prev = uv + fd.mv[y, x, :2]
        fd_prev = gen.frame(2)
        # sample prev-frame world position at uv_prev (nearest)
        xp = int(uv_prev[0] * w)
        yp = int(uv_prev[1] * h)
        if fd_prev.hit_mask[yp, xp] > 0:
            d = np.linalg.norm(fd_prev.world_pos[yp, xp] - fd.world_pos[y, x])
            # within a pixel footprint at that depth
            assert d < 0.1, d

    def test_sky_pixels_have_large_viewz(self, scene):
        fd = scene.frame(0)
        sky = fd.hit_mask == 0
        if sky.any():
            assert fd.view_z[sky].min() > 1e6

    def test_noisy_is_unbiased(self, scene):
        fds = [scene.frame(i) for i in range(50)]
        mean = np.mean([f.diff_noisy for f in fds], axis=0)
        clean = fds[0].diff_clean
        mask = clean.sum(-1) > 0.05
        rel = np.abs(mean[mask] - clean[mask]) / (clean[mask] + 1e-3)
        assert rel.mean() < 0.15
