"""Tests for REBLUR_DIFFUSE_OCCLUSION (the first REBLUR slice)."""

import numpy as np
import pytest

from nrdtpu.engine import Engine, psnr
from nrdtpu.settings import AccumulationMode, Denoiser, ReblurSettings, ResourceType
from nrdtpu.utils.scene import SceneGenerator, SceneSpec

SIZE = (128, 96)


@pytest.fixture(scope="module")
def scene():
    return SceneGenerator(SceneSpec(size=SIZE), camera_mode="static")


def occlusion_inputs(gen, fd):
    return {
        ResourceType.IN_VIEWZ: fd.view_z,
        ResourceType.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
        ResourceType.IN_MV: fd.mv,
        ResourceType.IN_DIFF_HITDIST: fd.ao_noisy,
    }


def run_frames(gen, n_frames, settings=None):
    eng = Engine({0: Denoiser.REBLUR_DIFFUSE_OCCLUSION}, resource_size=SIZE)
    if settings is not None:
        eng.set_denoiser_settings(0, settings)
    outs = []
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        out = eng.denoise([0], occlusion_inputs(gen, fd))
        outs.append(np.asarray(out[ResourceType.OUT_DIFF_HITDIST])[..., 0])
    return outs, eng


class TestReblurDiffuseOcclusion:
    def test_runs_and_is_finite(self, scene):
        outs, _ = run_frames(scene, 2)
        assert outs[-1].shape == (SIZE[1], SIZE[0])
        assert np.isfinite(outs[-1]).all()
        assert outs[-1].min() >= 0.0 and outs[-1].max() <= 1.0 + 1e-5

    def test_converges_towards_clean_ao(self, scene):
        outs, _ = run_frames(scene, 24)
        fd = scene.frame(0)
        geom = fd.hit_mask > 0
        clean = fd.ao_clean
        noisy_err = np.abs(fd.ao_noisy - clean)[geom].mean()
        out_err = np.abs(outs[-1] - clean)[geom].mean()
        # binary 1-spp noise -> denoised should cut the error dramatically
        assert out_err < 0.35 * noisy_err, (noisy_err, out_err)

    def test_temporal_variance_shrinks(self, scene):
        outs, _ = run_frames(scene, 20)
        fd = scene.frame(0)
        geom = fd.hit_mask > 0
        early = np.abs(outs[3] - outs[2])[geom].mean()
        late = np.abs(outs[-1] - outs[-2])[geom].mean()
        assert late < 0.6 * early, (early, late)

    def test_accum_speed_grows_then_caps(self, scene):
        outs, eng = run_frames(
            scene, 12, ReblurSettings(maxAccumulatedFrameNum=8,
                                      maxFastAccumulatedFrameNum=2))
        accum = np.asarray(eng.get_state(0)["diff_accum"])
        fd = scene.frame(0)
        geom = fd.hit_mask > 0
        # interior geometry pixels should reach the cap (+1 increments per frame, cap 8)
        assert np.median(accum[geom]) >= 7.0
        assert accum.max() <= 63.0

    def test_restart_resets_accumulation(self, scene):
        eng = Engine({0: Denoiser.REBLUR_DIFFUSE_OCCLUSION}, resource_size=SIZE)
        for i in range(6):
            fd = scene.frame(i)
            eng.set_common_settings(fd.common_settings)
            eng.denoise([0], occlusion_inputs(scene, fd))
        fd = scene.frame(6)
        fd.common_settings.accumulationMode = AccumulationMode.RESTART
        eng.set_common_settings(fd.common_settings)
        eng.denoise([0], occlusion_inputs(scene, fd))
        accum = np.asarray(eng.get_state(0)["diff_accum"])
        # gMaxAccumulatedFrameNum = 0 on reset -> accum speeds collapse to <= 1
        assert accum.max() <= 1.0 + 1e-5

    def test_reprojection_keeps_history_under_strafe(self):
        """Slow strafe: history stays useful (accum speeds remain high away from edges)."""
        gen = SceneGenerator(SceneSpec(size=SIZE), camera_mode="strafe")
        outs, eng = run_frames(gen, 12)
        accum = np.asarray(eng.get_state(0)["diff_accum"])
        fd = gen.frame(11)
        interior = fd.hit_mask > 0
        interior[:, :16] = False  # screen edge where new content streams in
        interior[:, -16:] = False
        assert np.median(accum[interior]) > 5.0

    def test_split_screen(self, scene):
        eng = Engine({0: Denoiser.REBLUR_DIFFUSE_OCCLUSION}, resource_size=SIZE)
        fd = scene.frame(0)
        fd.common_settings.splitScreen = 0.5
        eng.set_common_settings(fd.common_settings)
        out = np.asarray(eng.denoise([0], occlusion_inputs(scene, fd))
                         [ResourceType.OUT_DIFF_HITDIST])[..., 0]
        left = out[:, : SIZE[0] // 2]
        ref = fd.ao_noisy[:, : SIZE[0] // 2]
        geom = fd.view_z[:, : SIZE[0] // 2] < 1e5
        np.testing.assert_allclose(left[geom], ref[geom], atol=1e-6)
