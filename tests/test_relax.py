"""Tests for the RELAX family (à-trous wavelet denoiser)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nrdtpu import frontend as fe
from nrdtpu.engine import Engine, psnr
from nrdtpu.settings import Denoiser, RelaxSettings, ResourceType
from nrdtpu.utils.scene import SceneGenerator, SceneSpec

SIZE = (128, 96)
RT = ResourceType


@pytest.fixture(scope="module")
def scene():
    return SceneGenerator(SceneSpec(size=SIZE, noise=0.4), camera_mode="static")


def base_inputs(gen, fd):
    return {
        RT.IN_VIEWZ: fd.view_z,
        RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
        RT.IN_MV: fd.mv,
    }


def diff_packed(fd):
    return np.asarray(fe.relax_pack_radiance_hitdist(
        jnp.asarray(fd.diff_noisy), jnp.asarray(fd.diff_hit_dist)))


def spec_packed(fd):
    return np.asarray(fe.relax_pack_radiance_hitdist(
        jnp.asarray(fd.spec_noisy), jnp.asarray(fd.spec_hit_dist)))


def run(gen, denoiser, n_frames, make_pool, settings=None):
    eng = Engine({0: denoiser}, resource_size=SIZE)
    if settings is not None:
        eng.set_denoiser_settings(0, settings)
    outs = None
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        pool = base_inputs(gen, fd)
        pool.update(make_pool(fd))
        outs = eng.denoise([0], pool)
    return outs, eng, fd


class TestRelaxDiffuse:
    def test_converges_to_clean(self, scene):
        outs, eng, fd = run(scene, Denoiser.RELAX_DIFFUSE, 20,
                            lambda fd: {RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd)})
        out = np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST])
        assert np.isfinite(out).all()
        geom = fd.hit_mask > 0
        p_noisy = psnr(fd.diff_noisy[geom], fd.diff_clean[geom])
        p_out = psnr(out[..., :3][geom], fd.diff_clean[geom])
        assert p_out > p_noisy + 8.0, (p_noisy, p_out)

    def test_single_frame_spatial_only(self, scene):
        """First frame: spatial variance estimation + a-trous must already denoise."""
        outs, _, fd = run(scene, Denoiser.RELAX_DIFFUSE, 1,
                          lambda fd: {RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd)})
        out = np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST])
        geom = fd.hit_mask > 0
        p_noisy = psnr(fd.diff_noisy[geom], fd.diff_clean[geom])
        p_out = psnr(out[..., :3][geom], fd.diff_clean[geom])
        assert p_out > p_noisy + 2.0, (p_noisy, p_out)

    def test_history_length_grows(self, scene):
        _, eng, fd = run(scene, Denoiser.RELAX_DIFFUSE, 10,
                         lambda fd: {RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd)})
        hist = np.asarray(eng.get_state(0)["history_length"])
        geom = fd.hit_mask > 0
        assert np.median(hist[geom]) >= 9.0

    def test_anti_firefly(self, scene):
        outs, _, fd = run(scene, Denoiser.RELAX_DIFFUSE, 4,
                          lambda fd: {RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd)},
                          settings=RelaxSettings(enableAntiFirefly=True))
        assert np.isfinite(np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST])).all()

    def test_atrous_iteration_count_static(self, scene):
        outs, _, fd = run(scene, Denoiser.RELAX_DIFFUSE, 2,
                          lambda fd: {RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd)},
                          settings=RelaxSettings(atrousIterationNum=2))
        assert np.isfinite(np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST])).all()


class TestRelaxDiffuseSpecular:
    def test_flagship_converges(self, scene):
        def pool(fd):
            return {RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd),
                    RT.IN_SPEC_RADIANCE_HITDIST: spec_packed(fd)}

        outs, eng, fd = run(scene, Denoiser.RELAX_DIFFUSE_SPECULAR, 20, pool)
        geom = fd.hit_mask > 0
        for rt, clean, noisy in ((RT.OUT_DIFF_RADIANCE_HITDIST, fd.diff_clean,
                                  fd.diff_noisy),
                                 (RT.OUT_SPEC_RADIANCE_HITDIST, fd.spec_clean,
                                  fd.spec_noisy)):
            out = np.asarray(outs[rt])
            assert np.isfinite(out).all(), rt
            p_noisy = psnr(noisy[geom], clean[geom])
            p_out = psnr(out[..., :3][geom], clean[geom])
            assert p_out > p_noisy + 5.0, (rt, p_noisy, p_out)

    def test_reflection_hit_t_accumulates(self, scene):
        def pool(fd):
            return {RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd),
                    RT.IN_SPEC_RADIANCE_HITDIST: spec_packed(fd)}

        _, eng, fd = run(scene, Denoiser.RELAX_DIFFUSE_SPECULAR, 8, pool)
        hit_t = np.asarray(eng.get_state(0)["reflection_hit_t"])
        geom = (fd.hit_mask > 0) & (fd.spec_hit_dist > 0.1)
        # accumulated reflection hitT should be in the ballpark of the input hitT
        rel = np.abs(hit_t[geom] - fd.spec_hit_dist[geom]) / (fd.spec_hit_dist[geom] + 1e-3)
        assert np.median(rel) < 0.5


@pytest.mark.slow
class TestRelaxSH:
    def test_diffuse_sh_runs(self, scene):
        def pool(fd):
            sh0, sh1 = fe.relax_pack_sh(jnp.asarray(fd.diff_noisy),
                                        jnp.asarray(fd.diff_hit_dist),
                                        jnp.asarray(fd.normal))
            return {RT.IN_DIFF_SH0: np.asarray(sh0), RT.IN_DIFF_SH1: np.asarray(sh1)}

        outs, _, fd = run(scene, Denoiser.RELAX_DIFFUSE_SH, 6, pool)
        assert np.isfinite(np.asarray(outs[RT.OUT_DIFF_SH0])).all()
        assert np.isfinite(np.asarray(outs[RT.OUT_DIFF_SH1])).all()


@pytest.mark.slow
def test_relax_checkerboard_modes():
    """RELAX CheckerboardMode: half-width inputs resolve at the pipeline front
    (RELAX_PrePass.hlsli:28-110) and accumulate slower on no-data pixels."""
    import jax.numpy as jnp
    import numpy as np

    from nrdtpu import frontend as fe
    from nrdtpu.engine import Engine
    from nrdtpu.settings import (CheckerboardMode, Denoiser, RelaxSettings,
                                 ResourceType as RT)
    from nrdtpu.utils.scene import SceneGenerator, SceneSpec

    size = (128, 96)
    w, h = size

    def run(mode):
        gen = SceneGenerator(SceneSpec(size=size, noise=0.3), camera_mode="static")
        eng = Engine({0: Denoiser.RELAX_DIFFUSE_SPECULAR}, resource_size=size)
        s = RelaxSettings()
        s.checkerboardMode = mode
        eng.set_denoiser_settings(0, s)
        outs = None
        for i in range(4):
            fd = gen.frame(i)
            eng.set_common_settings(fd.common_settings)
            diff = np.asarray(fe.relax_pack_radiance_hitdist(
                jnp.asarray(fd.diff_noisy), jnp.asarray(fd.diff_hit_dist)))
            spec = np.asarray(fe.relax_pack_radiance_hitdist(
                jnp.asarray(fd.spec_noisy), jnp.asarray(fd.spec_hit_dist)))
            if mode != CheckerboardMode.OFF:
                cb = (np.arange(w)[None, :] + np.arange(h)[:, None] + i) & 1
                has = cb == (int(mode) - 1)
                sel = np.where(has[:, ::2], 0, 1) + np.arange(0, w, 2)[None, :]
                diff = diff[np.arange(h)[:, None], sel]
                spec = spec[np.arange(h)[:, None], sel]
            pool = {RT.IN_VIEWZ: fd.view_z,
                    RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
                    RT.IN_MV: fd.mv,
                    RT.IN_DIFF_RADIANCE_HITDIST: diff,
                    RT.IN_SPEC_RADIANCE_HITDIST: spec}
            outs = eng.denoise([0], pool)
        return np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST])

    full = run(CheckerboardMode.OFF)
    half = run(CheckerboardMode.BLACK)
    assert np.isfinite(half).all()
    corr = np.corrcoef(half[..., :3].ravel(), full[..., :3].ravel())[0, 1]
    assert corr > 0.9, corr


@pytest.mark.parametrize("camera", ["orbit", "zoom"])
def test_relax_history_retention_under_camera_motion(pallas_interpret, camera):
    """RELAX twin of the REBLUR retention test: the block-adaptive exact residual
    capture in the RELAX smb/vmb loaders (relax_pallas, round 5) must hold the
    history length the per-pixel XLA path holds under rotating/zooming cameras
    (pre-fix, clipped sampling froze accumulation at every dev > 1 px pixel)."""
    import os

    from nrdtpu.utils.scene import SceneGenerator, SceneSpec

    def run(impl):
        os.environ["NRDTPU_IMPL"] = impl
        try:
            gen = SceneGenerator(SceneSpec(size=(128, 96), noise=0.3),
                                 camera_mode=camera)
            eng = Engine({0: Denoiser.RELAX_DIFFUSE}, resource_size=(128, 96))
            for i in range(6):
                fd = gen.frame(i)
                eng.set_common_settings(fd.common_settings)
                eng.denoise([0], {
                    RT.IN_VIEWZ: fd.view_z,
                    RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
                    RT.IN_MV: fd.mv,
                    RT.IN_DIFF_RADIANCE_HITDIST: diff_packed(fd),
                })
            state = eng.get_state(0)
            hit = np.asarray(gen.frame(5).hit_mask) > 0.5
            return float(np.asarray(state["history_length"])[hit].mean())

        finally:
            os.environ["NRDTPU_IMPL"] = "pallas"

    hl_pallas = run("pallas")
    hl_xla = run("xla")
    assert hl_xla > 2.0, hl_xla
    assert hl_pallas > 0.9 * hl_xla, (hl_pallas, hl_xla)
