"""Interpret-mode tests for the Pallas fast path (runs on CPU).

Verifies the Pallas SIGMA pipeline against the XLA reference path on the analytic scene:
not bit-equal (documented radius quantization / skew approximations) but tightly correlated,
and all temporal invariants hold.
"""

import os

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl_mod
import jax.numpy as jnp

from nrdtpu import frontend as fe
from nrdtpu.engine import Engine
from nrdtpu.settings import Denoiser, ResourceType
from nrdtpu.utils.scene import SceneGenerator, SceneSpec

SIZE = (128, 96)
RT = ResourceType


@pytest.fixture()
def pallas_interpret(monkeypatch):
    orig = pl_mod.pallas_call

    def interp(*a, **k):
        k = dict(k)
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl_mod, "pallas_call", interp)
    monkeypatch.setenv("NRDTPU_IMPL", "pallas")
    yield


def run_sigma(n_frames):
    gen = SceneGenerator(SceneSpec(size=SIZE), camera_mode="static")
    eng = Engine({0: Denoiser.SIGMA_SHADOW}, resource_size=SIZE)
    outs = None
    fd = None
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        pool = {
            RT.IN_PENUMBRA: np.asarray(fe.sigma_pack_penumbra_directional(
                jnp.asarray(fd.dist_to_occluder), 0.15)),
            RT.IN_VIEWZ: fd.view_z,
            RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
            RT.IN_MV: fd.mv,
        }
        outs = eng.denoise([0], pool)
    return np.asarray(outs[RT.OUT_SHADOW_TRANSLUCENCY]), eng, fd


def test_sigma_pallas_pipeline(pallas_interpret):
    out, eng, fd = run_sigma(5)
    assert np.isfinite(out).all()
    shadow = out[..., 0] ** 2
    geom = fd.hit_mask > 0
    lit = (fd.shadow_clean > 0.5) & geom
    assert shadow[lit].mean() > 0.98
    hl = np.asarray(eng.get_state(0)["history_len"])
    assert np.median(hl[geom]) >= 5.0


def test_sigma_pallas_matches_xla_path(pallas_interpret):
    out_p, _, fd = run_sigma(4)
    os.environ["NRDTPU_IMPL"] = "xla"
    try:
        out_x, _, _ = run_sigma(4)
    finally:
        os.environ["NRDTPU_IMPL"] = "pallas"
    a = out_p[..., 0].ravel()
    b = out_x[..., 0].ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.98, corr
    assert np.abs(a - b).mean() < 0.03


def test_sigma_pallas_nopad_path(pallas_interpret):
    """Aligned size (h%8==0, w%128==0, >= window) exercises the clamped-DMA no-pad mode."""
    global SIZE
    old = SIZE
    try:
        globals()["SIZE"] = (512, 128)  # (w, h) -> h=128, w=512
        out_p, eng, fd = run_sigma(3)
        os.environ["NRDTPU_IMPL"] = "xla"
        out_x, _, _ = run_sigma(3)
    finally:
        globals()["SIZE"] = old
        os.environ["NRDTPU_IMPL"] = "pallas"
    a, b = out_p[..., 0].ravel(), out_x[..., 0].ravel()
    assert np.isfinite(a).all()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.97, corr
    assert np.abs(a - b).mean() < 0.04


def _run_reblur_ds(n_frames, size=(128, 96), camera="static"):
    import jax.numpy as jnp
    from nrdtpu.utils.scene import SceneGenerator, SceneSpec

    HDP = jnp.asarray([3.0, 0.1, 20.0, -25.0])
    gen = SceneGenerator(SceneSpec(size=size, noise=0.4), camera_mode=camera)
    eng = Engine({0: Denoiser.REBLUR_DIFFUSE_SPECULAR}, resource_size=size)
    outs = None
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        dn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.diff_hit_dist),
                                         jnp.asarray(fd.view_z), HDP, 1.0)
        sn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.spec_hit_dist),
                                         jnp.asarray(fd.view_z), HDP,
                                         jnp.asarray(fd.roughness))
        pool = {
            RT.IN_VIEWZ: fd.view_z,
            RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
            RT.IN_MV: fd.mv,
            RT.IN_DIFF_RADIANCE_HITDIST: np.asarray(
                fe.reblur_pack_radiance_hitdist(jnp.asarray(fd.diff_noisy), dn)),
            RT.IN_SPEC_RADIANCE_HITDIST: np.asarray(
                fe.reblur_pack_radiance_hitdist(jnp.asarray(fd.spec_noisy), sn)),
        }
        outs = eng.denoise([0], pool)
    return (np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST]),
            np.asarray(outs[RT.OUT_SPEC_RADIANCE_HITDIST]))


@pytest.mark.slow
def test_reblur_ta_pallas_matches_xla(pallas_interpret):
    """REBLUR_DIFFUSE_SPECULAR with the Pallas TA resolvers vs pure XLA (static camera)."""
    d_p, s_p = _run_reblur_ds(4)
    os.environ["NRDTPU_IMPL"] = "xla"
    try:
        d_x, s_x = _run_reblur_ds(4)
    finally:
        os.environ["NRDTPU_IMPL"] = "pallas"
    for a, b, name in ((d_p, d_x, "diff"), (s_p, s_x, "spec")):
        assert np.isfinite(a).all(), name
        corr = np.corrcoef(a[..., :3].ravel(), b[..., :3].ravel())[0, 1]
        assert corr > 0.98, (name, corr)
        assert np.abs(a - b).mean() < 0.05, (name, np.abs(a - b).mean())


def _run_relax_ds(n_frames, size=(128, 96), iterations=None):
    import jax.numpy as jnp
    from nrdtpu.utils.scene import SceneGenerator, SceneSpec

    gen = SceneGenerator(SceneSpec(size=size, noise=0.4), camera_mode="static")
    eng = Engine({0: Denoiser.RELAX_DIFFUSE_SPECULAR}, resource_size=size)
    if iterations is not None:
        from nrdtpu.settings import RelaxSettings
        eng.set_denoiser_settings(0, RelaxSettings(atrousIterationNum=iterations))
    outs = None
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        pool = {
            RT.IN_VIEWZ: fd.view_z,
            RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
            RT.IN_MV: fd.mv,
            RT.IN_DIFF_RADIANCE_HITDIST: np.asarray(fe.relax_pack_radiance_hitdist(
                jnp.asarray(fd.diff_noisy), jnp.asarray(fd.diff_hit_dist))),
            RT.IN_SPEC_RADIANCE_HITDIST: np.asarray(fe.relax_pack_radiance_hitdist(
                jnp.asarray(fd.spec_noisy), jnp.asarray(fd.spec_hit_dist))),
        }
        outs = eng.denoise([0], pool)
    return (np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST]),
            np.asarray(outs[RT.OUT_SPEC_RADIANCE_HITDIST]))


@pytest.mark.slow
def test_relax_atrous_large_strides_pallas(pallas_interpret):
    """The full 8-iteration ladder (strides 1..128) stays on the Pallas path
    (RELAX_Atrous.hlsli / Relax.cpp:274; VERDICT r1 #6). Strides > 4 jitter
    per-block on Pallas vs per-pixel on XLA, and strides >= 64 tap bf16 windows,
    so the comparison is statistical, not exact."""
    d_p, s_p = _run_relax_ds(3, iterations=8)
    os.environ["NRDTPU_IMPL"] = "xla"
    try:
        d_x, s_x = _run_relax_ds(3, iterations=8)
    finally:
        os.environ["NRDTPU_IMPL"] = "pallas"
    for a, b, name in ((d_p, d_x, "diff"), (s_p, s_x, "spec")):
        assert np.isfinite(a).all(), name
        corr = np.corrcoef(a[..., :3].ravel(), b[..., :3].ravel())[0, 1]
        assert corr > 0.95, (name, corr)
        assert np.abs(a[..., :3] - b[..., :3]).mean() < 0.08, name


@pytest.mark.slow
def test_relax_atrous_pallas_matches_xla(pallas_interpret):
    d_p, s_p = _run_relax_ds(3)
    os.environ["NRDTPU_IMPL"] = "xla"
    try:
        d_x, s_x = _run_relax_ds(3)
    finally:
        os.environ["NRDTPU_IMPL"] = "pallas"
    for a, b, name in ((d_p, d_x, "diff"), (s_p, s_x, "spec")):
        assert np.isfinite(a).all(), name
        corr = np.corrcoef(a[..., :3].ravel(), b[..., :3].ravel())[0, 1]
        assert corr > 0.98, (name, corr)
        assert np.abs(a[..., :3] - b[..., :3]).mean() < 0.05, name


def _run_reblur_ds_sh(n_frames, size=(128, 96)):
    import jax.numpy as jnp
    from nrdtpu.utils.scene import SceneGenerator, SceneSpec

    HDP = jnp.asarray([3.0, 0.1, 20.0, -25.0])
    gen = SceneGenerator(SceneSpec(size=size, noise=0.4), camera_mode="static")
    eng = Engine({0: Denoiser.REBLUR_DIFFUSE_SPECULAR_SH}, resource_size=size)
    outs = None
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        dn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.diff_hit_dist),
                                         jnp.asarray(fd.view_z), HDP, 1.0)
        sn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.spec_hit_dist),
                                         jnp.asarray(fd.view_z), HDP,
                                         jnp.asarray(fd.roughness))
        d0, d1 = fe.reblur_pack_sh(jnp.asarray(fd.diff_noisy[..., :3]), dn,
                                   jnp.asarray(fd.normal))
        s0, s1 = fe.reblur_pack_sh(jnp.asarray(fd.spec_noisy[..., :3]), sn,
                                   jnp.asarray(fd.normal))
        pool = {
            RT.IN_VIEWZ: fd.view_z,
            RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
            RT.IN_MV: fd.mv,
            RT.IN_DIFF_SH0: np.asarray(d0), RT.IN_DIFF_SH1: np.asarray(d1),
            RT.IN_SPEC_SH0: np.asarray(s0), RT.IN_SPEC_SH1: np.asarray(s1),
        }
        outs = eng.denoise([0], pool)
    return (np.asarray(outs[RT.OUT_DIFF_SH0]), np.asarray(outs[RT.OUT_SPEC_SH0]),
            np.asarray(outs[RT.OUT_DIFF_SH1]), np.asarray(outs[RT.OUT_SPEC_SH1]))


@pytest.mark.slow
def test_reblur_sh_pallas_matches_xla(pallas_interpret):
    """REBLUR_DIFFUSE_SPECULAR_SH end-to-end: Pallas path (incl. SH reprojection via
    the smb/vmb bundles) vs pure XLA."""
    res_p = _run_reblur_ds_sh(3)
    os.environ["NRDTPU_IMPL"] = "xla"
    try:
        res_x = _run_reblur_ds_sh(3)
    finally:
        os.environ["NRDTPU_IMPL"] = "pallas"
    for a, b, name in ((res_p[0], res_x[0], "diff_sh0"), (res_p[1], res_x[1], "spec_sh0"),
                       (res_p[2], res_x[2], "diff_sh1"), (res_p[3], res_x[3], "spec_sh1")):
        assert np.isfinite(a).all(), name
        corr = np.corrcoef(a[..., :3].ravel(), b[..., :3].ravel())[0, 1]
        assert corr > 0.98, (name, corr)
        assert np.abs(a - b).mean() < 0.05, (name, np.abs(a - b).mean())


def _run_relax_ds_sh(n_frames, size=(128, 96)):
    import jax.numpy as jnp
    from nrdtpu.utils.scene import SceneGenerator, SceneSpec

    gen = SceneGenerator(SceneSpec(size=size, noise=0.4), camera_mode="static")
    eng = Engine({0: Denoiser.RELAX_DIFFUSE_SPECULAR_SH}, resource_size=size)
    outs = None
    for i in range(n_frames):
        fd = gen.frame(i)
        eng.set_common_settings(fd.common_settings)
        d0, d1 = fe.relax_pack_sh(jnp.asarray(fd.diff_noisy[..., :3]),
                                  jnp.asarray(fd.diff_hit_dist),
                                  jnp.asarray(fd.normal))
        s0, s1 = fe.relax_pack_sh(jnp.asarray(fd.spec_noisy[..., :3]),
                                  jnp.asarray(fd.spec_hit_dist),
                                  jnp.asarray(fd.normal))
        pool = {
            RT.IN_VIEWZ: fd.view_z,
            RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
            RT.IN_MV: fd.mv,
            RT.IN_DIFF_SH0: np.asarray(d0), RT.IN_DIFF_SH1: np.asarray(d1),
            RT.IN_SPEC_SH0: np.asarray(s0), RT.IN_SPEC_SH1: np.asarray(s1),
        }
        outs = eng.denoise([0], pool)
    return (np.asarray(outs[RT.OUT_DIFF_SH0]), np.asarray(outs[RT.OUT_SPEC_SH0]),
            np.asarray(outs[RT.OUT_DIFF_SH1]), np.asarray(outs[RT.OUT_SPEC_SH1]))


@pytest.mark.slow
def test_relax_sh_pallas_matches_xla(pallas_interpret):
    """RELAX_DIFFUSE_SPECULAR_SH end-to-end: Pallas path (SH through prepass, TA
    smb/vmb, history fix, a-trous) vs pure XLA."""
    res_p = _run_relax_ds_sh(3)
    os.environ["NRDTPU_IMPL"] = "xla"
    try:
        res_x = _run_relax_ds_sh(3)
    finally:
        os.environ["NRDTPU_IMPL"] = "pallas"
    for a, b, name in ((res_p[0], res_x[0], "diff_sh0"), (res_p[1], res_x[1], "spec_sh0"),
                       (res_p[2], res_x[2], "diff_sh1"), (res_p[3], res_x[3], "spec_sh1")):
        assert np.isfinite(a).all(), name
        corr = np.corrcoef(a[..., :3].ravel(), b[..., :3].ravel())[0, 1]
        assert corr > 0.98, (name, corr)
        assert np.abs(a - b).mean() < 0.05, (name, np.abs(a - b).mean())


@pytest.mark.slow
def test_reblur_performance_mode(pallas_interpret):
    """enablePerformanceMode: 6-tap Poisson + bilinear-only history sampling
    (REBLUR_Config.hlsli:196-238). Output must stay finite and close to quality mode."""
    from nrdtpu.settings import ReblurSettings

    def run(perf):
        import jax.numpy as jnp
        from nrdtpu.utils.scene import SceneGenerator, SceneSpec

        HDP = jnp.asarray([3.0, 0.1, 20.0, -25.0])
        size = (128, 96)
        gen = SceneGenerator(SceneSpec(size=size, noise=0.4), camera_mode="static")
        eng = Engine({0: Denoiser.REBLUR_DIFFUSE_SPECULAR}, resource_size=size)
        s = ReblurSettings()
        s.enablePerformanceMode = perf
        eng.set_denoiser_settings(0, s)
        outs = None
        for i in range(3):
            fd = gen.frame(i)
            eng.set_common_settings(fd.common_settings)
            dn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.diff_hit_dist),
                                             jnp.asarray(fd.view_z), HDP, 1.0)
            sn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.spec_hit_dist),
                                             jnp.asarray(fd.view_z), HDP,
                                             jnp.asarray(fd.roughness))
            pool = {
                RT.IN_VIEWZ: fd.view_z,
                RT.IN_NORMAL_ROUGHNESS: gen.packed_normal_roughness(fd),
                RT.IN_MV: fd.mv,
                RT.IN_DIFF_RADIANCE_HITDIST: np.asarray(
                    fe.reblur_pack_radiance_hitdist(jnp.asarray(fd.diff_noisy), dn)),
                RT.IN_SPEC_RADIANCE_HITDIST: np.asarray(
                    fe.reblur_pack_radiance_hitdist(jnp.asarray(fd.spec_noisy), sn)),
            }
            outs = eng.denoise([0], pool)
        return np.asarray(outs[RT.OUT_DIFF_RADIANCE_HITDIST])

    d_perf = run(True)
    d_qual = run(False)
    assert np.isfinite(d_perf).all()
    corr = np.corrcoef(d_perf[..., :3].ravel(), d_qual[..., :3].ravel())[0, 1]
    assert corr > 0.95, corr


@pytest.mark.slow
def test_reblur_checkerboard_pallas(pallas_interpret):
    """Checkerboard on the Pallas path stays finite and close to the XLA path."""
    import jax.numpy as jnp
    from nrdtpu.settings import CheckerboardMode, ReblurSettings
    from nrdtpu.utils.scene import SceneGenerator, SceneSpec

    size = (128, 96)
    w, h = size
    HDP = jnp.asarray([3.0, 0.1, 20.0, -25.0])

    def run(n_frames=3):
        gen = SceneGenerator(SceneSpec(size=size, noise=0.3), camera_mode="static")
        eng = Engine({0: Denoiser.REBLUR_DIFFUSE_SPECULAR}, resource_size=size)
        s = ReblurSettings()
        s.checkerboardMode = CheckerboardMode.BLACK
        eng.set_denoiser_settings(0, s)
        outs = None
        for i in range(n_frames):
            fd = gen.frame(i)
            eng.set_common_settings(fd.common_settings)
            dn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.diff_hit_dist),
                                             jnp.asarray(fd.view_z), HDP, 1.0)
            sn = fe.reblur_get_norm_hit_dist(jnp.asarray(fd.spec_hit_dist),
                                             jnp.asarray(fd.view_z), HDP,
                                             jnp.asarray(fd.roughness))
            diff = np.asarray(fe.reblur_pack_radiance_hitdist(
                jnp.asarray(fd.diff_noisy), dn))
            spec = np.asarray(fe.reblur_pack_radiance_hitdist(
                jnp.asarray(fd.spec_noisy), sn))
            cb = (np.arange(w)[None, :] + np.arange(h)[:, None] + i) & 1
            has = cb == 0
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

    a = run()
    os.environ["NRDTPU_IMPL"] = "xla"
    try:
        b = run()
    finally:
        os.environ["NRDTPU_IMPL"] = "pallas"
    assert np.isfinite(a).all()
    corr = np.corrcoef(a[..., :3].ravel(), b[..., :3].ravel())[0, 1]
    assert corr > 0.97, corr


@pytest.mark.slow
def test_reblur_band_matches_fused(pallas_interpret, monkeypatch):
    """REBLUR HistoryFix+Blur+PostBlur band pipeline (kernels/reblur_band.py,
    opt-in NRDTPU_REBLUR_BAND=1) vs the default 3-launch fused chain.

    The band re-schedules the SAME tap formulas through sliding VMEM buffers;
    block-boundary jitter differs, so the comparison is statistical. Interpret
    mode validates semantics only - Mosaic legality needs a real-TPU run
    (ARCHITECTURE.md section 8)."""
    import os

    def run(band):
        monkeypatch.setenv("NRDTPU_REBLUR_BAND", "1" if band else "0")
        return _run_reblur_ds(3, size=(128, 96))

    d_b, s_b = run(True)
    d_f, s_f = run(False)
    for a, b, name in ((d_b, d_f, "diff"), (s_b, s_f, "spec")):
        assert np.isfinite(a).all(), name
        corr = np.corrcoef(a[..., :3].ravel(), b[..., :3].ravel())[0, 1]
        assert corr > 0.98, (name, corr)
        assert np.abs(a - b).mean() < 0.05, (name, np.abs(a - b).mean())
