"""Parity oracle tests: the engine's XLA reference path vs a numpy transliteration
of the reference HLSL (tests/oracle/), at >= 40 dB PSNR (BASELINE.md's quality metric).

The oracle transliterates the shaders from /root/reference; the engine's host constants
(camera matrices, rotators - pinned by test_camera.py) feed both sides. A formula change
in TA / spatial filter / history fix diverges the two implementations and fails here at
40 dB instead of slipping under the scene-level convergence floors.

Scene: slanted wall with a depth step and lumpy normals, noisy YCoCg signal, camera
translating sideways (fractional reprojection + disocclusion at the step edge).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nrdtpu import frontend as fe
from nrdtpu.engine import Engine
from nrdtpu.settings import CommonSettings, Denoiser
from nrdtpu.passes.reblur import kernels as K

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from oracle import hlsl as H  # noqa: E402
from oracle import reblur as O  # noqa: E402

W, H_ = 96, 64
RNG = np.random.default_rng(42)


def psnr(ref, x):
    ref = np.asarray(ref, np.float64)
    x = np.asarray(x, np.float64)
    mse = np.mean((ref - x) ** 2)
    peak = max(np.max(np.abs(ref)), 1e-6)
    return 10.0 * np.log10(peak * peak / max(mse, 1e-30))


def _camera(translate_x=0.0, denoiser=Denoiser.REBLUR_DIFFUSE):
    eng = Engine({0: denoiser}, resource_size=(W, H_))
    cs = CommonSettings()
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.0
    proj[2, 2] = 1.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    ident = np.eye(4, dtype=np.float32)
    view_prev = ident.copy()
    view = ident.copy()
    view[0, 3] = -translate_x  # world-to-view: camera moved +x
    cs.viewToClipMatrix = cs.viewToClipMatrixPrev = proj.flatten(order="F")
    cs.worldToViewMatrix = view.flatten(order="F")
    cs.worldToViewMatrixPrev = view_prev.flatten(order="F")
    cs.resourceSize = cs.resourceSizePrev = cs.rectSize = cs.rectSizePrev = (W, H_)
    cs.motionVectorScale = (1.0, 1.0, 0.0)
    eng.set_common_settings(cs)
    eng.set_common_settings(cs)  # 2nd frame: prev state valid, no reset
    inst = eng._instances[0]
    sc = eng._shared_consts()
    dc = inst.frame_constants(eng._consts, eng._settings[0])
    return sc, dc, inst.config


def _scene(sc):
    """Depth/normal/signal planes + true reprojection MV for the sc camera pair."""
    uv = O._pixel_uv(H_, W)
    # slanted wall: z = 8 + 3u + 1.5v, with a closer box in the middle
    view_z = 8.0 + 3.0 * uv[..., 0] + 1.5 * uv[..., 1]
    box = (np.abs(uv[..., 0] - 0.55) < 0.15) & (np.abs(uv[..., 1] - 0.5) < 0.2)
    view_z = np.where(box, view_z - 2.0, view_z).astype(np.float32)
    # lumpy normals around +z
    n = np.stack([0.25 * np.sin(uv[..., 0] * 21.0), 0.2 * np.cos(uv[..., 1] * 17.0),
                  np.ones((H_, W), np.float32)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    roughness = (0.3 + 0.4 * uv[..., 0]).astype(np.float32)
    nr = np.asarray(fe.pack_normal_roughness(
        jnp.asarray(n), jnp.asarray(roughness), jnp.zeros((H_, W), jnp.float32)))

    # screen-space MV from true geometry: uv_prev(X) - uv
    frustum = np.asarray(sc["frustum"], np.float32)
    xv = H.reconstruct_view_position(uv, frustum, view_z, 0.0)
    x = H.rotate_vector(sc["view_to_world"], xv)  # camera-relative world
    uv_prev = H.get_screen_uv(sc["world_to_clip_prev"],
                              x + np.asarray(sc["camera_delta"])[None, None, :])
    mv = np.concatenate([(uv_prev - uv), np.zeros((H_, W, 1), np.float32)],
                        -1).astype(np.float32)

    signal = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
    signal[..., 1:3] -= 0.5  # YCoCg chroma is signed
    return dict(view_z=view_z.astype(np.float32), nr=nr, mv=mv, signal=signal,
                n=n, roughness=roughness)


class TestSpatialFilterOracle:
    @pytest.mark.parametrize("mode", ["blur", "post_blur"])
    def test_blur_matches_oracle(self, mode):
        sc, dc, config = _camera()
        s = _scene(sc)
        data1 = RNG.uniform(0.0, 30.0, (H_, W)).astype(np.float32)

        ref = O.diffuse_spatial_filter(sc, dc, mode, s["signal"], s["view_z"],
                                       s["nr"], data1)
        got, _ = K.diffuse_spatial_filter(
            sc, dc, K.BLUR if mode == "blur" else K.POST_BLUR, jnp.asarray(s["signal"]),
            jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]), jnp.asarray(data1), config,
            occlusion=False, pallas=False)
        p = psnr(ref, got)
        assert p >= 40.0, f"{mode}: PSNR vs HLSL oracle = {p:.1f} dB"


class TestHistoryFixOracle:
    def test_history_fix_matches_oracle(self):
        sc, dc, config = _camera()
        s = _scene(sc)
        # mixed regime: converged in some areas, fresh (stride > 0) in others
        data1 = np.where(np.arange(W)[None, :] < W // 2, 1.0, 20.0).astype(np.float32)
        data1 = np.broadcast_to(data1, (H_, W)).copy()
        fast = RNG.uniform(0.0, 1.0, (H_, W)).astype(np.float32)

        ref_sig, ref_fast = O.history_fix_diffuse(sc, dc, s["view_z"], s["nr"], data1,
                                                  s["signal"], fast)
        got_sig, got_fast, _ = K.history_fix(
            sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]), jnp.asarray(data1),
            jnp.asarray(data1), jnp.asarray(s["signal"]), jnp.asarray(fast), config,
            is_diffuse=True, occlusion=False, anti_firefly=False, pallas=False)
        p_sig = psnr(ref_sig, got_sig)
        p_fast = psnr(ref_fast, got_fast)
        assert p_sig >= 40.0, f"history fix signal: {p_sig:.1f} dB"
        assert p_fast >= 40.0, f"history fix fast: {p_fast:.1f} dB"


class TestTemporalAccumulationOracle:
    @pytest.mark.parametrize("translate_x", [0.0, 0.013])
    def test_ta_diffuse_matches_oracle(self, translate_x):
        sc, dc, config = _camera(translate_x)
        s = _scene(sc)
        prev_view_z = s["view_z"]  # same surface; reprojection decides validity
        prev_nr = s["nr"]
        accum = RNG.uniform(0.0, 40.0, (H_, W)).astype(np.float32)
        prev_internal = {
            "diff_accum": jnp.asarray(accum),
            "spec_accum": jnp.asarray(accum),
            "material_id": jnp.zeros((H_, W), jnp.float32),
        }
        history = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        fast_hist = RNG.uniform(0.0, 1.0, (H_, W)).astype(np.float32)

        ref = O.ta_diffuse(sc, dc, s["view_z"], s["nr"], s["mv"], prev_view_z, prev_nr,
                           accum, accum, np.zeros((H_, W), np.float32), s["signal"],
                           history, fast_hist)

        sm = K.surface_motion_reprojection(
            sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]), jnp.asarray(s["mv"]),
            jnp.asarray(prev_view_z), jnp.asarray(prev_nr), prev_internal, config)
        got_diff, got_fast, got_accum, _ = K.temporal_accumulation_diffuse(
            sc, dc, sm, jnp.asarray(s["signal"]), jnp.asarray(history),
            jnp.asarray(fast_hist), config, occlusion=False)

        p_fb = psnr(ref["fbits"], sm["fbits"])
        p_acc = psnr(ref["accum_speed"], got_accum)
        p_diff = psnr(ref["diff"], got_diff)
        p_fast = psnr(ref["fast"], got_fast)
        assert p_fb >= 40.0, f"fbits: {p_fb:.1f} dB"
        assert p_acc >= 40.0, f"accum speed: {p_acc:.1f} dB"
        assert p_diff >= 40.0, f"TA diffuse: {p_diff:.1f} dB"
        assert p_fast >= 40.0, f"TA fast history: {p_fast:.1f} dB"


class TestSpecularTAOracle:
    """Specular TA vs the HLSL oracle (REBLUR_TemporalAccumulation.hlsli:306-830).

    Covers curvature-along-motion, GetXvirtual, the virtual-motion confidence
    cascade (roughness/normal/parallax/prev-prev), smb/vmb blend, responsive
    accumulation, firefly, fast history - the 930-line kernel VERDICT r3 flagged
    as oracle-less."""

    @pytest.mark.parametrize("translate_x", [0.0, 0.013])
    def test_ta_specular_matches_oracle(self, translate_x):
        sc, dc, config = _camera(translate_x,
                                 denoiser=Denoiser.REBLUR_DIFFUSE_SPECULAR)
        s = _scene(sc)
        prev_view_z = s["view_z"]
        prev_nr = s["nr"]
        accum = RNG.uniform(0.0, 40.0, (H_, W)).astype(np.float32)
        prev_internal = {
            "diff_accum": jnp.asarray(accum),
            "spec_accum": jnp.asarray(accum),
            "material_id": jnp.zeros((H_, W), jnp.float32),
        }
        spec_input = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        spec_input[..., 1:3] -= 0.5
        history = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        fast_hist = RNG.uniform(0.0, 1.0, (H_, W)).astype(np.float32)
        prev_hdt = RNG.uniform(0.0, 5.0, (H_, W)).astype(np.float32)
        hdt_in = spec_input[..., 3]  # ExtractHitDist(spec): prepass off (Preload :31)

        ref = O.ta_specular(sc, dc, s["view_z"], s["nr"], s["mv"], prev_view_z,
                            prev_nr, accum, accum, np.zeros((H_, W), np.float32),
                            spec_input, history, fast_hist, hdt_in, prev_hdt,
                            has_prepass_hitdist=False)

        sm = K.surface_motion_reprojection(
            sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]),
            jnp.asarray(s["mv"]), jnp.asarray(prev_view_z), jnp.asarray(prev_nr),
            prev_internal, config)
        got = K.temporal_accumulation_specular(
            sc, dc, sm, jnp.asarray(spec_input), jnp.asarray(history),
            jnp.asarray(fast_hist), jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]),
            jnp.asarray(prev_view_z), jnp.asarray(prev_nr), prev_internal,
            jnp.asarray(hdt_in), jnp.asarray(prev_hdt), config,
            occlusion=False, has_prepass_hitdist=False)

        checks = [
            ("hdt", ref["hdt"], got["hit_dist_for_tracking"]),
            ("virtual amount", ref["virtual_history_amount"],
             got["virtual_history_amount"]),
            ("accum speed", ref["accum_speed"], got["accum_speed"]),
            ("spec", ref["spec"], got["spec"]),
            ("fast", ref["fast"], got["fast"]),
        ]
        # With an exactly static camera the curvature MIX DIRECTION is pure float
        # noise (deltaUv ~ 1e-6 px, amplified 256x by the 1/256 floor) - the
        # reference's own comment: "curvature = 0 on static objects if camera is
        # static". Direction is well-conditioned only under real parallax.
        if translate_x != 0.0:
            checks.insert(1, ("curvature", ref["curvature"], got["curvature"]))
        for name, r, g in checks:
            p = psnr(r, g)
            assert p >= 40.0, f"TA specular {name}: {p:.1f} dB vs HLSL oracle"

        # fbits are binary: a tap whose plane distance lands within float-eps of
        # the threshold legitimately flips - assert the flip RATE instead of PSNR
        ri = np.asarray(ref["fbits"]).astype(np.int64)
        gi = (np.asarray(sm["fbits"]) + np.asarray(got["fbits_vmb"])).astype(np.int64)
        flip_px = np.mean((ri ^ gi) != 0)
        assert flip_px < 0.01, f"TA specular fbits: {flip_px:.2%} pixels flipped"


class TestTemporalStabilizationOracle:
    """TS vs the HLSL oracle (REBLUR_TemporalStabilization.hlsli:93-367):
    3x3 moments + RCRS, mode-2 antilag, clamped history blend, virtual-motion
    history combine, accumulation-speed increment."""

    @pytest.mark.parametrize("translate_x", [0.0, 0.013])
    def test_ts_matches_oracle(self, translate_x):
        sc, dc, config = _camera(translate_x,
                                 denoiser=Denoiser.REBLUR_DIFFUSE_SPECULAR)
        s = _scene(sc)
        # de-alias: the synthetic static camera lands smb/vmb uvs EXACTLY on texel
        # centers, where floor(pos - 0.5) legitimately differs between numpy and
        # XLA float rounding; with random fbits the footprint slots then disagree.
        # A fractional mv offset moves every uv off the measure-zero boundary
        # (real pipelines never sit exactly on it with random occlusion bits).
        s["mv"] = s["mv"] + np.asarray([0.37 / W, 0.23 / H_, 0.0], np.float32)
        data1_d = RNG.uniform(0.0, 30.0, (H_, W)).astype(np.float32)
        data1_s = RNG.uniform(0.0, 30.0, (H_, W)).astype(np.float32)
        fbits = RNG.integers(0, 256, (H_, W)).astype(np.float32)
        curvature = RNG.uniform(-0.2, 0.2, (H_, W)).astype(np.float32)
        amount = RNG.uniform(0.0, 1.0, (H_, W)).astype(np.float32)
        diff = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        spec = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        diff[..., 1:3] -= 0.5
        spec[..., 1:3] -= 0.5
        d_hist = RNG.uniform(0.0, 1.0, (H_, W)).astype(np.float32)
        s_hist = RNG.uniform(0.0, 1.0, (H_, W)).astype(np.float32)

        ref = O.temporal_stabilization(sc, dc, s["view_z"], s["nr"], s["mv"],
                                       data1_d, data1_s, fbits, curvature, amount,
                                       diff, spec, d_hist, s_hist)
        got = K.temporal_stabilization(
            sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]),
            jnp.asarray(s["mv"]), jnp.asarray(data1_d), jnp.asarray(data1_s),
            jnp.asarray(fbits), jnp.asarray(curvature), jnp.asarray(amount),
            jnp.asarray(diff), jnp.asarray(spec), jnp.asarray(d_hist),
            jnp.asarray(s_hist), None, None, config,
            has_diffuse=True, has_specular=True, has_prepass=False)

        for name in ["diff", "spec", "diff_luma_stab", "spec_luma_stab",
                     "data1_diff", "data1_spec"]:
            p = psnr(ref[name], np.asarray(got[name]))
            assert p >= 40.0, f"TS {name}: {p:.1f} dB vs HLSL oracle"


class TestSigmaOracle:
    """SIGMA Blur/PostBlur + TemporalStabilization vs tests/oracle/sigma.py
    (SIGMA_Blur.hlsli:77-269, SIGMA_TemporalStabilization.hlsli:46-226).

    Uniform live tiles (tileValue = 1): the tile machinery is pinned by
    tests/test_sigma.py; this pins the filter/stabilizer formulas at 40 dB."""

    def _sigma_scene(self, sc, translucent=False):
        s = _scene(sc)
        uv = O._pixel_uv(H_, W)
        fp16_max = np.float32(65504.0)
        blob = (np.sin(6.0 * uv[..., 0] * 2 - 1) *
                np.sin(5.0 * uv[..., 1] * 2 + 1.3) +
                0.3 * np.sin(13.0 * (2 * uv[..., 0] - 1) * (2 * uv[..., 1] - 1)))
        penumbra = np.where(blob > 0.8, fp16_max,
                            np.where(blob < -0.9, 0.0,
                                     0.2 + 2.5 * (blob + 0.9) / 1.7)).astype(np.float32)
        s["penumbra"] = penumbra
        th, tw = -(-H_ // 16), -(-W // 16)
        s["tiles"] = jnp.stack([jnp.zeros((th, tw), jnp.float32),
                                jnp.ones((th, tw), jnp.float32)], -1)
        if translucent:
            s["translucency"] = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        return s

    @pytest.mark.parametrize("first_pass", [True, False])
    def test_blur_matches_oracle(self, first_pass):
        from nrdtpu.passes.sigma import kernels as SK
        from oracle import sigma as OS

        sc, dc, config = _camera(denoiser=Denoiser.SIGMA_SHADOW)
        sc = dict(sc)
        sc["plane_dist_sensitivity"] = dc["plane_dist_sensitivity"]
        s = self._sigma_scene(sc)
        if first_pass:
            shadow_in = None
        else:
            shadow_in = np.sqrt(
                RNG.uniform(0.0, 1.0, (H_, W, 1)).astype(np.float32))

        ref_pen, ref_shadow = OS.blur(sc, dc, s["penumbra"], shadow_in,
                                      s["view_z"], s["nr"],
                                      first_pass=first_pass, translucent=False)
        got_pen, got_shadow = SK.blur(
            sc, dc, jnp.asarray(s["penumbra"]),
            None if shadow_in is None else jnp.asarray(shadow_in),
            jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]), s["tiles"],
            first_pass=first_pass, translucent=False, channels=1,
            normal_encoding=config.normal_encoding,
            roughness_encoding=config.roughness_encoding)
        # lit pixels carry FP16_MAX penumbra: compare on the finite-work mask
        live = ref_pen < 1e4
        p_pen = psnr(ref_pen[live], np.asarray(got_pen)[live])
        p_sh = psnr(ref_shadow, got_shadow)
        assert p_pen >= 40.0, f"blur penumbra (first={first_pass}): {p_pen:.1f} dB"
        assert p_sh >= 40.0, f"blur shadow (first={first_pass}): {p_sh:.1f} dB"

    @pytest.mark.parametrize("translate_x", [0.0, 0.013])
    def test_ts_matches_oracle(self, translate_x):
        from nrdtpu.passes.sigma import kernels as SK
        from oracle import sigma as OS

        sc, dc, config = _camera(translate_x, denoiser=Denoiser.SIGMA_SHADOW)
        sc = dict(sc)
        sc["plane_dist_sensitivity"] = dc["plane_dist_sensitivity"]
        s = self._sigma_scene(sc)
        s["mv"] = s["mv"] + np.asarray([0.37 / W, 0.23 / H_, 0.0], np.float32)
        shadow_packed = np.sqrt(RNG.uniform(0.0, 1.0, (H_, W, 1))).astype(np.float32)
        history = np.sqrt(RNG.uniform(0.0, 1.0, (H_, W, 1))).astype(np.float32)
        prev_view_z = s["view_z"] + RNG.uniform(-0.01, 0.01, (H_, W)).astype(np.float32)
        prev_len = RNG.integers(0, 8, (H_, W)).astype(np.float32)

        ref_out, ref_z, ref_len = OS.temporal_stabilization(
            sc, dc, s["view_z"], s["mv"], s["penumbra"], shadow_packed,
            history, prev_view_z, prev_len)
        got_out, got_z, got_len = SK.temporal_stabilization(
            sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(s["mv"]),
            jnp.asarray(s["penumbra"]), jnp.asarray(shadow_packed),
            jnp.asarray(history), jnp.asarray(prev_view_z),
            jnp.asarray(prev_len), s["tiles"], channels=1)
        p_out = psnr(ref_out, got_out)
        assert p_out >= 40.0, f"TS shadow: {p_out:.1f} dB vs HLSL oracle"
        assert psnr(ref_z, got_z) >= 40.0
        # history length is 3-bit integral: exact match on >= 99% of pixels
        match = np.mean(np.asarray(got_len) == ref_len)
        assert match >= 0.99, f"TS history length match {match:.4f}"


class TestRelaxAtrousOracle:
    """RELAX a-trous iterations >= 1 vs tests/oracle/relax.py
    (RELAX_Atrous.hlsli; edge stops, variance propagation via w^2, big-step
    PCG jitter). Steps 1/4 exercise the strict path, 32 the jittered one."""

    @pytest.mark.parametrize("step_size", [1, 4, 32])
    def test_atrous_matches_oracle(self, step_size):
        from nrdtpu.passes.relax import kernels as RK
        from oracle import relax as OR

        sc, dc, config = _camera(denoiser=Denoiser.RELAX_DIFFUSE_SPECULAR)
        # RELAX derives world-space frustum vectors from the camera set
        # (Relax.cpp:70-80); the instance owns that augmentation
        from nrdtpu.engine import Engine as _E
        eng = _E({0: Denoiser.RELAX_DIFFUSE_SPECULAR}, resource_size=(W, H_))
        sc = {k: (np.asarray(v) if hasattr(v, "shape") else v)
              for k, v in eng._instances[0].__class__._relax_sc(
                  eng._instances[0], sc).items()}
        s = _scene(sc)
        history_length = RNG.uniform(0.0, 30.0, (H_, W)).astype(np.float32)
        conf = RNG.uniform(0.0, 1.0, (H_, W)).astype(np.float32)
        diff = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        spec = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        diff[..., 3] = RNG.uniform(0.0, 0.2, (H_, W))   # variance plane
        spec[..., 3] = RNG.uniform(0.0, 0.2, (H_, W))

        ref = OR.atrous(sc, dc, s["view_z"], s["nr"], history_length, conf,
                        diff, spec, step_size=step_size)
        got = RK.atrous(sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]),
                        jnp.asarray(history_length), jnp.asarray(conf),
                        jnp.asarray(diff), jnp.asarray(spec), config,
                        step_size=step_size, is_first=False, is_last=False,
                        pallas=False)
        for name in ("diff", "spec"):
            p = psnr(ref[name][..., :3], np.asarray(got[name])[..., :3])
            pv = psnr(ref[name][..., 3], np.asarray(got[name])[..., 3])
            assert p >= 40.0, f"atrous {name} rgb (step {step_size}): {p:.1f} dB"
            assert pv >= 40.0, f"atrous {name} var (step {step_size}): {pv:.1f} dB"


class TestRelaxTAOracle:
    """RELAX TemporalAccumulation (diff + spec: smb 12-tap footprint, curvature
    along motion, vmb reprojection, confidence cascade) vs tests/oracle/relax.py
    (RELAX_TemporalAccumulation.hlsli:15-929)."""

    @pytest.mark.parametrize("translate_x", [0.0, 0.013])
    def test_ta_matches_oracle(self, translate_x):
        from nrdtpu.passes.relax import kernels as RK
        from oracle import relax as OR

        sc, dc, config = _camera(translate_x,
                                 denoiser=Denoiser.RELAX_DIFFUSE_SPECULAR)
        from nrdtpu.engine import Engine as _E
        eng = _E({0: Denoiser.RELAX_DIFFUSE_SPECULAR}, resource_size=(W, H_))
        inst = eng._instances[0]
        sc = {k: (np.asarray(v) if hasattr(v, "shape") else v)
              for k, v in inst.__class__._relax_sc(inst, sc).items()}
        s = _scene(sc)
        # de-alias uv off exact texel centers (see REBLUR TS oracle note above)
        s["mv"] = s["mv"] + np.asarray([0.37 / W, 0.23 / H_, 0.0], np.float32)
        diff = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        spec = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        spec[..., 3] = RNG.uniform(0.0, 4.0, (H_, W))  # hitT

        import jax
        prev_nr = np.asarray(jax.device_get(RK.pack_prev_normal_roughness(
            jnp.asarray(s["n"]), jnp.asarray(s["roughness"]))))
        state = {
            "history_length": RNG.uniform(0.0, 30.0, (H_, W)).astype(np.float32),
            "normal_roughness_prev": prev_nr,
            "material_id_prev": np.zeros((H_, W), np.float32),
            "view_z_prev": (s["view_z"]
                            + RNG.uniform(-0.005, 0.005, (H_, W))).astype(np.float32),
            "diff_illum_prev": RNG.uniform(0, 1, (H_, W, 4)).astype(np.float32),
            "diff_responsive_prev": RNG.uniform(0, 1, (H_, W, 4)).astype(np.float32),
            "spec_illum_prev": RNG.uniform(0, 1, (H_, W, 4)).astype(np.float32),
            "spec_responsive_prev": RNG.uniform(0, 1, (H_, W, 4)).astype(np.float32),
            "reflection_hit_t": RNG.uniform(0.01, 4.0, (H_, W)).astype(np.float32),
        }

        ref = OR.temporal_accumulation(sc, dc, s["view_z"], s["nr"], s["mv"],
                                       diff, spec, state)
        got = RK.temporal_accumulation(
            sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(s["nr"]),
            jnp.asarray(s["mv"]), jnp.asarray(diff), jnp.asarray(spec),
            {k: jnp.asarray(v) for k, v in state.items()}, config, pallas=False)

        for name in ["history_length", "diff", "diff_fast", "spec", "spec_fast",
                     "reflection_hit_t", "spec_reprojection_confidence"]:
            p = psnr(ref[name], np.asarray(got[name]))
            assert p >= 40.0, f"RELAX TA {name}: {p:.1f} dB vs HLSL oracle"


class TestRelaxHistoryClampingOracle:
    """RELAX HistoryClamping (YCoCg sigma box, antilag acceleration, history
    reset, 2nd-moment correction) vs tests/oracle/relax.py
    (RELAX_HistoryClamping.hlsli:52-330)."""

    def test_history_clamping_matches_oracle(self):
        from nrdtpu.passes.relax import kernels as RK
        from oracle import relax as OR

        sc, dc, config = _camera(denoiser=Denoiser.RELAX_DIFFUSE_SPECULAR)
        s = _scene(sc)
        noisy_d = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        noisy_s = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        slow_d = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        slow_s = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        resp_d = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        resp_s = RNG.uniform(0.0, 1.0, (H_, W, 4)).astype(np.float32)
        hl = RNG.uniform(0.0, 30.0, (H_, W)).astype(np.float32)

        ref = OR.history_clamping(sc, dc, s["view_z"], noisy_d, noisy_s,
                                  slow_d, slow_s, resp_d, resp_s, hl)
        got = RK.history_clamping(
            sc, dc, jnp.asarray(s["view_z"]), jnp.asarray(noisy_d),
            jnp.asarray(noisy_s), jnp.asarray(slow_d), jnp.asarray(slow_s),
            jnp.asarray(resp_d), jnp.asarray(resp_s), jnp.asarray(hl), config,
            pallas=False)
        for oname, gname in (("diff", "diff_slow"), ("diff_fast", "diff_resp"),
                             ("spec", "spec_slow"), ("spec_fast", "spec_resp")):
            # .a of diff responsive: HLSL writes literal 0, engine carries the
            # TA's fast .a (zero in the pipeline) - compare rgb for fast planes
            a = ref[oname][..., :3] if oname.endswith("fast") else ref[oname]
            b = np.asarray(got[gname])
            b = b[..., :3] if oname.endswith("fast") else b
            p = psnr(a, b)
            assert p >= 40.0, f"history clamping {oname}: {p:.1f} dB"
