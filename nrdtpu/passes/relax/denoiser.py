"""RELAX denoiser instances - pass-graph wiring for all 6 variants.

Graph from Source/Relax.cpp:182-293 + Source/Denoisers/Relax_DiffuseSpecular.hpp. The
ping/pong transient juggling (5 a-trous binding variants, Relax.cpp:265-274) disappears:
iterations are a Python loop of pure calls, XLA bufferizes.

State (permanent pool, Relax_DiffuseSpecular.hpp:18-41):
  diff/spec_illum_prev            (h, w, 4)  slow history: rgb + 2nd moment
  diff/spec_responsive_prev       (h, w, 4)  fast history: rgb (+ spec: minHitDist3x3)
  reflection_hit_t                (h, w)
  history_length                  (h, w)     0..255 (stored 8-bit-quantized)
  normal_roughness_prev           (h, w, 4)  RGBA8-packed 0.5*n+0.5, roughness
  material_id_prev, view_z_prev   (h, w)
  [+ SH planes for *_SH variants]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...settings import (
    RELAX_MAX_HISTORY_FRAME_NUM,
    CheckerboardMode,
    Denoiser,
    HitDistanceReconstructionMode,
    RelaxSettings,
    ResourceType,
)
from ... import math as nm
from ..reblur import kernels as RK  # hit-dist reconstruction is shared machinery
from . import kernels as K

RT = ResourceType


class RelaxDenoiser:
    def __init__(self, config):
        self.config = config
        d = config.denoiser
        self.sh = d.name.endswith("_SH")
        self.has_diffuse = "DIFFUSE" in d.name
        self.has_specular = "SPECULAR" in d.name
        self._s = RelaxSettings()

    def static_key(self, s: RelaxSettings):
        return (s.checkerboardMode, s.hitDistanceReconstructionMode, s.enableAntiFirefly,
                min(max(s.atrousIterationNum, 2), 8), s.enableRoughnessEdgeStopping)

    def specialize(self, s: RelaxSettings):
        self._s = s

    def init_state(self):
        w, h = self.config.rect_size
        state = {
            "history_length": jnp.zeros((h, w), jnp.float32),
            "normal_roughness_prev": jnp.full((h, w, 4), 1.0 / 255.0, jnp.float32),
            "material_id_prev": jnp.zeros((h, w), jnp.float32),
            "view_z_prev": jnp.full((h, w), 1e7, jnp.float32),
        }
        for name, present in (("diff", self.has_diffuse), ("spec", self.has_specular)):
            if not present:
                continue
            # rgb history rides bf16 (the RGBA16f analogue, Relax.cpp pool formats);
            # .w carries the accumulated 2nd moment - kept f32: variance comes from
            # the m2 - m1^2 cancellation, where 8 mantissa bits visibly noise the
            # edge-stopping phi (the reference has 10 fp16 bits there)
            state[f"{name}_illum_prev"] = jnp.zeros((h, w, 4), jnp.float32)
            state[f"{name}_responsive_prev"] = jnp.zeros((h, w, 4), jnp.float32)
            if self.sh:
                state[f"{name}_sh_prev"] = jnp.zeros((h, w, 4), jnp.bfloat16)
                state[f"{name}_sh_responsive_prev"] = jnp.zeros((h, w, 4), jnp.bfloat16)
        if self.has_specular:
            state["reflection_hit_t"] = jnp.zeros((h, w), jnp.float32)
        return state

    # -- AddSharedConstants_Relax (Relax.cpp:60-180), denoiser part -----------------
    def frame_constants(self, consts: dict, s: RelaxSettings) -> dict:
        reset = consts["reset_history"] > 0.0
        f32 = np.float32

        def cap(v):
            return 0.0 if reset else float(min(v, RELAX_MAX_HISTORY_FRAME_NUM))

        return {
            "spec_max_accumulated_frame_num": f32(cap(s.specularMaxAccumulatedFrameNum)),
            "spec_max_fast_accumulated_frame_num": f32(
                cap(s.specularMaxFastAccumulatedFrameNum)),
            "diff_max_accumulated_frame_num": f32(cap(s.diffuseMaxAccumulatedFrameNum)),
            "diff_max_fast_accumulated_frame_num": f32(
                cap(s.diffuseMaxFastAccumulatedFrameNum)),
            "roughness_fraction": f32(s.roughnessFraction),
            "spec_variance_boost": f32(s.specularVarianceBoost),
            "diff_blur_radius": f32(s.diffusePrepassBlurRadius),
            "spec_blur_radius": f32(s.specularPrepassBlurRadius),
            "depth_threshold": f32(s.depthThreshold),
            "lobe_angle_fraction": f32(s.lobeAngleFraction),
            "spec_lobe_angle_slack": f32(np.radians(s.specularLobeAngleSlack)),
            "history_fix_edge_stopping_normal_power": f32(
                s.historyFixEdgeStoppingNormalPower),
            "roughness_edge_stopping_relaxation": f32(s.roughnessEdgeStoppingRelaxation),
            "normal_edge_stopping_relaxation": f32(s.normalEdgeStoppingRelaxation),
            "color_box_sigma_scale": f32(s.historyClampingColorBoxSigmaScale),
            "history_acceleration_amount": f32(s.antilagSettings.accelerationAmount),
            "history_reset_temporal_sigma_scale": f32(s.antilagSettings.temporalSigmaScale),
            "history_reset_spatial_sigma_scale": f32(s.antilagSettings.spatialSigmaScale),
            "history_reset_amount": f32(s.antilagSettings.resetAmount),
            "spec_phi_luminance": f32(s.specularPhiLuminance),
            "diff_phi_luminance": f32(s.diffusePhiLuminance),
            "diff_max_luminance_relative_difference": f32(
                -np.log(max(min(s.diffuseMinLuminanceWeight, 1.0), 1e-6))),
            "spec_max_luminance_relative_difference": f32(
                -np.log(max(min(s.specularMinLuminanceWeight, 1.0), 1e-6))),
            "luminance_edge_stopping_relaxation": f32(s.roughnessEdgeStoppingRelaxation),
            "confidence_driven_relaxation_multiplier": f32(
                s.confidenceDrivenRelaxationMultiplier),
            "confidence_driven_luminance_edge_stopping_relaxation": f32(
                s.confidenceDrivenLuminanceEdgeStoppingRelaxation),
            "confidence_driven_normal_edge_stopping_relaxation": f32(
                s.confidenceDrivenNormalEdgeStoppingRelaxation),
            # gFramerateScale uses a different clamp than REBLUR (Relax.cpp:166)
            "framerate_scale": f32(np.clip(16.66 / max(consts["time_delta"], 1e-3),
                                           0.25, 4.0)),
            "history_fix_frame_num": f32(s.historyFixFrameNum + 1.0),
            "history_fix_base_pixel_stride": f32(s.historyFixBasePixelStride),
            "history_threshold": f32(s.spatialVarianceEstimationHistoryThreshold),
            # x2 to match REBLUR units (Relax.cpp:172)
            "min_hit_distance_weight": f32(s.minHitDistanceWeight * 2.0),
            "diff_min_material": f32(s.minMaterialForDiffuse),
            "spec_min_material": f32(s.minMaterialForSpecular),
            "roughness_edge_stopping_enabled": f32(
                1.0 if s.enableRoughnessEdgeStopping else 0.0),
            # RELAX-specific hit-dist params stand-in for the shared helper signature
            "hit_dist_params": np.array([3.0, 0.1, 20.0, -25.0], f32),
            "plane_dist_sensitivity": f32(0.02),
        }

    def _relax_sc(self, sc):
        """Augment shared constants with the RELAX frustum-vector decomposition
        (Relax.cpp:70-80)."""
        sc = dict(sc)

        def vectors(w2v_, v2c_, v2w_, frustum):
            tan_half = 1.0 / v2c_[0, 0]
            aspect = v2c_[0, 0] / v2c_[1, 1]
            right = w2v_[0, :3] * tan_half
            up = w2v_[1, :3] * tan_half * aspect
            fwd_view = jnp.stack([0.5 * frustum[2] + frustum[0],
                                  0.5 * frustum[3] + frustum[1],
                                  jnp.ones_like(frustum[0])])
            fwd = v2w_[:3, :3] @ fwd_view
            return right, up, fwd

        r, u, f = vectors(jnp.asarray(sc["world_to_view"]), jnp.asarray(sc["view_to_clip"]),
                          jnp.asarray(sc["view_to_world"]), jnp.asarray(sc["frustum"]))
        rp, up_, fp = vectors(jnp.asarray(sc["world_to_view_prev"]),
                              jnp.asarray(sc["view_to_clip_prev"]),
                              jnp.asarray(sc["view_to_world_prev"]),
                              jnp.asarray(sc["frustum_prev"]))
        sc["frustum_right"], sc["frustum_up"], sc["frustum_forward"] = r, u, f
        sc["prev_frustum_right"], sc["prev_frustum_up"], sc["prev_frustum_forward"] = \
            rp, up_, fp
        return sc

    # -- frame -----------------------------------------------------------------------
    def frame(self, sc: dict, dc: dict, state: dict, inputs: dict):
        cfg = self.config
        s = self._s
        sc = self._relax_sc(sc)
        view_z = inputs[RT.IN_VIEWZ]
        normal_roughness = inputs[RT.IN_NORMAL_ROUGHNESS]
        mv = inputs[RT.IN_MV]
        dt_mix = inputs.get(RT.IN_DISOCCLUSION_THRESHOLD_MIX)
        diff_conf = inputs.get(RT.IN_DIFF_CONFIDENCE)
        spec_conf = inputs.get(RT.IN_SPEC_CONFIDENCE)

        h, w = view_z.shape
        cb_on = s.checkerboardMode != CheckerboardMode.OFF
        from ..reblur import common as RC

        def sig(which):
            rt = {("diff", False): RT.IN_DIFF_RADIANCE_HITDIST,
                  ("spec", False): RT.IN_SPEC_RADIANCE_HITDIST,
                  ("diff", True): RT.IN_DIFF_SH0,
                  ("spec", True): RT.IN_SPEC_SH0}[(which, self.sh)]
            t = inputs.get(rt)
            return RC.cb_expand(t, w) if (cb_on and t is not None) else t

        diff_in = sig("diff") if self.has_diffuse else None
        spec_in = sig("spec") if self.has_specular else None
        diff_sh_in = inputs.get(RT.IN_DIFF_SH1) if self.sh and self.has_diffuse else None
        spec_sh_in = inputs.get(RT.IN_SPEC_SH1) if self.sh and self.has_specular else None
        if cb_on:
            diff_sh_in = RC.cb_expand(diff_sh_in, w) if diff_sh_in is not None else None
            spec_sh_in = RC.cb_expand(spec_sh_in, w) if spec_sh_in is not None else None

        has_data = True
        if cb_on:
            # checkerboard resolve at the pipeline front (RELAX_PrePass.hlsli:28-110):
            # bilateral-z + material weighted horizontal neighbors fill no-data pixels
            col = jnp.arange(w, dtype=jnp.int32)[None, :] * jnp.ones((h, 1), jnp.int32)
            rowg = jnp.arange(h, dtype=jnp.int32)[:, None] * jnp.ones((1, w), jnp.int32)
            cb = nm.checkerboard((col, rowg), sc["frame_index"])
            has_data = cb == jnp.uint32(int(s.checkerboardMode) - 1)
            vz = K.unpack_view_z(sc, view_z)
            _, _, mat_full = K.unpack_nr(sc, normal_roughness, cfg)
            from ...ops import stencil as _st
            z0 = _st.shifted(vz, 0, -1)
            z1 = _st.shifted(vz, 0, 1)
            m0 = _st.shifted(mat_full, 0, -1)
            m1 = _st.shifted(mat_full, 0, 1)
            w0 = K.get_bilateral_weight(z0, vz)
            w1 = K.get_bilateral_weight(z1, vz)
            colf = jnp.arange(w)[None, :]
            w0 = jnp.where((z0 > sc["denoising_range"]) | (colf < 1), 0.0, w0)
            w1 = jnp.where((z1 > sc["denoising_range"]) | (colf > w - 2), 0.0, w1)
            min_mat = min(float(s.minMaterialForDiffuse), float(s.minMaterialForSpecular))
            if cfg.normal_encoding.name == "R10_G10_B10_A2_UNORM":
                _, _, mc = K.unpack_nr(sc, normal_roughness, cfg)
                w0 = w0 * (jnp.maximum(mc, min_mat)
                           == jnp.maximum(m0, min_mat)).astype(jnp.float32)
                w1 = w1 * (jnp.maximum(mc, min_mat)
                           == jnp.maximum(m1, min_mat)).astype(jnp.float32)
            wsum = w0 + w1
            winv = jnp.where(wsum == 0.0, 0.0, 1.0 / jnp.maximum(wsum, 1e-15))
            w0 = w0 * winv
            w1 = w1 * winv

            def cb_resolve(t):
                if t is None:
                    return None
                r = (_st.shifted(t, 0, -1) * w0[..., None]
                     + _st.shifted(t, 0, 1) * w1[..., None])
                return jnp.where(has_data[..., None], t, r)

            diff_in = cb_resolve(diff_in)
            spec_in = cb_resolve(spec_in)
            diff_sh_in = cb_resolve(diff_sh_in)
            spec_sh_in = cb_resolve(spec_sh_in)

        tile_map = K.classify_tiles(sc, view_z)
        dead = K.dead_mask(sc, tile_map, view_z)

        from ...config import use_pallas
        pallas_ok = (use_pallas()
                     and cfg.normal_encoding.name == "R10_G10_B10_A2_UNORM"
                     and cfg.rect_size == cfg.resource_size)

        if (s.hitDistanceReconstructionMode != HitDistanceReconstructionMode.OFF
                and s.checkerboardMode == CheckerboardMode.OFF):
            radius = 2 if (s.hitDistanceReconstructionMode
                           == HitDistanceReconstructionMode.AREA_5X5) else 1
            diff_in, spec_in = RK.hit_dist_reconstruction(
                sc, dc, view_z, normal_roughness, diff_in, spec_in, cfg, radius=radius,
                pallas=pallas_ok)

        # PREPASS (always dispatched in the reference, radii gate internally)
        diff_p, spec_p, diff_sh_p, spec_sh_p = K.pre_pass(
            sc, dc, diff_in, spec_in, view_z, normal_roughness, cfg,
            diff_sh=diff_sh_in, spec_sh=spec_sh_in, pallas=pallas_ok)

        # TEMPORAL ACCUMULATION
        ta = K.temporal_accumulation(sc, dc, view_z, normal_roughness, mv,
                                     diff_p, spec_p, state, cfg, has_data=has_data,
                                     diff_confidence=diff_conf, spec_confidence=spec_conf,
                                     dt_mix=dt_mix, diff_sh=diff_sh_p, spec_sh=spec_sh_p,
                                     pallas=pallas_ok)
        history_length = ta["history_length"]
        spec_conf_reproj = ta.get("spec_reprojection_confidence")

        # HISTORY FIX (responsive history)
        diff_fix, spec_fix, diff_sh_fix, spec_sh_fix = K.history_fix(
            sc, dc, view_z, normal_roughness, history_length,
            ta.get("diff"), ta.get("spec"), cfg,
            diff_sh=ta.get("diff_sh"), spec_sh=ta.get("spec_sh"), pallas=pallas_ok)
        diff_resp = ta.get("diff_fast")
        spec_resp = ta.get("spec_fast")
        # the reference applies the fix to the RESPONSIVE (pong) buffers
        if diff_resp is not None and diff_fix is not None:
            fixmask = (history_length <= dc["history_fix_frame_num"])[..., None]
            diff_resp = jnp.where(fixmask, jnp.concatenate(
                [diff_fix[..., :3], diff_resp[..., 3:]], -1), diff_resp)
        if spec_resp is not None and spec_fix is not None:
            fixmask = (history_length <= dc["history_fix_frame_num"])[..., None]
            spec_resp = jnp.where(fixmask, jnp.concatenate(
                [spec_fix[..., :3], spec_resp[..., 3:]], -1), spec_resp)

        # HISTORY CLAMPING -> permanent histories
        hc = K.history_clamping(sc, dc, view_z, diff_p, spec_p,
                                ta.get("diff"), ta.get("spec"), diff_resp, spec_resp,
                                history_length, cfg,
                                diff_sh=ta.get("diff_sh"), spec_sh=ta.get("spec_sh"),
                                diff_sh_fast=ta.get("diff_sh_fast"),
                                spec_sh_fast=ta.get("spec_sh_fast"), pallas=pallas_ok)

        diff_slow = hc.get("diff_slow")
        spec_slow = hc.get("spec_slow")

        # ANTI FIREFLY (RCRS on the slow history)
        if s.enableAntiFirefly:
            af_d, af_s = K.anti_firefly(sc, dc, view_z, normal_roughness,
                                        diff_slow, spec_slow, cfg, pallas=pallas_ok)
            diff_slow = af_d if af_d is not None else diff_slow
            spec_slow = af_s if af_s is not None else spec_slow

        # A-TROUS ladder
        iterations = int(np.clip(s.atrousIterationNum, 2, 8))
        diff_cur = diff_slow
        spec_cur = spec_slow
        diff_sh_cur = hc.get("diff_sh")
        spec_sh_cur = hc.get("spec_sh")
        for i in range(iterations):
            # all 8 ladder strides (1..128) run on Pallas: the halo scales with the
            # stride and the block shrinks to keep windows in VMEM (atrous_block);
            # strides >= 64 ride bf16 windows (relax_pallas.relax_atrous_pallas)
            use_p = pallas_ok and (1 << i) <= 128
            res = K.atrous(sc, dc, view_z, normal_roughness, history_length,
                           spec_conf_reproj, diff_cur, spec_cur, cfg,
                           step_size=1 << i, is_first=(i == 0),
                           is_last=(i == iterations - 1),
                           diff_confidence=diff_conf, spec_confidence=spec_conf,
                           diff_sh=diff_sh_cur, spec_sh=spec_sh_cur, sh_mode=self.sh,
                           pallas=use_p)
            diff_cur = res.get("diff", diff_cur)
            spec_cur = res.get("spec", spec_cur)
            diff_sh_cur = res.get("diff_sh", diff_sh_cur)
            spec_sh_cur = res.get("spec_sh", spec_sh_cur)

        # outputs + split screen + dead passthrough
        outs = {}
        keep = dead
        n_unpacked, rough_unpacked, mat_unpacked = K.unpack_nr(sc, normal_roughness, cfg)
        new_state = dict(state)
        # stored as R8_UNORM frames/255 in the reference -> integer-frame quantization
        new_state["history_length"] = jnp.where(keep, state["history_length"],
                                                jnp.round(hc["history_length"]))
        # AtrousSmem pass re-saves the recurrent G-buffer (lines 120-141)
        nr_to_store = K.pack_prev_normal_roughness(
            jnp.where(dead[..., None], jnp.full_like(n_unpacked, 1.0 / 255.0), n_unpacked),
            jnp.where(dead, 1.0 / 255.0, rough_unpacked))
        new_state["normal_roughness_prev"] = nr_to_store
        new_state["material_id_prev"] = mat_unpacked
        new_state["view_z_prev"] = view_z

        for which in ("diff", "spec"):
            present = self.has_diffuse if which == "diff" else self.has_specular
            if not present:
                continue
            cur = diff_cur if which == "diff" else spec_cur
            raw = sig(which)
            out_sig = jnp.where(dead[..., None], raw, cur)
            out_sig = K.split_screen(sc, view_z, raw, out_sig, sh_mode=self.sh)
            rt_out = {("diff", False): RT.OUT_DIFF_RADIANCE_HITDIST,
                      ("spec", False): RT.OUT_SPEC_RADIANCE_HITDIST,
                      ("diff", True): RT.OUT_DIFF_SH0,
                      ("spec", True): RT.OUT_SPEC_SH0}[(which, self.sh)]
            outs[rt_out] = out_sig
            slow = diff_slow if which == "diff" else spec_slow
            resp = hc.get(f"{which}_resp")
            new_state[f"{which}_illum_prev"] = jnp.where(keep[..., None],
                                                         state[f"{which}_illum_prev"],
                                                         slow)
            new_state[f"{which}_responsive_prev"] = jnp.where(
                keep[..., None], state[f"{which}_responsive_prev"], resp)
            if self.sh:
                sh_cur = diff_sh_cur if which == "diff" else spec_sh_cur
                rt_sh = RT.OUT_DIFF_SH1 if which == "diff" else RT.OUT_SPEC_SH1
                outs[rt_sh] = jnp.where(dead[..., None],
                                        inputs.get(RT.IN_DIFF_SH1 if which == "diff"
                                                   else RT.IN_SPEC_SH1), sh_cur)
                new_state[f"{which}_sh_prev"] = jnp.where(
                    keep[..., None], state[f"{which}_sh_prev"], hc.get(f"{which}_sh"))
                new_state[f"{which}_sh_responsive_prev"] = jnp.where(
                    keep[..., None], state[f"{which}_sh_responsive_prev"],
                    hc.get(f"{which}_sh_fast"))
        if self.has_specular:
            new_state["reflection_hit_t"] = jnp.where(keep, state["reflection_hit_t"],
                                                      ta["reflection_hit_t"])

        if getattr(self, "enable_validation", False):
            # RELAX_Validation.cs.hlsl renders viewports 0-4 and 8 only
            from ..validation import render_validation
            overlay = render_validation(
                sc, view_z, normal_roughness, mv, cfg,
                diff_accum=history_length,
                max_accumulated_frame_num=255.0,
                prev_validation=state.get("validation"))
            outs[RT.OUT_VALIDATION] = overlay
            new_state["validation"] = overlay

        from ...config import requantize_state
        return outs, requantize_state(state, new_state)
