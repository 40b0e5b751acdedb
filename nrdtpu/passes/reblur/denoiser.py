"""REBLUR denoiser instances - pass-graph wiring for all 10 variants.

Graphs from Source/Reblur.cpp:104-295 (Update_Reblur / Update_ReblurOcclusion) and
Source/Denoisers/Reblur_*.hpp. One jitted function per variant; the 239 shader permutations
of the reference collapse into static python flags here.

State (permanent pool, e.g. Reblur_Diffuse.hpp:20-52 + the "OUT doubles as temp" trick):
  prev_view_z            (h, w)     raw packed viewZ re-saved by Blur
  prev_normal_roughness  (h, w, 4)  packed input encoding re-saved by PostBlur
  diff_accum / spec_accum / material_id  (h, w)  quantized internal data (R16_UINT split)
  per signal:  history (h, w, c), fast (h, w), luma_stab (h, w) [if TS], sh (h, w, 4) [if SH]
  prev_spec_hitdist_for_tracking (h, w) [specular variants]
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...settings import (
    REBLUR_MAX_HISTORY_FRAME_NUM,
    CheckerboardMode,
    Denoiser,
    HitDistanceReconstructionMode,
    ReblurSettings,
    ResourceType,
)
from . import common as C
from . import kernels as K

_OCCLUSION_VARIANTS = {
    Denoiser.REBLUR_DIFFUSE_OCCLUSION,
    Denoiser.REBLUR_SPECULAR_OCCLUSION,
    Denoiser.REBLUR_DIFFUSE_SPECULAR_OCCLUSION,
}

RT = ResourceType


class ReblurDenoiser:
    def __init__(self, config):
        self.config = config
        d = config.denoiser
        self.occlusion = d in _OCCLUSION_VARIANTS
        self.directional = d == Denoiser.REBLUR_DIFFUSE_DIRECTIONAL_OCCLUSION
        self.sh = d.name.endswith("_SH")
        self.has_diffuse = "DIFFUSE" in d.name
        self.has_specular = "SPECULAR" in d.name
        self.channels = 1 if self.occlusion else 4
        self._s = ReblurSettings()

    # -- static permutation key --------------------------------------------------
    def static_key(self, s: ReblurSettings):
        return (s.enablePerformanceMode, s.enableAntiFirefly, s.checkerboardMode,
                s.hitDistanceReconstructionMode, s.maxStabilizedFrameNum == 0,
                self._skip_prepass(s))

    def _skip_prepass(self, s: ReblurSettings):
        if self.occlusion:
            return True
        return ((s.diffusePrepassBlurRadius == 0.0 or not self.has_diffuse)
                and (s.specularPrepassBlurRadius == 0.0 or not self.has_specular)
                and s.checkerboardMode == CheckerboardMode.OFF)

    def specialize(self, s: ReblurSettings):
        self._s = s

    # -- pool ---------------------------------------------------------------------
    def init_state(self):
        w, h = self.config.rect_size
        c = self.channels
        state = {
            "prev_view_z": jnp.full((h, w), 1e7, jnp.float32),
            "prev_normal_roughness": jnp.zeros((h, w, 4), jnp.float32),
            "diff_accum": jnp.zeros((h, w), jnp.float32),
            "spec_accum": jnp.zeros((h, w), jnp.float32),
            "material_id": jnp.zeros((h, w), jnp.float32),
        }
        # radiance-class history rides bf16 - the RGBA16f-history analogue
        # (Reblur.cpp:37-64): halves HBM traffic for the TA/stabilization reads;
        # compute upcasts to f32 (Win2/gathers), the carry re-quantizes on store
        for name, present in (("diff", self.has_diffuse), ("spec", self.has_specular)):
            if not present:
                continue
            state[f"{name}_history"] = jnp.zeros((h, w, c), jnp.bfloat16)
            state[f"{name}_fast_history"] = jnp.zeros((h, w), jnp.bfloat16)
            if not self.occlusion:
                state[f"{name}_luma_stab"] = jnp.zeros((h, w), jnp.bfloat16)
            if self.sh:
                state[f"{name}_sh_history"] = jnp.zeros((h, w, 4), jnp.bfloat16)
        if self.has_specular:
            state["prev_spec_hitdist_for_tracking"] = jnp.zeros((h, w), jnp.float32)
        return state

    # -- AddSharedConstants_Reblur (Reblur.cpp:297-406), denoiser part -------------
    def frame_constants(self, consts: dict, s: ReblurSettings) -> dict:
        rect_w, rect_h = self.config.rect_size
        res_w, res_h = self.config.resource_size
        worst = min(rect_w / res_w, rect_h / res_h)
        reset = consts["reset_history"] > 0.0
        max_accum = min(s.maxAccumulatedFrameNum, REBLUR_MAX_HISTORY_FRAME_NUM)
        stab = s.maxStabilizedFrameNum / (1.0 + s.maxStabilizedFrameNum)
        stab_hit = (s.maxStabilizedFrameNumForHitDistance
                    / (1.0 + s.maxStabilizedFrameNumForHitDistance))
        hp = s.hitDistanceParameters
        f32 = np.float32
        return {
            "hit_dist_params": np.array([hp.A, hp.B, hp.C, hp.D], f32),
            "antilag_params": np.array([s.antilagSettings.luminanceSigmaScale,
                                        s.antilagSettings.luminanceSensitivity], f32),
            "max_blur_radius": f32(max(s.maxBlurRadius * worst, s.minBlurRadius)),
            "min_blur_radius": f32(s.minBlurRadius),
            "diff_prepass_blur_radius": f32(s.diffusePrepassBlurRadius * worst),
            "spec_prepass_blur_radius": f32(s.specularPrepassBlurRadius * worst),
            "stabilization_strength": f32(0.0 if reset else stab),
            "hit_dist_stabilization_strength": f32(0.0 if reset else stab_hit),
            "max_accumulated_frame_num": f32(0.0 if reset else max_accum),
            "max_fast_accumulated_frame_num": f32(
                0.0 if reset else s.maxFastAccumulatedFrameNum),
            "anti_firefly": f32(1.0 if s.enableAntiFirefly else 0.0),
            "lobe_angle_fraction": f32(s.lobeAngleFraction * s.lobeAngleFraction),
            "roughness_fraction": f32(s.roughnessFraction),
            "responsive_accumulation_roughness_threshold": f32(
                s.responsiveAccumulationRoughnessThreshold),
            "history_fix_frame_num": f32(s.historyFixFrameNum),
            "history_fix_base_pixel_stride": f32(s.historyFixBasePixelStride),
            "use_prepass_not_only_for_specular_motion_estimation": f32(
                0.0 if s.usePrepassOnlyForSpecularMotionEstimation else 1.0),
            "firefly_suppressor_min_relative_scale": f32(s.fireflySuppressorMinRelativeScale),
            "min_hit_distance_weight": f32(s.minHitDistanceWeight),
            "diff_min_material": f32(s.minMaterialForDiffuse),
            "spec_min_material": f32(s.minMaterialForSpecular),
            "plane_dist_sensitivity": f32(s.planeDistanceSensitivity),
            "spec_probability_thresholds": np.array(
                [s.specularProbabilityThresholdsForMvModification[0]
                 if True else 2.0,
                 s.specularProbabilityThresholdsForMvModification[1]], f32),
        }

    # -- input/output resource names ------------------------------------------------
    def _in_resource(self, which):
        if self.directional:
            return RT.IN_DIFF_DIRECTION_HITDIST
        if self.occlusion:
            return RT.IN_DIFF_HITDIST if which == "diff" else RT.IN_SPEC_HITDIST
        if self.sh:
            return RT.IN_DIFF_SH0 if which == "diff" else RT.IN_SPEC_SH0
        return (RT.IN_DIFF_RADIANCE_HITDIST if which == "diff"
                else RT.IN_SPEC_RADIANCE_HITDIST)

    def _out_resource(self, which):
        if self.directional:
            return RT.OUT_DIFF_DIRECTION_HITDIST
        if self.occlusion:
            return RT.OUT_DIFF_HITDIST if which == "diff" else RT.OUT_SPEC_HITDIST
        if self.sh:
            return RT.OUT_DIFF_SH0 if which == "diff" else RT.OUT_SPEC_SH0
        return (RT.OUT_DIFF_RADIANCE_HITDIST if which == "diff"
                else RT.OUT_SPEC_RADIANCE_HITDIST)

    # -- frame ------------------------------------------------------------------------
    def frame(self, sc: dict, dc: dict, state: dict, inputs: dict):
        cfg = self.config
        s = self._s
        view_z = inputs[RT.IN_VIEWZ]
        normal_roughness = inputs[RT.IN_NORMAL_ROUGHNESS]
        mv = inputs[RT.IN_MV]
        dt_mix = inputs.get(RT.IN_DISOCCLUSION_THRESHOLD_MIX)
        base_color_metalness = inputs.get(RT.IN_BASECOLOR_METALNESS)
        h, w = view_z.shape
        cb_on = s.checkerboardMode != CheckerboardMode.OFF

        def get_signal(which):
            sig = inputs[self._in_resource(which)]
            sig = sig[..., None] if sig.ndim == 2 else sig
            return C.cb_expand(sig, w) if cb_on else sig

        diff_in = get_signal("diff") if self.has_diffuse else None
        spec_in = get_signal("spec") if self.has_specular else None
        diff_in_raw, spec_in_raw = diff_in, spec_in  # validation shows the noisy .w
        diff_sh_in = inputs.get(RT.IN_DIFF_SH1) if self.sh and self.has_diffuse else None
        spec_sh_in = inputs.get(RT.IN_SPEC_SH1) if self.sh and self.has_specular else None
        if cb_on:
            diff_sh_in = C.cb_expand(diff_sh_in, w) if diff_sh_in is not None else None
            spec_sh_in = C.cb_expand(spec_sh_in, w) if spec_sh_in is not None else None

        cb_mask = None
        has_data = True
        if cb_on:
            from ... import math as nm_
            col = jnp.arange(w, dtype=jnp.int32)[None, :] * jnp.ones((h, 1), jnp.int32)
            row = jnp.arange(h, dtype=jnp.int32)[:, None] * jnp.ones((1, w), jnp.int32)
            cb = nm_.checkerboard((col, row), sc["frame_index"])
            has_data = cb == jnp.uint32(int(s.checkerboardMode) - 1)
            cb_mask = has_data.astype(jnp.float32)
        diff_conf = inputs.get(RT.IN_DIFF_CONFIDENCE)
        spec_conf = inputs.get(RT.IN_SPEC_CONFIDENCE)

        tile_map = K.classify_tiles(sc, view_z)
        dead = K.sky_pixel_mask(sc, tile_map, view_z)

        from ...config import use_pallas
        mesh = getattr(self, "mesh", None)
        kernels_ok = (use_pallas()
                      and cfg.normal_encoding.name == "R10_G10_B10_A2_UNORM"
                      and not self.directional
                      and cfg.rect_size == cfg.resource_size)
        # Under a device mesh the TA/reprojection gather launches now ALSO run
        # sharded Pallas (every motion-base reach is bounded by the base clip,
        # kernels/reblur_pallas.SHARD_HALO rows of ring halo exchange cover it),
        # provided each row shard is tall enough. Diff+spec configs - the ones
        # the fused spatial stages cover - take this production path; other
        # variants keep the warned XLA fallback (engine.py emits the warning).
        from ...kernels.reblur_pallas import SHARD_HALO
        shard_ta_ok = mesh is not None and self.has_diffuse and self.has_specular \
            and not self.directional \
            and cfg.rect_size[1] % mesh.devices.size == 0 \
            and cfg.rect_size[1] // mesh.devices.size >= SHARD_HALO
        pallas_ok = kernels_ok and (mesh is None or shard_ta_ok)

        perf = s.enablePerformanceMode
        # checkerboard disables reconstruction in the reference too, despite the
        # permutation table registering both: Reblur.cpp:125 and :231
        # ("enableHitDistanceReconstruction = ... && checkerboardMode == OFF")
        enable_hdrecon = (s.hitDistanceReconstructionMode
                          != HitDistanceReconstructionMode.OFF
                          and s.checkerboardMode == CheckerboardMode.OFF)
        skip_prepass = self._skip_prepass(s)
        skip_ts = self.occlusion or s.maxStabilizedFrameNum == 0

        # HITDIST_RECONSTRUCTION
        if enable_hdrecon:
            radius = 2 if (s.hitDistanceReconstructionMode
                           == HitDistanceReconstructionMode.AREA_5X5) else 1
            diff_in, spec_in = K.hit_dist_reconstruction(
                sc, dc, view_z, normal_roughness, diff_in, spec_in, cfg, radius=radius,
                pallas=pallas_ok, mesh=mesh)

        # Fused diff+spec spatial stages: one Pallas launch per stage with shared
        # geometry windows/math (kernels/reblur_fused.py); single-signal variants and
        # the XLA path keep the per-signal calls below.
        rows_ok = mesh is None or (
            cfg.rect_size[1] % mesh.devices.size == 0
            and cfg.rect_size[1] // mesh.devices.size >= 32)
        fused_ok = (kernels_ok and rows_ok and self.has_diffuse and self.has_specular
                    and not self.directional)
        geom = (K.make_filter_geometry(sc, dc, view_z, normal_roughness, cfg)
                if fused_ok else None)
        if geom is not None:
            # tile-map block culling: all-sky blocks skip the fused spatial stages
            # entirely (DMA + compute), like the reference's CTA cull
            geom["dead"] = dead

        # PREPASS
        spec_hdt_prepass = None
        if not skip_prepass:
            if fused_ok:
                fr = K.fused_spatial_filter(
                    sc, dc, K.PRE_BLUR, geom, view_z, cfg,
                    diff=dict(signal=diff_in, sh=diff_sh_in, cb_mask=cb_mask),
                    spec=dict(signal=spec_in, sh=spec_sh_in, cb_mask=cb_mask),
                    occlusion=False, perf_mode=perf, mesh=mesh)
                diff_in, diff_sh_in = fr["diff"], fr["diff_sh"]
                spec_in, spec_sh_in = fr["spec"], fr["spec_sh"]
                spec_hdt_prepass = fr["spec_hdt"]
            else:
                if self.has_diffuse and not self.directional:
                    diff_in, diff_sh_in = K.diffuse_pre_pass(
                        sc, dc, diff_in, view_z, normal_roughness, cfg,
                        sh=diff_sh_in, pallas=pallas_ok, perf_mode=perf,
                        cb_mask=cb_mask)
                if self.has_specular:
                    spec_in, spec_sh_in, spec_hdt_prepass = K.specular_spatial_filter(
                        sc, dc, K.PRE_BLUR, spec_in, view_z, normal_roughness, None,
                        cfg, sh=spec_sh_in, occlusion=False, pallas=pallas_ok,
                        perf_mode=perf, cb_mask=cb_mask)

        if cb_on and (self.occlusion or skip_prepass):
            import jax.numpy as _jnp
            from ... import math as nm_
            vz = _jnp.abs(view_z) * sc["view_z_scale"]
            fsz = nm_.get_frustum_size(sc["min_rect_dim_mul_unproject"],
                                       sc["ortho_mode"], vz)
            n_, _, _ = K.unpack_nr(sc, normal_roughness, cfg)
            uv_ = None
            import nrdtpu.ops.resample as _rs
            uv_ = _rs.pixel_uv_grid(h, w)
            xv_ = nm_.reconstruct_view_position(uv_, sc["frustum"][None, None, :], vz,
                                                sc["ortho_mode"])
            nv_ = n_ @ _jnp.asarray(sc["world_to_view"])[:3, :3].T
            vv_ = C.get_view_vector_view_space(sc, xv_)
            nov_ = _jnp.abs(nm_.dot(nv_, vv_))
            if diff_in is not None:
                res_ = K.cb_neighbor_resolve(sc, diff_in, vz, fsz, nov_)
                diff_in = _jnp.where(has_data[..., None], diff_in, res_)
            if spec_in is not None:
                res_ = K.cb_neighbor_resolve(sc, spec_in, vz, fsz, nov_)
                spec_in = _jnp.where(has_data[..., None], spec_in, res_)

        prev_internal = {k: state[k] for k in ("diff_accum", "spec_accum", "material_id")}

        sampler = None
        diff_samples = None
        spec_samples = None
        if pallas_ok:
            from ...kernels.reblur_pallas import PallasSampler

            sampler = PallasSampler(sc, mesh=mesh)
            hist_planes, bil_planes = [], []
            if self.has_diffuse:
                hist_planes += [state["diff_history"][..., c]
                                for c in range(self.channels)]
                bil_planes.append(state["diff_fast_history"])
                if self.sh:
                    bil_planes += [state["diff_sh_history"][..., c] for c in range(4)]
            if self.has_specular:
                hist_planes += [state["spec_history"][..., c]
                                for c in range(self.channels)]
                bil_planes.append(state["spec_fast_history"])
                if self.sh:
                    bil_planes += [state["spec_sh_history"][..., c] for c in range(4)]
            sm = K.surface_motion_reprojection_pallas(
                sc, dc, view_z, normal_roughness, mv, state["prev_view_z"],
                state["prev_normal_roughness"], prev_internal, cfg,
                hist_planes, bil_planes, disocclusion_threshold_mix=dt_mix,
                perf_mode=perf, mesh=mesh)
            hk = bk = 0
            if self.has_diffuse:
                diff_samples = dict(
                    history=jnp.stack(sm["hist"][hk:hk + self.channels], -1),
                    fast=sm["bil"][bk])
                hk += self.channels
                bk += 1
                if self.sh:
                    diff_samples["sh"] = jnp.stack(sm["bil"][bk:bk + 4], -1)
                    bk += 4
            if self.has_specular:
                spec_samples = dict(
                    history=jnp.stack(sm["hist"][hk:hk + self.channels], -1),
                    fast=sm["bil"][bk])
                bk += 1
                if self.sh:
                    spec_samples["sh"] = jnp.stack(sm["bil"][bk:bk + 4], -1)
        else:
            sm = K.surface_motion_reprojection(
                sc, dc, view_z, normal_roughness, mv, state["prev_view_z"],
                state["prev_normal_roughness"], prev_internal, cfg,
                disocclusion_threshold_mix=dt_mix)

        outs = {}
        data1_diff = state["diff_accum"]
        data1_spec = state["spec_accum"]
        fbits = sm["fbits"]
        curvature = jnp.zeros_like(view_z)
        virtual_amount = jnp.zeros_like(view_z)
        hdt_out = None

        # TEMPORAL ACCUMULATION
        if self.has_diffuse:
            diff1, diff_fast1, data1_diff, diff_sh1 = K.temporal_accumulation_diffuse(
                sc, dc, sm, diff_in, state["diff_history"], state["diff_fast_history"],
                cfg, diff_conf, occlusion=self.occlusion, directional=self.directional,
                diff_sh_input=diff_sh_in,
                diff_sh_history=state.get("diff_sh_history"), samples=diff_samples,
                has_data=has_data)
        if self.has_specular:
            has_prepass_hitdist = not skip_prepass
            hdt_in = (spec_hdt_prepass if has_prepass_hitdist
                      else C.extract_hit_dist(spec_in))
            ta_spec = K.temporal_accumulation_specular(
                sc, dc, sm, spec_in, state["spec_history"], state["spec_fast_history"],
                view_z, normal_roughness, state["prev_view_z"],
                state["prev_normal_roughness"], prev_internal, hdt_in,
                state["prev_spec_hitdist_for_tracking"], cfg, spec_conf,
                occlusion=self.occlusion, has_prepass_hitdist=has_prepass_hitdist,
                spec_sh_input=spec_sh_in, spec_sh_history=state.get("spec_sh_history"),
                samples=spec_samples, sampler=sampler, perf_mode=perf,
                has_data=has_data)
            spec1, spec_fast1 = ta_spec["spec"], ta_spec["fast"]
            data1_spec = ta_spec["accum_speed"]
            fbits = fbits + ta_spec["fbits_vmb"]
            curvature = ta_spec["curvature"]
            virtual_amount = ta_spec["virtual_history_amount"]
            hdt_out = ta_spec["hit_dist_for_tracking"]
            spec_sh1 = ta_spec["sh"]

        from ...utils import probe as _pb
        if _pb.active() or _pb.show_active():  # printfAt probe / SHOW-mode plane
            _pb.emit("reblur/smb/footprint_quality", sm.get("footprint_quality"))
            _pb.emit("reblur/smb/fbits", fbits)
            _pb.emit("reblur/ta/diff_accum_frames", data1_diff)
            _pb.emit("reblur/ta/spec_accum_frames", data1_spec)
            _pb.emit("reblur/ta/curvature", curvature)
            _pb.emit("reblur/ta/virtual_history_amount", virtual_amount)
            _pb.emit("reblur/ta/hit_dist_for_tracking", hdt_out)
            if self.has_specular:
                # REBLUR_SHOW_*_CONFIDENCE equivalents (REBLUR_Config.hlsli:43-48)
                for k in ("surface_history_confidence", "virtual_history_confidence",
                          "virtual_normal_confidence", "virtual_roughness_confidence",
                          "virtual_parallax_confidence"):
                    _pb.emit(f"reblur/ta/{k}", ta_spec.get(k))

        # HISTORY FIX + BLUR + POST BLUR in ONE launch (band pipeline): sliding
        # VMEM buffers carry each stage's output into the next stage's stencil -
        # no halo recompute, one launch floor, geometry DMA'd once
        # (kernels/reblur_band.py). Opt-IN via NRDTPU_REBLUR_BAND=1: the default
        # path must be the one proven on the chip (round-4 verdict: the band
        # shipped default-on with a Mosaic compile failure); flip the default
        # only with a committed on-chip A/B win over the 3-launch chain.
        import os as _os
        band_ok = (fused_ok and mesh is None
                   and not (_pb.active() or _pb.show_active())
                   and _os.environ.get("NRDTPU_REBLUR_BAND", "0") == "1")
        if band_ok:
            from ...kernels.reblur_band import reblur_spatial_band
            af_diff = (s.enableAntiFirefly and not self.occlusion
                       and not self.directional)
            af_spec = s.enableAntiFirefly and not self.occlusion
            rb = reblur_spatial_band(
                sc, dc, cfg, geom, view_z,
                diff=dict(signal=diff1, sh=diff_sh1, data1=data1_diff,
                          fast_history=diff_fast1, anti_firefly=af_diff),
                spec=dict(signal=spec1, sh=spec_sh1, data1=data1_spec,
                          fast_history=spec_fast1, anti_firefly=af_spec),
                occlusion=self.occlusion, directional=self.directional,
                perf_mode=perf)
            diff4, diff_sh4, diff_fast2 = rb["diff"], rb["diff_sh"], rb["diff_fast"]
            spec4, spec_sh4, spec_fast2 = rb["spec"], rb["spec_sh"], rb["spec_fast"]
        elif fused_ok:
            hf = K.fused_history_fix(
                sc, dc, geom, view_z, cfg, mesh=mesh,
                diff=dict(signal=diff1, sh=diff_sh1, data1=data1_diff,
                          fast_history=diff_fast1,
                          anti_firefly=s.enableAntiFirefly and not self.occlusion
                          and not self.directional),
                spec=dict(signal=spec1, sh=spec_sh1, data1=data1_spec,
                          fast_history=spec_fast1,
                          anti_firefly=s.enableAntiFirefly and not self.occlusion),
                occlusion=self.occlusion, directional=self.directional,
                perf_mode=perf)
            diff2, diff_fast2, diff_sh2 = hf["diff"]
            spec2, spec_fast2, spec_sh2 = hf["spec"]
        else:
            if self.has_diffuse:
                diff2, diff_fast2, diff_sh2 = K.history_fix(
                    sc, dc, view_z, normal_roughness, data1_diff, data1_spec, diff1,
                    diff_fast1, cfg, is_diffuse=True, occlusion=self.occlusion,
                    anti_firefly=s.enableAntiFirefly and not self.occlusion
                    and not self.directional,
                    sh=diff_sh1, directional=self.directional, pallas=pallas_ok,
                    perf_mode=perf)
            if self.has_specular:
                spec2, spec_fast2, spec_sh2 = K.history_fix(
                    sc, dc, view_z, normal_roughness, data1_diff, data1_spec, spec1,
                    spec_fast1, cfg, is_diffuse=False, occlusion=self.occlusion,
                    anti_firefly=s.enableAntiFirefly and not self.occlusion,
                    sh=spec_sh1, pallas=pallas_ok, perf_mode=perf)

        if _pb.active() or _pb.show_active():
            # REBLUR_SHOW_FAST_HISTORY (REBLUR_Config.hlsli:40)
            if self.has_diffuse:
                _pb.emit("reblur/hfix/diff_fast_history", diff_fast2)
            if self.has_specular:
                _pb.emit("reblur/hfix/spec_fast_history", spec_fast2)

        # BLUR + POST BLUR
        if band_ok:
            pass  # diff4/spec4 (+sh) already produced by the band launch above
        elif fused_ok:
            fb = K.fused_spatial_filter(
                sc, dc, K.BLUR, geom, view_z, cfg,
                diff=dict(signal=diff2, sh=diff_sh2, data1=data1_diff),
                spec=dict(signal=spec2, sh=spec_sh2, data1=data1_spec),
                occlusion=self.occlusion, perf_mode=perf, mesh=mesh)
            diff3, diff_sh3 = fb["diff"], fb["diff_sh"]
            spec3, spec_sh3 = fb["spec"], fb["spec_sh"]
            fpb = K.fused_spatial_filter(
                sc, dc, K.POST_BLUR, geom, view_z, cfg,
                diff=dict(signal=diff3, sh=diff_sh3, data1=data1_diff),
                spec=dict(signal=spec3, sh=spec_sh3, data1=data1_spec),
                occlusion=self.occlusion, perf_mode=perf, mesh=mesh)
            diff4, diff_sh4 = fpb["diff"], fpb["diff_sh"]
            spec4, spec_sh4 = fpb["spec"], fpb["spec_sh"]
        else:
            if self.has_diffuse:
                diff3, diff_sh3 = K.diffuse_spatial_filter(
                    sc, dc, K.BLUR, diff2, view_z, normal_roughness, data1_diff, cfg,
                    sh=diff_sh2, occlusion=self.occlusion,
                    directional=self.directional, pallas=pallas_ok, perf_mode=perf)
                diff4, diff_sh4 = K.diffuse_spatial_filter(
                    sc, dc, K.POST_BLUR, diff3, view_z, normal_roughness, data1_diff,
                    cfg, sh=diff_sh3, occlusion=self.occlusion,
                    directional=self.directional, pallas=pallas_ok, perf_mode=perf)
            if self.has_specular:
                spec3, spec_sh3, _ = K.specular_spatial_filter(
                    sc, dc, K.BLUR, spec2, view_z, normal_roughness, data1_spec, cfg,
                    sh=spec_sh2, occlusion=self.occlusion, pallas=pallas_ok,
                    perf_mode=perf)
                spec4, spec_sh4, _ = K.specular_spatial_filter(
                    sc, dc, K.POST_BLUR, spec3, view_z, normal_roughness, data1_spec,
                    cfg, sh=spec_sh3, occlusion=self.occlusion, pallas=pallas_ok,
                    perf_mode=perf)

        new_state = dict(state)
        keep = dead

        # TEMPORAL STABILIZATION or direct output
        if skip_ts:
            if self.has_diffuse:
                diff_out = diff4
                diff_sh_out = diff_sh4
            if self.has_specular:
                spec_out = spec4
                spec_sh_out = spec_sh4
            inc_diff = data1_diff + 1.0
            inc_spec = data1_spec + 1.0
            mv_out = None
        else:
            ts = K.temporal_stabilization(
                sc, dc, view_z, normal_roughness, mv, data1_diff, data1_spec, fbits,
                curvature, virtual_amount,
                diff4 if self.has_diffuse else None,
                spec4 if self.has_specular else None,
                state.get("diff_luma_stab"), state.get("spec_luma_stab"),
                hdt_out, base_color_metalness, cfg,
                has_diffuse=self.has_diffuse, has_specular=self.has_specular,
                has_prepass=not skip_prepass, directional=self.directional,
                diff_sh=diff_sh4 if self.has_diffuse and self.sh else None,
                spec_sh=spec_sh4 if self.has_specular and self.sh else None,
                pallas=pallas_ok, perf_mode=perf, mesh=mesh)
            if self.has_diffuse:
                diff_out = ts["diff"]
                diff_sh_out = ts.get("diff_sh")
                new_state["diff_luma_stab"] = jnp.where(
                    keep, state["diff_luma_stab"], ts["diff_luma_stab"])
                inc_diff = ts["data1_diff"]
            if self.has_specular:
                spec_out = ts["spec"]
                spec_sh_out = ts.get("spec_sh")
                new_state["spec_luma_stab"] = jnp.where(
                    keep, state["spec_luma_stab"], ts["spec_luma_stab"])
                inc_spec = ts["data1_spec"]
            mv_out = ts["mv_out"]
            if base_color_metalness is not None:
                outs[RT.IN_MV] = mv_out  # patched MV, like the reference's in-place write

        # shared state updates
        new_state["prev_view_z"] = view_z
        new_state["prev_normal_roughness"] = jnp.where(
            keep[..., None], state["prev_normal_roughness"], normal_roughness)
        new_state["material_id"] = jnp.where(keep, state["material_id"],
                                             C.quantize_material_id(sm["material_id"]))
        if self.has_diffuse:
            new_state["diff_accum"] = jnp.where(keep, state["diff_accum"],
                                                C.quantize_accum_speed(inc_diff))
        if self.has_specular:
            new_state["spec_accum"] = jnp.where(keep, state["spec_accum"],
                                                C.quantize_accum_speed(inc_spec))
            new_state["prev_spec_hitdist_for_tracking"] = jnp.where(
                keep, state["prev_spec_hitdist_for_tracking"], hdt_out)

        # per-signal outputs: passthrough in dead pixels, split-screen strip
        for which in ("diff", "spec"):
            if which == "diff" and not self.has_diffuse:
                continue
            if which == "spec" and not self.has_specular:
                continue
            out_sig = diff_out if which == "diff" else spec_out
            in_sig = diff_in if which == "diff" else spec_in
            raw_in = get_signal(which)
            out_sig = jnp.where(dead[..., None], raw_in, out_sig)
            out_sig = K.split_screen(sc, raw_in, view_z, out_sig)
            outs[self._out_resource(which)] = out_sig
            # history for next frame = post-blur feedback (PostBlur writes DIFF_HISTORY)
            hist = diff4 if which == "diff" else spec4
            new_state[f"{which}_history"] = jnp.where(
                keep[..., None], state[f"{which}_history"], hist)
            fast = diff_fast2 if which == "diff" else spec_fast2
            new_state[f"{which}_fast_history"] = jnp.where(
                keep, state[f"{which}_fast_history"], fast)
            if self.sh:
                sh_out = diff_sh_out if which == "diff" else spec_sh_out
                sh_hist = diff_sh4 if which == "diff" else spec_sh4
                sh_rt = (RT.OUT_DIFF_SH1 if which == "diff" else RT.OUT_SPEC_SH1)
                outs[sh_rt] = jnp.where(dead[..., None],
                                        inputs.get(RT.IN_DIFF_SH1 if which == "diff"
                                                   else RT.IN_SPEC_SH1), sh_out)
                new_state[f"{which}_sh_history"] = jnp.where(
                    keep[..., None], state[f"{which}_sh_history"], sh_hist)

        if getattr(self, "enable_validation", False):
            from ..validation import render_validation
            overlay = render_validation(
                sc, view_z, normal_roughness, mv, cfg,
                diff_accum=data1_diff if self.has_diffuse else None,
                spec_accum=data1_spec if self.has_specular else None,
                virtual_history_amount=virtual_amount,
                max_accumulated_frame_num=63.0,
                diff_hit_t=diff_in_raw[..., -1] if self.has_diffuse else None,
                spec_hit_t=spec_in_raw[..., -1] if self.has_specular else None,
                prev_validation=state.get("validation"))
            outs[RT.OUT_VALIDATION] = overlay
            new_state["validation"] = overlay

        from ...config import requantize_state
        return outs, requantize_state(state, new_state)
