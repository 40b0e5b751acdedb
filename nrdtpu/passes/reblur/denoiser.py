"""REBLUR denoiser instances - pass-graph wiring per variant.

Graphs from Source/Reblur.cpp:104-295 and Source/Denoisers/Reblur_*.hpp. Currently
implemented variants: *_OCCLUSION (diffuse path). Radiance / SH / specular variants land on
top of the same kernels as they are completed.

State (permanent pool, Reblur_DiffuseOcclusion.hpp:20-31 + "OUT as history" trick at :106):
  prev_view_z            (h, w)     raw packed viewZ re-saved by Blur
  prev_normal_roughness  (h, w, 4)  packed input encoding re-saved by PostBlur
  diff_accum / spec_accum / material_id  (h, w)  quantized internal data
  diff_fast_history      (h, w)
  diff_out_history       (h, w, c)  previous final output (TA history input)
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

_HAS_DIFFUSE = {d for d in Denoiser if d.name.startswith("REBLUR") and "DIFFUSE" in d.name}
_HAS_SPECULAR = {d for d in Denoiser if d.name.startswith("REBLUR") and "SPECULAR" in d.name}


class ReblurDenoiser:
    def __init__(self, config):
        self.config = config
        d = config.denoiser
        self.occlusion = d in _OCCLUSION_VARIANTS
        self.directional = d == Denoiser.REBLUR_DIFFUSE_DIRECTIONAL_OCCLUSION
        self.sh = d.name.endswith("_SH")
        self.has_diffuse = d in _HAS_DIFFUSE
        self.has_specular = d in _HAS_SPECULAR
        self.channels = 1 if self.occlusion else 4
        if not (self.occlusion and self.has_diffuse and not self.has_specular):
            raise NotImplementedError(f"{d.name} is not wired up yet (phase A: "
                                      "REBLUR_DIFFUSE_OCCLUSION)")
        self._settings_cache = ReblurSettings()

    def static_key(self, s: ReblurSettings):
        return (s.enablePerformanceMode, s.enableAntiFirefly,
                s.checkerboardMode, s.hitDistanceReconstructionMode,
                s.maxStabilizedFrameNum == 0)

    def specialize(self, s: ReblurSettings):
        if s.checkerboardMode != CheckerboardMode.OFF:
            raise NotImplementedError("REBLUR checkerboard mode lands with the full family")
        if s.hitDistanceReconstructionMode != HitDistanceReconstructionMode.OFF:
            raise NotImplementedError("hit distance reconstruction lands with the full family")
        self._settings_cache = s

    def init_state(self):
        w, h = self.config.rect_size
        c = self.channels
        return {
            "prev_view_z": jnp.full((h, w), 1e7, jnp.float32),
            "prev_normal_roughness": jnp.zeros((h, w, 4), jnp.float32),
            "diff_accum": jnp.zeros((h, w), jnp.float32),
            "spec_accum": jnp.zeros((h, w), jnp.float32),
            "material_id": jnp.zeros((h, w), jnp.float32),
            "diff_fast_history": jnp.zeros((h, w), jnp.float32),
            "diff_out_history": jnp.zeros((h, w, c), jnp.float32),
        }

    # -- AddSharedConstants_Reblur (Reblur.cpp:297-406), denoiser part ----------
    def frame_constants(self, consts: dict, s: ReblurSettings) -> dict:
        rect_w, rect_h = self.config.rect_size
        res_w, res_h = self.config.resource_size
        worst_resolution_scale = min(rect_w / res_w, rect_h / res_h)
        is_history_reset = consts["reset_history"] > 0.0
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
            "max_blur_radius": f32(max(s.maxBlurRadius * worst_resolution_scale,
                                       s.minBlurRadius)),
            "min_blur_radius": f32(s.minBlurRadius),
            "diff_prepass_blur_radius": f32(s.diffusePrepassBlurRadius
                                            * worst_resolution_scale),
            "spec_prepass_blur_radius": f32(s.specularPrepassBlurRadius
                                            * worst_resolution_scale),
            "stabilization_strength": f32(0.0 if is_history_reset else stab),
            "hit_dist_stabilization_strength": f32(0.0 if is_history_reset else stab_hit),
            "max_accumulated_frame_num": f32(0.0 if is_history_reset else max_accum),
            "max_fast_accumulated_frame_num": f32(
                0.0 if is_history_reset else s.maxFastAccumulatedFrameNum),
            "anti_firefly": f32(1.0 if s.enableAntiFirefly else 0.0),
            # Reblur.cpp:384 - fraction is squared to keep legacy settings working
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
                s.specularProbabilityThresholdsForMvModification, f32),
        }

    # -- frame -------------------------------------------------------------------
    def frame(self, sc: dict, dc: dict, state: dict, inputs: dict):
        cfg = self.config
        view_z = inputs[ResourceType.IN_VIEWZ]
        normal_roughness = inputs[ResourceType.IN_NORMAL_ROUGHNESS]
        mv = inputs[ResourceType.IN_MV]
        diff_in = inputs[ResourceType.IN_DIFF_HITDIST]
        if diff_in.ndim == 2:
            diff_in = diff_in[..., None]
        diff_confidence = inputs.get(ResourceType.IN_DIFF_CONFIDENCE)
        dt_mix = inputs.get(ResourceType.IN_DISOCCLUSION_THRESHOLD_MIX)

        tile_map = K.classify_tiles(sc, view_z)
        dead = K.sky_pixel_mask(sc, tile_map, view_z)

        prev_internal = {"diff_accum": state["diff_accum"],
                         "spec_accum": state["spec_accum"],
                         "material_id": state["material_id"]}

        sm = K.surface_motion_reprojection(
            sc, dc, view_z, normal_roughness, mv, state["prev_view_z"],
            state["prev_normal_roughness"], prev_internal, cfg,
            disocclusion_threshold_mix=dt_mix)

        diff1, fast1, diff_accum, _ = K.temporal_accumulation_diffuse(
            sc, dc, sm, diff_in, state["diff_out_history"], state["diff_fast_history"],
            cfg, diff_confidence, occlusion=True)
        data1_diff = diff_accum  # PackData1 - transient, kept in f32

        settings = self._settings_cache
        diff2, fast2, _ = K.history_fix(
            sc, dc, view_z, normal_roughness, data1_diff, data1_diff, diff1, fast1, cfg,
            is_diffuse=True, occlusion=True, anti_firefly=settings.enableAntiFirefly)

        diff3, _ = K.diffuse_spatial_filter(sc, dc, K.BLUR, diff2, view_z,
                                            normal_roughness, data1_diff, cfg,
                                            occlusion=True)
        diff4, _ = K.diffuse_spatial_filter(sc, dc, K.POST_BLUR, diff3, view_z,
                                            normal_roughness, data1_diff, cfg,
                                            occlusion=True)

        # dead pixels (sky / out of range): passthrough, frozen history
        out = jnp.where(dead[..., None], diff_in, diff4)
        out = K.split_screen(sc, diff_in, view_z, out)

        keep = dead
        new_state = {
            "prev_view_z": view_z,  # Blur pass re-saves raw viewZ (REBLUR_Blur.hlsli:22-23)
            "prev_normal_roughness": jnp.where(keep[..., None],
                                               state["prev_normal_roughness"],
                                               normal_roughness),
            # PostBlur_NoTemporalStabilization increments history (REBLUR_PostBlur.hlsli:49-50)
            "diff_accum": jnp.where(keep, state["diff_accum"],
                                    C.quantize_accum_speed(data1_diff + 1.0)),
            "spec_accum": state["spec_accum"],
            "material_id": jnp.where(keep, state["material_id"],
                                     C.quantize_material_id(sm["material_id"])),
            "diff_fast_history": jnp.where(keep, state["diff_fast_history"], fast2),
            "diff_out_history": out,
        }
        return {ResourceType.OUT_DIFF_HITDIST: out}, new_state
