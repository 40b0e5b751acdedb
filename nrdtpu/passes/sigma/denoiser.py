"""SIGMA_SHADOW / SIGMA_SHADOW_TRANSLUCENCY denoiser instance.

Pass graph from Source/Sigma.cpp:25-90 + Source/Denoisers/Sigma_Shadow.hpp:46-155, fused
into one jitted function. The COPY pass (snapshotting OUT_SHADOW_TRANSLUCENCY because history
lives in the output texture, Sigma_Shadow.hpp:71-84) disappears: history is a state carry.

State (permanent pool + the output-as-history trick):
  shadow_history : (h, w, c) sqrt-packed previous output
  prev_view_z    : (h, w)   viewZ stored alongside history length (R32_UINT pack split)
  history_len    : (h, w)   0..7
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ...settings import (
    SIGMA_MAX_HISTORY_FRAME_NUM,
    AccumulationMode,
    Denoiser,
    ResourceType,
    SigmaSettings,
)
from . import kernels as K


class SigmaDenoiser:
    def __init__(self, config):
        self.config = config
        self.translucent = config.denoiser == Denoiser.SIGMA_SHADOW_TRANSLUCENCY
        self.channels = 4 if self.translucent else 1
        self._stabilization = True  # refreshed by specialize()

    def static_key(self, settings: SigmaSettings):
        return (settings.maxStabilizedFrameNum > 0,)

    def specialize(self, settings: SigmaSettings):
        self._stabilization = settings.maxStabilizedFrameNum > 0

    def init_state(self):
        w, h = self.config.rect_size
        return {
            # [0,1] shadow/translucency history in bf16 (the reference packs it
            # into R32_UINT as unorm; 8 mantissa bits cover the 8-bit-class signal)
            "shadow_history": jnp.zeros((h, w, self.channels), jnp.bfloat16),
            "prev_view_z": jnp.zeros((h, w), jnp.float32),
            "history_len": jnp.zeros((h, w), jnp.float32),
        }

    def frame_constants(self, consts: dict, settings: SigmaSettings) -> dict:
        """AddSharedConstants_Sigma (Sigma.cpp:92-145), denoiser-specific part."""
        frame_num = min(settings.maxStabilizedFrameNum, SIGMA_MAX_HISTORY_FRAME_NUM)
        stabilization_strength = frame_num / (1.0 + frame_num)
        if consts["reset_history"] > 0.0:
            stabilization_strength = 0.0
        ld = np.asarray(settings.lightDirection, np.float32)
        light_dir_view = np.asarray(consts["world_to_view"])[:3, :3] @ ld
        return {
            "stabilization_strength": np.float32(stabilization_strength),
            "plane_dist_sensitivity": np.float32(settings.planeDistanceSensitivity),
            "light_direction_view": light_dir_view.astype(np.float32),
        }

    def frame(self, sc: dict, dc: dict, state: dict, inputs: dict):
        sc = dict(sc)
        sc["plane_dist_sensitivity"] = dc["plane_dist_sensitivity"]
        penumbra = inputs[ResourceType.IN_PENUMBRA]
        view_z = inputs[ResourceType.IN_VIEWZ]
        normal_roughness = inputs[ResourceType.IN_NORMAL_ROUGHNESS]
        mv = inputs.get(ResourceType.IN_MV)
        translucency = inputs.get(ResourceType.IN_TRANSLUCENCY) if self.translucent else None

        kw = dict(translucent=self.translucent, channels=self.channels,
                  normal_encoding=self.config.normal_encoding,
                  roughness_encoding=self.config.roughness_encoding)

        from ...config import use_pallas

        tile_map = K.classify_tiles(sc, penumbra, view_z, translucency)
        tiles_smoothed = K.smooth_tiles(tile_map)

        shadow_in0 = translucency if self.translucent else None
        from ...kernels import get_sigma_blur
        sigma_blur_pallas, blur_channels = get_sigma_blur()
        pallas_ok = use_pallas() and self.channels <= blur_channels
        rs_static = self.config.rect_size == self.config.resource_size

        # The single-launch band pipeline (blur1+blur2+TS in one Pallas call with
        # sliding VMEM buffers) was DELETED in round 5 after the on-chip A/B:
        # 19.5 ms vs 5.96 ms for the 3-launch chain at 1440p (per-grid-step
        # window re-DMA + serial in-kernel DMA waits dominate; see
        # ARCHITECTURE.md section 8 and the REBLUR twin's numbers in
        # bench_details.json). Don't carry a slower parallel implementation.
        if pallas_ok:

            penum1, shadow1 = sigma_blur_pallas(
                sc, dc, penumbra, shadow_in0, view_z, normal_roughness, tiles_smoothed,
                first_pass=True, channels=self.channels, rs_static=rs_static)
            penum2, shadow2 = sigma_blur_pallas(
                sc, dc, penum1, shadow1, view_z, normal_roughness, tiles_smoothed,
                first_pass=False, channels=self.channels, rs_static=rs_static)
        else:
            penum1, shadow1 = K.blur(sc, dc, penumbra, shadow_in0, view_z,
                                     normal_roughness, tiles_smoothed,
                                     first_pass=True, **kw)
            penum2, shadow2 = K.blur(sc, dc, penum1, shadow1, view_z, normal_roughness,
                                     tiles_smoothed, first_pass=False, **kw)

        from ...utils import probe as _pb
        if _pb.active():
            _pb.emit("sigma/tiles_smoothed", tiles_smoothed)
            _pb.emit("sigma/blur/penumbra1", penum1)
            _pb.emit("sigma/postblur/penumbra2", penum2)
            _pb.emit("sigma/history_len", state["history_len"])

        if self._stabilization and mv is not None:
            if mv.ndim == 3 and mv.shape[-1] == 2:
                mv = jnp.concatenate([mv, jnp.zeros_like(mv[..., :1])], -1)
            if pallas_ok:
                from ...kernels.sigma_pallas import sigma_ts_pallas

                out, new_prev_view_z, new_history_len = sigma_ts_pallas(
                    sc, dc, view_z, mv, penum2, shadow2,
                    state["shadow_history"], state["prev_view_z"], state["history_len"],
                    tiles_smoothed, channels=self.channels, rs_static=rs_static)
            else:
                out, new_prev_view_z, new_history_len = K.temporal_stabilization(
                    sc, dc, view_z, mv, penum2, shadow2,
                    state["shadow_history"], state["prev_view_z"], state["history_len"],
                    tiles_smoothed, channels=self.channels)
            new_state = {"shadow_history": out, "prev_view_z": new_prev_view_z,
                         "history_len": new_history_len}
        else:
            out = shadow2
            new_state = {"shadow_history": out, "prev_view_z": jnp.abs(view_z),
                         "history_len": state["history_len"]}

        out = K.split_screen(sc, penumbra, view_z, out, translucency,
                             channels=self.channels)
        from ...config import requantize_state
        return ({ResourceType.OUT_SHADOW_TRANSLUCENCY: out},
                requantize_state(state, new_state))
