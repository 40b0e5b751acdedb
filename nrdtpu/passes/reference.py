"""REFERENCE denoiser - plain temporal accumulation (ground-truth convergence tool).

Rebuild of /root/reference/Source/Denoisers/Reference.hpp and the two shaders
REFERENCE_TemporalAccumulation.cs.hlsl / REFERENCE_Copy.cs.hlsl as one fused jitted function.

State (the "permanent pool", Reference.hpp:21-26): a single RGBA32f history plane.
Host-side accumulation counter semantics ported from Update_Reference (Reference.hpp:55-74):
reset on any camera matrix / rect change or history reset; else grow to the max.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..settings import REFERENCE_MAX_HISTORY_FRAME_NUM, ReferenceSettings, ResourceType


class ReferenceDenoiser:
    """Host wrapper: owns the accumulation counter + matrix change detection."""

    name = "REFERENCE"

    def __init__(self, config):
        self.config = config
        self._accumulated_frame_num = 0
        self._world_to_clip_prev = None

    # -- pool ---------------------------------------------------------------
    def init_state(self):
        h, w = self.config.rect_size[1], self.config.rect_size[0]
        return {"history": jnp.zeros((h, w, 4), jnp.float32)}

    # -- per-frame host update (Reference.hpp:55-89) --------------------------
    def frame_constants(self, consts: dict, settings: ReferenceSettings) -> dict:
        # Reference.hpp:65-68 compares the camera-relative m_WorldToClip to m_WorldToClipPrev
        # of the SAME frame: any camera rotation/translation/projection change differs there
        # (the prev matrix carries the translation delta).
        changed = (not np.array_equal(np.asarray(consts["world_to_clip"]),
                                      np.asarray(consts["world_to_clip_prev"]))
                   or consts["reset_history"] > 0.0
                   or consts["is_rect_changed"] > 0.0)
        if changed:
            self._accumulated_frame_num = 0
        else:
            max_frames = min(settings.maxAccumulatedFrameNum, REFERENCE_MAX_HISTORY_FRAME_NUM)
            self._accumulated_frame_num = min(self._accumulated_frame_num + 1, max_frames)
        return {
            "accum_speed": np.float32(1.0 / (1.0 + self._accumulated_frame_num)),
            "split_screen": consts["split_screen"],
        }

    # -- device frame (pure, jitted by the engine) ----------------------------
    @staticmethod
    def frame(sc: dict, dc: dict, state: dict, inputs: dict):
        """One frame: accumulate + copy. `sc` = shared consts, `dc` = denoiser consts."""
        signal = inputs[ResourceType.IN_SIGNAL]
        if signal.ndim == 2:
            signal = signal[..., None]
        history = state["history"]
        chans = signal.shape[-1]

        # REFERENCE_TemporalAccumulation.cs.hlsl:29-35
        new_history = history.at[..., :chans].set(
            history[..., :chans] + (signal - history[..., :chans]) * dc["accum_speed"])

        # REFERENCE_Copy.cs.hlsl:22-26 + split screen: left strip passes the noisy input
        h, w = signal.shape[0], signal.shape[1]
        u = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
        use_out = (u > dc["split_screen"])[None, :, None]
        out = jnp.where(use_out, new_history[..., :chans], signal)

        return {ResourceType.OUT_SIGNAL: out}, {"history": new_history}
