"""Pixel probe - the TPU equivalent of the reference's shader printf at a chosen pixel
(`CommonSettings::printfAt`, Common.hlsli:152-164 / NRDSettings.h:163).

The reference compiles a printf hook into every shader and prints at one debug pixel.
Here, passes tag named intermediate planes with `emit(name, plane)`; when a probe is
active (printfAt set to a valid pixel), the tagged values at that pixel are collected
as traced scalars and returned with the frame outputs under `Engine.PROBE_KEY` - one
jit, no host sync per value. When no probe is active, `emit` is a no-op (zero cost).

Usage:
    cs.printfAt = (x, y)        # enable; (-1, -1)/None disables
    outs = eng.denoise(...)     # outs[Engine.PROBE_KEY] = {"reblur/ta/diff_accum": ...}
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Optional, Tuple

_active: Optional["_Collector"] = None


class _Collector:
    def __init__(self, xy: Tuple[int, int]):
        self.x, self.y = int(xy[0]), int(xy[1])
        self.values = {}

    def emit(self, name: str, arr):
        if arr is None:
            return
        h, w = arr.shape[0], arr.shape[1]
        if not (0 <= self.y < h and 0 <= self.x < w):
            return
        v = arr[self.y, self.x]
        key = name
        i = 2
        while key in self.values:  # same tag emitted twice (e.g. per-iteration)
            key = f"{name}#{i}"
            i += 1
        self.values[key] = v


def emit(name: str, arr) -> None:
    """Tag an intermediate plane; records plane[y, x] if a probe is active and the
    full plane if a SHOW capture is active."""
    if _active is not None:
        _active.emit(name, arr)
    if _show is not None:
        _show.emit(name, arr)


def active() -> bool:
    return _active is not None


@contextmanager
def collect(xy: Tuple[int, int]):
    """Activate probing at pixel (x, y) for the duration of a frame trace."""
    global _active
    prev = _active
    _active = _Collector(xy)
    try:
        yield _active
    finally:
        _active = prev


# ---------------------------------------------------------------------------
# SHOW modes - full-plane debug capture (REBLUR_Config.hlsli:39-50 analogue)
# ---------------------------------------------------------------------------

_show: Optional["_PlaneCollector"] = None


class _PlaneCollector:
    """Captures the FULL plane of one emitted tag (vs the per-pixel probe).

    The reference's REBLUR_SHOW_* compile-time switches replace the denoiser
    output with an internal quantity (curvature, history confidences, ...);
    here the same emit() tags feed a whole-plane capture - the TPU-native
    equivalent is returning the plane alongside the outputs (one jit, the
    plane is a live value in the traced graph, zero recompute)."""

    def __init__(self, tag: str):
        self.tag = tag
        self.plane = None

    def emit(self, name: str, arr):
        if name == self.tag and self.plane is None and arr is not None:
            self.plane = arr


def show_active() -> bool:
    return _show is not None


@contextmanager
def collect_show(tag: str):
    """Capture the full plane of `tag` for the duration of a frame trace."""
    global _show
    prev = _show
    _show = _PlaneCollector(tag)
    try:
        yield _show
    finally:
        _show = prev
