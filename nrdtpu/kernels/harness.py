"""Halo-window kernel harness: the TPU-native replacement for CTA groupshared preloads.

The reference preloads (GROUP + 2*BORDER)^2 texels into groupshared memory and lets 256
threads walk neighborhoods (Common.hlsli:109-150). Here each Mosaic grid block DMAs a halo'd
window from HBM into VMEM scratch and taps become vector ops at static or runtime-uniform
offsets (`pltpu.roll` + aligned slice); per-pixel offsets are resolved by weight arithmetic
over a small static tap set (see reproject.py).

Two window modes:
  * no-pad (production): images stay unpadded in HBM; the DMA start is clamped to the array
    and a per-block compensating roll re-centres the window. Avoids per-frame `jnp.pad`,
    which costs ~17 ms/array at 1440p through this backend's XLA path (ARCHITECTURE.md,
    "backend findings"). Border taps see wrapped rows/cols - kernels mask them with
    in-screen weights, which replaces the reference's clamp-sampler border semantics with
    exclude-and-renormalise (documented divergence, quality-neutral for 2-32 px borders).
  * padded (fallback for small or unaligned images, and for CPU interpret tests): inputs are
    edge-padded by the halo so every tap is in-bounds; no compensation rolls.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pick_block(h: int, w: int, want=(64, 256), halo=(32, 128)):
    """Deterministic block choice: prefer `want`, else a size that divides the image.

    A block that does not divide the image forces the padded fallback (per-frame XLA
    edge-pads of EVERY window and centre input - ~17 ms each at 1440p on this backend),
    so exact division matters more than the preferred aspect: 1440p uses (96, 256).
    Callers that precompute per-block data (reproject.block_motion_base) use the same
    function so grids always agree with stencil_call."""
    bh, bw = want
    if h % bh or h < bh + 2 * halo[0]:
        for cand in (96, 64, 128, 80, 48, 160, 32, 112, 144, 24, 16, 8):
            if h % cand == 0 and h >= cand + 2 * halo[0]:
                bh = cand
                break
    if w % bw or w < bw + 2 * halo[1]:
        for cand in (256, 512, 384, 128, 640, 768):
            if w % cand == 0 and w >= cand + 2 * halo[1]:
                bw = cand
                break
    return bh, bw


class Win:
    """A halo'd VMEM window around the current block, with cached base compensation.

    tap(dy, dx): static-offset view of the (bh, bw) centre, dy/dx Python ints.
    tap_dyn(oy, ox): runtime-uniform scalar offsets (frame constants like rotated
      Poisson taps). Offsets beyond the halo wrap - mask with in-screen weights.
    full(): the re-centred full window (centre at [hy:hy+bh, hx:hx+bw]).
    """

    def __init__(self, ref, bh, bw, hy, hx, comp, upcast=False):
        self._ref = ref
        self.bh, self.bw, self.hy, self.hx = bh, bw, hy, hx
        self._comp = comp  # None (padded mode) or (dy, dx) runtime scalars
        self._full = None
        self._upcast = upcast  # bf16 window -> f32 at the centre slice

    def full(self):
        if self._full is None:
            val = self._ref[:, :]
            if self._comp is not None:
                cy, cx = self._comp
                val = pltpu.roll(val, jnp.mod(-cy, val.shape[0]), 0)
                val = pltpu.roll(val, jnp.mod(-cx, val.shape[1]), 1)
            self._full = val
        return self._full

    def _center(self, val):
        out = val[self.hy: self.hy + self.bh, self.hx: self.hx + self.bw]
        return out.astype(jnp.float32) if self._upcast else out

    def tap(self, dy: int = 0, dx: int = 0):
        val = self.full()
        if dy != 0:
            val = pltpu.roll(val, (-dy) % val.shape[0], 0)
        if dx != 0:
            val = pltpu.roll(val, (-dx) % val.shape[1], 1)
        return self._center(val)

    def tap_dyn(self, oy, ox):
        val = self.full()
        val = pltpu.roll(val, jnp.mod(-oy, val.shape[0]), 0)
        val = pltpu.roll(val, jnp.mod(-ox, val.shape[1]), 1)
        return self._center(val)

    def shifted(self, oy, ox):
        """A rebased Win whose static taps read at (+oy, +ox) runtime-uniform offsets.

        The roll is applied ONCE and shared by all subsequent static taps - the cheap way
        to combine a per-block motion base with a static tap neighbourhood (reproject.py)."""
        val = self.full()
        val = pltpu.roll(val, jnp.mod(-oy, val.shape[0]), 0)
        val = pltpu.roll(val, jnp.mod(-ox, val.shape[1]), 1)
        w2 = Win(self._ref, self.bh, self.bw, self.hy, self.hx, None,
                 upcast=self._upcast)
        w2._full = val
        return w2


def stencil_call(body, images: Sequence, n_windows: int, n_out: int, *,
                 halo=(32, 128), block=(64, 256), scalars=None,
                 block_scalars: Sequence = (), center_inputs: Sequence = (),
                 window_dtypes: Sequence = None, interpret: bool = False):
    """Run `body(smem, bsm, wins, centers, outs, (y0, x0))` over halo'd blocks of `images`.

    images: (H, W) f32 arrays; the first n_windows get halo'd VMEM windows (manual DMA),
    the rest plus `center_inputs` are delivered as plain (bh, bw) VMEM blocks.
    Outputs: n_out (H, W) f32 arrays.
    scalars: optional (N,) f32 SMEM array of frame constants.
    block_scalars: (gh, gw) arrays in SMEM - per-block values (e.g. motion bases); the body
      indexes them with the block ids it gets via `origin` division or program_id.
    body receives: smem ref (or None), [block-scalar refs...], [Win...], [center refs...],
      [out refs...], origin.
    """
    assert n_windows == len(images)
    h, w = images[0].shape[:2]
    hy, hx = halo
    bh, bw = pick_block(h, w, block, halo)
    gh, gw = -(-h // bh), -(-w // bw)
    ph, pw = gh * bh, gw * bw
    win_h, win_w = bh + 2 * hy, bw + 2 * hx

    nopad = (h == ph and w == pw and h % 8 == 0 and w % 128 == 0
             and h >= win_h and w >= win_w)

    # bf16 windows halve the VMEM roll cost of the halo'd planes (the dominant vector
    # work); taps upcast to f32 at the (bh, bw) centre slice. Callers mark which planes
    # tolerate 8-bit-mantissa storage (UNORM-coded data, radiance mirroring the
    # reference's fp16 textures) - viewZ stays f32 (plane-distance tests need it).
    if window_dtypes is None:
        window_dtypes = [None] * n_windows
    images = [img if dt is None else img.astype(dt)
              for img, dt in zip(images, window_dtypes)]
    # weight-parameter planes are often scalars for default settings - broadcast to 2D
    center_inputs = [c if getattr(c, "ndim", 2) == 2
                     else jnp.broadcast_to(jnp.asarray(c), (h, w))
                     for c in center_inputs]

    if nopad:
        hbm_imgs = list(images)
        centers = [jnp.pad(c, ((0, ph - h), (0, pw - w))) if c.shape[:2] != (ph, pw)
                   else c for c in center_inputs]
    else:
        hbm_imgs = [jnp.pad(img, ((hy, hy + ph - h), (hx, hx + pw - w)), mode="edge")
                    for img in images]
        centers = [jnp.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
                   for c in center_inputs]

    num_scalars = 0 if scalars is None else scalars.shape[0]
    n_center = len(centers)
    n_bs = len(block_scalars)

    def kernel(*refs):
        idx = 0
        smem = None
        if num_scalars:
            smem = refs[0]
            idx = 1
        bsm = list(refs[idx: idx + n_bs])
        idx += n_bs
        hbm_refs = refs[idx: idx + n_windows]
        center_refs = refs[idx + n_windows: idx + n_windows + n_center]
        out_refs = refs[idx + n_windows + n_center:
                        idx + n_windows + n_center + n_out]
        scratch = refs[idx + n_windows + n_center + n_out:]
        win_refs = scratch[:n_windows]
        sem = scratch[n_windows]

        i = pl.program_id(0)
        j = pl.program_id(1)
        y0 = i * bh
        x0 = j * bw

        if nopad:
            sy = jnp.clip(y0 - hy, 0, h - win_h)
            sx = jnp.clip(x0 - hx, 0, w - win_w)
            sy = pl.multiple_of(sy, 8)
            sx = pl.multiple_of(sx, 128)
            comp = ((y0 - hy) - sy, (x0 - hx) - sx)
        else:
            sy = pl.multiple_of(y0, 8)
            sx = pl.multiple_of(x0, 128)
            comp = None

        copies = [pltpu.make_async_copy(
            src.at[pl.ds(sy, win_h), pl.ds(sx, win_w)], dst, sem.at[k])
            for k, (src, dst) in enumerate(zip(hbm_refs, win_refs))]
        for c in copies:
            c.start()
        for c in copies:
            c.wait()

        wins = [Win(r, bh, bw, hy, hx, comp, upcast=dt is not None)
                for r, dt in zip(win_refs, window_dtypes)]
        body(smem, bsm, wins, list(center_refs), list(out_refs), (y0, x0))

    in_specs = []
    if num_scalars:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * n_bs
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_windows
    in_specs += [pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)] * n_center

    out_specs = tuple(pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM) for _ in range(n_out))
    out_shape = tuple(jax.ShapeDtypeStruct((ph, pw), jnp.float32)
                      for _ in range(n_out))

    scratch_shapes = [pltpu.VMEM((win_h, win_w),
                                 jnp.float32 if dt is None else dt)
                      for dt in window_dtypes] + \
                     [pltpu.SemaphoreType.DMA((n_windows,))]

    args = ([scalars] if num_scalars else []) + list(block_scalars) + hbm_imgs + centers
    outs = pl.pallas_call(
        kernel, grid=(gh, gw),
        in_specs=in_specs,
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shape if n_out > 1 else out_shape[0],
        scratch_shapes=scratch_shapes,
        # fat kernels (REBLUR blur/TA: ~20 windows + dozens of live window-sized rolls)
        # exceed the default 16M scoped-vmem budget; v5e has far more physical VMEM.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if n_out == 1:
        outs = (outs,)
    return tuple(o[:h, :w] for o in outs)
