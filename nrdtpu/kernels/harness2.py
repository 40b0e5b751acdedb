"""Halo-window kernel harness v2: static-slice taps over edge-normalized VMEM windows.

v1 (`harness.py`) materialized each halo'd window as a value and applied `pltpu.roll`
per tap - runtime-uniform lane rotates are the single most expensive vector op in these
kernels (~21 us per full-res tap-plane measured, see bench_micro.py) and the cached
full-window values create register/VMEM spill pressure in fat kernels.

v2 exploits a structural fact: with block/halo geometry that divides the image, the DMA
start clamping offset ("comp") is nonzero ONLY for edge blocks and is then exactly +-halo.
So the window is normalized ONCE, in place, under `pl.when(comp != 0)` - interior blocks
(the majority) pay one scalar compare - and every tap afterwards is a *static slice of the
scratch ref* (one unaligned vector load, ~10.6 us per full-res tap-plane, no live
window-sized values). Dynamic runtime-uniform shifts (reprojection motion bases) roll the
window once into a shadow scratch and re-tap statically from there.

bf16 windows are supported: taps upcast at the slice. The normalization/shift rolls (which
Mosaic restricts to 32-bit) go through an f32 upcast-roll-downcast, paid only on edge
blocks / per shift. Pass bf16 *arrays* in if the plane already lives in bf16 - converting
an f32 plane at the call site costs an extra HBM round trip that usually cancels the win.

Reference analogue: the CTA groupshared preload of Common.hlsli:109-150.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .harness import pick_block


class Win2:
    """A halo'd, edge-normalized VMEM window; taps are static slices of the ref.

    tap(dy, dx): (bh, bw) f32 block at static integer offset (dy, dx) from the center.
    shift(oy, ox): roll the window by runtime-uniform scalars into `shadow` (a second
      scratch ref) and return a Win2 over it - subsequent static taps are plain slices.
      Offsets beyond the halo wrap; kernels mask with in-screen weights.
    """

    def __init__(self, ref, bh, bw, hy, hx, upcast=False, shadow=None, row0=0):
        self._ref = ref
        self.bh, self.bw, self.hy, self.hx = bh, bw, hy, hx
        self._upcast = upcast
        self._shadow = shadow
        # row0: extra row base added to every slice start. Must be a STATIC
        # python int in TPU-compiled kernels: a traced base plus an arbitrary
        # static tap offset reaches Mosaic's dynamic-slice divisibility prover,
        # which cannot prove dim-0 alignment for offsets not a multiple of 8
        # (the round-4 on-chip failure; ARCHITECTURE.md section 8). Static
        # slicing is preserved when row0 is the python int 0.
        self._row0 = row0

    def _rows(self, r0, n):
        if isinstance(self._row0, int) and self._row0 == 0:
            return slice(r0, r0 + n)
        from jax.experimental import pallas as pl

        return pl.ds(self._row0 + r0, n)

    def at_rows(self, row0, bh):
        """A view of this window whose taps cover `bh` rows starting `row0` rows
        below the block's first row (row0 may be traced)."""
        return Win2(self._ref, bh, self.bw, self.hy, self.hx,
                    upcast=self._upcast, shadow=self._shadow, row0=row0)

    def tap(self, dy: int = 0, dx: int = 0):
        assert isinstance(dy, int) and isinstance(dx, int), "static taps only"
        assert abs(dy) <= self.hy and abs(dx) <= self.hx, (dy, dx, self.hy, self.hx)
        val = self._ref[self._rows(self.hy + dy, self.bh),
                        self.hx + dx: self.hx + dx + self.bw]
        return val.astype(jnp.float32) if self._upcast else val

    def tapb(self, dy: int = 0, dx: int = 0):
        """tap() without the f32 upcast: the window's own dtype (bf16 tap loops).

        A bf16 vreg holds 2x the elements of an f32 one, so an all-bf16 tap chain
        issues ~half the vector ops (measured: fma 1.9 vs 3.1 us/full-res plane,
        unaligned load 5.6 vs 13.6 - bench_vpu/bench_micro)."""
        assert isinstance(dy, int) and isinstance(dx, int), "static taps only"
        assert abs(dy) <= self.hy and abs(dx) <= self.hx, (dy, dx, self.hy, self.hx)
        return self._ref[self._rows(self.hy + dy, self.bh),
                         self.hx + dx: self.hx + dx + self.bw]

    def ext(self, ry: int, rx: int):
        """(bh + 2*ry, bw + 2*rx) static slice centered on the block.

        Building block for separable stencils over computed planes: slice once,
        derive the plane, then row/column-shift the VALUE instead of re-tapping."""
        assert ry <= self.hy and rx <= self.hx, (ry, rx, self.hy, self.hx)
        val = self._ref[self._rows(self.hy - ry, self.bh + 2 * ry),
                        self.hx - rx: self.hx + rx + self.bw]
        return val.astype(jnp.float32) if self._upcast else val

    def band(self, dy0: int, dy1: int, dx: int = 0):
        """(bh + dy1 - dy0, bw) static slice: rows [dy0, bh + dy1) around the center.

        Building block for separable box sums (row-sum bands then column sums)."""
        val = self._ref[self._rows(self.hy + dy0, self.bh + dy1 - dy0),
                        self.hx + dx: self.hx + dx + self.bw]
        return val.astype(jnp.float32) if self._upcast else val

    def full(self):
        val = self._ref[:, :]
        return val.astype(jnp.float32) if self._upcast else val

    def shift(self, oy, ox):
        assert self._shadow is not None, "mark this window shiftable in stencil_call2"
        val = self._ref[:, :].astype(jnp.float32)
        val = pltpu.roll(val, jnp.mod(-oy, val.shape[0]), 0)
        val = pltpu.roll(val, jnp.mod(-ox, val.shape[1]), 1)
        self._shadow[:, :] = val
        return Win2(self._shadow, self.bh, self.bw, self.hy, self.hx, upcast=False)


def _normalize(ref, cy, cx):
    """Roll the window in place so the block center sits at (hy, hx).

    comp is +-halo at image-edge blocks and 0 elsewhere; predicated so interior blocks
    pay one scalar compare. 32-bit-only Mosaic rolls -> f32 round trip for bf16 refs.
    """

    @pl.when((cy != 0) | (cx != 0))
    def _():
        val = ref[:, :]
        bf16 = val.dtype == jnp.bfloat16
        if bf16:
            val = val.astype(jnp.float32)
        val = pltpu.roll(val, jnp.mod(-cy, val.shape[0]), 0)
        val = pltpu.roll(val, jnp.mod(-cx, val.shape[1]), 1)
        ref[:, :] = val.astype(jnp.bfloat16) if bf16 else val


def stencil_call2(body, images: Sequence, n_out: int, *,
                  halo=(32, 128), block=(160, 512), scalars=None,
                  block_scalars: Sequence = (), center_inputs: Sequence = (),
                  shiftable: Sequence = None, scratch_blocks: int = 0,
                  base_offset=None, offset_windows: Sequence = None,
                  block_skip=None, origin_offset=None, interpret: bool = False):
    """Run `body(smem, bsm, wins, centers, outs, (y0, x0), scratch)` over halo'd blocks.

    images: (H, W) arrays (f32 or bf16 - dtype taken from the array) delivered as
      halo'd VMEM windows via manual DMA; `center_inputs` as plain (bh, bw) VMEM blocks
      (upcast to f32 on read is the body's job if it passes bf16 arrays).
    n_out: number of (H, W) f32 outputs.
    scalars: optional (N,) f32 SMEM array of frame constants.
    block_scalars: (gh, gw) arrays in SMEM, indexed by the body with program ids.
    shiftable: per-window bools; True allocates an f32 shadow scratch enabling Win2.shift.
    scratch_blocks: extra (bh, bw) f32 VMEM scratch refs handed to the body (accumulators
      for predicated multi-level loops).
    base_offset: optional ((gh, gw) i32, (gh, gw) i32) per-block (oy, ox) pair - OR a
      list of such pairs - added to the DMA start of windows flagged in
      `offset_windows`: reprojection motion bases ride the DMA for free instead of
      paying a window roll. With a list, `offset_windows` entries are int indices into
      it (True means pair 0), so one launch can resolve several motion fields (e.g.
      surface + virtual + prev-prev taps) over shared HBM planes. Offsets must stay
      within halo bounds (block_motion_base guarantees this); image-edge overreach is
      folded into the pl.when normalization like the static comp.
    block_skip: optional (gh, gw) f32; blocks with a non-zero entry skip ALL window
      DMAs (zero-filling the VMEM windows instead) - the CTA-culling analogue
      (tile-map-driven, Common.hlsli:118-135). The body still runs (on the zeroed
      windows); callers should also append the mask to `block_scalars` and fold it
      into the body's per-block predicates to cut the tap loops.
    origin_offset: optional (2,) i32 (traced ok) added to the (y0, x0) the body
      sees - the row-sharded multi-chip path (parallel/sharding.shard_stencil) runs
      the kernel on a halo-padded LOCAL shard and passes (shard_row0 - halo, 0) so
      in-kernel pixel coordinates (uv reconstruction, in-screen tests) stay GLOBAL.
    """
    n_windows = len(images)
    h, w = images[0].shape[:2]
    hy, hx = halo
    bh, bw = pick_block(h, w, block, halo)
    gh, gw = -(-h // bh), -(-w // bw)
    ph, pw = gh * bh, gw * bw

    # normalize base_offset to a list of (by, bx) pairs + integer window indices
    if base_offset is not None and not isinstance(base_offset, list):
        base_offset = [base_offset]
    if offset_windows is not None:
        offset_windows = [0 if o is True else o if o is not False and o is not None
                          else None for o in offset_windows]
    win_h, win_w = bh + 2 * hy, bw + 2 * hx
    if shiftable is None:
        shiftable = [False] * n_windows
    if offset_windows is None:
        offset_windows = [None] * n_windows
    assert base_offset is not None \
        or not any(o is not None for o in offset_windows)

    # comp-in-{0, +-halo} requires exact division + alignment; otherwise edge-pad (tests)
    any_off = any(o is not None for o in offset_windows)
    nopad = (h == ph and w == pw and h % 8 == 0 and w % 128 == 0
             and hy % 8 == 0 and hx % 128 == 0 and bh % 8 == 0 and bw % 128 == 0
             and h >= win_h + (8 if any_off else 0)
             and w >= win_w + (128 if any_off else 0))

    # offset windows are (8, 128) larger: the tile-alignment remainder of the DMA
    # start (absorbed by the normalization roll) consumes up to (7, 127) of slack
    owin_h, owin_w = win_h + 8, win_w + 128

    center_inputs = [c if getattr(c, "ndim", 2) == 2
                     else jnp.broadcast_to(jnp.asarray(c), (h, w))
                     for c in center_inputs]
    if nopad:
        hbm_imgs = list(images)
        centers = list(center_inputs)
    else:
        ey, ex = (8, 128) if any_off else (0, 0)
        hbm_imgs = [jnp.pad(img, ((hy, hy + ph - h + ey), (hx, hx + pw - w + ex)),
                            mode="edge")
                    for img in images]
        centers = [jnp.pad(c, ((0, ph - h), (0, pw - w)), mode="edge")
                   for c in center_inputs]

    num_scalars = 0 if scalars is None else scalars.shape[0]
    n_center = len(centers)
    n_bs = len(block_scalars)
    n_off = 2 * len(base_offset) if base_offset is not None else 0
    n_shadow = sum(bool(s) for s in shiftable)
    win_dtypes = [img.dtype for img in hbm_imgs]

    def kernel(*refs):
        idx = 0
        smem = None
        if num_scalars:
            smem = refs[0]
            idx = 1
        oo_ref = None
        if origin_offset is not None:
            oo_ref = refs[idx]
            idx += 1
        off_refs = refs[idx: idx + n_off]
        idx += n_off
        skip_ref = None
        if block_skip is not None:
            skip_ref = refs[idx]
            idx += 1
        bsm = list(refs[idx: idx + n_bs])
        idx += n_bs
        hbm_refs = refs[idx: idx + n_windows]
        center_refs = refs[idx + n_windows: idx + n_windows + n_center]
        out_refs = refs[idx + n_windows + n_center:
                        idx + n_windows + n_center + n_out]
        scratch = refs[idx + n_windows + n_center + n_out:]
        win_refs = scratch[:n_windows]
        shadow_refs = list(scratch[n_windows:n_windows + n_shadow])
        blk_scratch = list(scratch[n_windows + n_shadow:
                                   n_windows + n_shadow + scratch_blocks])
        sem = scratch[n_windows + n_shadow + scratch_blocks]

        i = pl.program_id(0)
        j = pl.program_id(1)
        y0 = i * bh
        x0 = j * bw

        # static-window start (comp in {0, +-halo} on the nopad path)
        hh, ww = (h, w) if nopad else (ph + 2 * hy, pw + 2 * hx)
        oy0 = y0 - hy if nopad else y0
        ox0 = x0 - hx if nopad else x0
        sy = jnp.clip(oy0, 0, hh - win_h)
        sx = jnp.clip(ox0, 0, ww - win_w)
        # Mosaic's divisibility prover needs explicit hints on dynamic DMA starts.
        # nopad: oy0 = i*bh - hy with bh % 8 == 0, hy % 8 == 0, clip bounds 0 and
        # h - win_h both tile-aligned. padded: oy0 = i*bh, clip bound ph - bh =
        # (gh-1)*bh - every term is a multiple of bh, so aligned whenever bh is
        # (pick_block candidates are all multiples of 8 / 128; the guard covers
        # caller-supplied odd blocks). Without the padded-path hints the whole
        # engine fails Mosaic compile at any resolution that doesn't divide into
        # aligned blocks (e.g. 256x160 - the driver's entry() size).
        if nopad or (bh % 8 == 0 and hy % 8 == 0):
            sy = pl.multiple_of(sy, 8)
        if nopad or (bw % 128 == 0 and hx % 128 == 0):
            sx = pl.multiple_of(sx, 128)
        cy, cx = oy0 - sy, ox0 - sx
        starts = []
        if base_offset is not None:
            # Mosaic requires DMA starts aligned to the (8, 128) tile: floor-align and
            # let the normalization roll absorb the remainder (one roll pair per
            # offset window - the roll fires via the same pl.when as edge comp).
            # One (start, comp) set per base-offset pair.
            hhb = hh + (8 if not nopad else 0)
            wwb = ww + (128 if not nopad else 0)
            for p_ in range(len(base_offset)):
                by = off_refs[2 * p_][i, j]
                bx = off_refs[2 * p_ + 1][i, j]
                syb = jnp.clip(oy0 + by, 0, hhb - owin_h)
                sxb = jnp.clip(ox0 + bx, 0, wwb - owin_w)
                syb = pl.multiple_of((syb // 8) * 8, 8)
                sxb = pl.multiple_of((sxb // 128) * 128, 128)
                starts.append((syb, sxb, (oy0 + by) - syb, (ox0 + bx) - sxb))

        def fetch_windows():
            copies = []
            for k, (src, dst) in enumerate(zip(hbm_refs, win_refs)):
                if offset_windows[k] is not None:
                    syb, sxb, _, _ = starts[offset_windows[k]]
                    copies.append(pltpu.make_async_copy(
                        src.at[pl.ds(syb, owin_h), pl.ds(sxb, owin_w)], dst,
                        sem.at[k]))
                else:
                    copies.append(pltpu.make_async_copy(
                        src.at[pl.ds(sy, win_h), pl.ds(sx, win_w)], dst, sem.at[k]))
            for c in copies:
                c.start()
            for c in copies:
                c.wait()
            for k, r in enumerate(win_refs):
                if offset_windows[k] is not None:
                    _, _, cyb, cxb = starts[offset_windows[k]]
                    _normalize(r, cyb, cxb)
                elif nopad:
                    _normalize(r, cy, cx)

        if skip_ref is None:
            fetch_windows()
        else:
            # block culling: skipped blocks trade the HBM window DMAs for cheap
            # VMEM zero-fills; the body runs unconditionally on the zeroed windows
            # (identical semantics on TPU and in interpret mode - pl.when around
            # the body itself would put pl.program_id inside a cond, which the
            # interpreter cannot lower), and its own block-scalar predicates are
            # expected to fold the skip in to cut the tap loops.
            skip = skip_ref[i, j]

            @pl.when(skip == 0.0)
            def _():
                fetch_windows()

            @pl.when(skip != 0.0)
            def _():
                for r, dt in zip(win_refs, win_dtypes):
                    r[:, :] = jnp.zeros(r.shape, dt)

        sh_iter = iter(shadow_refs)
        wins = [Win2(r, bh, bw, hy, hx, upcast=dt == jnp.bfloat16,
                     shadow=next(sh_iter) if sf else None)
                for r, dt, sf in zip(win_refs, win_dtypes, shiftable)]
        oy_, ox_ = (y0, x0) if oo_ref is None else (y0 + oo_ref[0], x0 + oo_ref[1])
        body(smem, bsm, wins, list(center_refs), list(out_refs), (oy_, ox_),
             blk_scratch)

    in_specs = []
    if num_scalars:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    n_oo = 1 if origin_offset is not None else 0
    n_skip = 1 if block_skip is not None else 0
    in_specs += [pl.BlockSpec(memory_space=pltpu.SMEM)] * (n_oo + n_off + n_skip + n_bs)
    in_specs += [pl.BlockSpec(memory_space=pl.ANY)] * n_windows
    in_specs += [pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                              memory_space=pltpu.VMEM)] * n_center

    out_specs = tuple(pl.BlockSpec((bh, bw), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM) for _ in range(n_out))
    out_shape = tuple(jax.ShapeDtypeStruct((ph, pw), jnp.float32)
                      for _ in range(n_out))

    scratch_shapes = (
        [pltpu.VMEM((owin_h, owin_w) if off is not None else (win_h, win_w), dt)
         for dt, off in zip(win_dtypes, offset_windows)]
        + [pltpu.VMEM((win_h, win_w), jnp.float32)
           for s in shiftable if s]
        + [pltpu.VMEM((bh, bw), jnp.float32) for _ in range(scratch_blocks)]
        + [pltpu.SemaphoreType.DMA((n_windows,))])

    off_args = [jnp.asarray(o, jnp.int32) for pair in base_offset for o in pair] \
        if base_offset is not None else []
    oo_args = [jnp.asarray(origin_offset, jnp.int32).reshape(2)] \
        if origin_offset is not None else []
    skip_args = [jnp.asarray(block_skip, jnp.float32)] if block_skip is not None else []
    args = ([scalars] if num_scalars else []) + oo_args + off_args + skip_args \
        + list(block_scalars) + hbm_imgs + centers
    outs = pl.pallas_call(
        kernel, grid=(gh, gw),
        in_specs=in_specs,
        out_specs=out_specs if n_out > 1 else out_specs[0],
        out_shape=out_shape if n_out > 1 else out_shape[0],
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if n_out == 1:
        outs = (outs,)
    return tuple(o[:h, :w] for o in outs)


def block_dead_mask(dead, block=(160, 512), halo=(32, 128)):
    """(grid skip, pixel mask) for tile-map block culling (Common.hlsli:118-135).

    grid skip: (gh, gw) f32, 1.0 where EVERY pixel of the block is dead - feed to
    stencil_call2(block_skip=...). pixel mask: (h, w) bool, the same decision
    broadcast back to pixels - the XLA path must zero its result there
    (`jnp.where(px_mask, 0, out)`) so both paths stay bit-identical."""
    h, w = dead.shape
    bh, bw = pick_block(h, w, block, halo)
    gh, gw = -(-h // bh), -(-w // bw)
    d = dead.astype(jnp.float32)
    if gh * bh != h or gw * bw != w:
        # pad with dead so partial edge blocks only skip if their real pixels are dead
        d = jnp.pad(d, ((0, gh * bh - h), (0, gw * bw - w)), constant_values=1.0)
    skip = (d.reshape(gh, bh, gw, bw).min((1, 3)) > 0.0).astype(jnp.float32)
    px = jnp.repeat(jnp.repeat(skip > 0.0, bh, 0), bw, 1)[:h, :w]
    return skip, px


def block_minmax(plane, block=(160, 512), halo=(32, 128)):
    """Per-block (min, max) of a plane as (gh, gw) f32 arrays for block_scalars.

    Uses the same block choice as stencil_call2 so grids agree.
    """
    h, w = plane.shape
    bh, bw = pick_block(h, w, block, halo)
    gh, gw = -(-h // bh), -(-w // bw)
    if gh * bh != h or gw * bw != w:
        plane = jnp.pad(plane, ((0, gh * bh - h), (0, gw * bw - w)), mode="edge")
    t = plane.reshape(gh, bh, gw, bw)
    return t.min((1, 3)), t.max((1, 3))
