"""Harness v2 (static-slice taps over edge-normalized windows) unit tests.

Runs in interpret mode on CPU. Geometry chosen to exercise the nopad path (exact
block division + alignment) so the pl.when edge normalization is covered.
"""

import numpy as np
import pytest

import jax
import jax.experimental.pallas as pl_mod
import jax.numpy as jnp

from nrdtpu.kernels.harness2 import block_minmax, stencil_call2


@pytest.fixture()
def interpret(monkeypatch):
    orig = pl_mod.pallas_call

    def interp(*a, **k):
        k = dict(k)
        k["interpret"] = True
        return orig(*a, **k)

    monkeypatch.setattr(pl_mod, "pallas_call", interp)
    yield


def test_static_taps_nopad_interior_exact(interpret):
    # (192, 1280) with want (160,512) resolves to (96, 256) blocks: nopad path
    h, w = 192, 1280
    rng = np.random.default_rng(0)
    img = rng.random((h, w)).astype(np.float32)

    def body(smem, bsm, wins, centers, outs, origin, scratch):
        outs[0][:, :] = wins[0].tap(5, -7) * 2.0 + wins[0].tap(-32, 128)

    (out,) = stencil_call2(body, [jnp.asarray(img)], n_out=1)
    out = np.asarray(out)
    exp = np.roll(img, (-5, 7), (0, 1)) * 2.0 + np.roll(img, (32, -128), (0, 1))
    sl = (slice(33, h - 33), slice(129, w - 129))
    np.testing.assert_allclose(out[sl], exp[sl], rtol=0, atol=0)


def test_bf16_window_and_shift(interpret):
    h, w = 192, 1280
    rng = np.random.default_rng(1)
    img = rng.random((h, w)).astype(np.float32)

    def body(smem, bsm, wins, centers, outs, origin, scratch):
        sh = wins[0].shift(jnp.int32(3), jnp.int32(-9))
        outs[0][:, :] = sh.tap(1, 2)  # total offset (4, -7)
        outs[1][:, :] = wins[1].tap(2, 3)  # bf16 upcast tap

    (a, b) = stencil_call2(
        body, [jnp.asarray(img), jnp.asarray(img, jnp.bfloat16)], n_out=2,
        shiftable=[True, False])
    sl = (slice(33, h - 33), slice(129, w - 129))
    np.testing.assert_allclose(np.asarray(a)[sl], np.roll(img, (-4, 7), (0, 1))[sl],
                               rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(b)[sl], np.roll(img, (-2, -3), (0, 1))[sl],
                               rtol=0.01, atol=0.01)  # bf16 storage error


def test_block_minmax_agrees_with_grid():
    h, w = 192, 1280
    rng = np.random.default_rng(2)
    img = rng.random((h, w)).astype(np.float32)
    mn, mx = block_minmax(jnp.asarray(img))
    mn, mx = np.asarray(mn), np.asarray(mx)
    assert mn.shape == mx.shape
    gh, gw = mn.shape
    bh, bw = h // gh, w // gw
    t = img.reshape(gh, bh, gw, bw)
    np.testing.assert_allclose(mn, t.min((1, 3)))
    np.testing.assert_allclose(mx, t.max((1, 3)))


@pytest.mark.slow
def test_blur2_matches_v1_identity_rotator(interpret):
    """v3's lattice == v1's rotated lattice: identity rotator + uniform level radius.

    The v3 redesign (one block-level disk + per-pixel Gaussian rescale, reblur_blur2
    module docstring) only coincides with v1's per-pixel lattice when the radius is
    uniform and equal to a RADIUS_LEVELS entry - there the level selection is exact
    and the Gaussian rescale reduces to v1's per-tap Gaussian."""
    from nrdtpu.engine import DenoiserConfig
    from nrdtpu.kernels.reblur_blur2 import spatial_filter_taps_pallas2 as v2
    from nrdtpu.kernels.reblur_pallas import spatial_filter_taps_pallas as v1
    from nrdtpu.settings import Denoiser

    H, W = 96, 128
    rng = np.random.default_rng(0)
    sc = {"view_z_scale": 1.0, "rect_size": np.array([W, H], np.float32),
          "ortho_mode": 0.0, "frustum": np.array([-1.0, -1.0, 2.0, 2.0], np.float32)}
    dc = {"hit_dist_params": np.array([3.0, 0.1, 20.0, -25.0], np.float32),
          "diff_min_material": 0.0}
    config = DenoiserConfig(denoiser=Denoiser.REBLUR_DIFFUSE, rect_size=(W, H),
                            resource_size=(W, H))
    # valid octahedral encodings so v1's in-kernel decode of the packed plane and
    # v2's caller-decoded normal planes see the same sample normals
    import nrdtpu.math as nm
    n = rng.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    enc = np.asarray(nm.encode_unit_vector(jnp.asarray(n), signed=False))
    packed = np.concatenate([enc, rng.random((H, W, 1)).astype(np.float32),
                             np.zeros((H, W, 1), np.float32)], -1).astype(np.float32)
    n = np.asarray(nm.normalize(nm.decode_unit_vector(jnp.asarray(enc), signed=False,
                                                      do_normalize=True)))
    kw = dict(rotator=jnp.asarray([1.0, 0.0, 0.0, 1.0]),
              signal=jnp.asarray(rng.random((H, W, 4)), jnp.float32), sh=None,
              view_z_in=jnp.asarray(1.0 + rng.random((H, W)), jnp.float32),
              normal_roughness=jnp.asarray(packed, jnp.float32),
              blur_radius=jnp.full((H, W), 8.0, jnp.float32),  # == RADIUS_LEVELS[2]
              ga=jnp.full((H, W), 5.0), gb=jnp.full((H, W), 0.1),
              normal_weight_param=jnp.full((H, W), 2.0),
              ha=jnp.full((H, W), -1.0), hb=jnp.full((H, W), 0.0),
              min_hit_dist_weight=jnp.full((H, W), 0.2),
              material_id=jnp.zeros((H, W)),
              n=jnp.asarray(n), nv=jnp.asarray(n))
    a = np.asarray(v1(sc, dc, config, **kw)[0])
    b = np.asarray(v2(sc, dc, config, **kw)[0])
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # v3 runs bf16 windows (reblur_blur2 docstring) -> quantization-level differences;
    # the lattice/weight shape must still agree closely
    assert np.abs(a - b).mean() < 0.01, np.abs(a - b).mean()
    corr = np.corrcoef(a.ravel(), b.ravel())[0, 1]
    assert corr > 0.995, corr


def test_nearest_resolve_multi_matches_single(interpret):
    """One multi-base launch == N separate nearest_resolve launches."""
    from nrdtpu.kernels.reblur_pallas import nearest_resolve, nearest_resolve_multi

    h, w = 192, 1280
    rng = np.random.default_rng(4)
    planes = [jnp.asarray(rng.random((h, w)).astype(np.float32)) for _ in range(3)]
    sets = []
    for k in range(3):
        mvy = jnp.asarray((rng.random((h, w)) * 16 - 8 + 5 * k).astype(np.float32))
        mvx = jnp.asarray((rng.random((h, w)) * 40 - 20 - 7 * k).astype(np.float32))
        sets.append((mvy, mvx))
    multi = nearest_resolve_multi(planes, sets)
    for (mvy, mvx), (got, gvalid) in zip(sets, multi):
        exp, evalid = nearest_resolve(planes, mvy, mvx)
        np.testing.assert_array_equal(np.asarray(gvalid), np.asarray(evalid))
        for a, b in zip(got, exp):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dma_base_offset_windows(interpret):
    """Per-block DMA offsets reproduce in-screen shifted reads exactly."""
    h, w = 192, 1280
    rng = np.random.default_rng(3)
    img = rng.random((h, w)).astype(np.float32)
    # block grid for (96, 256) blocks
    gh, gw = h // 96, w // 256
    oy = np.array([[(3 * i + j) % 9 - 4 for j in range(gw)] for i in range(gh)], np.int32)
    ox = np.array([[(17 * i - 5 * j) % 49 - 24 for j in range(gw)] for i in range(gh)],
                  np.int32)

    def body(smem, bsm, wins, centers, outs, origin, scratch):
        outs[0][:, :] = wins[0].tap(1, -2)

    (out,) = stencil_call2(body, [jnp.asarray(img)], n_out=1,
                           base_offset=(jnp.asarray(oy), jnp.asarray(ox)),
                           offset_windows=[True])
    out = np.asarray(out)
    exp = np.empty_like(img)
    for i in range(gh):
        for j in range(gw):
            ys, xs = slice(i * 96, (i + 1) * 96), slice(j * 256, (j + 1) * 256)
            yy = np.arange(i * 96, (i + 1) * 96)[:, None] + oy[i, j] + 1
            xx = np.arange(j * 256, (j + 1) * 256)[None, :] + ox[i, j] - 2
            yy = np.clip(yy, 0, h - 1)
            xx = np.clip(xx, 0, w - 1)
            exp[ys, xs] = img[yy, xx]
    # compare where the shifted read is fully in-screen (borders wrap by design)
    ok = np.ones((h, w), bool)
    for i in range(gh):
        for j in range(gw):
            ys, xs = slice(i * 96, (i + 1) * 96), slice(j * 256, (j + 1) * 256)
            yy = np.arange(i * 96, (i + 1) * 96)[:, None] + oy[i, j] + 1
            xx = np.arange(j * 256, (j + 1) * 256)[None, :] + ox[i, j] - 2
            ok[ys, xs] = ((yy >= 0) & (yy < h)) & ((xx >= 0) & (xx < w))
    assert np.array_equal(out[ok], exp[ok])


def test_block_skip_culls_windows(interpret):
    """block_skip: culled blocks trade window DMAs for zero-filled windows; the
    body runs on the zeros (Common.hlsli:118-135 CTA-cull analogue)."""
    from nrdtpu.kernels.harness2 import block_dead_mask

    h, w = 192, 512  # nopad geometry: blocks divide exactly
    rng = np.random.default_rng(3)
    img = rng.uniform(1.0, 2.0, (h, w)).astype(np.float32)
    dead = np.zeros((h, w), bool)
    dead[:96] = True  # top half of the block rows fully dead
    skip, px = block_dead_mask(jnp.asarray(dead), block=(96, 512), halo=(32, 128))
    assert np.asarray(skip).sum() >= 1.0

    def body(smem, bsm, wins, centers, outs, origin, scratch):
        outs[0][:, :] = wins[0].tap(0, 0) + 1.0

    (out,) = stencil_call2(body, [jnp.asarray(img)], n_out=1,
                           block=(96, 512), block_skip=skip)
    out = np.asarray(out)
    px = np.asarray(px)
    # culled blocks: body saw zeroed windows -> 0 + 1
    assert np.allclose(out[px], 1.0)
    # live blocks: untouched
    assert np.allclose(out[~px], img[~px] + 1.0)


def test_block_wide_flag_gates_exact_capture():
    """block_wide_flag: pans (residual < 1 px everywhere) stay narrow; a zoom-like
    in-block motion gradient > 1 px flags the block wide (reblur_pallas
    _smb_kernel's block-adaptive exact-capture fork)."""
    import jax.numpy as jnp
    from nrdtpu.kernels.reproject import block_motion_base, block_wide_flag

    h, w = 96, 128
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # pure pan with fractional part: residual 0.5 px everywhere -> narrow
    mvy = np.full((h, w), 2.5, np.float32)
    mvx = np.full((h, w), 4.5, np.float32)
    by, bx = block_motion_base(jnp.asarray(mvy), jnp.asarray(mvx))
    wf = np.asarray(block_wide_flag(jnp.asarray(mvy), jnp.asarray(mvx), by, bx))
    assert wf.max() == 0.0, wf

    # zoom-like radial gradient: +-3 px across the frame -> wide blocks exist
    mvx_z = ((xx - w / 2) / (w / 2) * 3.0).astype(np.float32)
    mvy_z = ((yy - h / 2) / (h / 2) * 3.0).astype(np.float32)
    by, bx = block_motion_base(jnp.asarray(mvy_z), jnp.asarray(mvx_z))
    wf = np.asarray(block_wide_flag(jnp.asarray(mvy_z), jnp.asarray(mvx_z), by, bx))
    assert wf.max() == 1.0, wf
