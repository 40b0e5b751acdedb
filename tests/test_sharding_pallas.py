"""Multi-chip on the PRODUCTION (Pallas) path: shard_map + halo exchange around
stencil_call2 (parallel/sharding.shard_stencil), asserted sharded == unsharded.

Runs the fused REBLUR spatial filter and history fix in Pallas interpret mode on the
8-device virtual CPU mesh (conftest provisions it). Geometry: H=256 over 8 devices ->
32-row shards with 32-row halos, so the +-32 px tap reach crosses shard boundaries
everywhere (VERDICT r2 #4: shard height < 128, reach >= shard height).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nrdtpu import frontend as fe
from nrdtpu.engine import Engine
from nrdtpu.settings import CommonSettings, Denoiser
from nrdtpu.passes.reblur import kernels as K

# 8 shards x 32 rows; blur reach +-32 px crosses every ROW boundary (the sharded
# dimension). Width is not load-bearing for the halo exchange - keep it at one
# lane tile so the interpret-mode runs stay fast.
W, H = 128, 256
RNG = np.random.default_rng(5)


def _camera():
    eng = Engine({0: Denoiser.REBLUR_DIFFUSE_SPECULAR}, resource_size=(W, H))
    cs = CommonSettings()
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.0
    proj[2, 2] = 1.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    cs.viewToClipMatrix = cs.viewToClipMatrixPrev = proj.flatten(order="F")
    cs.worldToViewMatrix = cs.worldToViewMatrixPrev = np.eye(4, dtype=np.float32).flatten()
    cs.resourceSize = cs.resourceSizePrev = cs.rectSize = cs.rectSizePrev = (W, H)
    cs.motionVectorScale = (1.0, 1.0, 0.0)
    eng.set_common_settings(cs)
    eng.set_common_settings(cs)
    inst = eng._instances[0]
    inst.specialize(eng._settings[0])
    return (eng._shared_consts(), inst.frame_constants(eng._consts, eng._settings[0]),
            inst.config)


def _scene():
    uv_x = (np.arange(W, dtype=np.float32) + 0.5)[None, :] / W
    uv_y = (np.arange(H, dtype=np.float32) + 0.5)[:, None] / H
    view_z = (8.0 + 3.0 * uv_x + 1.5 * uv_y).astype(np.float32)
    view_z[:32] = 1.0e6  # sky band: exercises tile culling under sharding
    n = np.stack([0.2 * np.sin(uv_x * 9.0) * np.ones((H, 1)),
                  0.2 * np.cos(uv_y * 7.0) * np.ones((1, W)),
                  np.ones((H, W), np.float32)], -1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    rough = (0.3 + 0.4 * uv_x * np.ones((H, 1))).astype(np.float32)
    nr = np.asarray(fe.pack_normal_roughness(jnp.asarray(n), jnp.asarray(rough),
                                             jnp.zeros((H, W), jnp.float32)))
    sig = RNG.uniform(0.0, 1.0, (H, W, 4)).astype(np.float32)
    sig[..., 1:3] -= 0.5
    return view_z.astype(np.float32), nr, sig


@pytest.fixture()
def mesh():
    from nrdtpu.parallel.sharding import make_mesh

    assert len(jax.devices()) >= 8, "conftest must provision the 8-device CPU mesh"
    return make_mesh(8)


def _geom(sc, dc, view_z, nr, cfg, dead=True):
    g = K.make_filter_geometry(sc, dc, jnp.asarray(view_z), jnp.asarray(nr), cfg)
    if dead:
        g["dead"] = K.sky_pixel_mask(sc, K.classify_tiles(sc, jnp.asarray(view_z)),
                                     jnp.asarray(view_z))
    return g


@pytest.mark.slow
def test_fused_blur_sharded_equals_unsharded(pallas_interpret, mesh):
    sc, dc, cfg = _camera()
    view_z, nr, sig = _scene()
    data1 = RNG.uniform(0.0, 30.0, (H, W)).astype(np.float32)
    geom = _geom(sc, dc, view_z, nr, cfg)

    def run(m):
        from nrdtpu.kernels.reblur_fused import spatial_filter_fused_pallas

        d_p = K._fused_diff_params(sc, dc, K.BLUR, geom, jnp.asarray(sig),
                                   jnp.asarray(data1), None, False)
        d_p.update(signal=jnp.asarray(sig), sh=None, cb_mask=None)
        s_p = K._fused_spec_params(sc, dc, K.BLUR, geom, jnp.asarray(sig),
                                   jnp.asarray(data1), None, False)
        s_p.update(signal=jnp.asarray(sig), sh=None, cb_mask=None)
        res = spatial_filter_fused_pallas(
            sc, dc, cfg, signals=[d_p, s_p], view_z_in=jnp.asarray(view_z),
            n=geom["n"], nv=geom["nv"], roughness=geom["roughness"],
            material_id=geom["material_id"], ga=geom["ga"], gb=geom["gb"],
            dead=geom["dead"], mesh=m)
        return np.asarray(res[0]["signal"]), np.asarray(res[1]["signal"])

    ref_d, ref_s = run(None)
    got_d, got_s = run(mesh)
    live = view_z < 1e5
    np.testing.assert_allclose(got_d[live], ref_d[live], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got_s[live], ref_s[live], rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_fused_hfix_sharded_equals_unsharded(pallas_interpret, mesh):
    sc, dc, cfg = _camera()
    view_z, nr, sig = _scene()
    # fresh history in the bottom half -> strides fire across shard boundaries
    data1 = np.where(np.arange(H)[:, None] < H // 2, 20.0, 1.0).astype(np.float32)
    data1 = np.broadcast_to(data1, (H, W)).copy()
    fast = RNG.uniform(0.0, 1.0, (H, W)).astype(np.float32)
    geom = _geom(sc, dc, view_z, nr, cfg)

    def run(m):
        from nrdtpu.kernels.reblur_fused import history_fix_fused_pallas

        sigs = []
        for is_d in (True, False):
            p = K._fused_hfix_params(sc, dc, geom, jnp.asarray(sig),
                                     jnp.asarray(data1), is_d)
            p["stride"] = jnp.where(geom["dead"], 0.0, p["stride"])
            p.update(signal=jnp.asarray(sig), sh=None,
                     fast_history=jnp.asarray(fast), anti_firefly=False)
            sigs.append(p)
        res = history_fix_fused_pallas(
            sc, dc, cfg, signals=sigs, view_z_in=jnp.asarray(view_z), n=geom["n"],
            nv=geom["nv"], roughness=geom["roughness"],
            material_id=geom["material_id"], ga=geom["ga"], gb=geom["gb"],
            frustum_size=geom["frustum_size"], dead=geom["dead"], mesh=m)
        return [np.asarray(r["signal"]) for r in res] \
            + [np.asarray(r["fast"]) for r in res]

    ref = run(None)
    got = run(mesh)
    live = view_z < 1e5
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g[live], r[live], rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_smb_resolve_sharded_equals_unsharded(pallas_interpret):
    """TA surface-motion resolve under shard_map (VERDICT r3 ask #4): the
    motion-base gather launches run row-sharded with SHARD_HALO exchanged rows.

    4-device mesh -> 64-row shards (= SHARD_HALO); the motion field pushes
    reprojection up to 20 rows across every shard boundary."""
    from nrdtpu.parallel.sharding import make_mesh

    assert len(jax.devices()) >= 4
    mesh = make_mesh(4)
    sc, dc, cfg = _camera()
    view_z, nr, sig = _scene()
    state_prev_z = (view_z * (1.0 + 0.01 * RNG.uniform(size=(H, W)))) \
        .astype(np.float32)
    hist = [RNG.uniform(0.0, 1.0, (H, W)).astype(np.float32) for _ in range(4)]
    bil = [RNG.uniform(0.0, 1.0, (H, W)).astype(np.float32) for _ in range(2)]
    prev_internal = {
        "diff_accum": RNG.uniform(0.0, 30.0, (H, W)).astype(np.float32),
        "spec_accum": RNG.uniform(0.0, 30.0, (H, W)).astype(np.float32),
        "material_id": np.zeros((H, W), np.float32),
    }
    # vertical + horizontal screen-space motion, varying per pixel: rows cross
    # shard boundaries (up to 20 rows), residuals exercise the wide capture
    uv_y = (np.arange(H, dtype=np.float32) + 0.5)[:, None] / H
    mv = np.zeros((H, W, 3), np.float32)
    mv[..., 0] = (6.0 + 2.0 * uv_y * np.ones((1, W))) / W   # cols
    mv[..., 1] = (20.0 * uv_y - 10.0) / H                   # rows: -10..+10
    def run(m):
        return K.surface_motion_reprojection_pallas(
            sc, dc, jnp.asarray(view_z), jnp.asarray(nr), jnp.asarray(mv),
            jnp.asarray(state_prev_z), jnp.asarray(nr),
            {k: jnp.asarray(v) for k, v in prev_internal.items()}, cfg,
            [jnp.asarray(p) for p in hist], [jnp.asarray(p) for p in bil],
            mesh=m)

    ref = run(None)
    got = run(mesh)
    for key in ("hist", "bil"):
        for r, g in zip(ref[key], got[key]):
            np.testing.assert_allclose(np.asarray(g), np.asarray(r),
                                       rtol=2e-5, atol=2e-5)
    for key in ("diff_accum_speed", "footprint_quality", "fbits"):
        np.testing.assert_allclose(np.asarray(got[key]), np.asarray(ref[key]),
                                   rtol=2e-5, atol=2e-5)
