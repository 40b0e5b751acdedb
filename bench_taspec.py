"""Where TA-specular's 12 ms lives: stub each Pallas gather launch and measure
the delta vs the real stage (16-frame scan methodology, bench_stages setup).

Stubs return correctly-shaped cheap values, so deltas isolate each launch's cost
(floor + work) from the XLA glue that stays. `allstub` = pure-glue residual.

Usage: python bench_taspec.py [full prelude shift nearest multi vmb allstub]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from bench import setup_jax_cache

setup_jax_cache()

import bench_stages as BS

N = BS.N


def main():
    which = sys.argv[1:] or ["full", "prelude", "shift", "nearest", "multi",
                             "vmb", "allstub"]
    eng, inst, sc, dc, state, pool = BS.setup()
    from nrdtpu.passes.reblur import kernels as K
    from nrdtpu.settings import ResourceType as RT
    from nrdtpu.kernels.reblur_pallas import PallasSampler

    cfg = inst.config
    env = {
        "view_z": pool[RT.IN_VIEWZ],
        "nr": pool[RT.IN_NORMAL_ROUGHNESS],
        "mv": pool[RT.IN_MV],
        "diff_in0": pool[RT.IN_DIFF_RADIANCE_HITDIST],
        "spec_in0": pool[RT.IN_SPEC_RADIANCE_HITDIST],
    }

    # materialize upstream stage outputs once (geometry -> prepass -> smb)
    @jax.jit
    def upstream(env):
        geom = K.make_filter_geometry(sc, dc, env["view_z"], env["nr"], cfg)
        fr = K.fused_spatial_filter(
            sc, dc, K.PRE_BLUR, geom, env["view_z"], cfg,
            diff=dict(signal=env["diff_in0"], sh=None),
            spec=dict(signal=env["spec_in0"], sh=None), occlusion=False)
        prev_internal = {k: state[k]
                         for k in ("diff_accum", "spec_accum", "material_id")}
        hist_planes = [state["diff_history"][..., c] for c in range(4)] \
            + [state["spec_history"][..., c] for c in range(4)]
        bil_planes = [state["diff_fast_history"], state["spec_fast_history"]]
        sm = K.surface_motion_reprojection_pallas(
            sc, dc, env["view_z"], env["nr"], env["mv"], state["prev_view_z"],
            state["prev_normal_roughness"], prev_internal, cfg,
            hist_planes, bil_planes, disocclusion_threshold_mix=None)
        return fr["spec"], fr["spec_hdt"], sm

    env["spec_in"], env["spec_hdt_prepass"], env["sm"] = jax.tree.map(
        lambda x: x, upstream(env))

    @jax.jit
    def probe(x):
        return jnp.ravel(x)[0]

    _ = np.asarray(probe(env["view_z"]))
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(env["view_z"]))
        lats.append(time.perf_counter() - t0)
    lat = float(np.median(lats))
    print(f"latency baseline: {lat * 1e3:.1f} ms", flush=True)

    def make_sampler(stubs):
        sampler = PallasSampler(sc)
        if "prelude" in stubs:
            sampler.spec_prelude = lambda hdt, r: (hdt, r * r, r ** 4)
        if "shift" in stubs:
            sampler.shift = lambda planes, offs: [[p for _ in offs]
                                                  for p in planes]
        if "nearest" in stubs:
            def near(planes, uv, rect_cur=False):
                valid = jnp.ones(planes[0].shape[:2], jnp.float32)
                return [p * 1.0 for p in planes], valid
            sampler.nearest = near
        if "multi" in stubs:
            def multi(planes, uvs, rect_cur=False):
                valid = jnp.ones(planes[0].shape[:2], jnp.float32)
                return [([p * 1.0 for p in planes], valid) for _ in uvs]
            sampler.nearest_multi = multi
        if "vmb" in stubs:
            def vmb_stub(sc_, dc_, config_, **kw):
                z = env["sm"]["view_z"]
                zeros = jnp.zeros_like(z)
                ones = jnp.ones_like(z)
                return dict(rough_conf=ones, fbits_vmb=zeros,
                            footprint_raw=ones, spec_accum_speed_raw=ones,
                            allow_catrom=ones, hdt_prev=zeros,
                            spec_hist=jnp.zeros(z.shape + (4,), jnp.float32),
                            spec_fast=zeros)
            sampler.vmb_bundle = vmb_stub
        return sampler

    def run(name, stubs):
        sampler = make_sampler(stubs)

        def st_tas(e):
            sm = env["sm"]
            prev_internal = {k: state[k]
                             for k in ("diff_accum", "spec_accum", "material_id")}
            spec_samples = dict(history=jnp.stack(sm["hist"][4:8], -1),
                                fast=sm["bil"][1])
            return K.temporal_accumulation_specular(
                sc, dc, sm, env["spec_in"] + e, state["spec_history"],
                state["spec_fast_history"], env["view_z"], env["nr"],
                state["prev_view_z"], state["prev_normal_roughness"],
                prev_internal, env["spec_hdt_prepass"],
                state["prev_spec_hitdist_for_tracking"], cfg, None,
                occlusion=False, has_prepass_hitdist=True, spec_sh_input=None,
                spec_sh_history=None, samples=spec_samples, sampler=sampler)

        @jax.jit
        def loop(e):
            def step(c, _):
                o = st_tas(c)
                leaf = jnp.ravel(jax.tree.leaves(o)[0])[0].astype(jnp.float32)
                return c + leaf * 1e-20, None
            c, _ = jax.lax.scan(step, e, None, length=N)
            return c

        t0 = time.perf_counter()
        c = loop(jnp.float32(0.0))
        _ = np.asarray(c)
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = np.asarray(loop(jnp.float32(0.0)))
            ts.append(time.perf_counter() - t0)
        ms = (float(np.median(ts)) - lat) / N * 1e3
        print(f"{name:12s}: {ms:8.3f} ms  (compile {comp:.0f}s)", flush=True)
        return ms

    base = None
    for w in which:
        stubs = () if w == "full" else \
            ("prelude", "shift", "nearest", "multi", "vmb") if w == "allstub" \
            else (w,)
        try:
            ms = run(w, stubs)
        except Exception as ex:  # a stub shape mismatch shouldn't kill the sweep
            print(f"{w:12s}: FAILED {type(ex).__name__}: {ex}", flush=True)
            continue
        if w == "full":
            base = ms
        elif base is not None:
            print(f"{'':14s}-> {w} share: {base - ms:+.3f} ms", flush=True)


if __name__ == "__main__":
    main()
