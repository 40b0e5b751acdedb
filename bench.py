"""Benchmark harness: ms/frame at 1440p on one TPU chip vs the reference's RTX 4080 numbers.

Prints ONE JSON line: {"metric": ..., "value": ..., "unit": "ms/frame", "vs_baseline": ...}
for the flagship config currently implemented (upgraded as denoiser families land), and writes
the full per-config table to bench_details.json.

Baselines are the reference's published frame costs (README.md:18-22, see BASELINE.md).
Timing methodology: device-only time of the jit-compiled frame function (the published NRD
numbers are GPU pass cost, not host bookkeeping), median over repeats, donated history state.
"""

import json
import sys
import time

import numpy as np

RESOLUTION = (2560, 1440)  # 1440p, the reference's headline resolution

# Reference README.md:18-22 (RTX 4080, 1440p) - ms/frame
BASELINES = {
    "REBLUR_DIFFUSE_SPECULAR": 2.30,
    "REBLUR_DIFFUSE_SPECULAR_SH": 3.15,
    "RELAX_DIFFUSE_SPECULAR": 3.00,
    "RELAX_DIFFUSE_SPECULAR_SH": 4.85,
    "SIGMA_SHADOW": 0.40,
    "SIGMA_SHADOW_TRANSLUCENCY": 0.50,
    "REBLUR_DIFFUSE_OCCLUSION": 0.60,   # estimated: ~1/4 of DIFFUSE_SPECULAR (half planes, no stabilization)
    "REFERENCE": 0.10,                  # estimated: 2 trivial passes over RGBA32f
}

# priority order: headline first, then known-good Pallas configs, then the fragile
# XLA-path configs LAST (their 1440p remote compiles can wedge the device for the
# rest of the process - see bench_details notes).
HEADLINE_ORDER = [
    "REBLUR_DIFFUSE_SPECULAR",
    "SIGMA_SHADOW",
    "REBLUR_DIFFUSE_OCCLUSION",
    "REFERENCE",
    "SIGMA_SHADOW_TRANSLUCENCY",
    "RELAX_DIFFUSE_SPECULAR",
    "REBLUR_DIFFUSE_SPECULAR_SH",
    "RELAX_DIFFUSE_SPECULAR_SH",
]


def make_inputs(w, h, seed=0):
    """Synthetic but *structured* 1440p frame inputs (uploaded once; timing excludes
    host->device copies).

    TPU kernel cost is data-independent (no divergence), but the fields must still put the
    pipelines in their typical operating regime: smooth viewZ/normals so geometry weights
    pass, and a penumbra map mixing lit sky (NRD_FP16_MAX), soft penumbrae, and hard-shadow
    cores so SIGMA's tile classifier marks most tiles as "needs denoising" (an all-uniform
    field degenerates to the early-out path and the blur would be benched against no work).
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(-1, 1, h, dtype=np.float32),
                         np.linspace(-1, 1, w, dtype=np.float32), indexing="ij")
    # smooth receiver plane: viewZ ramp + gentle waves (keeps plane-distance weights alive)
    view_z = (5.0 + 20.0 * (yy + 1.0) + 0.8 * np.sin(3.0 * xx) * np.cos(2.0 * yy)
              ).astype(np.float32)
    # smooth normals around +z (view-facing), oct-packed like the frontend does
    nx = 0.35 * np.sin(2.5 * xx + 0.7)
    ny = 0.35 * np.cos(1.9 * yy)
    nz = np.sqrt(np.maximum(1.0 - nx * nx - ny * ny, 1e-4))
    s = np.abs(nx) + np.abs(ny) + np.abs(nz)
    ox, oy = nx / s, ny / s  # nz>0, no fold needed
    normal_roughness = np.stack([ox * 0.5 + 0.5, oy * 0.5 + 0.5,
                                 0.25 + 0.2 * (xx * 0.5 + 0.5),
                                 np.zeros_like(nx)], -1).astype(np.float32)
    # shadow layout: lit background, soft penumbra bands, hard cores (~15% lit, ~70% soft)
    fp16_max = np.float32(65504.0)
    blob = np.sin(6.0 * xx) * np.sin(5.0 * yy + 1.3) + 0.3 * np.sin(13.0 * xx * yy)
    penumbra = np.where(blob > 0.8, fp16_max,                     # lit
                        np.where(blob < -0.9, 0.0,                # hard shadow core
                                 (0.2 + 2.5 * (blob + 0.9) / 1.7))).astype(np.float32)
    mv = np.zeros((h, w, 3), np.float32)
    mv[..., 0] = 0.0004 * np.sin(2.0 * yy)  # sub-pixel screen-space motion
    mv[..., 1] = 0.0003 * np.cos(2.0 * xx)
    return {
        "signal": rng.uniform(0, 1, (h, w, 4)).astype(np.float32),
        "view_z": view_z,
        "mv": mv,
        "normal_roughness": normal_roughness,
        "penumbra": penumbra,
        "translucency": rng.uniform(0, 1, (h, w, 4)).astype(np.float32),
        "hitdist": rng.uniform(0, 1, (h, w)).astype(np.float32),
        "radiance": rng.uniform(0, 1, (h, w, 4)).astype(np.float32),
    }


def time_frame_fn(fn, sc, dc, state, inputs, warmup=1, iters=6, frames_per_call=32,
                  budget_s=120.0):
    """Median device ms/frame of `fn(sc, dc, state, inputs) -> (outs, state)`.

    The axon tunnel dispatches ASYNCHRONOUSLY: `block_until_ready` returns before remote
    execution finishes; only a host data fetch waits for completion. So each timed sample
    fetches a scalar reduced from the final state. The fixed tunnel dispatch+fetch
    latency (~1-30 ms) is measured with a trivial probe jit (compiles in seconds, unlike
    a second scan chain of the full pipeline - remote compiles of the big graphs are
    minutes each) and subtracted. Iteration count adapts to the measured sample cost so
    slow XLA-path configs stay within `budget_s`.
    """
    import jax
    import jax.numpy as jnp

    n = frames_per_call

    # sc/dc/inputs ride as jit ARGUMENTS: closed-over device arrays would be embedded
    # into the program as literal constants (hundreds of MB of MLIR at 1440p), which
    # blows up remote compile time and can exceed the compile-service request limit.
    @jax.jit
    def run(state, sc, dc, inputs):
        def step(state, _):
            outs, new_state = fn(sc, dc, state, inputs)
            return new_state, None

        out, _ = jax.lax.scan(step, state, None, length=n)
        leaves = [jnp.ravel(x)[0].astype(jnp.float32) for x in jax.tree.leaves(out)]
        return out, jnp.sum(jnp.stack(leaves))

    @jax.jit
    def probe(state):
        leaves = [jnp.ravel(x)[0].astype(jnp.float32) for x in jax.tree.leaves(state)]
        return jnp.sum(jnp.stack(leaves))

    def sample():
        nonlocal state
        t0 = time.perf_counter()
        state, s = run(state, sc, dc, inputs)
        _ = np.asarray(s)  # forces remote completion
        return time.perf_counter() - t0

    _ = np.asarray(probe(state))  # compile probe
    lats = []
    for _ in range(5):
        t0 = time.perf_counter()
        _ = np.asarray(probe(state))
        lats.append(time.perf_counter() - t0)
    latency = float(np.median(lats))

    t_first = sample()  # compile + first run
    for _ in range(warmup - 1):
        t_first = sample()
    iters = max(2, min(iters, int(budget_s / max(t_first, 1e-3))))
    ts = [sample() for _ in range(iters)]
    t = float(np.median(ts))
    return max(t - latency, 1e-9) * 1e3 / n


def bench_config(name, raw, w, h):
    import jax

    from nrdtpu.engine import Engine
    from nrdtpu.settings import CommonSettings, Denoiser, ResourceType

    denoiser = Denoiser[name]
    eng = Engine({0: denoiser}, resource_size=(w, h))
    cs = CommonSettings()
    ident = np.eye(4, dtype=np.float32).flatten()
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.0
    proj[2, 2] = 1.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    cs.viewToClipMatrix = cs.viewToClipMatrixPrev = proj.flatten(order="F")
    cs.worldToViewMatrix = cs.worldToViewMatrixPrev = ident
    cs.resourceSize = cs.resourceSizePrev = cs.rectSize = cs.rectSizePrev = (w, h)
    cs.motionVectorScale = (1.0, 1.0, 1.0)
    eng.set_common_settings(cs)

    pool = {}
    if name == "REFERENCE":
        pool[ResourceType.IN_SIGNAL] = raw["signal"]
    else:
        pool[ResourceType.IN_MV] = raw["mv"]
        pool[ResourceType.IN_NORMAL_ROUGHNESS] = raw["normal_roughness"]
        pool[ResourceType.IN_VIEWZ] = raw["view_z"]
        if name.startswith("SIGMA"):
            pool[ResourceType.IN_PENUMBRA] = raw["penumbra"]
            if "TRANSLUCENCY" in name:
                pool[ResourceType.IN_TRANSLUCENCY] = raw["translucency"]
        elif "OCCLUSION" in name and "DIRECTIONAL" not in name:
            if "DIFFUSE" in name:
                pool[ResourceType.IN_DIFF_HITDIST] = raw["hitdist"]
            if "SPECULAR" in name:
                pool[ResourceType.IN_SPEC_HITDIST] = raw["hitdist"]
        else:
            if "DIFFUSE" in name:
                if name.endswith("_SH"):
                    pool[ResourceType.IN_DIFF_SH0] = raw["radiance"]
                    pool[ResourceType.IN_DIFF_SH1] = raw["radiance"]
                else:
                    pool[ResourceType.IN_DIFF_RADIANCE_HITDIST] = raw["radiance"]
            if "SPECULAR" in name:
                if name.endswith("_SH"):
                    pool[ResourceType.IN_SPEC_SH0] = raw["radiance"]
                    pool[ResourceType.IN_SPEC_SH1] = raw["radiance"]
                else:
                    pool[ResourceType.IN_SPEC_RADIANCE_HITDIST] = raw["radiance"]

    pool = {k: jax.device_put(v) for k, v in pool.items()}

    inst = eng._instances[0]
    fn = inst.frame  # raw pure fn; time_frame_fn jits the scanned loop itself
    dc = inst.frame_constants(eng._consts, eng._settings[0])
    sc = eng._shared_consts()
    state = jax.tree.map(jax.device_put, inst.init_state())
    return time_frame_fn(fn, sc, dc, state, pool)


def main():
    w, h = RESOLUTION
    raw = make_inputs(w, h)
    from nrdtpu.engine import _registry
    from nrdtpu.settings import Denoiser

    available = {d.name for d in _registry().keys()}
    results = {}
    headline_printed = False
    t_start = time.time()
    budget_s = float(__import__("os").environ.get("NRDTPU_BENCH_BUDGET_S", "2400"))

    for name in HEADLINE_ORDER:
        if name not in available:
            continue
        # once the headline is in hand, stay within the wall-clock budget for details
        if headline_printed and time.time() - t_start > budget_s:
            results[name] = "SKIPPED: bench budget"
            continue
        try:
            results[name] = bench_config(name, raw, w, h)
        except Exception as e:  # pragma: no cover
            results[name] = f"ERROR: {type(e).__name__}: {str(e)[:300]}"
            if "TPU device error" in str(e) and headline_printed:
                # the device is wedged for this process; further configs would all fail
                results["_note"] = "stopped: device wedged by a previous config"
                with open("bench_details.json", "w") as f:
                    json.dump({"resolution": f"{w}x{h}", "results_ms": results,
                               "baselines_ms": BASELINES}, f, indent=2)
                break
        with open("bench_details.json", "w") as f:  # incremental: survive timeouts
            json.dump({"resolution": f"{w}x{h}", "results_ms": results,
                       "baselines_ms": BASELINES}, f, indent=2)
        if not headline_printed and isinstance(results.get(name), float):
            ms = results[name]
            print(json.dumps({
                "metric": f"{name} frame time @1440p (1 TPU chip)",
                "value": round(ms, 4),
                "unit": "ms/frame",
                "vs_baseline": round(BASELINES[name] / ms, 4),
            }), flush=True)
            headline_printed = True

    with open("bench_details.json", "w") as f:
        json.dump({"resolution": f"{w}x{h}", "results_ms": results,
                   "baselines_ms": BASELINES}, f, indent=2)

    if not headline_printed:
        print(json.dumps({"metric": "no config available", "value": 0,
                          "unit": "ms/frame", "vs_baseline": 0}))
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
