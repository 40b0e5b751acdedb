"""Standalone 1440p timing of the REBLUR spatial-filter kernel, v1 vs v2."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from nrdtpu.engine import DenoiserConfig
from nrdtpu.settings import Denoiser

H, W = 1440, 2560


def make_args(spec=False):
    rng = np.random.default_rng(0)
    sc = {"view_z_scale": 1.0, "rect_size": np.array([W, H], np.float32),
          "ortho_mode": 0.0, "frustum": np.array([-1.0, -1.0, 2.0, 2.0], np.float32),
          "rotator": np.array([1.0, 0.0, 0.0, 1.0], np.float32)}
    dc = {"hit_dist_params": np.array([3.0, 0.1, 20.0, -25.0], np.float32),
          "diff_min_material": 0.0, "spec_min_material": 0.0}
    config = DenoiserConfig(denoiser=Denoiser.REBLUR_DIFFUSE, rect_size=(W, H),
                            resource_size=(W, H))
    n = rng.normal(size=(H, W, 3)).astype(np.float32)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    kw = dict(rotator=jnp.asarray(sc["rotator"]),
              signal=jnp.asarray(rng.random((H, W, 4)), jnp.float32), sh=None,
              view_z_in=jnp.asarray(1.0 + rng.random((H, W)), jnp.float32),
              normal_roughness=jnp.asarray(rng.random((H, W, 4)), jnp.float32),
              # spatially smooth radius like production (radius ~ sqrt(hitDistFactor
              # / (1+N)) fields): blocks see a narrow range -> level predication works
              blur_radius=jnp.asarray(
                  15.0 + 14.0 * np.sin(np.linspace(0, 6, H))[:, None]
                  * np.cos(np.linspace(0, 8, W))[None, :], jnp.float32),
              ga=jnp.full((H, W), 5.0), gb=jnp.full((H, W), 0.1),
              normal_weight_param=jnp.full((H, W), 2.0),
              ha=jnp.full((H, W), -1.0), hb=jnp.full((H, W), 0.0),
              min_hit_dist_weight=jnp.full((H, W), 0.2),
              material_id=jnp.zeros((H, W)),
              n=jnp.asarray(n), nv=jnp.asarray(n))
    if spec:
        kw.update(wr_a=jnp.full((H, W), 1.0), wr_b=jnp.full((H, W), 0.0), spec=True)
    return sc, dc, config, kw


def timed(fn, sc, dc, config, kw, label, reps=(4, 20)):
    def make(n):
        @jax.jit
        def loop(sig):
            def step(c, _):
                out = fn(sc, dc, config, **{**kw, "signal": c})[0]
                return out, None
            return jax.lax.scan(step, sig, None, length=n)[0][0, 0, 0]
        return loop

    sig = kw["signal"]
    l1, l2 = make(reps[0]), make(reps[1])

    def t(loop, n=4):
        _ = np.asarray(loop(sig))
        ts = []
        for k in range(n):
            t0 = time.perf_counter()
            _ = np.asarray(loop(sig + np.float32(k + 1) * 1e-4))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    dt = (t(l2) - t(l1)) / (reps[1] - reps[0]) * 1e3
    print(f"{label:24s}: {dt:8.3f} ms", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["v2", "v1"]
    sc, dc, config, kw = make_args()
    if "v2" in which:
        from nrdtpu.kernels.reblur_blur2 import spatial_filter_taps_pallas2
        timed(spatial_filter_taps_pallas2, sc, dc, config, kw, "blur v2 (diff)")
    if "v1" in which:
        from nrdtpu.kernels.reblur_pallas import spatial_filter_taps_pallas
        timed(spatial_filter_taps_pallas, sc, dc, config, kw, "blur v1 (diff)")
