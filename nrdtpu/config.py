"""Implementation selection: XLA reference path vs Pallas fast path.

Both paths implement the same pass semantics; the XLA path (`passes/*/kernels.py`) is the
readable reference used for correctness tests on CPU, the Pallas path (`kernels/*.py`) is the
TPU production path (fast local Mosaic compiles, VMEM halo blocks; see ARCHITECTURE.md §3).
Select with NRDTPU_IMPL=xla|pallas; default: pallas on TPU, xla elsewhere.
"""

from __future__ import annotations

import os


def use_pallas() -> bool:
    mode = os.environ.get("NRDTPU_IMPL", "auto")
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    import jax

    try:
        platform = jax.devices()[0].platform
    except Exception:
        return False
    # "axon" is a TPU chip behind a tunnelled PJRT plugin; same Mosaic path.
    return platform in ("tpu", "axon")
