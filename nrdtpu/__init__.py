"""nrdtpu - a TPU-native real-time ray-tracing denoising engine.

From-scratch JAX/XLA/Pallas rebuild of the capabilities of NVIDIA Real-Time Denoisers
(NRD v4.14.0): REBLUR, RELAX, SIGMA and REFERENCE denoiser families. See SURVEY.md for the
structural mapping to the reference and ARCHITECTURE.md for the TPU-native design.
"""

from . import camera, frontend, math, settings  # noqa: F401
from .settings import (  # noqa: F401
    AccumulationMode,
    CheckerboardMode,
    CommonSettings,
    Denoiser,
    HitDistanceReconstructionMode,
    NormalEncoding,
    ReblurSettings,
    ReferenceSettings,
    RelaxSettings,
    ResourceType,
    RoughnessEncoding,
    SigmaSettings,
)

__version__ = "0.1.0"
