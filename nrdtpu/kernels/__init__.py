import os


def get_spatial_filter():
    """Select the REBLUR spatial-filter kernel implementation.

    v2 (static tap lattice + per-block level predication) is the default; set
    NRDTPU_BLUR=1 to fall back to the v1 rotated-Poisson kernel for A/B comparison.
    """
    if os.environ.get("NRDTPU_BLUR") == "1":
        from .reblur_pallas import spatial_filter_taps_pallas
        return spatial_filter_taps_pallas
    from .reblur_blur2 import spatial_filter_taps_pallas2
    return spatial_filter_taps_pallas2


def get_history_fix():
    """Select the REBLUR history-fix kernel implementation (see get_spatial_filter)."""
    if os.environ.get("NRDTPU_BLUR") == "1":
        from .reblur_pallas import history_fix_taps_pallas
        return history_fix_taps_pallas
    from .reblur_hfix2 import history_fix_taps_pallas2
    return history_fix_taps_pallas2


def get_sigma_blur():
    """Select the SIGMA blur kernel: (fn, max supported channels).

    The v1 kernel only handles the shadow-only (1-channel) pipeline; v2 also covers
    translucency (4 channels)."""
    if os.environ.get("NRDTPU_BLUR") == "1":
        from .sigma_pallas import sigma_blur_pallas
        return sigma_blur_pallas, 1
    from .sigma_blur2 import sigma_blur_pallas2
    return sigma_blur_pallas2, 4
