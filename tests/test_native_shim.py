"""Test the native C ABI shim (native/) against the python engine path.

Loads libnrdtpu_c.so via ctypes into this process (the shim attaches to the already-running
interpreter), runs the REFERENCE denoiser through the C API, and checks the output matches
the direct python Engine result exactly.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LIB = os.path.join(ROOT, "native", "build", "libnrdtpu_c.so")


class CommonSettingsC(ctypes.Structure):
    _fields_ = [
        ("view_to_clip_matrix", ctypes.c_float * 16),
        ("view_to_clip_matrix_prev", ctypes.c_float * 16),
        ("world_to_view_matrix", ctypes.c_float * 16),
        ("world_to_view_matrix_prev", ctypes.c_float * 16),
        ("world_prev_to_world_matrix", ctypes.c_float * 16),
        ("motion_vector_scale", ctypes.c_float * 3),
        ("camera_jitter", ctypes.c_float * 2),
        ("camera_jitter_prev", ctypes.c_float * 2),
        ("resource_size", ctypes.c_uint16 * 2),
        ("resource_size_prev", ctypes.c_uint16 * 2),
        ("rect_size", ctypes.c_uint16 * 2),
        ("rect_size_prev", ctypes.c_uint16 * 2),
        ("view_z_scale", ctypes.c_float),
        ("time_delta_between_frames", ctypes.c_float),
        ("denoising_range", ctypes.c_float),
        ("disocclusion_threshold", ctypes.c_float),
        ("disocclusion_threshold_alternate", ctypes.c_float),
        ("camera_attached_reflection_material_id", ctypes.c_float),
        ("strand_material_id", ctypes.c_float),
        ("strand_thickness", ctypes.c_float),
        ("split_screen", ctypes.c_float),
        ("debug", ctypes.c_float),
        ("rect_origin", ctypes.c_uint32 * 2),
        ("frame_index", ctypes.c_uint32),
        ("accumulation_mode", ctypes.c_uint8),
        ("is_motion_vector_in_world_space", ctypes.c_uint8),
        ("is_history_confidence_available", ctypes.c_uint8),
        ("is_disocclusion_threshold_mix_available", ctypes.c_uint8),
        ("is_base_color_metalness_available", ctypes.c_uint8),
        ("enable_validation", ctypes.c_uint8),
    ]


class DenoiserDescC(ctypes.Structure):
    _fields_ = [("identifier", ctypes.c_uint32), ("denoiser", ctypes.c_int)]


class ResourceSlotC(ctypes.Structure):
    _fields_ = [("type", ctypes.c_int), ("data", ctypes.POINTER(ctypes.c_float)),
                ("channels", ctypes.c_uint32)]


@pytest.fixture(scope="module")
def lib():
    if not os.path.exists(LIB):
        r = subprocess.run(["make"], cwd=os.path.join(ROOT, "native"),
                           capture_output=True, text=True)
        assert r.returncode == 0, r.stderr
    lib = ctypes.CDLL(LIB)
    lib.nrdtpu_get_last_error.restype = ctypes.c_char_p
    lib.nrdtpu_get_version_string.restype = ctypes.c_char_p
    return lib


def make_common_settings(w, h, frame_index):
    import numpy as np

    s = CommonSettingsC()
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.0
    proj[2, 2] = 1.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    flat = proj.flatten(order="F")
    for name in ("view_to_clip_matrix", "view_to_clip_matrix_prev"):
        getattr(s, name)[:] = flat.tolist()
    ident = np.eye(4, dtype=np.float32).flatten(order="F")
    for name in ("world_to_view_matrix", "world_to_view_matrix_prev",
                 "world_prev_to_world_matrix"):
        getattr(s, name)[:] = ident.tolist()
    s.motion_vector_scale[:] = [1.0, 1.0, 0.0]
    for name in ("resource_size", "resource_size_prev", "rect_size", "rect_size_prev"):
        getattr(s, name)[:] = [w, h]
    s.view_z_scale = 1.0
    s.denoising_range = 500000.0
    s.disocclusion_threshold = 0.01
    s.disocclusion_threshold_alternate = 0.05
    s.camera_attached_reflection_material_id = 999.0
    s.strand_material_id = 999.0
    s.strand_thickness = 80e-6
    s.frame_index = frame_index
    return s


def test_version(lib):
    assert b"nrdtpu" in lib.nrdtpu_get_version_string()


def test_reference_denoiser_matches_python(lib):
    w, h = 64, 48
    descs = (DenoiserDescC * 1)(DenoiserDescC(0, 18))  # REFERENCE
    inst = ctypes.c_void_p()
    r = lib.nrdtpu_create_instance(descs, 1, w, h, 2, 1, ctypes.byref(inst))
    assert r == 0, lib.nrdtpu_get_last_error()

    rng = np.random.default_rng(0)
    signals = [rng.uniform(0, 1, (h, w, 4)).astype(np.float32) for _ in range(3)]
    out = np.zeros((h, w, 4), np.float32)

    for i, sig in enumerate(signals):
        cs = make_common_settings(w, h, i)
        r = lib.nrdtpu_set_common_settings(inst, ctypes.byref(cs))
        assert r == 0, lib.nrdtpu_get_last_error()
        sig_c = np.ascontiguousarray(sig)
        slots = (ResourceSlotC * 2)(
            ResourceSlotC(18, sig_c.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 4),
            ResourceSlotC(29, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), 4),
        )
        idents = (ctypes.c_uint32 * 1)(0)
        r = lib.nrdtpu_denoise(inst, idents, 1, slots, 2)
        assert r == 0, lib.nrdtpu_get_last_error()

    # python reference path
    from nrdtpu.engine import Engine
    from nrdtpu.settings import CommonSettings, Denoiser, ResourceType

    eng = Engine({0: Denoiser.REFERENCE}, resource_size=(w, h))
    proj = np.zeros((4, 4), np.float32)
    proj[0, 0] = proj[1, 1] = 1.0
    proj[2, 2] = 1.0
    proj[2, 3] = -0.1
    proj[3, 2] = 1.0
    py_out = None
    for i, sig in enumerate(signals):
        cs = CommonSettings()
        cs.viewToClipMatrix = cs.viewToClipMatrixPrev = proj.flatten(order="F")
        cs.worldToViewMatrix = cs.worldToViewMatrixPrev = np.eye(4, dtype=np.float32).flatten()
        cs.resourceSize = cs.resourceSizePrev = cs.rectSize = cs.rectSizePrev = (w, h)
        cs.frameIndex = i
        eng.set_common_settings(cs)
        py_out = eng.denoise([0], {ResourceType.IN_SIGNAL: sig})

    np.testing.assert_allclose(out, np.asarray(py_out[ResourceType.OUT_SIGNAL]),
                               rtol=1e-6, atol=1e-6)

    r = lib.nrdtpu_set_denoiser_settings(inst, 0, b"maxAccumulatedFrameNum=7")
    assert r == 0, lib.nrdtpu_get_last_error()
    assert lib.nrdtpu_destroy_instance(inst) == 0


class ReblurSettingsC(ctypes.Structure):
    _fields_ = [
        ("hit_distance_parameters", ctypes.c_float * 4),
        ("antilag_luminance_sigma_scale", ctypes.c_float),
        ("antilag_luminance_sensitivity", ctypes.c_float),
        ("max_accumulated_frame_num", ctypes.c_uint32),
        ("max_fast_accumulated_frame_num", ctypes.c_uint32),
        ("max_stabilized_frame_num", ctypes.c_uint32),
        ("max_stabilized_frame_num_for_hit_distance", ctypes.c_uint32),
        ("history_fix_frame_num", ctypes.c_uint32),
        ("history_fix_base_pixel_stride", ctypes.c_uint32),
        ("diffuse_prepass_blur_radius", ctypes.c_float),
        ("specular_prepass_blur_radius", ctypes.c_float),
        ("min_hit_distance_weight", ctypes.c_float),
        ("min_blur_radius", ctypes.c_float),
        ("max_blur_radius", ctypes.c_float),
        ("lobe_angle_fraction", ctypes.c_float),
        ("roughness_fraction", ctypes.c_float),
        ("responsive_accumulation_roughness_threshold", ctypes.c_float),
        ("plane_distance_sensitivity", ctypes.c_float),
        ("specular_probability_thresholds_for_mv_modification", ctypes.c_float * 2),
        ("firefly_suppressor_min_relative_scale", ctypes.c_float),
        ("checkerboard_mode", ctypes.c_uint32),
        ("hit_distance_reconstruction_mode", ctypes.c_uint32),
        ("enable_anti_firefly", ctypes.c_uint8),
        ("enable_performance_mode", ctypes.c_uint8),
        ("min_material_for_diffuse", ctypes.c_float),
        ("min_material_for_specular", ctypes.c_float),
        ("use_prepass_only_for_specular_motion_estimation", ctypes.c_uint8),
    ]


class LibraryDescC(ctypes.Structure):
    _fields_ = [
        ("version_major", ctypes.c_uint32),
        ("version_minor", ctypes.c_uint32),
        ("supported_denoisers", ctypes.POINTER(ctypes.c_int)),
        ("supported_denoiser_num", ctypes.c_uint32),
        ("normal_encoding", ctypes.c_uint32),
        ("roughness_encoding", ctypes.c_uint32),
    ]


def test_library_desc_and_name_tables(lib):
    """Wrapper.cpp:46-123 parity: LibraryDesc + denoiser/resource name strings."""
    lib.nrdtpu_get_library_desc.restype = ctypes.POINTER(LibraryDescC)
    lib.nrdtpu_get_denoiser_string.restype = ctypes.c_char_p
    lib.nrdtpu_get_resource_type_string.restype = ctypes.c_char_p
    desc = lib.nrdtpu_get_library_desc().contents
    assert desc.supported_denoiser_num == 19
    ids = [desc.supported_denoisers[i] for i in range(desc.supported_denoiser_num)]
    assert ids == list(range(19))

    from nrdtpu.settings import Denoiser, ResourceType

    for d in Denoiser:
        assert lib.nrdtpu_get_denoiser_string(int(d)) == d.name.encode()
    for r in ResourceType:
        assert lib.nrdtpu_get_resource_type_string(int(r)) == r.name.encode()
    assert lib.nrdtpu_get_denoiser_string(99) == b""


def test_typed_reblur_settings_marshalling(lib):
    """Typed settings structs marshal every field onto the python dataclass."""
    descs = (DenoiserDescC * 1)(DenoiserDescC(0, 6))  # REBLUR_DIFFUSE_SPECULAR
    inst = ctypes.c_void_p()
    r = lib.nrdtpu_create_instance(descs, 1, 64, 48, 2, 1, ctypes.byref(inst))
    assert r == 0, lib.nrdtpu_get_last_error()

    s = ReblurSettingsC()
    lib.nrdtpu_get_default_reblur_settings(ctypes.byref(s))
    assert s.max_accumulated_frame_num == 30
    assert abs(s.lobe_angle_fraction - 0.15) < 1e-6
    s.max_accumulated_frame_num = 17
    s.lobe_angle_fraction = 0.33
    s.checkerboard_mode = 2  # WHITE
    s.enable_anti_firefly = 1
    s.hit_distance_parameters[:] = [4.0, 0.2, 10.0, -20.0]
    s.specular_probability_thresholds_for_mv_modification[:] = [0.25, 0.75]
    r = lib.nrdtpu_set_reblur_settings(inst, 0, ctypes.byref(s))
    assert r == 0, lib.nrdtpu_get_last_error()

    # the text protocol error path: unknown field must fail cleanly
    r = lib.nrdtpu_set_denoiser_settings(inst, 0, b"noSuchField=1")
    assert r != 0

    assert lib.nrdtpu_destroy_instance(inst) == 0
