"""Tests for the per-frame host math (camera.py) - the SetCommonSettings port."""

import numpy as np

from nrdtpu import camera
from nrdtpu import math as nm
from nrdtpu.settings import AccumulationMode, CommonSettings


def make_settings(eye=(0, 0, 0), target=(0, 0, -10), fov=np.radians(90), size=(128, 128),
                  eye_prev=None, target_prev=None, frame_index=0):
    eye_prev = eye if eye_prev is None else eye_prev
    target_prev = target if target_prev is None else target_prev
    aspect = size[0] / size[1]
    proj = camera.perspective_rh(fov, aspect, 0.1)  # RH pair: exercises the LH conversion
    cs = CommonSettings()
    cs.viewToClipMatrix = proj.flatten(order="F")
    cs.viewToClipMatrixPrev = proj.flatten(order="F")
    cs.worldToViewMatrix = camera.look_at_rh(eye, target).flatten(order="F")
    cs.worldToViewMatrixPrev = camera.look_at_rh(eye_prev, target_prev).flatten(order="F")
    cs.resourceSize = cs.resourceSizePrev = cs.rectSize = cs.rectSizePrev = size
    cs.frameIndex = frame_index
    return cs


class TestProjectionDecompose:
    def test_perspective_lh_detected(self):
        p = camera.perspective_lh(np.radians(60), 16 / 9, 0.1, 1000.0)
        info = camera.decompose_projection(p)
        assert info.is_left_handed and not info.is_ortho
        tan_half = np.tan(np.radians(30))
        np.testing.assert_allclose(info.frustum, [-tan_half * 16 / 9, tan_half,
                                                  2 * tan_half * 16 / 9, -2 * tan_half],
                                   rtol=1e-5)
        np.testing.assert_allclose(info.project_y, 1.0 / tan_half, rtol=1e-6)

    def test_rh_projection_detected(self):
        p = camera.perspective_lh(np.radians(60), 1.0, 0.1)
        p_rh = p.copy()
        p_rh[:, 2] = -p_rh[:, 2]  # flip z-input column -> right handed
        info = camera.decompose_projection(p_rh)
        assert not info.is_left_handed


class TestFrameMath:
    def test_first_use_forces_clear_and_restart(self):
        fm = camera.FrameMath()
        cs = make_settings()
        consts = fm.set_common_settings(cs)
        assert consts["reset_history"] == 1.0
        cs2 = make_settings(frame_index=1)
        consts = fm.set_common_settings(cs2)
        assert consts["reset_history"] == 0.0

    def test_camera_relative_matrices(self):
        fm = camera.FrameMath()
        fm.set_common_settings(make_settings())
        eye, eye_prev = (5.0, 2.0, 3.0), (4.0, 2.0, 3.0)
        cs = make_settings(eye=eye, eye_prev=eye_prev, target=(5, 2, -10),
                           target_prev=(4, 2, -10), frame_index=1)
        consts = fm.set_common_settings(cs)
        # current camera is at the origin of the camera-relative world
        np.testing.assert_allclose(consts["view_to_world"][:3, 3], 0, atol=1e-6)
        np.testing.assert_allclose(consts["camera_delta"],
                                   np.subtract(eye_prev, eye), atol=1e-5)

    def test_reprojection_static_point_lands_on_same_uv_when_camera_static(self):
        fm = camera.FrameMath()
        fm.set_common_settings(make_settings())
        consts = fm.set_common_settings(make_settings(frame_index=1))
        x = np.array([1.0, 2.0, -20.0], np.float32)  # camera-relative world point
        uv = np.asarray(nm.get_screen_uv(consts["world_to_clip"], x))
        uv_prev = np.asarray(nm.get_screen_uv(consts["world_to_clip_prev"], x))
        np.testing.assert_allclose(uv, uv_prev, atol=1e-6)
        assert (uv > 0).all() and (uv < 1).all()

    def test_reprojection_translating_camera(self):
        """A static world point reprojects to its prev-frame uv through worldToClipPrev."""
        fm = camera.FrameMath()
        eye_prev, eye = (0.0, 0.0, 0.0), (0.5, 0.0, 0.0)
        fm.set_common_settings(make_settings(eye=eye_prev))
        cs = make_settings(eye=eye, eye_prev=eye_prev, target=(0.5, 0, -10),
                           target_prev=(0, 0, -10), frame_index=1)
        consts = fm.set_common_settings(cs)

        # world point, absolute coords
        p_abs = np.array([1.0, 1.0, -10.0], np.float32)
        # camera-relative: relative to CURRENT camera position
        p_rel = p_abs - np.asarray(eye, np.float32)

        uv_prev_engine = np.asarray(nm.get_screen_uv(consts["world_to_clip_prev"], p_rel))

        # ground truth: project absolute point with the absolute prev view-proj (RH pair)
        w2v_prev = camera.look_at_rh(eye_prev, (0, 0, -10))
        proj = camera.perspective_rh(np.radians(90), 1.0, 0.1)
        clip = (proj @ w2v_prev).astype(np.float32) @ np.append(p_abs, 1.0)
        ndc = clip[:2] / clip[3]
        uv_prev_truth = np.array([ndc[0] * 0.5 + 0.5, 0.5 - ndc[1] * 0.5])
        np.testing.assert_allclose(uv_prev_engine, uv_prev_truth, atol=1e-5)

    def test_view_reconstruction_matches_projection(self):
        """reconstruct_view_position(frustum) inverts the projection for any uv."""
        fm = camera.FrameMath()
        consts = fm.set_common_settings(make_settings(size=(256, 128)))
        rng = np.random.default_rng(0)
        uv = rng.uniform(0.05, 0.95, (32, 2)).astype(np.float32)
        view_z = rng.uniform(0.5, 100, (32,)).astype(np.float32)
        xv = np.asarray(nm.reconstruct_view_position(uv, consts["frustum"], view_z))
        clip = xv @ np.asarray(consts["view_to_clip"])[:3, :3].T + consts["view_to_clip"][:3, 3]
        w = xv @ np.asarray(consts["view_to_clip"])[3, :3].T + consts["view_to_clip"][3, 3]
        ndc = clip[:, :2] / w[:, None]
        uv_back = np.stack([ndc[:, 0] * 0.5 + 0.5, 0.5 - ndc[:, 1] * 0.5], -1)
        np.testing.assert_allclose(uv_back, uv, atol=1e-4)

    def test_restart_snaps_prev_state(self):
        fm = camera.FrameMath()
        fm.set_common_settings(make_settings())
        cs = make_settings(eye=(3, 0, 0), eye_prev=(0, 0, 0), target=(3, 0, -10), frame_index=1)
        cs.accumulationMode = AccumulationMode.RESTART
        consts = fm.set_common_settings(cs)
        np.testing.assert_allclose(consts["camera_delta"], 0, atol=1e-6)
        assert consts["reset_history"] == 1.0

    def test_framerate_scale(self):
        fm = camera.FrameMath()
        cs = make_settings()
        cs.timeDeltaBetweenFrames = 16.667  # 60 fps
        consts = fm.set_common_settings(cs)
        np.testing.assert_allclose(consts["framerate_scale"], 2.0, rtol=1e-3)
        cs.timeDeltaBetweenFrames = 66.67  # 15 fps -> clamped at 1
        consts = fm.set_common_settings(cs)
        np.testing.assert_allclose(consts["framerate_scale"], 1.0, rtol=1e-3)

    def test_unproject_pixel_size(self):
        """unproject * viewZ = world size of one pixel at that depth."""
        size = (128, 128)
        fm = camera.FrameMath()
        consts = fm.set_common_settings(make_settings(size=size, fov=np.radians(90)))
        # At viewZ=1, the 90-deg frustum is 2 units tall over 128 pixels
        np.testing.assert_allclose(consts["unproject"], 2.0 / 128, rtol=1e-5)
