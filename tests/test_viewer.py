"""VR viewer subsystem: geometry, formats, controls, A/V sync, lifecycle."""
import numpy as np
import pytest

from comfystereo_tpu.viewer import (
    MediaUpdate, Projection, StereoFormat, check_openxr_available)
from comfystereo_tpu.viewer import audio, controls, core, geometry, media


# --- geometry ---------------------------------------------------------------

def test_sphere_mesh_shape_and_radius():
    verts, idx = geometry.create_sphere_mesh(segments=12, rings=8, radius=5.0)
    assert verts.shape == (13 * 9, 5)
    r = np.linalg.norm(verts[:, :3], axis=1)
    np.testing.assert_allclose(r, 5.0, atol=1e-4)
    assert idx.max() < len(verts)
    assert idx.shape[1] == 3
    u, v = verts[:, 3], verts[:, 4]
    assert u.min() >= 0 and u.max() <= 1 and v.min() >= 0 and v.max() <= 1


def test_flat_screen_quad():
    verts, idx = geometry.create_flat_screen(width=4.0, aspect=2.0,
                                             distance=3.0)
    assert verts.shape == (4, 5)
    assert idx.shape == (2, 3)
    np.testing.assert_allclose(verts[:, 2], -3.0)
    assert verts[:, 0].max() - verts[:, 0].min() == pytest.approx(4.0)
    assert verts[:, 1].max() - verts[:, 1].min() == pytest.approx(2.0)


def test_curved_screen_curvature():
    verts, _ = geometry.create_curved_screen(curve=0.4, segments=10, rows=4)
    z = verts[:, 2]
    assert z.max() - z.min() > 0.01  # actually curved
    u = verts[:, 3]
    assert u.min() == pytest.approx(0) and u.max() == pytest.approx(1)


def test_dome_hemisphere():
    verts, _ = geometry.create_dome_180(segments=8, rings=8, radius=2.0)
    assert (verts[:, 2] <= 1e-5).all()  # front hemisphere only


def test_mesh_for_projection_dispatch():
    for proj in Projection:
        verts, idx = geometry.mesh_for_projection(proj)
        assert verts.shape[1] == 5 and idx.shape[1] == 3


# --- media ------------------------------------------------------------------

def test_aspect_ratio_per_eye():
    assert media.calculate_aspect_ratio(3840, 1080, StereoFormat.SBS) == \
        pytest.approx(1920 / 1080)
    assert media.calculate_aspect_ratio(1920, 2160, StereoFormat.OU) == \
        pytest.approx(1920 / 1080)
    assert media.calculate_aspect_ratio(1920, 1080, StereoFormat.MONO) == \
        pytest.approx(1920 / 1080)


# --- audio ------------------------------------------------------------------

def test_extraction_command_copy_vs_reencode():
    argv, out = audio.extraction_command("v.mp4", "mp3", "/tmp/x")
    assert "copy" in argv and out.endswith(".mp3")
    argv, out = audio.extraction_command("v.mp4", "aac", "/tmp/x")
    assert "libvorbis" in argv and out.endswith(".ogg")
    assert "-q:a" in argv and argv[argv.index("-q:a") + 1] == "6"


# --- controls ---------------------------------------------------------------

def test_keyboard_state_machine():
    st = controls.ViewerState()
    kb = controls.KeyboardHandler(st)
    assert kb.handle("space") and st.paused
    kb.handle("p")
    assert st.projection == Projection.CURVED
    kb.handle("shift+s")
    assert st.stereo_format == StereoFormat.OU
    kb.handle("e")
    assert st.swap_eyes
    kb.handle("page_up")
    assert st.screen_distance == pytest.approx(3.5)
    kb.handle("w")
    kb.handle("d")
    assert (st.align_x, st.align_y) == (pytest.approx(0.1), pytest.approx(0.1))
    kb.handle("0")
    assert st.screen_distance == 3.0 and st.align_x == 0.0
    assert not kb.handle("zz")  # unknown key
    kb.handle("escape")
    assert st.quit_request


def test_help_overlay_texture():
    tex = controls.create_help_overlay_texture()
    assert tex.shape == (300, 400, 4)
    assert tex[..., 3].max() > 0


# --- A/V sync + queue -------------------------------------------------------

def test_av_sync_policy():
    assert core.schedule_video_frame(0.0, 30, 0) == (0, "hold")
    assert core.schedule_video_frame(1.0, 30, 29) == (30, "advance")
    assert core.schedule_video_frame(2.0, 30, 10) == (60, "seek")


def test_viewer_queue_drains_to_latest():
    v = core.PersistentNativeViewer()
    v.update_media(MediaUpdate(image_path="a.png"))
    v.update_media(MediaUpdate(image_path="b.png",
                               stereo_format=StereoFormat.OU))
    assert v.check_for_updates()
    assert v.current_media.image_path == "b.png"
    assert v.state.stereo_format == StereoFormat.OU
    assert not v.check_for_updates()  # queue empty now


def test_viewer_tick_polls_every_interval():
    v = core.PersistentNativeViewer()
    v.update_media(MediaUpdate(image_path="x.png"))
    changed = [v.tick() for _ in range(core.MEDIA_POLL_INTERVAL)]
    assert changed[-1] is not None and all(c is None for c in changed[:-1])


# --- availability + nodes ---------------------------------------------------

def test_openxr_probe_graceful():
    ok, msg = check_openxr_available()
    assert isinstance(ok, bool) and isinstance(msg, str)
    assert not ok  # this image has no OpenXR stack


def test_vr_status_node():
    from comfystereo_tpu.nodes.native_nodes import NativeVRStatus

    (status,) = NativeVRStatus().get_status()
    assert "OpenXR" in status


def test_image_viewer_node_passthrough(tmp_path):
    from comfystereo_tpu.nodes.native_nodes import (NativeStereoImageViewer,
                                                    save_hashed_png)

    img = np.random.default_rng(0).uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
    (out,) = NativeStereoImageViewer().view_stereo_native(img)
    assert out is img
    p1 = save_hashed_png(img[0])
    p2 = save_hashed_png(img[0])
    assert p1 == p2  # content-hashed reuse
