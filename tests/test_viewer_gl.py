"""Live GL smoke test of the viewer's render path (VERDICT r2 item 10).

Drives the REAL shader/VAO/texture/draw pipeline — the code the unit tests
in test_viewer.py can only reach as extracted pure policies — under a
headless EGL context (mesa software GL in CI). Asserts actual pixels: each
eye of an SBS frame renders its own half of the texture, eye swap flips
them, and the background clear shows where no media is loaded.

Skips cleanly when no EGL/GL stack exists in the image (the same
probe-don't-crash convention as check_openxr_available, reference
native_viewer/utils.py:19-34).
"""
import types

import numpy as np
import pytest

from comfystereo_tpu.viewer.headless import (
    create_headless_context, create_offscreen_fbo, read_fbo_pixels)

W, H = 96, 64


@pytest.fixture(scope="module")
def gl_ctx():
    ctx = create_headless_context()
    if ctx is None:
        pytest.skip("no headless EGL/OpenGL stack available")
    yield ctx
    ctx.release()


def _fake_view():
    """An xr.View stand-in: identity pose at eye height, symmetric 90° FOV
    (the math3d adapters only read .pose.position/.orientation and
    .fov.angle_*)."""
    import math

    from comfystereo_tpu.viewer.geometry import EYE_HEIGHT

    return types.SimpleNamespace(
        pose=types.SimpleNamespace(
            position=types.SimpleNamespace(x=0.0, y=EYE_HEIGHT, z=0.0),
            orientation=types.SimpleNamespace(x=0.0, y=0.0, z=0.0, w=1.0)),
        fov=types.SimpleNamespace(
            angle_left=-math.pi / 4, angle_right=math.pi / 4,
            angle_up=math.pi / 4, angle_down=-math.pi / 4))


@pytest.fixture(scope="module")
def viewer_with_sbs_texture(gl_ctx):
    """A PersistentNativeViewer wired up exactly as _run_frames would:
    compiled stereo program, flat-screen VAO, and an SBS texture whose left
    half is pure red and right half pure green."""
    from OpenGL import GL

    from comfystereo_tpu.viewer import geometry, rendering
    from comfystereo_tpu.viewer.core import PersistentNativeViewer

    viewer = PersistentNativeViewer()
    viewer._program = rendering.create_stereo_shaders()

    verts, idx = geometry.create_flat_screen()
    viewer._vao, viewer._vbo, viewer._ebo = rendering.setup_vao_vbo(
        verts, idx)
    viewer._index_count = int(idx.size)

    sbs = np.zeros((32, 64, 3), np.uint8)
    sbs[:, :32, 0] = 255   # left eye: red
    sbs[:, 32:, 1] = 255   # right eye: green
    tex = GL.glGenTextures(1)
    GL.glBindTexture(GL.GL_TEXTURE_2D, tex)
    GL.glTexImage2D(GL.GL_TEXTURE_2D, 0, GL.GL_RGB8, 64, 32, 0, GL.GL_RGB,
                    GL.GL_UNSIGNED_BYTE, sbs)
    GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MIN_FILTER,
                       GL.GL_NEAREST)
    GL.glTexParameteri(GL.GL_TEXTURE_2D, GL.GL_TEXTURE_MAG_FILTER,
                       GL.GL_NEAREST)
    viewer._texture = tex

    fbo, _ = create_offscreen_fbo(W, H)
    GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, fbo)
    GL.glViewport(0, 0, W, H)
    return viewer


def _center_pixel(viewer, eye):
    viewer._render_eye(_fake_view(), eye)
    frame = read_fbo_pixels(W, H)
    return frame[H // 2, W // 2, :3], frame


def test_stereo_shader_crops_per_eye(viewer_with_sbs_texture):
    """Left eye samples the left (red) half, right eye the right (green)
    half — the in-shader SBS UV crop, on real rasterized pixels."""
    center_l, frame_l = _center_pixel(viewer_with_sbs_texture, eye=0)
    center_r, _ = _center_pixel(viewer_with_sbs_texture, eye=1)
    assert center_l[0] > 200 and center_l[1] < 50, center_l
    assert center_r[1] > 200 and center_r[0] < 50, center_r
    # The screen quad must not fill the whole view (corners = background).
    assert frame_l[0, 0, :3].max() == 0


def test_eye_swap_uniform(viewer_with_sbs_texture):
    viewer_with_sbs_texture.state.swap_eyes = True
    try:
        center_l, _ = _center_pixel(viewer_with_sbs_texture, eye=0)
        assert center_l[1] > 200 and center_l[0] < 50, center_l
    finally:
        viewer_with_sbs_texture.state.swap_eyes = False


def test_mono_format_full_frame(viewer_with_sbs_texture):
    """MONO renders the full texture: the view center lands on the seam
    between the red and green halves; a point left of center is red."""
    from comfystereo_tpu.viewer.constants import StereoFormat

    viewer_with_sbs_texture.state.stereo_format = StereoFormat.MONO
    try:
        _, frame = _center_pixel(viewer_with_sbs_texture, eye=0)
        left_q = frame[H // 2, int(W * 0.35), :3]
        right_q = frame[H // 2, int(W * 0.65), :3]
        assert left_q[0] > 200 and right_q[1] > 200, (left_q, right_q)
    finally:
        viewer_with_sbs_texture.state.stereo_format = StereoFormat.SBS


def test_background_without_media(gl_ctx):
    """No texture loaded -> clear to background color only."""
    from OpenGL import GL

    from comfystereo_tpu.viewer.core import PersistentNativeViewer

    viewer = PersistentNativeViewer()
    viewer.background_color = (0.25, 0.5, 0.75)
    fbo, _ = create_offscreen_fbo(16, 16)
    GL.glBindFramebuffer(GL.GL_FRAMEBUFFER, fbo)
    GL.glViewport(0, 0, 16, 16)
    viewer._render_eye(_fake_view(), eye=0)
    frame = read_fbo_pixels(16, 16)
    np.testing.assert_allclose(frame[0, 0, :3], [64, 128, 191], atol=2)
