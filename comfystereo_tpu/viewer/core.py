"""Persistent VR viewer: media queue, A/V sync, and the OpenXR render loop.

Reference: native_viewer/core.py:41-659 — a daemon-thread viewer that owns an
OpenXR session, polls a thread-safe media queue every 30 frames, schedules
video frames from the audio clock (seek when >3 frames behind), renders per
eye with headset pose matrices, and resets state fully on shutdown for clean
restarts.

The render loop requires OpenXR/OpenGL hardware and is gated; the queue
handling, A/V frame scheduling, and lifecycle state machine are plain Python
and covered by tests.
"""
from __future__ import annotations

import queue
import threading
import time
from typing import Optional

from .audio import AudioPlayer
from .constants import PYOPENXR_AVAILABLE, MediaUpdate
from .controls import KeyboardHandler, ViewerState

MEDIA_POLL_INTERVAL = 30       # frames between media-queue polls (ref :421)
AV_SEEK_THRESHOLD = 3          # frames behind audio before seeking (ref :437-467)


def schedule_video_frame(audio_pos_s: float, fps: float, current_frame: int):
    """A/V sync policy: (target_frame, action) where action is
    'hold' | 'advance' | 'seek' (reference :437-467)."""
    target = int(audio_pos_s * fps)
    if target <= current_frame:
        return current_frame, "hold"
    if target - current_frame > AV_SEEK_THRESHOLD:
        return target, "seek"
    return current_frame + 1, "advance"


class PersistentNativeViewer:
    """Viewer instance living on a daemon thread; media updates arrive
    through a thread-safe queue (update_media)."""

    def __init__(self):
        self.media_queue: "queue.Queue[MediaUpdate]" = queue.Queue()
        self.state = ViewerState()
        self.keyboard = KeyboardHandler(self.state)
        self.running = False
        self.ready = threading.Event()
        self.audio: Optional[AudioPlayer] = None
        self.current_media: Optional[MediaUpdate] = None
        self._frame_counter = 0
        self._video_frame = 0

    # -- thread-safe API ----------------------------------------------------

    def update_media(self, update: MediaUpdate):
        """Enqueue a media change (called from the node thread; ref :652-658)."""
        self.media_queue.put(update)

    def stop(self):
        self.state.quit_request = True

    # -- queue handling (runs on the viewer thread) --------------------------

    def check_for_updates(self) -> bool:
        """Drain the queue; apply the newest update. Returns True if media
        changed (ref :288-336)."""
        latest = None
        while True:
            try:
                latest = self.media_queue.get_nowait()
            except queue.Empty:
                break
        if latest is None:
            return False
        self.current_media = latest
        self.state.stereo_format = latest.stereo_format
        self.state.projection = latest.projection
        self.state.swap_eyes = latest.swap_eyes
        self.state.loop = latest.loop_video
        self._video_frame = 0
        if latest.video_path and latest.audio_enabled:
            self.audio = AudioPlayer(latest.video_path)
        else:
            self.audio = None
        return True

    def tick(self) -> Optional[MediaUpdate]:
        """One iteration of queue/frame bookkeeping (extracted from the render
        loop so it is testable without a headset)."""
        self._frame_counter += 1
        changed = None
        if self._frame_counter % MEDIA_POLL_INTERVAL == 0:
            if self.check_for_updates():
                changed = self.current_media
        return changed

    # -- the hardware render loop -------------------------------------------

    def run(self):  # pragma: no cover - requires OpenXR hardware
        """Create the OpenXR session and render until quit (ref :349-646)."""
        if not PYOPENXR_AVAILABLE:
            raise RuntimeError(
                "PyOpenXR/OpenGL/GLFW are not available; install pyopenxr, "
                "PyOpenGL and glfw and connect a headset runtime.")
        import xr

        from .context import GLFWVisibleContextProvider
        from . import rendering

        self.running = True
        self.ready.set()
        context_provider = GLFWVisibleContextProvider()
        with xr.ContextObject(
                instance_create_info=xr.InstanceCreateInfo(
                    enabled_extension_names=[
                        xr.KHR_OPENGL_ENABLE_EXTENSION_NAME]),
        ) as ctx:
            program = rendering.create_stereo_shaders()
            vao = vbo = ebo = None
            for frame_state in ctx.frame_loop():
                self.tick()
                context_provider.poll_keys(self.keyboard)
                if self.state.quit_request:
                    break
                for view_index, view in enumerate(ctx.view_loop(frame_state)):
                    self._render_eye(program, vao, view, view_index)
        self._teardown()

    def _render_eye(self, program, vao, view, eye):  # pragma: no cover
        from OpenGL import GL

        from .constants import FORMAT_SHADER_IDS

        GL.glUseProgram(program)
        GL.glUniform1i(GL.glGetUniformLocation(program, "u_stereo_format"),
                       FORMAT_SHADER_IDS[self.state.stereo_format])
        GL.glUniform1i(GL.glGetUniformLocation(program, "u_eye_index"), eye)
        GL.glUniform1i(GL.glGetUniformLocation(program, "u_swap_eyes"),
                       int(self.state.swap_eyes))
        if vao is not None:
            GL.glBindVertexArray(vao)

    def _teardown(self):  # pragma: no cover
        """Full state reset so a new viewer can start cleanly (ref :604-646)."""
        if self.audio is not None:
            try:
                self.audio.stop()
            except Exception:
                pass
        self.running = False
        self.ready.clear()
        self._frame_counter = 0
        self._video_frame = 0
