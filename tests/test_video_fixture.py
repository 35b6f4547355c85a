"""Committed end-to-end Video2Stereo regression fixture (VERDICT r4 #4).

The reference ships `examples/example-video.mp4` + depth video + expected
output as a manual regression artifact (SURVEY §4). Here the same pin is
automated and deterministic: a seeded synthetic video pair is written with
LOSSLESS FFV1 (so decode is bit-exact everywhere), run through the full
`utils.video.convert_video` loop (decode -> device pipeline -> encode), and
the decoded output is compared against committed goldens — per-frame sha256
for the exact case, plus the full reference frames (npz) with a ±1 LSB
fallback so a benign quantization-boundary flip is distinguishable from a
real regression.

Regenerate after an INTENTIONAL pipeline change with:
    PYTHONPATH=/root/repo python tests/test_video_fixture.py --regen
"""
import hashlib
import json
import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
HASH_PATH = os.path.join(GOLDEN_DIR, "video2stereo_hashes.json")
FRAMES_PATH = os.path.join(GOLDEN_DIR, "video2stereo_frames.npz")

N_FRAMES, H, W = 8, 48, 64
FPS = 30

pytestmark = pytest.mark.slow


def _write_fixture_videos(tmpdir):
    """Seeded moving-scene video + matching depth video, FFV1-lossless."""
    import cv2

    from comfystereo_tpu.utils import fixtures

    src = os.path.join(tmpdir, "src.avi")
    dep = os.path.join(tmpdir, "dep.avi")
    base_img = fixtures.create_test_image(H, W).astype(np.uint8)
    base_dm = np.stack([fixtures.create_depth_map(H, W)] * 3, -1
                       ).astype(np.uint8)
    for path, base in ((src, base_img), (dep, base_dm)):
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"FFV1"), FPS,
                             (W, H))
        assert wr.isOpened(), "FFV1 encoder unavailable in this cv2 build"
        for i in range(N_FRAMES):
            wr.write(cv2.cvtColor(np.roll(base, 3 * i, axis=1),
                                  cv2.COLOR_RGB2BGR))
        wr.release()
    return src, dep


def _decode_all(path):
    import cv2

    cap = cv2.VideoCapture(path)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def run_fixture(tmpdir):
    """Full loop: synth videos -> convert_video -> decoded output frames."""
    from comfystereo_tpu.config import StereoConfig
    from comfystereo_tpu.utils import video

    src, dep = _write_fixture_videos(tmpdir)
    out = os.path.join(tmpdir, "out.avi")  # .avi -> lossless FFV1 output
    cfg = StereoConfig(modes=("left-right",), fill_technique="gpu_warp",
                       batch_size=4)
    total = video.convert_video(src, dep, out, cfg, progress=False)
    assert total == N_FRAMES
    frames = _decode_all(out)
    assert frames.shape == (N_FRAMES, H, 2 * W, 3)
    return frames


def _hashes(frames):
    return [hashlib.sha256(np.ascontiguousarray(f).tobytes()).hexdigest()
            for f in frames]


def test_video2stereo_matches_committed_goldens(tmp_path):
    assert os.path.exists(HASH_PATH) and os.path.exists(FRAMES_PATH), (
        "goldens missing — run: python tests/test_video_fixture.py --regen")
    frames = run_fixture(str(tmp_path))
    with open(HASH_PATH) as f:
        want_hashes = json.load(f)["sha256"]
    got_hashes = _hashes(frames)
    if got_hashes == want_hashes:
        return  # bit-exact — the expected outcome on any one platform
    # Quantization-boundary fallback: a benign float-wobble flip moves a
    # uint8 by at most 1; anything larger is a real pipeline regression.
    want_frames = np.load(FRAMES_PATH)["frames"]
    diff = np.abs(frames.astype(np.int16) - want_frames.astype(np.int16))
    n_off = int((diff > 0).sum())
    assert diff.max() <= 1, (
        f"video2stereo output drifted: max |diff|={int(diff.max())} LSB "
        f"({n_off} px differ) — real regression, not float wobble")
    assert n_off <= frames.size // 1000, (
        f"{n_off} pixels off-by-one (> 0.1% of output) — quantization "
        "points moved; regenerate goldens only if intentional")


def test_mask_and_depth_parity_with_direct_pipeline(tmp_path):
    """The video loop's output must equal calling the pipeline directly on
    the decoded inputs (the loop adds chunking/threading/uint8 IO, none of
    which may change pixels)."""
    import jax.numpy as jnp

    import comfystereo_tpu as cs
    from comfystereo_tpu.config import StereoConfig

    frames = run_fixture(str(tmp_path))
    src, dep = (os.path.join(str(tmp_path), n) for n in
                ("src.avi", "dep.avi"))
    # Mirror the device chunk program EXACTLY (utils/video._device_chunk_fn):
    # BGR->RGB /255 in f32, Rec.601 luma of the BGR depth frame, and
    # trunc(clip(sbs*255)) quantization — any deviation here is measuring
    # the mirror, not the loop.
    imgs = jnp.asarray(_decode_all(src))[..., ::-1].astype(jnp.float32) / 255.0
    d = jnp.asarray(_decode_all(dep)).astype(jnp.float32)
    dms = (0.2989 * d[..., 2] + 0.5870 * d[..., 1]
           + 0.1140 * d[..., 0]) / 255.0
    cfg = StereoConfig(modes=("left-right",), fill_technique="gpu_warp",
                       batch_size=4)
    out = cs.stereo_pipeline(imgs, dms, cfg)
    sbs = out["stereo"][0]
    direct_u8 = np.asarray(jnp.trunc(jnp.clip(sbs * 255.0, 0.0, 255.0))
                           .astype(jnp.uint8))[..., ::-1]
    # The loop jits one fused uint8->uint8 chunk program; this mirror has
    # different jit boundaries (and B=8 vs two B=4 chunks), so XLA fusion
    # differs and ~3% of pixels land 1 LSB across a trunc boundary. The
    # bound that matters: NO pixel may move more than 1 LSB — chunking,
    # threading, padding, or channel-order bugs all blow well past that.
    diff = np.abs(frames.astype(np.int16) - direct_u8.astype(np.int16))
    assert diff.max() <= 1, f"loop vs direct pipeline: {diff.max()} LSB"
    assert (diff > 0).mean() < 0.05


if __name__ == "__main__":
    import sys

    # Goldens are canonical for the test environment: same platform AND the
    # same XLA flags conftest.py sets (-O0 shifts a few hundred pixels
    # across quantization boundaries vs default opt).
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8"
                               + " --xla_backend_optimization_level=0")

    import jax

    jax.config.update("jax_platforms", "cpu")
    if "--regen" in sys.argv:
        import tempfile

        frames = run_fixture(tempfile.mkdtemp(prefix="v2s_golden_"))
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(HASH_PATH, "w") as f:
            json.dump({"sha256": _hashes(frames),
                       "shape": list(frames.shape)}, f, indent=1)
            f.write("\n")
        np.savez_compressed(FRAMES_PATH, frames=frames)
        print(f"wrote {len(frames)} frame hashes + "
              f"{os.path.getsize(FRAMES_PATH)} byte npz")
    else:
        pytest.main([__file__, "-v"])
