"""Aux subsystems: profiling, caching, video streaming."""
import numpy as np
import pytest

from comfystereo_tpu.utils import caching, profiling


def test_stage_timer_records():
    results = {}
    with profiling.stage_timer("x", results, verbose=False):
        pass
    assert "x" in results and results["x"] >= 0


def test_memory_stats_host():
    stats = profiling.memory_stats()
    assert stats.get("host_rss_mb", 1.0) > 0


def test_model_cache_loads_once():
    calls = []
    caching.clear_model_cache()

    def loader():
        calls.append(1)
        return object()

    a = caching.get_or_load_model(("m", 1), loader)
    b = caching.get_or_load_model(("m", 1), loader)
    assert a is b and len(calls) == 1


def test_embedding_cache_lru():
    calls = []
    cache = caching.EmbeddingCache(lambda t: calls.append(t) or len(t),
                                   capacity=2)
    assert cache("a") == 1 and cache("a") == 1
    cache("bb")
    cache("ccc")  # evicts "a"
    cache("a")
    assert calls == ["a", "bb", "ccc", "a"]


def test_orbax_roundtrip(tmp_path):
    import jax.numpy as jnp

    params = {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.zeros(3)}
    path = str(tmp_path / "ckpt")
    caching.save_params(path, params)
    restored = caching.load_params(path, like=params)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(params["w"]))


@pytest.mark.skipif(
    not pytest.importorskip("cv2", reason="cv2 required"),
    reason="cv2 required")
def test_video_roundtrip(tmp_path):
    import cv2

    from comfystereo_tpu.config import StereoConfig
    from comfystereo_tpu.utils import fixtures, video

    h, w, n = 48, 64, 5
    src = str(tmp_path / "src.mp4")
    dep = str(tmp_path / "dep.mp4")
    for path, maker in ((src, fixtures.create_test_image),
                        (dep, lambda hh, ww: np.stack(
                            [fixtures.create_depth_map(hh, ww)] * 3, -1))):
        wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
        for _ in range(n):
            frame = maker(h, w)
            if frame.ndim == 2:
                frame = np.stack([frame] * 3, -1)
            wr.write(cv2.cvtColor(frame.astype(np.uint8), cv2.COLOR_RGB2BGR))
        wr.release()

    out = str(tmp_path / "out.mp4")
    cfg = StereoConfig(batch_size=2, depth_map_blur=False)
    total = video.convert_video(src, dep, out, cfg, progress=False)
    assert total == n
    cap = cv2.VideoCapture(out)
    assert int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)) == 2 * w
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == n
    # Output fps comes from the source probe, not a loop-closure leftover.
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 10.0) < 0.5
    cap.release()
    assert video.video_fps(src) == pytest.approx(10.0, abs=0.5)
