#!/usr/bin/env python
"""End-to-end Video2Stereo example (the reference's examples/Video2Stereo.json
workflow as a script): source video + depth video -> SBS stereo video,
streamed chunk-by-chunk through the TPU pipeline, then (optionally) pushed to
a VR headset.

Usage:
    python examples/video2stereo.py input.mp4 depth.mp4 out_sbs.mp4 \
        [--fill gpu_warp] [--divergence 4.5] [--view]
"""
import argparse

from comfystereo_tpu.config import StereoConfig
from comfystereo_tpu.utils.video import convert_video


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video")
    ap.add_argument("depth_video")
    ap.add_argument("output")
    ap.add_argument("--fill", default="gpu_warp")
    ap.add_argument("--divergence", type=float, default=4.5)
    ap.add_argument("--batch-size", type=int, default=12)
    ap.add_argument("--view", action="store_true",
                    help="push the result to a VR headset when available")
    args = ap.parse_args()

    cfg = StereoConfig(divergence=args.divergence, fill_technique=args.fill,
                       batch_size=args.batch_size)
    frames = convert_video(args.video, args.depth_video, args.output, cfg)
    print(f"wrote {frames} frames -> {args.output}")

    if args.view:
        from comfystereo_tpu.viewer import MediaUpdate, launch_native_viewer

        ok, msg = launch_native_viewer(MediaUpdate(video_path=args.output))
        print(msg if not ok else "viewing in headset")


if __name__ == "__main__":
    main()
