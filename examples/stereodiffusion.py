#!/usr/bin/env python
"""StereoDiffusion example: AI stereo generation from one image + depth map.

Mirrors the reference StereoDiffusion node flows (stereodiffusion_nodes.py):
  * Standard (DDIM): DDIM inversion -> BN-attention denoise with latent
    stereo shifting (+ optional null-text optimization).
  * Fast (Warp + Inpaint): geometric right-eye warp, disocclusion detect,
    SD inpainting of the revealed regions.

By default this runs on the bundled toy latent model (no checkpoint
download; proves the full pipeline end-to-end). Point --model-dir at a
diffusers-layout Stable Diffusion directory (safetensors) to run the real
SD-1.5 architecture via the flax port.

Usage:
    python examples/stereodiffusion.py image.png depth.png out_sbs.png \
        [--mode fast|ddim] [--prompt "..."] [--steps 20] \
        [--model-dir /path/to/sd15]
"""
import argparse

import numpy as np
from PIL import Image


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("image")
    ap.add_argument("depth")
    ap.add_argument("output")
    ap.add_argument("--mode", choices=("fast", "ddim"), default="fast")
    ap.add_argument("--prompt", default="")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--scale-factor", type=float, default=5.0)
    ap.add_argument("--seed", type=int, default=1337)
    ap.add_argument("--null-text", action="store_true",
                    help="enable null-text optimization (ddim mode)")
    ap.add_argument("--model-dir", default="",
                    help="diffusers-layout SD checkpoint dir (optional)")
    args = ap.parse_args()

    img = np.asarray(Image.open(args.image).convert("RGB"),
                     np.float32) / 255.0
    dm = np.asarray(Image.open(args.depth).convert("L"), np.float32)

    from comfystereo_tpu.nodes.stereodiffusion import StereoDiffusionNode

    mode = ("Standard (DDIM)" if args.mode == "ddim"
            else "Fast (Warp + Inpaint)")
    pair, left, right = StereoDiffusionNode().generate_stereo(
        img[None], dm[None], scale_factor=args.scale_factor,
        pipeline_mode=mode, num_inference_steps=args.steps,
        seed=args.seed, null_text_optimization=args.null_text,
        model_id=args.model_dir, inpaint_model_id=args.model_dir,
        prompt=args.prompt)

    out = (np.clip(pair[0], 0.0, 1.0) * 255).astype(np.uint8)
    Image.fromarray(out).save(args.output)
    print(f"wrote {out.shape[1]}x{out.shape[0]} SBS pair -> {args.output}")


if __name__ == "__main__":
    main()
