"""StereoDiffusion subsystem: JAX latent-stereo generation.

Reference parity (SURVEY.md §2.3-2.5): latent stereo shift, BN attention,
DDIM inversion + null-text optimization, CFG denoising, and the fast
warp+inpaint path — re-designed as pure functions over flax models.
"""
from . import adapters, attention, helpers, inversion, models, schedulers  # noqa: F401
from . import clip_text, clip_tokenizer, sd_pipeline, stereo_latent  # noqa: F401
from .clip_text import CLIPTextModel, CLIPTextConfig, NativeCLIPTextEncoder  # noqa: F401
from .clip_tokenizer import CLIPBPETokenizer  # noqa: F401
from .attention import AttentionMode, bn_attention  # noqa: F401
from .helpers import diffusion_step, diffusion_step_no_cfg, init_latent  # noqa: F401
from .models import DiffusionModel, LatentUNet, SimpleVAE, UNetConfig, make_toy_model  # noqa: F401
from .sd_pipeline import text2stereo, warp_inpaint, diffusion_inpaint  # noqa: F401
from .stereo_latent import stereo_shift, stereo_shift_with_mask  # noqa: F401
