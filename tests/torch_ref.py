"""Test-only torch reference models: tiny-but-COMPLETE SD UNet + VAE.

diffusers is not installed in this image, so these modules re-implement the
published UNet2DConditionModel / AutoencoderKL architectures (the models the
reference drives through diffusers, /root/reference/model_loader.py:22-95)
directly in torch, with the exact diffusers state_dict key layout. They are
the torch-numerics oracle for the full-model port parity tests
(test_torch_unet_parity.py) — the same pattern tests/test_clip_text.py uses
with transformers' CLIP, extended to the UNet/VAE where no torch reference
implementation ships in the image.

Semantics pinned to diffusers:
  * timestep embedding: flip_sin_to_cos=True, downscale_freq_shift=0
    ([cos | sin]);
  * ResnetBlock2D: GN(eps 1e-5) -> silu -> conv1 -> +time_emb_proj(silu(temb))
    -> GN -> silu -> conv2 -> + 1x1 shortcut when channels change;
  * Transformer2DModel (use_linear_projection=False): GN(eps 1e-6), 1x1-conv
    proj_in/out, BasicTransformerBlock = self-attn / cross-attn / GEGLU-FF
    with pre-LayerNorms (eps 1e-5), exact (erf) gelu;
  * VAE: GN eps 1e-6 everywhere, single-head mid-block attention with
    group_norm + to_q/to_k/to_v/to_out.0 linears, asymmetric (0,1) downsample
    padding, nearest-2x upsample; encode returns the distribution MEAN
    (reference model_wrappers.py:60-71).
"""
import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def timestep_embedding(t: torch.Tensor, dim: int) -> torch.Tensor:
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float32) / half)
    args = t.float()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


class TorchResnetBlock2D(nn.Module):
    def __init__(self, in_ch, out_ch, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, out_ch)
        self.norm2 = nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1)
        if in_ch != out_ch:
            self.conv_shortcut = nn.Conv2d(in_ch, out_ch, 1)
        else:
            self.conv_shortcut = None

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class TorchAttention(nn.Module):
    """Multi-head attention, diffusers Attention key layout."""

    def __init__(self, query_dim, heads, dim_head, context_dim=None):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(query_dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim or query_dim, inner, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(inner, query_dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        b, n, _ = x.shape
        q = self.to_q(x).view(b, n, self.heads, self.dim_head).transpose(1, 2)
        k = self.to_k(ctx).view(b, -1, self.heads,
                                self.dim_head).transpose(1, 2)
        v = self.to_v(ctx).view(b, -1, self.heads,
                                self.dim_head).transpose(1, 2)
        sim = torch.matmul(q, k.transpose(-1, -2)) * self.dim_head ** -0.5
        out = torch.matmul(sim.softmax(dim=-1), v)
        out = out.transpose(1, 2).reshape(b, n, -1)
        return self.to_out[0](out)


class TorchGEGLU(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.proj = nn.Linear(dim, dim_out * 2)

    def forward(self, x):
        a, gate = self.proj(x).chunk(2, dim=-1)
        return a * F.gelu(gate)


class TorchFeedForward(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.net = nn.ModuleList([TorchGEGLU(dim, dim * 4), nn.Identity(),
                                  nn.Linear(dim * 4, dim)])

    def forward(self, x):
        return self.net[2](self.net[0](x))


class TorchBasicTransformerBlock(nn.Module):
    def __init__(self, dim, heads, dim_head, context_dim):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-5)
        self.attn1 = TorchAttention(dim, heads, dim_head)
        self.norm2 = nn.LayerNorm(dim, eps=1e-5)
        self.attn2 = TorchAttention(dim, heads, dim_head, context_dim)
        self.norm3 = nn.LayerNorm(dim, eps=1e-5)
        self.ff = TorchFeedForward(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        return x + self.ff(self.norm3(x))


class TorchTransformer2D(nn.Module):
    def __init__(self, channels, heads, context_dim, groups, depth=1):
        super().__init__()
        self.norm = nn.GroupNorm(groups, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, channels, 1)
        self.transformer_blocks = nn.ModuleList([
            TorchBasicTransformerBlock(channels, heads, channels // heads,
                                       context_dim) for _ in range(depth)])
        self.proj_out = nn.Conv2d(channels, channels, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        y = self.proj_in(self.norm(x))
        tokens = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            tokens = blk(tokens, context)
        y = tokens.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + residual


class TorchDownsample2D(nn.Module):
    def __init__(self, ch, pad=(1, 1, 1, 1)):
        super().__init__()
        self.pad = pad
        self.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)

    def forward(self, x):
        return self.conv(F.pad(x, self.pad))


class TorchUpsample2D(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


class _TorchDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, heads, ctx_dim, groups,
                 temb_dim, has_attn, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchResnetBlock2D(in_ch if i == 0 else out_ch, out_ch,
                                temb_dim, groups) for i in range(layers)])
        self.attentions = nn.ModuleList(
            [TorchTransformer2D(out_ch, heads, ctx_dim, groups)
             for _ in range(layers)]) if has_attn else None
        self.downsamplers = nn.ModuleList(
            [TorchDownsample2D(out_ch)]) if add_down else None

    def forward(self, x, temb, context):
        residuals = []
        for i, res in enumerate(self.resnets):
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
            residuals.append(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
            residuals.append(x)
        return x, residuals


class _TorchUpBlock(nn.Module):
    def __init__(self, in_chs, out_ch, heads, ctx_dim, groups, temb_dim,
                 has_attn, add_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchResnetBlock2D(ic, out_ch, temb_dim, groups)
             for ic in in_chs])
        self.attentions = nn.ModuleList(
            [TorchTransformer2D(out_ch, heads, ctx_dim, groups)
             for _ in in_chs]) if has_attn else None
        self.upsamplers = nn.ModuleList(
            [TorchUpsample2D(out_ch)]) if add_up else None

    def forward(self, x, skips, temb, context):
        for i, res in enumerate(self.resnets):
            x = torch.cat([x, skips.pop()], dim=1)
            x = res(x, temb)
            if self.attentions is not None:
                x = self.attentions[i](x, context)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class _TorchMidBlock(nn.Module):
    def __init__(self, ch, heads, ctx_dim, groups, temb_dim):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchResnetBlock2D(ch, ch, temb_dim, groups),
             TorchResnetBlock2D(ch, ch, temb_dim, groups)])
        self.attentions = nn.ModuleList(
            [TorchTransformer2D(ch, heads, ctx_dim, groups)])

    def forward(self, x, temb, context):
        x = self.resnets[0](x, temb)
        x = self.attentions[0](x, context)
        return self.resnets[1](x, temb)


class _TimestepEmbedding(nn.Module):
    def __init__(self, in_dim, dim):
        super().__init__()
        self.linear_1 = nn.Linear(in_dim, dim)
        self.linear_2 = nn.Linear(dim, dim)

    def forward(self, temb):
        return self.linear_2(F.silu(self.linear_1(temb)))


class TorchSDUNet(nn.Module):
    """UNet2DConditionModel semantic twin; diffusers key layout, so
    porting.port_torch_unet consumes its state_dict() directly."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        chans = cfg.block_out_channels
        n = len(chans)
        temb_dim = chans[0] * 4
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.time_embedding = _TimestepEmbedding(chans[0], temb_dim)

        skip_chs = [chans[0]]
        self.down_blocks = nn.ModuleList()
        in_ch = chans[0]
        for i, ch in enumerate(chans):
            layers = cfg.layers_per_block
            self.down_blocks.append(_TorchDownBlock(
                in_ch, ch, layers, cfg.heads_for_block(i),
                cfg.cross_attention_dim, cfg.norm_num_groups, temb_dim,
                has_attn=i < n - 1, add_down=i < n - 1))
            skip_chs.extend([ch] * layers + ([ch] if i < n - 1 else []))
            in_ch = ch

        self.mid_block = _TorchMidBlock(
            chans[-1], cfg.heads_for_block(n - 1), cfg.cross_attention_dim,
            cfg.norm_num_groups, temb_dim)

        self.up_blocks = nn.ModuleList()
        x_ch = chans[-1]
        for i in range(n):
            j = n - 1 - i
            ch = chans[j]
            in_chs = []
            for _ in range(cfg.layers_per_block + 1):
                in_chs.append(x_ch + skip_chs.pop())
                x_ch = ch
            self.up_blocks.append(_TorchUpBlock(
                in_chs, ch, cfg.heads_for_block(j), cfg.cross_attention_dim,
                cfg.norm_num_groups, temb_dim,
                has_attn=j < n - 1, add_up=j > 0))

        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, chans[0],
                                          eps=1e-5)
        self.conv_out = nn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, latents, t, context):
        cfg = self.cfg
        if t.ndim == 0:
            t = t.expand(latents.shape[0])
        temb = self.time_embedding(
            timestep_embedding(t, cfg.block_out_channels[0]))
        x = self.conv_in(latents)
        skips = [x]
        for blk in self.down_blocks:
            x, res = blk(x, temb, context)
            skips.extend(res)
        x = self.mid_block(x, temb, context)
        for blk in self.up_blocks:
            x = blk(x, skips, temb, context)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


# --- VAE -----------------------------------------------------------------


class TorchVAEAttention(nn.Module):
    """Single-head spatial self-attention (diffusers VAE mid block)."""

    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.ModuleList([nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x)
        tokens = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(tokens), self.to_k(tokens), self.to_v(tokens)
        sim = torch.matmul(q, k.transpose(-1, -2)) * c ** -0.5
        out = torch.matmul(sim.softmax(dim=-1), v)
        out = self.to_out[0](out).reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + out


class _TorchVAEMid(nn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchResnetBlock2D(ch, ch, None, groups, eps=1e-6),
             TorchResnetBlock2D(ch, ch, None, groups, eps=1e-6)])
        self.attentions = nn.ModuleList([TorchVAEAttention(ch, groups)])

    def forward(self, x):
        x = self.resnets[0](x)
        x = self.attentions[0](x)
        return self.resnets[1](x)


class _TorchVAEDownBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_down):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, None,
                                groups, eps=1e-6) for i in range(layers)])
        self.downsamplers = nn.ModuleList(
            [TorchDownsample2D(out_ch, pad=(0, 1, 0, 1))]) if add_down \
            else None

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.downsamplers is not None:
            x = self.downsamplers[0](x)
        return x


class _TorchVAEUpBlock(nn.Module):
    def __init__(self, in_ch, out_ch, layers, groups, add_up):
        super().__init__()
        self.resnets = nn.ModuleList(
            [TorchResnetBlock2D(in_ch if i == 0 else out_ch, out_ch, None,
                                groups, eps=1e-6) for i in range(layers)])
        self.upsamplers = nn.ModuleList(
            [TorchUpsample2D(out_ch)]) if add_up else None

    def forward(self, x):
        for res in self.resnets:
            x = res(x)
        if self.upsamplers is not None:
            x = self.upsamplers[0](x)
        return x


class _TorchVAEEncoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        n = len(chans)
        self.conv_in = nn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        self.down_blocks = nn.ModuleList()
        in_ch = chans[0]
        for i, ch in enumerate(chans):
            self.down_blocks.append(_TorchVAEDownBlock(
                in_ch, ch, cfg.layers_per_block, cfg.norm_num_groups,
                add_down=i < n - 1))
            in_ch = ch
        self.mid_block = _TorchVAEMid(chans[-1], cfg.norm_num_groups)
        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, chans[-1],
                                          eps=1e-6)
        self.conv_out = nn.Conv2d(chans[-1], 2 * cfg.latent_channels, 3,
                                  padding=1)

    def forward(self, x):
        x = self.conv_in(x)
        for blk in self.down_blocks:
            x = blk(x)
        x = self.mid_block(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class _TorchVAEDecoder(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        rev = tuple(reversed(cfg.block_out_channels))
        n = len(rev)
        self.conv_in = nn.Conv2d(cfg.latent_channels, rev[0], 3, padding=1)
        self.mid_block = _TorchVAEMid(rev[0], cfg.norm_num_groups)
        self.up_blocks = nn.ModuleList()
        in_ch = rev[0]
        for i, ch in enumerate(rev):
            self.up_blocks.append(_TorchVAEUpBlock(
                in_ch, ch, cfg.layers_per_block + 1, cfg.norm_num_groups,
                add_up=i < n - 1))
            in_ch = ch
        self.conv_norm_out = nn.GroupNorm(cfg.norm_num_groups, rev[-1],
                                          eps=1e-6)
        self.conv_out = nn.Conv2d(rev[-1], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        x = self.conv_in(z)
        x = self.mid_block(x)
        for blk in self.up_blocks:
            x = blk(x)
        return self.conv_out(F.silu(self.conv_norm_out(x)))


class TorchSDVAE(nn.Module):
    """AutoencoderKL semantic twin; diffusers key layout."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.encoder = _TorchVAEEncoder(cfg)
        self.decoder = _TorchVAEDecoder(cfg)
        self.quant_conv = nn.Conv2d(2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1)
        self.post_quant_conv = nn.Conv2d(cfg.latent_channels,
                                         cfg.latent_channels, 1)

    def encode_mean(self, img):
        moments = self.quant_conv(self.encoder(img))
        return moments[:, :self.cfg.latent_channels]

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))
