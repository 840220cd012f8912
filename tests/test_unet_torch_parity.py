"""Cross-framework numeric parity of the full UNet2D.

Builds an independent torch implementation of the tiny UNet2D architecture
(diffusers `UNet2DModel` semantics, written here from the published block
structure — diffusers itself is not installed), ports its state dict through
`models/port.py`, and requires the Flax model to reproduce the torch output.
Validates, end to end: conv/linear transposes, GroupNorm eps/group handling,
single-head attention scaling, sinusoidal timestep embeddings
(flip_sin_to_cos=False, shift=1), asymmetric DDPM downsampling, nearest
upsampling, skip-connection ordering.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from diffusion_image_editing_tpu.models import TINY_UNET2D, UNet2D
from diffusion_image_editing_tpu.models.port import port_state_dict

CFG = TINY_UNET2D  # blocks (32, 64), down (Down, AttnDown), up (AttnUp, Up)
G = CFG.norm_num_groups
EPS = CFG.norm_eps


class TResnet(nn.Module):
    def __init__(self, cin, cout, temb_dim):
        super().__init__()
        self.norm1 = nn.GroupNorm(G, cin, eps=EPS)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(G, cout, eps=EPS)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        sc = self.conv_shortcut(x) if self.conv_shortcut is not None else x
        return sc + h


class TAttn(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.group_norm = nn.GroupNorm(G, c, eps=EPS)
        self.query = nn.Linear(c, c)
        self.key = nn.Linear(c, c)
        self.value = nn.Linear(c, c)
        self.proj_attn = nn.Linear(c, c)

    def forward(self, x):
        b, c, h, w = x.shape
        hid = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)  # (b, hw, c)
        q, k, v = self.query(hid), self.key(hid), self.value(hid)
        attn = torch.softmax(q @ k.transpose(1, 2) / math.sqrt(c), dim=-1)
        out = self.proj_attn(attn @ v)
        return x + out.transpose(1, 2).reshape(b, c, h, w)


class TDown(nn.Module):
    def __init__(self, c, padding):
        super().__init__()
        self.padding = padding
        self.conv = nn.Conv2d(c, c, 3, stride=2, padding=padding)

    def forward(self, x):
        if self.padding == 0:
            x = F.pad(x, (0, 1, 0, 1))
        return self.conv(x)


class TUp(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv = nn.Conv2d(c, c, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2, mode="nearest"))


def timestep_embedding_torch(t, dim, shift=1.0):
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    return torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)


class TorchTinyUNet(nn.Module):
    def __init__(self):
        super().__init__()
        c0, c1 = CFG.block_out_channels
        temb = CFG.time_embed_dim
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(c0, temb)
        self.time_embedding.linear_2 = nn.Linear(temb, temb)
        self.conv_in = nn.Conv2d(CFG.in_channels, c0, 3, padding=1)

        def block(resnets, attns=None, down=None, up=None):
            m = nn.Module()
            m.resnets = nn.ModuleList(resnets)
            if attns is not None:
                m.attentions = nn.ModuleList(attns)
            if down is not None:
                m.downsamplers = nn.ModuleList([down])
            if up is not None:
                m.upsamplers = nn.ModuleList([up])
            return m

        # down 0: plain, with downsampler; down 1: attn, final (no downsampler)
        self.down_blocks = nn.ModuleList([
            block([TResnet(c0, c0, temb)], down=TDown(c0, CFG.downsample_padding)),
            block([TResnet(c0, c1, temb)], attns=[TAttn(c1)]),
        ])
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(c1, c1, temb), TResnet(c1, c1, temb)]
        )
        self.mid_block.attentions = nn.ModuleList([TAttn(c1)])
        # up 0 (attn, layers+1=2 resnets, upsampler), up 1 (plain, final)
        self.up_blocks = nn.ModuleList([
            block([TResnet(c1 + c1, c1, temb), TResnet(c1 + c0, c1, temb)],
                  attns=[TAttn(c1), TAttn(c1)], up=TUp(c1)),
            block([TResnet(c1 + c0, c0, temb), TResnet(c0 + c0, c0, temb)]),
        ])
        self.conv_norm_out = nn.GroupNorm(G, c0, eps=EPS)
        self.conv_out = nn.Conv2d(c0, CFG.out_channels, 3, padding=1)

    def forward(self, x, t):
        temb = timestep_embedding_torch(t, CFG.block_out_channels[0], CFG.freq_shift)
        temb = self.time_embedding.linear_2(F.silu(self.time_embedding.linear_1(temb)))
        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, temb)
        for blk in self.up_blocks:
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h)
            if hasattr(blk, "upsamplers"):
                h = blk.upsamplers[0](h)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


def test_unet2d_matches_independent_torch_mirror():
    torch.manual_seed(0)
    tm = TorchTinyUNet().eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = port_state_dict(sd, "unet2d")

    model = UNet2D(CFG)
    rng = np.random.RandomState(0)
    x = rng.normal(size=(1, 3, 16, 16)).astype(np.float32) * 0.5
    t = 501
    with torch.no_grad():
        ref = tm(torch.tensor(x), torch.tensor([t])).numpy()
    out = model.apply(
        jax.tree.map(jnp.asarray, params),
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        jnp.int32(t),
    )
    out_nchw = np.transpose(np.asarray(out), (0, 3, 1, 2))
    np.testing.assert_allclose(out_nchw, ref, rtol=5e-3, atol=5e-4)
