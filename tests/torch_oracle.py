"""Minimal torch CLIP (ViT + text) oracle, written from the published
architecture, used only to validate the checkpoint porter and tower
numerics. Emits state dicts in standard CLIP naming."""

import math

import numpy as np
import torch
from torch import nn


class QuickGELU(nn.Module):
    def forward(self, x):
        return x * torch.sigmoid(1.702 * x)


class Block(nn.Module):
    def __init__(self, d, heads, causal=False):
        super().__init__()
        self.attn = nn.MultiheadAttention(d, heads)
        self.ln_1 = nn.LayerNorm(d)
        self.mlp = nn.Sequential()
        self.mlp.add_module("c_fc", nn.Linear(d, 4 * d))
        self.mlp.add_module("gelu", QuickGELU())
        self.mlp.add_module("c_proj", nn.Linear(4 * d, d))
        self.ln_2 = nn.LayerNorm(d)
        self.causal = causal

    def forward(self, x):  # x: [T, B, D]
        mask = None
        if self.causal:
            t = x.shape[0]
            mask = torch.full((t, t), float("-inf"))
            mask.triu_(1)
        a, _ = self.attn(
            self.ln_1(x), self.ln_1(x), self.ln_1(x), need_weights=False, attn_mask=mask
        )
        x = x + a
        x = x + self.mlp(self.ln_2(x))
        return x


class TorchTransformer(nn.Module):
    def __init__(self, d, layers, heads, causal=False):
        super().__init__()
        self.resblocks = nn.Sequential(*[Block(d, heads, causal) for _ in range(layers)])

    def forward(self, x):
        return self.resblocks(x)


class TorchVisual(nn.Module):
    def __init__(self, width=64, layers=2, heads=4, embed_dim=32, resolution=224, patch=32):
        super().__init__()
        grid = resolution // patch
        self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
        scale = width ** -0.5
        self.class_embedding = nn.Parameter(scale * torch.randn(width))
        self.positional_embedding = nn.Parameter(scale * torch.randn(grid * grid + 1, width))
        self.ln_pre = nn.LayerNorm(width)
        self.transformer = TorchTransformer(width, layers, heads)
        self.ln_post = nn.LayerNorm(width)
        self.proj = nn.Parameter(scale * torch.randn(width, embed_dim))

    def forward(self, x):
        x = self.conv1(x)
        x = x.reshape(x.shape[0], x.shape[1], -1).permute(0, 2, 1)
        cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1) + self.positional_embedding
        x = self.ln_pre(x)
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        return self.ln_post(x[:, 0]) @ self.proj


class TorchText(nn.Module):
    def __init__(self, width=32, layers=2, heads=4, embed_dim=32, ctx=77, vocab=49408):
        super().__init__()
        self.token_embedding = nn.Embedding(vocab, width)
        self.positional_embedding = nn.Parameter(0.01 * torch.randn(ctx, width))
        self.transformer = TorchTransformer(width, layers, heads, causal=True)
        self.ln_final = nn.LayerNorm(width)
        self.text_projection = nn.Parameter((width ** -0.5) * torch.randn(width, embed_dim))
        nn.init.normal_(self.token_embedding.weight, std=0.02)

    def forward(self, ids):
        x = self.token_embedding(ids) + self.positional_embedding[: ids.shape[1]]
        x = self.transformer(x.permute(1, 0, 2)).permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), ids.argmax(dim=-1)] @ self.text_projection
        return x


def clip_state_dict(visual: TorchVisual, text: TorchText) -> dict:
    sd = {}
    for k, v in visual.state_dict().items():
        sd[f"visual.{k}"] = v
    for k, v in text.state_dict().items():
        sd[k] = v
    sd["logit_scale"] = torch.tensor(np.log(1 / 0.07), dtype=torch.float32)
    return sd
