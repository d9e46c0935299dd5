"""Minimal PyTorch transcription of the reference model math, used ONLY as
a golden oracle in parity tests (timm/decord are not installed, so the
reference repo itself cannot be imported).

This transcribes the forward math of /root/reference/modeling_finetune.py
(Attention lines 54-98, Block 194-223, Mlp 34-51, PatchEmbed 226-248,
sinusoid table 252-262) and modeling_pretrain.py (encoder 83-101, decoder
152-161, full model 253-266) with dropout/droppath elided (rates are 0 in
the parity configs). Weights are loaded from the flax model, so inits don't
matter here.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def sinusoid_table(n_position, d_hid):
    pos = np.arange(n_position, dtype=np.float64)[:, None]
    j = np.arange(d_hid, dtype=np.float64)[None, :]
    angle = pos / np.power(10000.0, 2.0 * np.floor(j / 2.0) / d_hid)
    tab = np.zeros((n_position, d_hid))
    tab[:, 0::2] = np.sin(angle[:, 0::2])
    tab[:, 1::2] = np.cos(angle[:, 1::2])
    return torch.FloatTensor(tab).unsqueeze(0)


class RefAttention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=True):
        super().__init__()
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = head_dim**-0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim)) if qkv_bias else None
        self.v_bias = nn.Parameter(torch.zeros(dim)) if qkv_bias else None
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        qkv_bias = None
        if self.q_bias is not None:
            qkv_bias = torch.cat(
                (self.q_bias, torch.zeros_like(self.v_bias), self.v_bias)
            )
        qkv = F.linear(x, self.qkv.weight, qkv_bias)
        qkv = qkv.reshape(B, N, 3, self.num_heads, -1).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = (q * self.scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.proj(x)


class RefMlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class RefBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=True,
                 init_values=0.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = RefAttention(dim, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = RefMlp(dim, int(dim * mlp_ratio))
        if init_values > 0:
            self.gamma_1 = nn.Parameter(init_values * torch.ones(dim))
            self.gamma_2 = nn.Parameter(init_values * torch.ones(dim))
        else:
            self.gamma_1 = self.gamma_2 = None

    def forward(self, x):
        if self.gamma_1 is None:
            x = x + self.attn(self.norm1(x))
            x = x + self.mlp(self.norm2(x))
        else:
            x = x + self.gamma_1 * self.attn(self.norm1(x))
            x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


class RefPatchEmbed(nn.Module):
    def __init__(self, img_size, patch_size, in_chans, embed_dim,
                 num_frames, tubelet_size):
        super().__init__()
        self.proj = nn.Conv3d(
            in_chans,
            embed_dim,
            kernel_size=(tubelet_size, patch_size, patch_size),
            stride=(tubelet_size, patch_size, patch_size),
        )
        self.num_patches = (
            (img_size // patch_size) ** 2 * (num_frames // tubelet_size)
        )

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)


class RefPretrain(nn.Module):
    """PretrainVisionTransformer forward (modeling_pretrain.py:253-266)."""

    def __init__(self, img_size, patch_size, enc_dim, enc_depth, enc_heads,
                 dec_dim, dec_depth, dec_heads, dec_classes, num_frames,
                 tubelet_size):
        super().__init__()
        self.patch_embed = RefPatchEmbed(
            img_size, patch_size, 3, enc_dim, num_frames, tubelet_size
        )
        n = self.patch_embed.num_patches
        self.enc_pos = sinusoid_table(n, enc_dim)
        self.enc_blocks = nn.ModuleList(
            [RefBlock(enc_dim, enc_heads) for _ in range(enc_depth)]
        )
        self.enc_norm = nn.LayerNorm(enc_dim, eps=1e-6)
        self.encoder_to_decoder = nn.Linear(enc_dim, dec_dim, bias=False)
        self.mask_token = nn.Parameter(torch.zeros(1, 1, dec_dim))
        self.dec_pos = sinusoid_table(n, dec_dim)
        self.dec_blocks = nn.ModuleList(
            [RefBlock(dec_dim, dec_heads) for _ in range(dec_depth)]
        )
        self.dec_norm = nn.LayerNorm(dec_dim, eps=1e-6)
        self.head = nn.Linear(dec_dim, dec_classes)

    def forward(self, x, mask):
        # x: (B, C, T, H, W); mask: (B, N) bool
        tok = self.patch_embed(x)
        tok = tok + self.enc_pos.type_as(tok)
        B, _, C = tok.shape
        x_vis = tok[~mask].reshape(B, -1, C)
        for blk in self.enc_blocks:
            x_vis = blk(x_vis)
        x_vis = self.enc_norm(x_vis)
        x_vis = self.encoder_to_decoder(x_vis)
        B, N, Cd = x_vis.shape
        pos = self.dec_pos.expand(B, -1, -1).type_as(x_vis)
        pos_vis = pos[~mask].reshape(B, -1, Cd)
        pos_mask = pos[mask].reshape(B, -1, Cd)
        full = torch.cat(
            [x_vis + pos_vis, self.mask_token + pos_mask], dim=1
        )
        n_mask = pos_mask.shape[1]
        for blk in self.dec_blocks:
            full = blk(full)
        return self.head(self.dec_norm(full[:, -n_mask:]))


class RefClassifier(nn.Module):
    """VisionTransformer forward with mean pooling
    (modeling_finetune.py:389-409)."""

    def __init__(self, img_size, patch_size, dim, depth, heads, num_classes,
                 num_frames, tubelet_size):
        super().__init__()
        self.patch_embed = RefPatchEmbed(
            img_size, patch_size, 3, dim, num_frames, tubelet_size
        )
        self.pos = sinusoid_table(self.patch_embed.num_patches, dim)
        self.blocks = nn.ModuleList(
            [RefBlock(dim, heads) for _ in range(depth)]
        )
        self.fc_norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)

    def forward(self, x):
        tok = self.patch_embed(x)
        tok = tok + self.pos.type_as(tok)
        for blk in self.blocks:
            tok = blk(tok)
        return self.head(self.fc_norm(tok.mean(1)))


# ---------------------------------------------------------------------------
# flax -> torch weight loading
# ---------------------------------------------------------------------------


def _t(a):
    return torch.from_numpy(np.asarray(a, dtype=np.float32))


def load_block(ref_block: RefBlock, p: dict):
    ref_block.norm1.weight.data = _t(p["norm1"]["scale"])
    ref_block.norm1.bias.data = _t(p["norm1"]["bias"])
    ref_block.norm2.weight.data = _t(p["norm2"]["scale"])
    ref_block.norm2.bias.data = _t(p["norm2"]["bias"])
    a = p["attn"]
    ref_block.attn.qkv.weight.data = _t(a["qkv_kernel"]).T.contiguous()
    ref_block.attn.q_bias.data = _t(a["q_bias"])
    ref_block.attn.v_bias.data = _t(a["v_bias"])
    ref_block.attn.proj.weight.data = _t(a["proj_kernel"]).T.contiguous()
    ref_block.attn.proj.bias.data = _t(a["proj_bias"])
    m = p["mlp"]
    ref_block.mlp.fc1.weight.data = _t(m["fc1"]["kernel"]).T.contiguous()
    ref_block.mlp.fc1.bias.data = _t(m["fc1"]["bias"])
    ref_block.mlp.fc2.weight.data = _t(m["fc2"]["kernel"]).T.contiguous()
    ref_block.mlp.fc2.bias.data = _t(m["fc2"]["bias"])


def load_patch_embed(ref_pe: RefPatchEmbed, p: dict, tubelet, patch, chans,
                     dim):
    # flax kernel (p0*p1*p2*C, D), vector order (p0, p1, p2, c) ->
    # torch conv weight (D, C, p0, p1, p2)
    k = _t(p["kernel"]).reshape(tubelet, patch, patch, chans, dim)
    ref_pe.proj.weight.data = k.permute(4, 3, 0, 1, 2).contiguous()
    ref_pe.proj.bias.data = _t(p["bias"])


def load_pretrain(ref: RefPretrain, params: dict, tubelet=2, patch=16):
    enc = params["encoder"]
    dim = ref.enc_blocks[0].norm1.weight.shape[0]
    load_patch_embed(ref.patch_embed, enc["patch_embed"], tubelet, patch, 3,
                     dim)
    for i, blk in enumerate(ref.enc_blocks):
        load_block(blk, enc[f"blocks_{i}"])
    ref.enc_norm.weight.data = _t(enc["norm"]["scale"])
    ref.enc_norm.bias.data = _t(enc["norm"]["bias"])
    ref.encoder_to_decoder.weight.data = _t(
        params["encoder_to_decoder"]["kernel"]
    ).T.contiguous()
    ref.mask_token.data = _t(params["mask_token"])
    dec = params["decoder"]
    for i, blk in enumerate(ref.dec_blocks):
        load_block(blk, dec[f"blocks_{i}"])
    ref.dec_norm.weight.data = _t(dec["norm"]["scale"])
    ref.dec_norm.bias.data = _t(dec["norm"]["bias"])
    ref.head.weight.data = _t(dec["head"]["kernel"]).T.contiguous()
    ref.head.bias.data = _t(dec["head"]["bias"])


def load_classifier(ref: RefClassifier, params: dict, tubelet=2, patch=16):
    dim = ref.blocks[0].norm1.weight.shape[0]
    load_patch_embed(ref.patch_embed, params["patch_embed"], tubelet, patch,
                     3, dim)
    for i, blk in enumerate(ref.blocks):
        load_block(blk, params[f"blocks_{i}"])
    ref.fc_norm.weight.data = _t(params["fc_norm"]["scale"])
    ref.fc_norm.bias.data = _t(params["fc_norm"]["bias"])
    ref.head.weight.data = _t(params["head"]["kernel"]).T.contiguous()
    ref.head.bias.data = _t(params["head"]["bias"])
