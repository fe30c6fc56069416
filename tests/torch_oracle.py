"""Test-only PyTorch oracle replicating the reference model's numerics.

The reference (simeonjunker/retr) depends on torchvision, which is not installed in
this environment, so the reference cannot be executed directly. This module rebuilds
the same computation with torch core ops — FrozenBatchNorm ResNet (torchvision
semantics: V1.5 stride-on-conv2 bottleneck, replace_stride_with_dilation),
pre-norm ConcatTransformer on nn.MultiheadAttention, DecoderEmbeddings, MLP head,
and batched greedy decode (reference eval_utils/decode.py:53-81) — so JAX parity
tests have an executable ground truth.

Used ONLY by tests; never imported by retr_tpu.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


class FrozenBatchNorm2d(nn.Module):
    """Affine-only BN with eps added before rsqrt (reference models/backbone.py:41-51)."""

    def __init__(self, n):
        super().__init__()
        self.register_buffer("weight", torch.ones(n))
        self.register_buffer("bias", torch.zeros(n))
        self.register_buffer("running_mean", torch.zeros(n))
        self.register_buffer("running_var", torch.ones(n))

    def forward(self, x):
        w = self.weight.reshape(1, -1, 1, 1)
        b = self.bias.reshape(1, -1, 1, 1)
        rv = self.running_var.reshape(1, -1, 1, 1)
        rm = self.running_mean.reshape(1, -1, 1, 1)
        scale = w * (rv + 1e-5).rsqrt()
        bias = b - rm * scale
        return x * scale + bias


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 1, bias=False)
        self.bn1 = FrozenBatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = FrozenBatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = FrozenBatchNorm2d(planes * 4)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.relu(self.bn2(self.conv2(out)))
        out = self.bn3(self.conv3(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, inplanes, planes, stride=1, downsample=None, dilation=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn1 = FrozenBatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=dilation, dilation=dilation, bias=False)
        self.bn2 = FrozenBatchNorm2d(planes)
        self.downsample = downsample
        self.relu = nn.ReLU(inplace=True)

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


SPECS = {
    "ResNet18": (BasicBlock, [2, 2, 2, 2]),
    "ResNet34": (BasicBlock, [3, 4, 6, 3]),
    "ResNet50": (Bottleneck, [3, 4, 6, 3]),
    "ResNet101": (Bottleneck, [3, 4, 23, 3]),
}


class ResNet(nn.Module):
    """torchvision-semantics ResNet trunk (through layer4 only, no fc/avgpool)."""

    def __init__(self, name="ResNet50", dilation=True):
        super().__init__()
        block, layers = SPECS[name]
        self.inplanes = 64
        self.dilation = 1
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = FrozenBatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
        self.layer1 = self._make_layer(block, 64, layers[0])
        self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
        self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
        self.layer4 = self._make_layer(block, 512, layers[3], stride=2, dilate=dilation)
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out", nonlinearity="relu")

    def _make_layer(self, block, planes, blocks, stride=1, dilate=False):
        downsample = None
        previous_dilation = self.dilation
        if dilate:
            self.dilation *= stride
            stride = 1
        if stride != 1 or self.inplanes != planes * block.expansion:
            downsample = nn.Sequential(
                nn.Conv2d(self.inplanes, planes * block.expansion, 1, stride=stride, bias=False),
                FrozenBatchNorm2d(planes * block.expansion),
            )
        layers = [block(self.inplanes, planes, stride, downsample, previous_dilation)]
        self.inplanes = planes * block.expansion
        for _ in range(1, blocks):
            layers.append(block(self.inplanes, planes, dilation=self.dilation))
        return nn.Sequential(*layers)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        return self.layer4(x)


# ------------------------------------------------------------------------------
# Transformer oracle (reference ConcatTransformer.py / transformer_modules.py)
# ------------------------------------------------------------------------------


def with_pos(t, pos):
    return t if pos is None else t + pos


class SelfAttRes(nn.Module):
    """Attribute names (sublayer/norm) match the reference so state_dict keys line up."""

    def __init__(self, d, h, dropout=0.0):
        super().__init__()
        self.sublayer = nn.MultiheadAttention(d, h, dropout=dropout)
        self.norm = nn.LayerNorm(d)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x, pos, key_padding_mask=None, attn_mask=None):
        nx = self.norm(x)
        q = k = with_pos(nx, pos)
        out, w = self.sublayer(q, k, nx, key_padding_mask=key_padding_mask, attn_mask=attn_mask)
        return x + self.dropout(out), w


class CrossAttRes(nn.Module):
    def __init__(self, d, h, dropout=0.0):
        super().__init__()
        self.sublayer = nn.MultiheadAttention(d, h, dropout=dropout)
        self.norm = nn.LayerNorm(d)
        self.dropout = nn.Dropout(dropout)

    def forward(self, q, kv, q_pos, k_pos, key_padding_mask=None):
        nq = self.norm(q)
        out, w = self.sublayer(with_pos(nq, q_pos), with_pos(kv, k_pos), kv,
                               key_padding_mask=key_padding_mask)
        return q + self.dropout(out), w


class FFRes(nn.Module):
    def __init__(self, d, dff, dropout=0.0):
        super().__init__()
        self.sublayer = nn.Sequential(nn.Linear(d, dff), nn.ReLU(), nn.Linear(dff, d))
        self.norm = nn.LayerNorm(d)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        return x + self.dropout(self.sublayer(self.norm(x)))


class EncLayer(nn.Module):
    def __init__(self, d, h, dff, dropout=0.0):
        super().__init__()
        self.self_attn = SelfAttRes(d, h, dropout)
        self.ff = FFRes(d, dff, dropout)

    def forward(self, src, pos, key_padding_mask):
        src, w = self.self_attn(src, pos, key_padding_mask=key_padding_mask)
        return self.ff(src), w


class DecLayer(nn.Module):
    def __init__(self, d, h, dff, dropout=0.0):
        super().__init__()
        self.tgt_self_attn = SelfAttRes(d, h, dropout)
        self.tgt_src_cross_attn = CrossAttRes(d, h, dropout)
        self.ff = FFRes(d, dff, dropout)

    def forward(self, tgt, memory, tgt_mask, tgt_kpm, mem_kpm, pos, query_pos):
        tgt, sw = self.tgt_self_attn(tgt, query_pos, key_padding_mask=tgt_kpm, attn_mask=tgt_mask)
        tgt, cw = self.tgt_src_cross_attn(tgt, memory, query_pos, pos, key_padding_mask=mem_kpm)
        return self.ff(tgt), sw, cw


class Encoder(nn.Module):
    def __init__(self, d, h, dff, n, dropout=0.0, pre_norm=True):
        super().__init__()
        self.layers = nn.ModuleList(EncLayer(d, h, dff, dropout) for _ in range(n))
        self.norm = nn.LayerNorm(d) if pre_norm else None


class Decoder(nn.Module):
    def __init__(self, d, h, dff, n, dropout=0.0):
        super().__init__()
        self.layers = nn.ModuleList(DecLayer(d, h, dff, dropout) for _ in range(n))
        self.norm = nn.LayerNorm(d)


class DecoderEmbeddings(nn.Module):
    def __init__(self, vocab, d, pad_id, max_pos, ln_eps, dropout=0.0):
        super().__init__()
        self.word_embeddings = nn.Embedding(vocab, d, padding_idx=pad_id)
        self.position_embeddings = nn.Embedding(max_pos, d)
        self.LayerNorm = nn.LayerNorm(d, eps=ln_eps)
        self.dropout = nn.Dropout(dropout)

    def forward(self, x):
        ids = torch.arange(x.shape[1], device=x.device).unsqueeze(0).expand(x.shape)
        return self.dropout(self.LayerNorm(self.word_embeddings(x) + self.position_embeddings(ids)))


def sine_table(d_model, max_len=1024):
    position = torch.arange(max_len).unsqueeze(1)
    div = torch.exp(torch.arange(0, d_model, 2) * (-math.log(10000.0) / d_model))
    pe = torch.zeros(max_len, d_model)
    pe[:, 0::2] = torch.sin(position * div)
    pe[:, 1::2] = torch.cos(position * div)
    return pe  # [max_len, d]


def square_subsequent_mask(sz):
    m = torch.triu(torch.ones(sz, sz), diagonal=1).bool()
    out = torch.zeros(sz, sz)
    out.masked_fill_(m, float("-inf"))
    return out


class ConcatTransformer(nn.Module):
    def __init__(self, vocab=128, d=64, h=4, nenc=2, ndec=2, dff=128, max_pos=16,
                 pad_id=0, ln_eps=1e-12, dropout=0.0, pre_norm=True):
        super().__init__()
        self.encoder = Encoder(d, h, dff, nenc, dropout, pre_norm)
        self.decoder = Decoder(d, h, dff, ndec, dropout)
        self.embeddings = DecoderEmbeddings(vocab, d, pad_id, max_pos, ln_eps, dropout)
        self.d = d
        # reference re-inits all dim>1 params with xavier (ConcatTransformer.py:40-43)
        for p in self.parameters():
            if p.dim() > 1:
                nn.init.xavier_uniform_(p)

    def forward(self, src, mask, tgt, tgt_mask, src_c=None, mask_c=None, return_attention=False):
        """src: [B, C, S] features, mask: [B, S] (True=pad), tgt: [B, T] token ids."""
        if src_c is not None:
            src = torch.concat([src, src_c], 2)
            mask = torch.concat([mask, mask_c], 1)
        bs, c, s = src.shape
        pos = sine_table(self.d)[:s].T.unsqueeze(0).repeat(bs, 1, 1)  # [B, C, S]

        src = src.permute(2, 0, 1)          # [S, B, C]
        pos = pos.permute(2, 0, 1)
        tgt_emb = self.embeddings(tgt).permute(1, 0, 2)  # [T, B, C]
        query_pos = self.embeddings.position_embeddings.weight.unsqueeze(1).repeat(1, bs, 1)

        out = src
        enc_ws = []
        for layer in self.encoder.layers:
            out, w = layer(out, pos, mask)
            enc_ws.append(w)
        if self.encoder.norm is not None:
            out = self.encoder.norm(out)
        memory = out

        causal = square_subsequent_mask(tgt_emb.shape[0])
        x = tgt_emb
        dec_sws, dec_cws = [], []
        for layer in self.decoder.layers:
            x, sw, cw = layer(x, memory, causal, tgt_mask, mask, pos, query_pos)
            dec_sws.append(sw)
            dec_cws.append(cw)
        x = self.decoder.norm(x)
        if return_attention:
            atts = {
                "enc_tc_self_att": torch.stack(enc_ws),
                "dec_exp_self_att": torch.stack(dec_sws),
                "dec_exp_tc_cross_att": torch.stack(dec_cws),
            }
            return x, atts
        return x  # [T, B, C]


class MLP(nn.Module):
    def __init__(self, d_in, d_h, d_out, n=3):
        super().__init__()
        dims = [d_in] + [d_h] * (n - 1)
        self.layers = nn.ModuleList(nn.Linear(a, b) for a, b in zip(dims, dims[1:] + [d_out]))

    def forward(self, x):
        for i, l in enumerate(self.layers):
            x = F.relu(l(x)) if i < len(self.layers) - 1 else l(x)
        return x


class BackboneWrap(nn.Module):
    """Matches the reference BackboneBase's `.body` nesting so state_dict keys are
    `backbone.body.conv1.weight` etc."""

    def __init__(self, name, dilation):
        super().__init__()
        self.body = ResNet(name, dilation)

    def forward(self, x):
        return self.body(x)


class CaptionModel(nn.Module):
    """Full reference model: backbone -> 1x1 proj -> transformer -> MLP head, with the
    reference's three variants (caption.py:10-158) folded into one test oracle via
    use_loc / use_global flags."""

    def __init__(self, backbone_name="ResNet50", dilation=True, vocab=128, d=64, h=4,
                 nenc=2, ndec=2, dff=128, max_pos=16, num_channels=None,
                 use_loc=False, use_global=False, n_loc=5):
        super().__init__()
        self.backbone = BackboneWrap(backbone_name, dilation)
        nc = num_channels or (512 if backbone_name in ("ResNet18", "ResNet34") else 2048)
        self.input_proj = nn.Conv2d(nc, d, kernel_size=1)
        self.transformer = ConcatTransformer(vocab, d, h, nenc, ndec, dff, max_pos)
        self.mlp = MLP(d, 2 * d, vocab)
        self.use_loc, self.use_global = use_loc, use_global
        if use_loc and use_global:
            self.loc_proj = nn.Linear(1, d)   # CaptionGlobalLoc: one token per scalar
        elif use_loc:
            self.loc_proj = nn.Linear(n_loc, d)  # CaptionLoc with the 7→5 fix

    def _features(self, img, img_mask):
        feats = self.backbone(img)
        src = self.input_proj(feats).flatten(2)  # [B, d, HW]
        fmask = F.interpolate(img_mask[None].float(), size=feats.shape[-2:]).to(torch.bool)[0]
        return src, fmask.flatten(1)

    def forward(self, *args):
        if self.use_global and self.use_loc:
            img, img_mask, g_img, g_mask, loc, caps, cap_mask = args
            t_src, t_mask = self._features(img, img_mask)
            loc_src = self.loc_proj(loc.unsqueeze(2)).permute(0, 2, 1)  # [B, d, n]
            loc_mask = torch.zeros((loc.shape[0], loc.shape[1]), dtype=torch.bool)
            src = torch.concat([t_src, loc_src], 2)
            mask = torch.concat([t_mask, loc_mask], 1)
            g_src, g_mask_f = self._features(g_img, g_mask)
            hs = self.transformer(src, mask, caps, cap_mask, src_c=g_src, mask_c=g_mask_f)
        elif self.use_loc:
            img, img_mask, loc, caps, cap_mask = args
            t_src, t_mask = self._features(img, img_mask)
            loc_src = self.loc_proj(loc).unsqueeze(-1)  # [B, d, 1]
            loc_mask = torch.zeros((loc.shape[0], 1), dtype=torch.bool)
            src = torch.concat([t_src, loc_src], 2)
            mask = torch.concat([t_mask, loc_mask], 1)
            hs = self.transformer(src, mask, caps, cap_mask)
        else:
            img, img_mask, caps, cap_mask = args
            src, fmask = self._features(img, img_mask)
            hs = self.transformer(src, fmask, caps, cap_mask)
        return self.mlp(hs.permute(1, 0, 2))  # [B, T, vocab]


@torch.no_grad()
def greedy_oracle(model_fn, batch, max_len, bos, eos, steps=None):
    """Reference batched greedy (eval_utils/decode.py:53-81) against any model_fn
    (img, img_mask, caption, cap_mask) -> [B, T, V] logits.

    ``steps`` caps the number of decode iterations while keeping the full
    ``max_len`` buffer/position-table semantics (the reference always decodes
    over the whole 128 buffer) — used by the full-scale parity artifact, where
    each oracle step is a full ResNet101+6+6 forward on one CPU core and only
    the first ``steps`` emitted tokens are compared.
    """
    b = batch[0].shape[0]
    caption = torch.zeros((b, max_len), dtype=torch.long)
    cap_mask = torch.ones((b, max_len), dtype=torch.bool)
    caption[:, 0] = bos
    cap_mask[:, 0] = False
    finished = torch.zeros(b, dtype=torch.bool)
    n_steps = max_len - 1 if steps is None else min(steps, max_len - 1)
    for i in range(n_steps):
        logits = model_fn(*batch, caption, cap_mask)
        pred = torch.argmax(logits[:, i, :], axis=-1)
        finished = torch.logical_or(pred == eos, finished)
        if bool(finished.all()):
            return caption
        caption[:, i + 1] = pred
        cap_mask[:, i + 1] = False
    return caption
