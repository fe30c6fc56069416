"""Export retr_tpu param pytrees as reference-format PyTorch state dicts.

The exact inverse of ``torch_import``: produces the reference's module naming
(models/caption.py + models/ConcatTransformer.py tree — ``backbone.body.*``,
``input_proj.*``, ``transformer.encoder.layers.N.self_attn.{sublayer,norm}.*``,
``transformer.embeddings.*``, ``mlp.layers.N.*``), so a model trained here can be
loaded by the reference's ``eval_model.py`` (``model_state_dict`` key,
train_utils/checkpoints.py:4-15) or by any torchvision-compatible tool.

BatchNorm caveat: our backbone stores frozen BN folded to (scale, bias)
(resnet.fold_bn), so the original (weight, bias, running_mean, running_var) are
not recoverable. We emit the canonical equivalent ``weight=scale, bias=bias,
running_mean=0, running_var=1-eps``: the reference's FrozenBatchNorm2d
(models/backbone.py:41-51) computes ``scale' = weight * rsqrt(running_var + eps)
= scale * rsqrt(1.0) = scale`` exactly, so the round trip is bit-exact
(tests/test_engine_e2e.py::test_export_reference_checkpoint_roundtrip).

Values are numpy float32 arrays; callers wrap them for torch.save (see
train.checkpoints.export_reference_checkpoint). torch itself is NOT imported
here, so the framework stays torch-free.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from retr_tpu.config import Config
from retr_tpu.models.resnet import BN_EPS, resnet_structure

Params = Mapping[str, Any]
StateDict = Dict[str, np.ndarray]


def _np(x) -> np.ndarray:
    return np.asarray(x, np.float32)


def _lin(out: StateDict, name: str, p: Params) -> None:
    out[f"{name}.weight"] = _np(p["w"]).T.copy()
    out[f"{name}.bias"] = _np(p["b"])


def _norm(out: StateDict, name: str, p: Params) -> None:
    out[f"{name}.weight"] = _np(p["scale"])
    out[f"{name}.bias"] = _np(p["bias"])


def _mha(out: StateDict, name: str, p: Params) -> None:
    out[f"{name}.in_proj_weight"] = np.concatenate(
        [_np(p[k]["w"]).T for k in ("q", "k", "v")], axis=0
    ).copy()
    out[f"{name}.in_proj_bias"] = np.concatenate(
        [_np(p[k]["b"]) for k in ("q", "k", "v")], axis=0
    )
    _lin(out, f"{name}.out_proj", p["out"])


def _att_block(out: StateDict, name: str, p: Params) -> None:
    _norm(out, f"{name}.norm", p["norm"])
    _mha(out, f"{name}.sublayer", p["mha"])


def _ff_block(out: StateDict, name: str, p: Params) -> None:
    _norm(out, f"{name}.norm", p["norm"])
    _lin(out, f"{name}.sublayer.0", p["lin1"])
    _lin(out, f"{name}.sublayer.2", p["lin2"])


def _bn(out: StateDict, name: str, p: Params) -> None:
    """Folded (scale, bias) -> canonical FrozenBatchNorm2d buffers (see module
    docstring for why this is a bit-exact inverse under fold_bn)."""
    scale = _np(p["scale"])
    out[f"{name}.weight"] = scale
    out[f"{name}.bias"] = _np(p["bias"])
    out[f"{name}.running_mean"] = np.zeros_like(scale)
    out[f"{name}.running_var"] = np.full_like(scale, 1.0 - BN_EPS)


def export_backbone(p: Params, cfg: Config, prefix: str = "backbone.body.") -> StateDict:
    out: StateDict = {}
    out[f"{prefix}conv1.weight"] = _np(p["conv1"]["w"])
    _bn(out, f"{prefix}bn1", p["bn1"])
    block_type, plan = resnet_structure(cfg.backbone, cfg.dilation)
    n_convs = 3 if block_type == "bottleneck" else 2
    for stage in range(4):
        for bi, (_, _, has_ds) in enumerate(plan[stage]):
            base = f"{prefix}layer{stage + 1}.{bi}"
            bp = p[f"layer{stage + 1}"][bi]
            for ci in range(1, n_convs + 1):
                out[f"{base}.conv{ci}.weight"] = _np(bp[f"conv{ci}"]["w"])
                _bn(out, f"{base}.bn{ci}", bp[f"bn{ci}"])
            if has_ds:
                out[f"{base}.downsample.0.weight"] = _np(bp["downsample"]["conv"]["w"])
                _bn(out, f"{base}.downsample.1", bp["downsample"]["bn"])
    return out


def export_transformer(p: Params, cfg: Config, prefix: str = "transformer.") -> StateDict:
    out: StateDict = {}
    for i, layer in enumerate(p["encoder"]["layers"]):
        _att_block(out, f"{prefix}encoder.layers.{i}.self_attn", layer["self_attn"])
        _ff_block(out, f"{prefix}encoder.layers.{i}.ff", layer["ff"])
    if "norm" in p["encoder"]:
        _norm(out, f"{prefix}encoder.norm", p["encoder"]["norm"])
    for i, layer in enumerate(p["decoder"]["layers"]):
        _att_block(out, f"{prefix}decoder.layers.{i}.tgt_self_attn", layer["self_attn"])
        _att_block(out, f"{prefix}decoder.layers.{i}.tgt_src_cross_attn", layer["cross_attn"])
        _ff_block(out, f"{prefix}decoder.layers.{i}.ff", layer["ff"])
    _norm(out, f"{prefix}decoder.norm", p["decoder"]["norm"])
    emb = p["embeddings"]
    out[f"{prefix}embeddings.word_embeddings.weight"] = _np(emb["word"]["table"])
    out[f"{prefix}embeddings.position_embeddings.weight"] = _np(emb["pos"]["table"])
    _norm(out, f"{prefix}embeddings.LayerNorm", emb["norm"])
    return out


def export_caption_model(params: Params, cfg: Config) -> StateDict:
    """Full retr_tpu params (any variant) -> reference-named state_dict
    (numpy float32 values)."""
    out = export_backbone(params["backbone"], cfg)
    w = _np(params["input_proj"]["w"]).T  # [d, nc]
    out["input_proj.weight"] = w[:, :, None, None].copy()
    out["input_proj.bias"] = _np(params["input_proj"]["b"])
    out.update(export_transformer(params["transformer"], cfg))
    for i, layer in enumerate(params["mlp"]["layers"]):
        _lin(out, f"mlp.layers.{i}", layer)
    if "loc_proj" in params:
        _lin(out, "loc_proj", params["loc_proj"])
    return out
