"""Import reference PyTorch checkpoints into retr_tpu param pytrees.

Maps the reference's state_dict naming (models/caption.py + models/ConcatTransformer.py
module tree: ``backbone.body.*``, ``input_proj.*``, ``transformer.encoder.layers.N.
self_attn.{sublayer,norm}.*``, ``transformer.embeddings.*``, ``mlp.layers.N.*``) onto
our functional param layout, with:

- BatchNorm folded to (scale, bias) (see resnet.fold_bn);
- torch Linear/Conv [out, in] weights transposed to our [in, out] matmul layout;
- nn.MultiheadAttention's stacked in_proj [3E, E] split into q/k/v.

Input is a ``{name: np.ndarray}`` mapping — load a ``.pth`` with
``torch.load(..., map_location='cpu')`` and convert values via ``.numpy()``
(the reference saves under key ``model_state_dict``, train_utils/checkpoints.py:4-15);
torch itself is NOT imported here, so the framework stays torch-free.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax.numpy as jnp
import numpy as np

from retr_tpu.config import Config
from retr_tpu.models import resnet

Params = Dict[str, Any]


def _arr(x) -> jnp.ndarray:
    """Copy into a fresh device array. jnp.asarray can zero-copy ALIAS the numpy
    buffer on CPU — and torch's .numpy() views share storage with the live module,
    so a later optimizer.step() would silently mutate the 'imported' params."""
    return jnp.array(np.asarray(x), copy=True)


def _lin(state: Mapping[str, np.ndarray], name: str) -> Params:
    return {
        "w": _arr(np.asarray(state[f"{name}.weight"]).T),
        "b": _arr(state[f"{name}.bias"]),
    }


def _norm(state: Mapping[str, np.ndarray], name: str) -> Params:
    return {
        "scale": _arr(state[f"{name}.weight"]),
        "bias": _arr(state[f"{name}.bias"]),
    }


def _mha(state: Mapping[str, np.ndarray], name: str) -> Params:
    w = np.asarray(state[f"{name}.in_proj_weight"])  # [3E, E]
    b = np.asarray(state[f"{name}.in_proj_bias"])    # [3E]
    e = w.shape[1]
    return {
        "q": {"w": _arr(w[:e].T), "b": _arr(b[:e])},
        "k": {"w": _arr(w[e : 2 * e].T), "b": _arr(b[e : 2 * e])},
        "v": {"w": _arr(w[2 * e :].T), "b": _arr(b[2 * e :])},
        "out": _lin(state, f"{name}.out_proj"),
    }


def _att_block(state, name) -> Params:
    return {"norm": _norm(state, f"{name}.norm"), "mha": _mha(state, f"{name}.sublayer")}


def _ff_block(state, name) -> Params:
    return {
        "norm": _norm(state, f"{name}.norm"),
        "lin1": _lin(state, f"{name}.sublayer.0"),
        "lin2": _lin(state, f"{name}.sublayer.2"),
    }


def import_transformer(state: Mapping[str, np.ndarray], cfg: Config, prefix="transformer.") -> Params:
    p: Params = {
        "encoder": {
            "layers": [
                {
                    "self_attn": _att_block(state, f"{prefix}encoder.layers.{i}.self_attn"),
                    "ff": _ff_block(state, f"{prefix}encoder.layers.{i}.ff"),
                }
                for i in range(cfg.enc_layers)
            ]
        },
        "decoder": {
            "layers": [
                {
                    "self_attn": _att_block(state, f"{prefix}decoder.layers.{i}.tgt_self_attn"),
                    "cross_attn": _att_block(state, f"{prefix}decoder.layers.{i}.tgt_src_cross_attn"),
                    "ff": _ff_block(state, f"{prefix}decoder.layers.{i}.ff"),
                }
                for i in range(cfg.dec_layers)
            ],
            "norm": _norm(state, f"{prefix}decoder.norm"),
        },
        "embeddings": {
            "word": {"table": _arr(state[f"{prefix}embeddings.word_embeddings.weight"])},
            "pos": {"table": _arr(state[f"{prefix}embeddings.position_embeddings.weight"])},
            "norm": _norm(state, f"{prefix}embeddings.LayerNorm"),
        },
    }
    if f"{prefix}encoder.norm.weight" in state:
        p["encoder"]["norm"] = _norm(state, f"{prefix}encoder.norm")
    return p


def import_caption_model(state: Mapping[str, np.ndarray], cfg: Config) -> Params:
    """Full reference model (any variant) -> retr_tpu params."""
    conv_w = np.asarray(state["input_proj.weight"])  # [d, nc, 1, 1]
    params: Params = {
        "backbone": resnet.import_torch_state_dict(
            state, cfg.backbone, cfg.dilation, prefix="backbone.body."
        ),
        "input_proj": {
            "w": _arr(conv_w[:, :, 0, 0].T),
            "b": _arr(state["input_proj.bias"]),
        },
        "transformer": import_transformer(state, cfg),
        "mlp": {"layers": [_lin(state, f"mlp.layers.{i}") for i in range(3)]},
    }
    if "loc_proj.weight" in state:
        params["loc_proj"] = _lin(state, "loc_proj")
    return params
