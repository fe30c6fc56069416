"""Caption model variants: backbone -> 1x1 projection -> ConcatTransformer -> MLP head.

Reference: models/caption.py. Variant selection by
``(use_global_features, use_location_features)`` (caption.py:183-199):

    (F, F) -> Caption          — target patches only
    (F, T) -> CaptionLoc       — target patches + ONE projected location token
    (T, T) -> CaptionGlobalLoc — target patches + one token PER location scalar,
                                 concat-fused with a separately-encoded context stream
    (T, F) -> NotImplementedError (matching the reference)

Deviation (documented): CaptionLoc projects ``num_location_features`` (=5) features —
the reference declares Linear(7, hidden) (caption.py:60) while its own pipeline
produces 5 (data_utils/utils.py:228), so the reference (F, T) path crashes as shipped.

The 1x1 input_proj conv is realized as a single [C_backbone -> hidden] matmul over the
flattened patch sequence — identical math, and on TPU a plain MXU matmul instead of a
conv. The MLP head is 256→512→512→vocab with ReLU between layers (caption.py:161-174).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from retr_tpu import device
from retr_tpu.config import Config
from retr_tpu.masking import Masked, ensure_unmasked_values
from retr_tpu.models import layers, resnet, transformer
from retr_tpu.precision import matmul_precision

Params = Dict[str, Any]


def init(key, cfg: Config) -> Params:
    if cfg.use_global_features and not cfg.use_location_features:
        raise NotImplementedError()  # caption.py:198-199; raise before building
    kb, kp, kt, km1, km2, km3, kloc = jax.random.split(key, 7)
    nc, d = cfg.backbone_num_channels, cfg.hidden_dim
    params: Params = {
        "backbone": resnet.init(kb, cfg.backbone, cfg.dilation),
        # Conv2d(nc, d, 1) == Linear over channels; torch conv default init.
        "input_proj": layers.torch_linear_init(kp, nc, d),
        "transformer": transformer.init(kt, cfg),
        "mlp": {
            "layers": [
                layers.torch_linear_init(km1, d, 512),
                layers.torch_linear_init(km2, 512, 512),
                layers.torch_linear_init(km3, 512, cfg.vocab_size),
            ]
        },
    }
    if cfg.use_global_features and cfg.use_location_features:
        params["loc_proj"] = layers.torch_linear_init(kloc, 1, d)
    elif cfg.use_location_features:
        params["loc_proj"] = layers.torch_linear_init(kloc, cfg.num_location_features, d)
    return params


def mlp_head(p: Params, x: jax.Array) -> jax.Array:
    """3-layer MLP with ReLU between layers (caption.py:161-174)."""
    n = len(p["layers"])
    for i, lp in enumerate(p["layers"]):
        x = layers.linear(lp, x)
        if i < n - 1:
            x = jax.nn.relu(x)
    return x


def _backbone_features(params: Params, samples: Masked, cfg: Config, compute_dtype,
                       stop_prefix_gradient: bool = False):
    """backbone -> input_proj -> flatten: [B, hidden, HW] features + [B, HW] mask."""
    feats = resnet.backbone_forward(
        params["backbone"], samples, name=cfg.backbone, dilation=cfg.dilation,
        compute_dtype=compute_dtype, precision=cfg.backbone_precision
        if cfg.backbone_precision != "highest" else "",
        stop_prefix_gradient=stop_prefix_gradient, remat=cfg.remat,
    )
    if cfg.guard_all_masked_target:
        feats = feats._replace(
            mask=ensure_unmasked_values(feats.mask, jax.random.key(cfg.seed))
        )
    b, c, h, w = feats.tensors.shape
    x = feats.tensors.reshape(b, c, h * w).swapaxes(1, 2)  # [B, HW, C]
    with matmul_precision(compute_dtype):
        src = layers.linear(params["input_proj"], x)       # [B, HW, hidden]
    return src.swapaxes(1, 2), feats.mask.reshape(b, h * w), feats


class EncoderInput(NamedTuple):
    """Assembled encoder streams, pre-transformer (channel-first like the reference)."""

    src_t: jax.Array
    mask_t: jax.Array
    src_c: Optional[jax.Array]
    mask_c: Optional[jax.Array]


def build_encoder_input(
    params: Params,
    cfg: Config,
    samples: Masked,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    *,
    compute_dtype=jnp.float32,
    unmask_key: Optional[jax.Array] = None,
    stop_prefix_gradient: bool = False,
) -> EncoderInput:
    """Run backbones + location projections for whichever variant cfg selects."""
    src_t, mask_t, _ = _backbone_features(
        params, samples, cfg, compute_dtype, stop_prefix_gradient
    )

    if cfg.use_global_features and cfg.use_location_features:
        assert global_samples is not None and loc_feats is not None
        # one token per location scalar (caption.py:126-128)
        with matmul_precision(compute_dtype):
            loc_src = layers.linear(params["loc_proj"], loc_feats[:, :, None].astype(compute_dtype))
        loc_src = loc_src.swapaxes(1, 2)  # [B, hidden, n_loc]
        loc_mask = jnp.zeros(loc_feats.shape, dtype=bool)
        src_t = jnp.concatenate([src_t, loc_src], axis=2)
        mask_t = jnp.concatenate([mask_t, loc_mask], axis=1)

        g_feats = resnet.backbone_forward(
            params["backbone"], global_samples, name=cfg.backbone, dilation=cfg.dilation,
            compute_dtype=compute_dtype, precision=cfg.backbone_precision
            if cfg.backbone_precision != "highest" else "",
            stop_prefix_gradient=stop_prefix_gradient, remat=cfg.remat,
        )
        if unmask_key is None:
            unmask_key = jax.random.key(cfg.seed)
        g_mask = ensure_unmasked_values(g_feats.mask, unmask_key)  # caption.py:144
        b, c, h, w = g_feats.tensors.shape
        with matmul_precision(compute_dtype):
            g_src = layers.linear(
                params["input_proj"], g_feats.tensors.reshape(b, c, h * w).swapaxes(1, 2)
            ).swapaxes(1, 2)
        return EncoderInput(src_t, mask_t, g_src, g_mask.reshape(b, h * w))

    if cfg.use_location_features:
        assert loc_feats is not None
        # single location token (caption.py:78-84), with the 5-feature fix
        with matmul_precision(compute_dtype):
            loc_src = layers.linear(params["loc_proj"], loc_feats.astype(compute_dtype))
        loc_src = loc_src[:, :, None]  # [B, hidden, 1]
        loc_mask = jnp.zeros((loc_feats.shape[0], 1), dtype=bool)
        return EncoderInput(
            jnp.concatenate([src_t, loc_src], axis=2),
            jnp.concatenate([mask_t, loc_mask], axis=1),
            None,
            None,
        )

    return EncoderInput(src_t, mask_t, None, None)


def forward(
    params: Params,
    cfg: Config,
    samples: Masked,
    target_exp: jax.Array,       # [B, T] token ids
    target_exp_mask: jax.Array,  # [B, T] bool True=pad
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    return_attention: bool = False,
    key: Optional[jax.Array] = None,
    train: bool = False,
    compute_dtype=jnp.float32,
):
    """Full teacher-forced forward -> logits [B, T, vocab] (+ attention maps)."""
    k_unmask = None if key is None else jax.random.fold_in(key, 2)
    # train=True is the only differentiated path; the frozen stem prefix
    # (conv1/bn1/layer1, reference backbone.py:58-60) is pruned from backward
    # exactly as torch autograd prunes requires_grad=False subgraphs.
    enc_in = build_encoder_input(
        params, cfg, samples, global_samples, loc_feats,
        compute_dtype=compute_dtype, unmask_key=k_unmask,
        stop_prefix_gradient=train,
    )
    hs, atts = transformer.forward(
        params["transformer"], enc_in.src_t, enc_in.mask_t, enc_in.src_c, enc_in.mask_c,
        target_exp, target_exp_mask, cfg,
        return_attention=return_attention, key=key, train=train,
    )
    with matmul_precision(compute_dtype):
        out = mlp_head(params["mlp"], hs)
    if return_attention:
        return out, atts
    return out


def encode(
    params: Params,
    cfg: Config,
    samples: Masked,
    *,
    global_samples: Optional[Masked] = None,
    loc_feats: Optional[jax.Array] = None,
    compute_dtype=jnp.float32,
    unmask_key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Encode once for autoregressive decoding: returns (memory [B,S,C], mask [B,S],
    pos [S,C]). This is the half of the model the reference recomputes every greedy
    step (eval_utils/decode.py:69) and we run exactly once."""
    enc_in = build_encoder_input(
        params, cfg, samples, global_samples, loc_feats,
        compute_dtype=compute_dtype, unmask_key=unmask_key,
    )
    if enc_in.src_c is not None:
        src = jnp.concatenate([enc_in.src_t, enc_in.src_c], axis=2)
        mask = jnp.concatenate([enc_in.mask_t, enc_in.mask_c], axis=1)
    else:
        src, mask = enc_in.src_t, enc_in.mask_t
    src = jnp.swapaxes(src, 1, 2)
    with matmul_precision(compute_dtype):
        memory, pos, _ = transformer.encode(params["transformer"], src, mask, cfg)
    return memory, mask, pos


def build_model(cfg: Config, key=None):
    """Reference-compatible factory (caption.py:177-212): returns (params, loss_fn).

    The criterion is plain softmax cross-entropy averaged over ALL positions —
    including PAD, exactly like the reference's CrossEntropyLoss with no ignore_index
    (caption.py:210, engine.py:71).
    """
    if key is None:
        key = jax.random.key(cfg.seed)
    params = init(key, cfg)
    # Commit to the default LOCAL device (see retr_tpu/device.py for why, and why
    # not jax.devices()[0] under multi-host).
    params = device.commit_to_local_device(params)

    def criterion(logits: jax.Array, targets: jax.Array) -> jax.Array:
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll)

    return params, criterion
