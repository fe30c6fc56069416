"""Attention-map inspection example (reference eval_utils/decode.py:131-167,
greedy_with_att): decode an image and look at WHERE the decoder attended for
each generated token.

The reference re-runs the full model once per step to collect per-step attention
dicts; retr_tpu's ``greedy_with_attention`` reproduces the same information with
one KV-cached decode + one teacher-forced forward (row i of the full-sequence
maps == the step-i map). Returned stacks are keyed like the reference merge
(ConcatTransformer.py:72-73):

    enc_tc_self_att       [enc_layers, B, S, S]
    dec_exp_self_att      [dec_layers, B, T, T]
    dec_exp_tc_cross_att  [dec_layers, B, T, S]

Run:  python examples/attention_maps.py     (CPU, ~1 min; tiny random model)

With a trained checkpoint, replace the build_model call with
Predictor.from_checkpoint(...) internals and real images; the plotting below is
dependency-free (ASCII heatmap + .npy dumps).
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # remove to run on the TPU

from retr_tpu import Config, build_model
from retr_tpu.data.preprocess import preprocess_sample
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.decode import greedy_with_attention, prune_token_ids
from retr_tpu.masking import Masked


def ascii_heatmap(grid: np.ndarray, width: int = 2) -> str:
    """Render a [H, W] attention grid with unicode shades."""
    shades = " .:-=+*#%@"
    lo, hi = float(grid.min()), float(grid.max())
    scale = (len(shades) - 1) / (hi - lo) if hi > lo else 0.0
    return "\n".join(
        "".join(shades[int((v - lo) * scale)] * width for v in row) for row in grid
    )


def main():
    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=2,
        dec_layers=2, dim_feedforward=128, vocab_size=tok.vocab_size,
        max_position_embeddings=16, dropout=0.0, image_size=64,
    )
    params, _ = build_model(cfg, jax.random.key(0))

    rng = np.random.default_rng(0)
    image = rng.integers(0, 256, (120, 160, 3), dtype=np.uint8)
    bbox = [30, 20, 80, 60]
    s = preprocess_sample(image, bbox, "", tok, image_size=cfg.image_size,
                          max_length=cfg.max_position_embeddings)
    samples = Masked(
        jax.numpy.asarray(s.target_image, jax.numpy.float32)[None].transpose(0, 3, 1, 2) / 255.0,
        jax.numpy.asarray(s.target_mask)[None],
    )

    ids, atts = greedy_with_attention(
        params, cfg, samples, max_len=cfg.max_position_embeddings,
    )
    ids_np = np.asarray(ids)
    pruned = prune_token_ids(ids_np.tolist())
    tokens = tok.convert_ids_to_tokens(pruned[0]) if pruned[0] else []
    print("generated tokens:", tokens or "(empty — random weights)")
    print("attention stacks:", {k: tuple(np.asarray(v).shape) for k, v in atts.items()})

    cross = np.asarray(atts["dec_exp_tc_cross_att"])  # [L, B, T, S]
    side = int(np.sqrt(cross.shape[-1]))
    out_dir = os.path.join(_REPO, "examples", "out")
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "cross_attention.npy"), cross)
    print(f"saved cross-attention stack -> {out_dir}/cross_attention.npy")

    # last decoder layer, first batch element: where each generated position looked
    for t in range(min(3, cross.shape[2])):
        grid = cross[-1, 0, t, : side * side].reshape(side, side)
        label = tokens[t] if t < len(tokens) else f"pos {t}"
        print(f"\ncross-attention, last layer, step {t} ({label}):")
        print(ascii_heatmap(grid))


if __name__ == "__main__":
    main()
