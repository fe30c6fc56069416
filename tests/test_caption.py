"""End-to-end Caption model parity: logits, variants, and exact greedy token parity."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from retr_tpu import decode
from retr_tpu.config import Config
from retr_tpu.masking import Masked
from retr_tpu.models import caption, torch_import
from tests import torch_oracle


def tiny_cfg(**kw):
    base = dict(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=2,
        dec_layers=2, dim_feedforward=128, vocab_size=96, max_position_embeddings=12,
        dropout=0.0, image_size=64,
    )
    base.update(kw)
    return Config(**base)


def make_oracle(cfg, seed=0, **kw):
    torch.manual_seed(seed)
    tm = torch_oracle.CaptionModel(
        backbone_name=cfg.backbone, dilation=cfg.dilation, vocab=cfg.vocab_size,
        d=cfg.hidden_dim, h=cfg.nheads, nenc=cfg.enc_layers, ndec=cfg.dec_layers,
        dff=cfg.dim_feedforward, max_pos=cfg.max_position_embeddings,
        n_loc=cfg.num_location_features, **kw,
    ).eval()
    # oracle MLP head is d->2d->2d->vocab; adapt import: build params then overwrite mlp
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = import_oracle(state, cfg)
    return tm, params


def import_oracle(state, cfg):
    """Import the oracle's state dict (reference-shaped names, tiny MLP dims)."""
    conv_w = state["input_proj.weight"]
    params = {
        "backbone": __import__("retr_tpu.models.resnet", fromlist=["x"]).import_torch_state_dict(
            state, cfg.backbone, cfg.dilation, prefix="backbone.body."
        ),
        "input_proj": {"w": jnp.asarray(conv_w[:, :, 0, 0].T), "b": jnp.asarray(state["input_proj.bias"])},
        "transformer": torch_import.import_transformer(state, cfg),
        "mlp": {"layers": [torch_import._lin(state, f"mlp.layers.{i}") for i in range(3)]},
    }
    if "loc_proj.weight" in state:
        params["loc_proj"] = torch_import._lin(state, "loc_proj")
    return params


def make_image_batch(b, size, seed=0, pad_frac=0.3):
    torch.manual_seed(seed)
    img = torch.randn(b, 3, size, size)
    mask = torch.zeros(b, size, size, dtype=torch.bool)
    # simulate square padding: bottom strip padded on sample 0
    pad = int(size * pad_frac)
    mask[0, size - pad :, :] = True
    return img, mask


def test_caption_forward_parity():
    cfg = tiny_cfg()
    tm, params = make_oracle(cfg)
    b, t = 2, cfg.max_position_embeddings
    img, mask = make_image_batch(b, cfg.image_size)
    torch.manual_seed(20)
    caps = torch.randint(0, cfg.vocab_size, (b, t))
    cap_mask = torch.zeros(b, t, dtype=torch.bool)
    cap_mask[:, 9:] = True

    with torch.no_grad():
        ref = tm(img, mask, caps, cap_mask).numpy()

    got = caption.forward(
        params, cfg,
        Masked(jnp.asarray(img.numpy()), jnp.asarray(mask.numpy())),
        jnp.asarray(caps.numpy()), jnp.asarray(cap_mask.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)


def test_caption_loc_forward_parity():
    cfg = tiny_cfg(use_location_features=True)
    tm, params = make_oracle(cfg, seed=1, use_loc=True)
    b, t = 2, cfg.max_position_embeddings
    img, mask = make_image_batch(b, cfg.image_size, seed=1)
    torch.manual_seed(21)
    loc = torch.rand(b, cfg.num_location_features)
    caps = torch.randint(0, cfg.vocab_size, (b, t))
    cap_mask = torch.zeros(b, t, dtype=torch.bool)

    with torch.no_grad():
        ref = tm(img, mask, loc, caps, cap_mask).numpy()

    got = caption.forward(
        params, cfg,
        Masked(jnp.asarray(img.numpy()), jnp.asarray(mask.numpy())),
        jnp.asarray(caps.numpy()), jnp.asarray(cap_mask.numpy()),
        loc_feats=jnp.asarray(loc.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)


def test_caption_global_loc_forward_parity():
    cfg = tiny_cfg(use_location_features=True, use_global_features=True)
    tm, params = make_oracle(cfg, seed=2, use_loc=True, use_global=True)
    b, t = 2, cfg.max_position_embeddings
    img, mask = make_image_batch(b, cfg.image_size, seed=2)
    g_img, g_mask = make_image_batch(b, cfg.image_size, seed=3, pad_frac=0.2)
    torch.manual_seed(22)
    loc = torch.rand(b, cfg.num_location_features)
    caps = torch.randint(0, cfg.vocab_size, (b, t))
    cap_mask = torch.zeros(b, t, dtype=torch.bool)

    with torch.no_grad():
        ref = tm(img, mask, g_img, g_mask, loc, caps, cap_mask).numpy()

    got = caption.forward(
        params, cfg,
        Masked(jnp.asarray(img.numpy()), jnp.asarray(mask.numpy())),
        jnp.asarray(caps.numpy()), jnp.asarray(cap_mask.numpy()),
        global_samples=Masked(jnp.asarray(g_img.numpy()), jnp.asarray(g_mask.numpy())),
        loc_feats=jnp.asarray(loc.numpy()),
    )
    np.testing.assert_allclose(np.asarray(got), ref, atol=5e-4)


def test_unimplemented_variant():
    with pytest.raises(NotImplementedError):
        caption.init(jax.random.key(0), tiny_cfg(use_global_features=True))


def test_greedy_token_parity():
    """The north-star check: KV-cached jit greedy == reference full-recompute greedy,
    token for token, including the post-EOS buffer contents."""
    cfg = tiny_cfg()
    tm, params = make_oracle(cfg, seed=7)
    b = 3
    img, mask = make_image_batch(b, cfg.image_size, seed=7)
    bos, eos = 90, 91

    ref = torch_oracle.greedy_oracle(
        tm, (img, mask), cfg.max_position_embeddings, bos, eos
    ).numpy()

    got = decode.greedy(
        params, cfg,
        Masked(jnp.asarray(img.numpy()), jnp.asarray(mask.numpy())),
        max_len=cfg.max_position_embeddings, bos_token=bos, eos_token=eos,
    )
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_prune_token_ids_matches_reference_semantics():
    seqs = [[101, 5, 6, 102, 9, 9], [101, 7, 7, 7, 7, 7], [101, 102, 0, 0, 0, 0]]
    out = decode.prune_token_ids(seqs, clean=True, pad_token=0, bos_token=101, eos_token=102)
    assert out == [[5, 6], [7, 7, 7, 7, 7], []]
    out_raw = decode.prune_token_ids(seqs, clean=False, pad_token=0, bos_token=101, eos_token=102)
    assert out_raw == [[101, 5, 6, 102], [101, 7, 7, 7, 7, 7], [101, 102]]


def test_beam_search_beats_or_matches_greedy_score():
    cfg = tiny_cfg()
    _, params = make_oracle(cfg, seed=9)
    b = 2
    img, mask = make_image_batch(b, cfg.image_size, seed=9)
    samples = Masked(jnp.asarray(img.numpy()), jnp.asarray(mask.numpy()))
    bos, eos = 90, 91

    tokens, scores = decode.beam_search(
        params, cfg, samples, max_len=cfg.max_position_embeddings,
        bos_token=bos, eos_token=eos, beam_size=4, length_penalty=1.0,
    )
    assert tokens.shape == (b, 4, cfg.max_position_embeddings)
    # scores sorted best-first
    s = np.asarray(scores)
    assert (np.diff(s, axis=1) <= 1e-6).all()
    # beam-1 must equal greedy when beam_size=1
    g = decode.greedy(params, cfg, samples, max_len=cfg.max_position_embeddings,
                      bos_token=bos, eos_token=eos)
    t1, _ = decode.beam_search(params, cfg, samples, max_len=cfg.max_position_embeddings,
                               bos_token=bos, eos_token=eos, beam_size=1)
    g_np, t1_np = np.asarray(g), np.asarray(t1[:, 0])
    # compare up to each sequence's EOS (greedy's post-EOS junk differs by design:
    # beam freezes finished hypotheses, greedy keeps writing argmax tokens)
    for i in range(b):
        ge = np.where(g_np[i] == eos)[0]
        end = ge[0] + 1 if len(ge) else g_np.shape[1]
        np.testing.assert_array_equal(t1_np[i, :end], g_np[i, :end])
