"""Training-step parity vs torch: gradients + AdamW(two groups, wd) + clip.

Runs the SAME batch through the torch oracle (CE loss over shifted tokens, AdamW with
backbone/rest LR groups, global-norm clip — the reference recipe main.py:30-40,
engine.py:70-82) and through retr_tpu's optax pipeline with imported weights, then
compares the updated parameters. This validates end-to-end gradient correctness and
optimizer-semantics parity, not just forward parity.
"""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from retr_tpu.config import Config
from retr_tpu.train import state as tstate
from tests import torch_oracle
from tests.test_caption import import_oracle


def tiny_cfg():
    return Config(
        backbone="ResNet18", dilation=False, hidden_dim=64, nheads=4, enc_layers=1,
        dec_layers=1, dim_feedforward=128, vocab_size=96, max_position_embeddings=10,
        dropout=0.0, image_size=32, clip_max_norm=0.1, lr=1e-3, lr_backbone=1e-4,
        weight_decay=1e-4,
    )


def test_adamw_two_group_step_parity():
    cfg = tiny_cfg()
    torch.manual_seed(0)
    tm = torch_oracle.CaptionModel(
        backbone_name=cfg.backbone, dilation=cfg.dilation, vocab=cfg.vocab_size,
        d=cfg.hidden_dim, h=cfg.nheads, nenc=cfg.enc_layers, ndec=cfg.dec_layers,
        dff=cfg.dim_feedforward, max_pos=cfg.max_position_embeddings,
    ).train()

    # reference param groups (main.py:30-39); reference freezing: conv1/bn1/layer1
    # requires_grad False (backbone.py:58-60)
    for name, p in tm.backbone.named_parameters():
        if name.startswith(("body.conv1", "body.bn1", "body.layer1")):
            p.requires_grad_(False)
    groups = [
        {"params": [p for n, p in tm.named_parameters()
                    if "backbone" not in n and p.requires_grad]},
        {"params": [p for n, p in tm.named_parameters()
                    if "backbone" in n and p.requires_grad], "lr": cfg.lr_backbone},
    ]
    opt = torch.optim.AdamW(groups, lr=cfg.lr, weight_decay=cfg.weight_decay)

    # .copy(): torch .numpy() views share storage with the live module; without it
    # the torch opt.step() below would mutate the imported params in place.
    params = import_oracle(
        {k: v.detach().numpy().copy() for k, v in tm.state_dict().items()}, cfg
    )

    # fixed batch
    torch.manual_seed(1)
    b, t = 2, cfg.max_position_embeddings + 1
    img = torch.randn(b, 3, cfg.image_size, cfg.image_size)
    mask = torch.zeros(b, cfg.image_size, cfg.image_size, dtype=torch.bool)
    caps = torch.randint(3, cfg.vocab_size, (b, t))
    caps[:, 0] = 1
    cap_mask = torch.zeros(b, t, dtype=torch.bool)

    # --- torch step (engine.py:70-82 semantics)
    out = tm(img, mask, caps[:, :-1], cap_mask[:, :-1])
    loss_t = torch.nn.CrossEntropyLoss()(out.permute(0, 2, 1), caps[:, 1:])
    opt.zero_grad()
    loss_t.backward()
    torch.nn.utils.clip_grad_norm_(tm.parameters(), cfg.clip_max_norm)
    opt.step()

    # --- retr_tpu step
    tx = tstate.make_optimizer(cfg, steps_per_epoch=1000)
    state = tstate.TrainState(params, tx.init(params), jnp.int32(0))
    step = tstate.make_train_step(cfg, tx, donate=False)
    batch = tstate.Batch(
        images=jnp.asarray(img.numpy()),
        image_masks=jnp.asarray(mask.numpy()),
        caps=jnp.asarray(caps.numpy().astype(np.int32)),
        cap_masks=jnp.asarray(cap_mask.numpy()),
    )
    state2, loss_j = step(state, batch, jax.random.key(0))

    # losses agree
    assert abs(float(loss_j) - float(loss_t.detach())) < 2e-5, (float(loss_j), float(loss_t))

    after = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    got = state2.params

    # head weight (rest group, lr)
    np.testing.assert_allclose(
        np.asarray(got["mlp"]["layers"][0]["w"]), after["mlp.layers.0.weight"].T,
        atol=5e-5,
    )
    # transformer FF weight (rest group)
    np.testing.assert_allclose(
        np.asarray(got["transformer"]["encoder"]["layers"][0]["ff"]["lin1"]["w"]),
        after["transformer.encoder.layers.0.self_attn.norm.weight"].T
        if False else after["transformer.encoder.layers.0.ff.sublayer.0.weight"].T,
        atol=5e-5,
    )
    # backbone layer2 conv (backbone group, lr_backbone)
    np.testing.assert_allclose(
        np.asarray(got["backbone"]["layer2"][0]["conv1"]["w"]),
        after["backbone.body.layer2.0.conv1.weight"],
        atol=5e-5,
    )
    # frozen parts unchanged and identical on both sides
    np.testing.assert_allclose(
        np.asarray(got["backbone"]["conv1"]["w"]),
        after["backbone.body.conv1.weight"],
        atol=1e-7,
    )
    np.testing.assert_array_equal(
        np.asarray(got["backbone"]["conv1"]["w"]),
        np.asarray(params["backbone"]["conv1"]["w"]),
    )

    # --- SECOND step: scale-sensitive parity. AdamW's first update from zero
    # moments is sign(g) — invariant to any uniform clip factor — so only a
    # second step can detect a global-norm-clip mismatch (e.g. frozen grads
    # leaking into the norm; torch excludes them: grad None / BN buffers).
    out2 = tm(img, mask, caps[:, :-1], cap_mask[:, :-1])
    loss_t2 = torch.nn.CrossEntropyLoss()(out2.permute(0, 2, 1), caps[:, 1:])
    opt.zero_grad()
    loss_t2.backward()
    torch.nn.utils.clip_grad_norm_(tm.parameters(), cfg.clip_max_norm)
    opt.step()

    state3, loss_j2 = step(state2, batch, jax.random.key(0))
    assert abs(float(loss_j2) - float(loss_t2.detach())) < 2e-5, (
        float(loss_j2), float(loss_t2))

    after2 = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    got2 = state3.params
    np.testing.assert_allclose(
        np.asarray(got2["mlp"]["layers"][0]["w"]), after2["mlp.layers.0.weight"].T,
        atol=5e-5,
    )
    np.testing.assert_allclose(
        np.asarray(got2["backbone"]["layer2"][0]["conv1"]["w"]),
        after2["backbone.body.layer2.0.conv1.weight"],
        atol=5e-5,
    )
