"""Minimal end-to-end example: build a synthetic RefCOCO dataset, train a tiny model,
evaluate with CIDEr, decode with greedy and beam, and run the Predictor.

    python examples/train_tiny.py            # runs on CPU in ~2 minutes

Swap the synthetic fixture for real RefCOCO paths + the full Config() defaults
(ResNet101, 6+6 layers, bert-base-uncased vocab.txt) for the real thing.
"""

import os
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # remove to run on the TPU

import jax.numpy as jnp

from retr_tpu import Config, Predictor, build_model
from retr_tpu.data import dataset as ds
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.engine import eval_model, train_one_epoch
from retr_tpu.train import checkpoints as ckpt
from retr_tpu.train.state import TrainState, make_optimizer, make_train_step
from synth_refcoco import make_synth_refcoco

root = tempfile.mkdtemp()
coco_dir, ref_dir = make_synth_refcoco(root, n_images=4)
tokenizer, bos, eos = prepare_tokenizer()

cfg = Config(
    dir=coco_dir, ref_dir=ref_dir, verbose=False,
    backbone="ResNet18", dilation=True, hidden_dim=64, nheads=4,
    enc_layers=1, dec_layers=1, dim_feedforward=128,
    vocab_size=tokenizer.vocab_size, max_position_embeddings=16,
    dropout=0.1, image_size=64, batch_size=4, num_workers=2,
    project_data_path=os.path.join(root, "data"), lr=1e-3,
)

train_set = ds.build_dataset(cfg, "training", tokenizer=tokenizer)
loader = ds.DataLoader(train_set, cfg.batch_size, shuffle=True, drop_last=True, num_workers=2)
eval_set = ds.build_dataset(cfg, "training", tokenizer=tokenizer, return_unique=True)
eval_loader = ds.DataLoader(eval_set, cfg.batch_size, num_workers=2)

params, _ = build_model(cfg, jax.random.key(0))
tx = make_optimizer(cfg, steps_per_epoch=len(loader))
state = TrainState(params, tx.init(params), jnp.int32(0))
step = make_train_step(cfg, tx, donate=False)

for epoch in range(3):
    state, loss = train_one_epoch(state, step, loader, jax.random.key(1), epoch=epoch)
    print(f"epoch {epoch}: train loss {loss:.3f}")

metrics, hyps = eval_model(state.params, cfg, eval_loader, tokenizer)
print("metrics:", {k: round(v, 3) for k, v in metrics.items()})

path = ckpt.save_checkpoint(cfg.checkpoint_path, state, cfg, epoch=2, cider_score=metrics["CIDEr"])
print("checkpoint:", path)

pred = Predictor.from_checkpoint(path, max_batch=4)
img = np.asarray(
    __import__("PIL.Image", fromlist=["x"]).open(
        os.path.join(coco_dir, "train2014", os.listdir(os.path.join(coco_dir, "train2014"))[0])
    ).convert("RGB")
)
print("greedy :", repr(pred.predict(img, [5, 5, 60, 60])))
print("beam   :", repr(pred.predict(img, [5, 5, 60, 60], beam=True)))
