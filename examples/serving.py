"""Serving quickstart: Predictor -> ServingQueue -> HTTP, on a tiny trained model.

Demonstrates the full serving surface (the reference has none — its only
single-request path is the notebook helper eval_utils/decode.py:30-50):

1. train a tiny model on a synthetic fixture for a few steps (same recipe as
   examples/train_tiny.py);
2. Predictor: predict / predict(decoder="beam"|"sample") / complete / score /
   predict_with_attention;
3. ServingQueue: concurrent submits, dynamic batching;
4. HTTP: POST /predict against an in-process server.

Run:  python examples/serving.py     (CPU, ~2-3 min)
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # remove to run on the TPU

from synth_refcoco import make_synth_refcoco  # tests/ fixture generator

from retr_tpu import Config, Predictor, ServingQueue, build_model
from retr_tpu.data import dataset as ds
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.engine import train_one_epoch
from retr_tpu.train.state import TrainState, make_optimizer, make_train_step


def main():
    root = "/tmp/retr_serving_example"
    os.makedirs(root, exist_ok=True)
    coco_dir, ref_dir = make_synth_refcoco(root, n_images=4)
    tok, _, _ = prepare_tokenizer()
    cfg = Config(
        dir=coco_dir, ref_dir=ref_dir, verbose=False, backbone="ResNet18",
        dilation=False, hidden_dim=64, nheads=4, enc_layers=1, dec_layers=1,
        dim_feedforward=128, vocab_size=tok.vocab_size, max_position_embeddings=16,
        dropout=0.1, image_size=64, batch_size=2, num_workers=2,
    )

    print("== training a tiny model (2 epochs) ==")
    train_set = ds.build_dataset(cfg, "training", tokenizer=tok)
    loader = ds.DataLoader(train_set, cfg.batch_size, shuffle=True, drop_last=True)
    params, _ = build_model(cfg, jax.random.key(0))
    tx = make_optimizer(cfg, steps_per_epoch=len(loader))
    state = TrainState(params, tx.init(params), jax.numpy.int32(0))
    step = make_train_step(cfg, tx, donate=False)
    for epoch in range(2):
        state, loss = train_one_epoch(state, step, loader, jax.random.key(1), epoch=epoch)
        print(f"  epoch {epoch}: loss {loss:.3f}")

    pred = Predictor(state.params, cfg, tok, max_batch=2)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (120, 150, 3), dtype=np.uint8)
    bbox = [20, 20, 80, 60]

    print("== Predictor surface ==")
    print("  greedy:   ", repr(pred.predict(img, bbox)))
    print("  beam:     ", repr(pred.predict(img, bbox, decoder='beam')))
    print("  sample:   ", repr(pred.predict(img, bbox, decoder='sample', seed=3)))
    print("  complete: ", repr(pred.complete(img, bbox, 'the')))
    print("  score:    ", pred.score([img], [bbox], ["the red thing"])[0])
    _, atts = pred.predict_with_attention(img, bbox)
    print("  attention stacks:", {k: v.shape for k, v in atts.items()})

    print("== ServingQueue: 5 concurrent requests, dynamically batched ==")
    q = ServingQueue(pred, max_wait_s=0.05)
    futs = [q.submit(img, bbox) for _ in range(5)]
    print("  ", [f.result(timeout=300) == futs[0].result(timeout=300) for f in futs])

    print("== HTTP front end ==")
    import base64
    import io
    import json
    import urllib.request

    from PIL import Image

    from retr_tpu.serve import run_in_thread

    server, base = run_in_thread(q)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    payload = json.dumps({"image": base64.b64encode(buf.getvalue()).decode(),
                          "bbox": bbox}).encode()
    req = urllib.request.Request(base + "/predict", data=payload,
                                 headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        print("  POST /predict ->", r.read().decode())
    server.shutdown()
    q.close()
    print("done.")


if __name__ == "__main__":
    main()
