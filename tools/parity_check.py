"""Cross-platform greedy-token parity check: CPU (exact f32) vs TPU (f32 HIGHEST).

The CPU greedy path is bit-validated against the PyTorch reference semantics by the
test suite (tests/test_caption.py::test_greedy_token_parity); this tool checks how
closely the TPU execution of the SAME program tracks it.

Interpretation guide: bit-exact agreement across DIFFERENT hardware cannot be
guaranteed — CPU and TPU sum in different orders, so two logits within ~1 ulp can
argmax-flip. Measured on random-init weights (worst case: logit margins are tiny),
the flip rate is ~0.2% of tokens (1 in 508 on the default run); trained models have
far larger margins. The parity guarantees that ARE exact: same-device XLA vs Pallas
paths (verified), and CPU vs the torch-semantics oracle (test suite). A handful of
flipped rows here is expected; systematic divergence is a bug.

Usage: python tools/parity_check.py [--batch 8] [--seed 0] [--checkpoint PATH]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(platform: str, batch: int, seed: int, checkpoint: str):
    """Run greedy in a fresh subprocess pinned to `platform`; return the token buffer."""
    import json
    import subprocess
    import tempfile

    code = f"""
import os
import numpy as np, jax
jax.config.update("jax_platforms", "{platform}")
import jax.numpy as jnp
from retr_tpu.config import Config
from retr_tpu.masking import Masked
from retr_tpu.models import caption
from retr_tpu import decode

cfg = Config(backbone="ResNet50", dilation=True, dropout=0.1)
ckpt = {checkpoint!r}
if ckpt:
    from retr_tpu.train.checkpoints import import_reference_checkpoint
    params, _ = import_reference_checkpoint(ckpt, cfg)
else:
    params, _ = caption.build_model(cfg, jax.random.key({seed}))
rng = np.random.default_rng({seed})
img = jnp.asarray(rng.normal(size=({batch}, 3, 224, 224)), jnp.float32)
samples = Masked(img, jnp.zeros(({batch}, 224, 224), bool))
ids = decode.greedy(params, cfg, samples, max_len=128, bos_token=101, eos_token=102)
np.save(os.environ["PARITY_OUT"], np.asarray(ids))
"""
    with tempfile.TemporaryDirectory() as d:
        out = os.path.join(d, "ids.npy")
        env = dict(os.environ, PARITY_OUT=out)
        subprocess.run(
            [sys.executable, "-c", code], check=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        return np.load(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--checkpoint", default="", help="optional reference .pth")
    args = ap.parse_args()

    cpu = run("cpu", args.batch, args.seed, args.checkpoint)
    tpu = run("axon,cpu", args.batch, args.seed, args.checkpoint)
    match = (cpu == tpu).all()
    n_rows = int((cpu != tpu).any(axis=1).sum())
    n_tok = int((cpu != tpu).sum())
    total = cpu.size
    print(
        f"token parity CPU vs TPU: "
        f"{'EXACT' if match else f'{n_tok}/{total} tokens differ ({n_rows}/{len(cpu)} rows)'}"
    )
    if not match:
        idx = np.argwhere(cpu != tpu)[:10]
        for i, j in idx:
            print(f"  row {i} pos {j}: cpu={cpu[i, j]} tpu={tpu[i, j]}")
        # cross-hardware argmax ties flip at ~0.2% on random weights (see module
        # docstring); treat low single-token counts as expected float behavior.
        sys.exit(0 if n_tok <= max(2, total // 200) else 1)


if __name__ == "__main__":
    main()
