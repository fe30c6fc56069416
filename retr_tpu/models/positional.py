"""Positional encodings.

The reference uses a **1-D** sine table over the flattened feature sequence — not
DETR's 2-D spatial sine (models/position_encoding.py:7-35, applied at
ConcatTransformer.py:55) — plus a learned alternative (position_encoding.py:38-63).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

from retr_tpu.models import layers


def sine_table(d_model: int, max_len: int = 1024, dtype=jnp.float32) -> jax.Array:
    """[max_len, d_model] table; pe[p, 2i] = sin(p·w_i), pe[p, 2i+1] = cos(p·w_i)
    with w_i = exp(-2i·ln(10000)/d) (position_encoding.py:16-21).

    Built on the host in float64 then cast: angles reach ~10³ rad where fp32
    sin/cos argument-reduction error across math libraries is ~1e-4 — enough to
    threaten greedy-token parity. f64-then-cast is within 1-2 ulp of the torch
    reference's own f32 computation.
    """
    import numpy as np

    pos = np.arange(max_len, dtype=np.float64)[:, None]
    div = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-math.log(10000.0) / d_model))
    angles = pos * div[None, :]
    pe = np.zeros((max_len, d_model), np.float64)
    pe[:, 0::2] = np.sin(angles)
    pe[:, 1::2] = np.cos(angles)
    return jnp.asarray(pe, dtype=dtype)


def learned_init(key, d_model: int, max_len: int = 1024) -> dict:
    """Learned positional embedding + LayerNorm (position_encoding.py:38-63).
    nn.Embedding default init is N(0,1); the table lives outside ConcatTransformer's
    xavier reset in the reference only when built via build_position_encoding — but it
    is registered under the transformer, so xavier applies (ConcatTransformer.py:40-43)."""
    return {
        "table": layers.xavier_uniform(key, (max_len, d_model)),
        "norm": layers.layer_norm_init(d_model),
    }


def positional_encoding(
    kind: str,
    seq_len: int,
    d_model: int,
    params: Optional[dict] = None,
    *,
    dropout_rate: float = 0.0,
    key: Optional[jax.Array] = None,
    train: bool = False,
) -> jax.Array:
    """Return [S, d] positional encoding for a flattened source sequence."""
    if kind in ("v2", "sine"):
        return sine_table(d_model, max_len=max(seq_len, 1024))[:seq_len]
    elif kind in ("v3", "learned"):
        assert params is not None
        emb = layers.layer_norm(params["norm"], params["table"][:seq_len])
        return layers.dropout(emb, dropout_rate, key, train)
    raise ValueError(f"not supported {kind}")
