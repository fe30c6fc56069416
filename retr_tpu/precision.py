"""Matmul/conv precision discipline.

TPU MXU matmuls on float32 inputs default to bfloat16 multiplication passes; that is
the right choice for throughput but breaks greedy-token parity with the fp32 PyTorch
reference (BASELINE.md: exact greedy token parity). Rule used throughout retr_tpu:

- ``compute_dtype == float32``  → request HIGHEST precision (true f32 accumulation)
  — the parity configuration.
- ``compute_dtype == bfloat16`` → DEFAULT precision — the throughput configuration.

Model entry points wrap their bodies in :func:`matmul_precision` so the choice is
explicit in the compiled graph instead of depending on ambient config.
"""

from __future__ import annotations

import contextlib

import jax
import jax.numpy as jnp


def precision_for(compute_dtype) -> jax.lax.Precision:
    if jnp.dtype(compute_dtype) == jnp.float32:
        return jax.lax.Precision.HIGHEST
    return jax.lax.Precision.DEFAULT


@contextlib.contextmanager
def matmul_precision(compute_dtype):
    name = "highest" if jnp.dtype(compute_dtype) == jnp.float32 else "default"
    with jax.default_matmul_precision(name):
        yield
