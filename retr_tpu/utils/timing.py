"""Tunnel-safe device timing: serial on-device chains with one scalar fetch.

Through the tunneled TPU transport, `block_until_ready` returns at dispatch-ack
(NOT completion), every host fetch costs a ~25 ms round trip, and dispatching a
program whose arguments include large arrays blocks the host ~20 ms per call —
all three drown per-dispatch timing (docs/ROADMAP.md gotchas; measured
2026-08-18). The only trustworthy protocol is:

  1. run the function-under-test `iters` times SERIALLY inside one jitted
     `fori_loop` whose carry threads a data dependency from each output into
     the next input (so XLA's while-loop invariant code motion cannot hoist the
     body), with every large input captured in the closure;
  2. fetch ONE scalar at the end (the only real barrier);
  3. report (T(2k) - T(k)) / k — the round trip and all fixed dispatch cost
     cancel in the difference.

The data dependency is a one-element in-place `.at[].add` of the previous
output's first element scaled by 1e-30: a hard underflow in bfloat16 and far
below f32 eps at O(1) magnitudes, so the measured math is unchanged, while the
add is a cheap aliased dynamic-update-slice on the loop carry (no input copy).

Used by tools/roofline.py, tools/exp_encode.py and future perf probes; kept in
the package because correct measurement on this transport is part of the
framework's TPU story (the reference times with `torch.cuda`-free wall clocks
on local devices, reference engine.py:52-87 — locally that is fine; through a
tunnel it is not).
"""
from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np


def chain_apply(fn: Callable[[Any], Any], *, thread: bool = False) -> Callable:
    """Return jitted `run(x, iters)`: apply `fn` to `x` `iters` times serially
    on-device and return a scalar. `iters` is a traced trip count, so one
    compile serves every chain depth.

    ``thread=False`` (default): `fn`'s output may have any structure; each
    iteration re-applies `fn` to the original input, with a 1e-30-scaled tap of
    the previous output folded into one element so XLA cannot hoist the body.
    Right for stateless programs (encode, decode) whose output shape differs
    from the input.

    ``thread=True``: `fn` must map a pytree to one of the SAME structure (e.g.
    a train step, state -> state); each iteration's OUTPUT becomes the next
    input. This measures the production semantics of a state-threading loop:
    the dependency is real (no perturbation needed) and the fori_loop carry
    aliases buffers in place — the same buffer reuse a donating top-level step
    gets — instead of keeping the input state alive across the call."""
    import jax
    import jax.numpy as jnp

    def _perturb(tree, s):
        # bump one element of the first floating-point leaf
        leaves, treedef = jax.tree.flatten(tree)
        i = next(j for j, leaf in enumerate(leaves)
                 if jnp.issubdtype(leaf.dtype, jnp.inexact))
        leaves[i] = leaves[i].at[(0,) * leaves[i].ndim].add(
            (s * 1e-30).astype(leaves[i].dtype))
        return jax.tree.unflatten(treedef, leaves)

    def _tap(y):
        # tap one element of EVERY leaf: a single-leaf tap lets XLA
        # dead-code-eliminate whole subcomputations (e.g. tapping a frozen
        # param of a train step's output state DCE'd the entire step)
        return sum(jnp.float32(leaf.ravel()[0]) for leaf in jax.tree.leaves(y))

    @jax.jit
    def run(x0, iters):
        def body(_, carry):
            xc, s = carry
            if thread:
                y = fn(xc)
                return y, _tap(y)
            xc = _perturb(xc, s)
            return xc, _tap(fn(xc))

        return jax.lax.fori_loop(0, iters, body, (x0, jnp.float32(0.0)))[1]

    return run


def time_chained(fn: Callable[[Any], Any], x, *, k: int = 32,
                 rounds: int = 3, thread: bool = False) -> float:
    """Median per-application seconds of `fn(x)` over `rounds` differential
    fori-chain measurements: ((T(2k) - T(k)) / k per round."""
    import jax.numpy as jnp

    run = chain_apply(fn, thread=thread)
    k1, k2 = jnp.int32(k), jnp.int32(2 * k)
    float(run(x, k1))  # compile + warmup
    float(run(x, k2))
    deltas = []
    for _ in range(rounds):
        t0 = time.perf_counter()
        float(run(x, k1))
        t1 = time.perf_counter()
        float(run(x, k2))
        t2 = time.perf_counter()
        deltas.append(((t2 - t1) - (t1 - t0)) / k)
    return float(np.median(deltas))
