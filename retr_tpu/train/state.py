"""Train state and the jit/pjit training step.

Optimization recipe = the reference's (main.py:30-40, engine.py:52-87):

- AdamW, two learning rates: backbone params at ``lr_backbone`` (1e-5), everything
  else at ``lr`` (1e-4); weight decay 1e-4 on both groups (torch AdamW semantics —
  decoupled, lr-scaled; optax.adamw matches).
- frozen subsets exactly as the reference freezes them: the whole backbone below
  layer2 (conv1 + layer1; backbone.py:58-60) and every FrozenBatchNorm scale/bias
  (buffers in torch, hence never trained).
- StepLR: lr x0.1 every ``lr_drop`` epochs (main.py:40).
- global-norm gradient clip at ``clip_max_norm`` = 0.1 (engine.py:81-82).
- the PAD row of the word-embedding table gets zero gradient
  (torch nn.Embedding(padding_idx=...) semantics, transformer_modules.py:103).
- loss = softmax cross-entropy over shifted tokens, **mean over ALL positions
  including PAD** (caption.py:210 has no ignore_index; engine.py:70-71).

The training step is one jit-compiled function; under a ``(dp, mp)`` mesh the batch
is dp-sharded and gradients are reduced by XLA collectives — no hand-written NCCL
(reference has none either; SURVEY.md §2.2).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from retr_tpu import config as config_mod
from retr_tpu import device
from retr_tpu.config import Config
from retr_tpu.masking import Masked
from retr_tpu.models import caption

Params = Dict[str, Any]


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jax.Array


# ---------------------------------------------------------------------------------
# Parameter partition (frozen / backbone / rest)
# ---------------------------------------------------------------------------------


def _label_path(path) -> str:
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    if keys and keys[0] == "backbone":
        # conv1/bn1/layer1 frozen (backbone.py:58-60); all folded BN affines are
        # torch buffers, never trainable.
        if keys[1] in ("conv1", "bn1", "layer1"):
            return "frozen"
        if "bn1" in keys or "bn2" in keys or "bn3" in keys or "bn" in keys:
            return "frozen"
        return "backbone"
    return "rest"


def param_labels(params: Params) -> Params:
    return jax.tree_util.tree_map_with_path(lambda path, _: _label_path(path), params)


def _zero_pad_row_grad(pad_token_id: int) -> optax.GradientTransformation:
    """Zero the gradient of the word-embedding PAD row (padding_idx semantics)."""

    def update(updates, state, params=None):
        def fix(u):
            return u.at[pad_token_id].set(0.0)

        emb = updates["transformer"]["embeddings"]["word"]
        emb = dict(emb, table=fix(emb["table"]))
        updates = dict(updates)
        updates["transformer"] = dict(updates["transformer"])
        updates["transformer"]["embeddings"] = dict(
            updates["transformer"]["embeddings"], word=emb
        )
        return updates, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def _zero_frozen_grads() -> optax.GradientTransformation:
    """Zero frozen-label grads BEFORE the global-norm clip.

    In torch the frozen set never reaches ``clip_grad_norm_`` (engine.py:81-82):
    conv1/bn1/layer1 have requires_grad=False (grad None) and every
    FrozenBatchNorm scale/bias is a BUFFER, so neither contributes to the norm.
    Our tree keeps them as leaves with real autodiff grads (the stem prefix is
    stop_gradient-pruned, but layer2-4 folded-BN affines sit above the stop and
    get nonzero grads), so without this the clip factor — and thus every
    post-step-1 AdamW update (step 1 is scale-invariant from zero moments) —
    would drift from the reference."""

    def update(updates, state, params=None):
        labels = param_labels(updates)
        zeroed = jax.tree.map(
            lambda u, l: jnp.zeros_like(u) if l == "frozen" else u, updates, labels
        )
        return zeroed, state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def step_lr(base_lr: float, lr_drop_epochs: int, steps_per_epoch: int, gamma: float = 0.1):
    """torch StepLR(step_size=lr_drop, gamma=0.1) as a per-step schedule."""

    def schedule(count):
        epoch = count // max(steps_per_epoch, 1)
        return base_lr * gamma ** (epoch // lr_drop_epochs)

    return schedule


def build_schedule(cfg: Config, base_lr: float, steps_per_epoch: int):
    """Per-step LR schedule from the config knobs.

    ``lr_schedule="step"`` is the reference's StepLR (the parity default);
    ``"cosine"`` decays to 0 over ``epochs * steps_per_epoch``. ``warmup_steps > 0``
    prepends a linear ramp 0 -> ``base_lr`` to either (the reference has no warmup —
    main.py:40 — so 0 is the default)."""
    if cfg.lr_schedule == "cosine":
        total = max(cfg.epochs * max(steps_per_epoch, 1), cfg.warmup_steps + 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base_lr,
            warmup_steps=cfg.warmup_steps, decay_steps=total,
        )
    sched = step_lr(base_lr, cfg.lr_drop, steps_per_epoch)
    if cfg.warmup_steps > 0:
        warmup = cfg.warmup_steps

        def warmed(count):
            ramp = base_lr * (count + 1) / warmup
            return jnp.where(count < warmup, ramp, sched(count))

        return warmed
    return sched


def _program_key(cfg: Config) -> tuple:
    """Hashable projection of cfg onto the fields that can enter a traced
    train/eval program.

    XLA executables are NOT deduped across fresh ``jax.jit`` wrappers in this
    jax build (measured: a second ``make_train_step`` with an identical config
    recompiles the full ~23 s program on the CPU test host), and the persistent
    compilation cache deadlocks here (docs/ROADMAP.md gotchas) — so the factories
    below memoize on this key instead. The skip set is derived from config.py's
    single field-classification table (HOST_ONLY_FIELDS + DECODE_ONLY_FIELDS):
    paths, loop control, host-side knobs, and decode-search hyperparameters
    never enter the train/eval trace, so e.g. ``main(resume=...)`` with a
    different ``checkpoint_path`` reuses the already-compiled step. ``epochs``
    enters the program only through the cosine schedule's decay length, so it
    is skipped for the step schedule but kept for cosine."""
    skip = set(config_mod.HOST_ONLY_FIELDS) | set(config_mod.DECODE_ONLY_FIELDS)
    if cfg.lr_schedule == "step":
        skip.add("epochs")
    import dataclasses

    return tuple(
        (f.name, getattr(cfg, f.name)) for f in dataclasses.fields(cfg)
        if f.name not in skip
    )


_OPT_CACHE: Dict[tuple, optax.GradientTransformation] = {}
_STEP_CACHE: Dict[tuple, Tuple[optax.GradientTransformation, Callable]] = {}
_EVAL_CACHE: Dict[tuple, Callable] = {}


def make_optimizer(
    cfg: Config, steps_per_epoch: int, *, memo: bool = True
) -> optax.GradientTransformation:
    """``memo=False`` opts out of the process-level cache — required when module
    globals the update rule closes over are monkeypatched (tools/exp_r4.py A/Bs)."""
    if memo:
        key = (_program_key(cfg), steps_per_epoch)
        if key in _OPT_CACHE:
            return _OPT_CACHE[key]

    main_sched = build_schedule(cfg, cfg.lr, steps_per_epoch)
    backbone_sched = build_schedule(cfg, cfg.lr_backbone, steps_per_epoch)

    def adamw(sched):
        return optax.adamw(
            learning_rate=sched, b1=0.9, b2=0.999, eps=1e-8, weight_decay=cfg.weight_decay
        )

    tx = optax.multi_transform(
        {"rest": adamw(main_sched), "backbone": adamw(backbone_sched), "frozen": optax.set_to_zero()},
        param_labels,
    )
    chain = [_zero_pad_row_grad(cfg.pad_token_id), _zero_frozen_grads()]
    if cfg.clip_max_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_max_norm))
    chain.append(tx)
    out = optax.chain(*chain)
    if memo:
        _OPT_CACHE[key] = out
    return out


def create_train_state(cfg: Config, key=None, steps_per_epoch: int = 1000, params=None) -> Tuple[TrainState, optax.GradientTransformation]:
    if params is None:
        # build_model already commits fresh inits to the default local device.
        params, _ = caption.build_model(cfg, key)
    else:
        # Caller-supplied params (e.g. .pth import) may be uncommitted; normalize
        # placement so post-restore programs hit the jit cache (retr_tpu/device.py).
        # "Any multi-device leaf" is the sharding signal (device.is_sharded_tree):
        # such trees are deliberately mesh-placed and are left untouched —
        # collapsing them to one device would silently undo the caller's sharding.
        if not device.is_sharded_tree(params):
            params = device.commit_to_local_device(params)
    tx = make_optimizer(cfg, steps_per_epoch)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.int32(0)), tx


# ---------------------------------------------------------------------------------
# Batch container + the step
# ---------------------------------------------------------------------------------


class Batch(NamedTuple):
    """One training batch. caps are the 129-wide padded token buffers; the step
    slices input caps[:, :-1] vs target caps[:, 1:] (engine.py:70-71)."""

    images: jax.Array        # [B, 3, H, W] f32 normalized
    image_masks: jax.Array   # [B, H, W] bool
    caps: jax.Array          # [B, T+1] int32
    cap_masks: jax.Array     # [B, T+1] bool (True = pad)
    global_images: Optional[jax.Array] = None
    global_masks: Optional[jax.Array] = None
    loc_feats: Optional[jax.Array] = None


# Cross-entropy implementation: "fused" computes mean(logsumexp - target_logit)
# with the target logit extracted by an iota==target masked reduction — no
# [B, T, V] log-softmax materialization and no gather (gathers lower to
# scatter-adds in the backward pass on TPU; see docs/PERF.md round-4).
# "logsoftmax" is the reference-shaped form, kept for A/B (tools/exp_r4.py).
# Both are the same function mathematically: -log_softmax[tgt] == lse - logit[tgt].
CE_IMPL = "fused"


def _cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    logits32 = logits.astype(jnp.float32)
    if CE_IMPL == "logsoftmax":
        logp = jax.nn.log_softmax(logits32, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0])
    lse = jax.nn.logsumexp(logits32, axis=-1)
    vocab = jax.lax.broadcasted_iota(jnp.int32, logits32.shape, logits32.ndim - 1)
    tgt_logit = jnp.sum(jnp.where(vocab == targets[..., None], logits32, 0.0), axis=-1)
    return jnp.mean(lse - tgt_logit)


def loss_fn(params: Params, cfg: Config, batch: Batch, key, *, train: bool, compute_dtype=jnp.float32):
    logits = caption.forward(
        params, cfg,
        Masked(batch.images, batch.image_masks),
        batch.caps[:, :-1], batch.cap_masks[:, :-1],
        global_samples=(
            Masked(batch.global_images, batch.global_masks)
            if batch.global_images is not None
            else None
        ),
        loc_feats=batch.loc_feats,
        key=key, train=train, compute_dtype=compute_dtype,
    )
    return _cross_entropy(logits, batch.caps[:, 1:])


def make_train_step(
    cfg: Config,
    tx: optax.GradientTransformation,
    *,
    compute_dtype=None,
    donate: bool = True,
    accum_steps: Optional[int] = None,
    memo: bool = True,
) -> Callable:
    """Build the jit-compiled training step: grads -> clip -> AdamW -> apply.

    ``compute_dtype`` defaults to ``cfg.compute_dtype`` (f32 = parity mode,
    bf16 = throughput mode; weights/optimizer state stay f32 either way).

    ``accum_steps`` (default ``cfg.grad_accum_steps``) > 1 splits the batch into
    that many micro-batches and accumulates gradients over a ``lax.scan`` before
    the single optimizer update — the activation footprint shrinks by the factor
    while the update matches the full-batch step (the loss is a mean over rows,
    so the mean of equal-size micro-gradients IS the full-batch gradient;
    clipping/AdamW see identical inputs up to float addition order). Use it to
    train batch sizes whose activations don't fit HBM. The batch dim must be
    divisible by ``accum_steps``."""
    if compute_dtype is None:
        compute_dtype = jnp.dtype(cfg.compute_dtype)
    if accum_steps is None:
        accum_steps = cfg.grad_accum_steps

    # Memoize the jitted step so repeated construction (epoch loops, resume
    # runs, test suites) reuses the XLA executable — see _program_key. Keying on
    # id(tx) is safe because the cache holds a strong reference to the cached
    # tx: while it lives, no distinct live tx can share its id (verified on hit).
    key = (_program_key(cfg), id(tx), str(compute_dtype), donate, accum_steps, CE_IMPL)
    if memo:
        hit = _STEP_CACHE.get(key)
        if hit is not None and hit[0] is tx:
            return hit[1]

    def update_from(state: TrainState, grads, loss) -> Tuple[TrainState, jax.Array]:
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    if accum_steps == 1:
        def step(state: TrainState, batch: Batch, key) -> Tuple[TrainState, jax.Array]:
            step_key = jax.random.fold_in(key, state.step)
            loss, grads = jax.value_and_grad(loss_fn)(
                state.params, cfg, batch, step_key, train=True, compute_dtype=compute_dtype
            )
            return update_from(state, grads, loss)
    else:
        def step(state: TrainState, batch: Batch, key) -> Tuple[TrainState, jax.Array]:
            b = batch.images.shape[0]
            if b % accum_steps:
                raise ValueError(f"batch {b} not divisible by accum_steps {accum_steps}")
            step_key = jax.random.fold_in(key, state.step)

            def split(x):
                return x.reshape(accum_steps, b // accum_steps, *x.shape[1:])

            micro = jax.tree.map(split, batch)

            def body(carry, xs):
                g_acc, l_acc = carry
                mbatch, i = xs
                loss, grads = jax.value_and_grad(loss_fn)(
                    state.params, cfg, mbatch, jax.random.fold_in(step_key, i),
                    train=True, compute_dtype=compute_dtype,
                )
                return (jax.tree.map(jnp.add, g_acc, grads), l_acc + loss), None

            zeros = jax.tree.map(jnp.zeros_like, state.params)
            (g_sum, l_sum), _ = jax.lax.scan(
                body, (zeros, jnp.float32(0.0)), (micro, jnp.arange(accum_steps))
            )
            inv = 1.0 / accum_steps
            return update_from(
                state, jax.tree.map(lambda g: g * inv, g_sum), l_sum * inv
            )

    jitted = jax.jit(step, donate_argnums=(0,) if donate else ())
    if memo:
        _STEP_CACHE[key] = (tx, jitted)
    return jitted


def make_eval_step(cfg: Config, *, compute_dtype=None, memo: bool = True) -> Callable:
    """Validation loss (no grad, no dropout) — engine.evaluate (engine.py:89-114)."""
    if compute_dtype is None:
        compute_dtype = jnp.dtype(cfg.compute_dtype)
    key = (_program_key(cfg), str(compute_dtype), CE_IMPL)
    if memo and key in _EVAL_CACHE:
        return _EVAL_CACHE[key]

    def step(params: Params, batch: Batch) -> jax.Array:
        return loss_fn(params, cfg, batch, None, train=False, compute_dtype=compute_dtype)

    jitted = jax.jit(step)
    if memo:
        _EVAL_CACHE[key] = jitted
    return jitted
