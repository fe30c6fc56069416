"""Train/eval engine: epoch loops and the NLG-metric evaluation harness.

Reference: engine.py. Key behaviors preserved:

- ``train_one_epoch``: teacher forcing with caps[:, :-1] / caps[:, 1:]
  (engine.py:70-71), NaN-loss hard stop (engine.py:75-77 — raised here instead of
  sys.exit so callers can handle it), epoch-mean loss.
- ``evaluate``: same forward without grad/dropout (engine.py:89-114).
- ``eval_model`` (engine.py:125-186): per-ann_id reference dict built from
  ``dataset.annot``, greedy decoding per batch, tokenizer round-trip normalization of
  references (engine.py:117-122), and the reference's ``zip(*references)``
  TRANSPOSITION — which truncates every sample to the global minimum reference count
  before scoring (engine.py:181). That truncation is parity-relevant for CIDEr
  reproduction and is kept deliberately.

The compute is all jit: the engine is a thin host loop moving uint8 batches onto the
device and streaming results back.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retr_tpu import decode as decode_mod
from retr_tpu.config import Config
from retr_tpu.data.dataset import DataLoader
from retr_tpu.data.pipeline import device_batch
from retr_tpu.masking import Masked
from retr_tpu.metrics import NLGEval
from retr_tpu.train.state import TrainState, make_eval_step
from retr_tpu.utils.logging import MetricLogger


class NonFiniteLossError(RuntimeError):
    """Raised when a training batch produces a non-finite loss (engine.py:75-77).

    INVARIANT: with ``pipeline_depth > 1`` the loss check is deferred, so by the
    time this raises the optimizer has already applied updates derived from the
    non-finite gradients for up to ``depth-1`` further steps. Any ``TrainState``
    held by the caller after this raise is therefore poisoned and MUST be
    abandoned — never checkpoint it. Restart from the last saved checkpoint
    instead. ``last_good_step`` is the last global step whose loss was verified
    finite (checkpoints at or before it are safe).
    """

    def __init__(self, message: str, *, last_good_step: Optional[int] = None):
        super().__init__(message)
        self.last_good_step = last_good_step


def pack_encoder_inputs(encoder_input, global_features: bool, location_features: bool):
    """Reference-compatible batch packing (engine.py:20-48): a flat tuple of arrays
    becomes the model's (samples, global_samples, loc_feats) triple of Masked pairs.

    The main pipeline uses data.pipeline.device_batch instead (one fused jit); this
    exists for users porting reference code that calls pack_encoder_inputs directly.
    """
    import jax.numpy as jnp

    def masked(img, mask):
        return Masked(jnp.asarray(img), jnp.asarray(mask))

    if not global_features and not location_features:
        t_img, t_mask = encoder_input
        return masked(t_img, t_mask), None, None
    if global_features and not location_features:
        t_img, t_mask, g_img, g_mask = encoder_input
        return masked(t_img, t_mask), masked(g_img, g_mask), None
    if not global_features and location_features:
        t_img, t_mask, l_feats = encoder_input
        return masked(t_img, t_mask), None, jnp.asarray(l_feats)
    t_img, t_mask, g_img, g_mask, l_feats = encoder_input
    return masked(t_img, t_mask), masked(g_img, g_mask), jnp.asarray(l_feats)


def _shard_batch_on(mesh, batch):
    """dp-shard a device batch over `mesh` (no-op without one). Ragged batches —
    a trailing loader batch whose size isn't dp-divisible — are replicated
    instead: value-identical, just not split."""
    if mesh is None:
        return batch
    from retr_tpu.parallel.mesh import (batch_shard_tree, global_batch_from_local,
                                        replicated)

    if jax.process_count() > 1:
        # multi-host dp: this process's rows become its slice of the global batch
        # (train loader sharded with shard=(process_index, process_count) in
        # main.py; drop_last=True keeps train batches full). Unsharded eval
        # loaders reach here too with IDENTICAL per-host batches — a ragged one
        # whose duplicated-global row count doesn't split over dp falls back to
        # replicated assembly (value-identical, matching the single-host fallback).
        from retr_tpu.parallel.mesh import global_replicated_from_local

        b = batch.images.shape[0]
        if (b * jax.process_count()) % mesh.shape["dp"]:
            return global_replicated_from_local(mesh, batch)
        return global_batch_from_local(mesh, batch)
    b = batch.images.shape[0]
    if b % mesh.shape["dp"]:
        return jax.device_put(batch, jax.tree.map(lambda _: replicated(mesh), batch))
    return jax.device_put(batch, batch_shard_tree(mesh, batch))


def _staged_batches(loader, make_batch, depth: int = 2):
    """Yield ``make_batch(i, host_batch)`` for each loader batch, with the calls
    running up to ``depth`` ahead on a background thread.

    ``make_batch`` is where the host->device upload happens (device_batch +
    optional mesh sharding); staging it overlaps that transfer with the step
    running on the device — measured at ~30% of train-epoch wall time when done
    inline between dispatches (BENCH_DETAILS config 8 vs 6). Exceptions from the
    loader or the upload re-raise at the consumption point; early consumer exit
    (e.g. the NaN stop) unblocks and joins the worker via the generator's close.
    """
    import queue as _queue
    import threading as _threading

    q: _queue.Queue = _queue.Queue(maxsize=max(1, depth))
    stop = _threading.Event()
    done = object()

    def _put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except _queue.Full:
                pass
        return False

    def work():
        try:
            for i, host_batch in enumerate(loader):
                if stop.is_set() or not _put(make_batch(i, host_batch)):
                    return
            _put(done)
        except BaseException as exc:  # noqa: BLE001 — relayed to the consumer
            _put(exc)

    worker = _threading.Thread(target=work, daemon=True)
    worker.start()
    try:
        while True:
            item = q.get()
            if item is done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # drain so a blocked put exits
            try:
                q.get_nowait()
            except _queue.Empty:
                break
        worker.join()


def train_one_epoch(
    state: TrainState,
    step_fn,
    loader: DataLoader,
    key: jax.Array,
    *,
    epoch: int = 0,
    logger: Optional[MetricLogger] = None,
    pipeline_depth: int = 2,
    mesh=None,
    stage_uploads: bool = False,
) -> Tuple[TrainState, float]:
    """One training epoch (reference engine.py:52-87).

    With ``mesh``, each uploaded batch is dp-sharded over it (ragged trailing
    batches are replicated instead — value-identical, just unsharded), so the jit
    step runs SPMD across the mesh; pass params already sharded (parallel.mesh).

    ``stage_uploads=True`` builds/uploads batch n+1 on a background staging
    thread while step n dispatches — the right setting on real TPU hosts, where
    the ~4.8 MB uint8 transfer rides DMA concurrently with compute. It is OFF by
    default because on this project's tunneled dev chip all device traffic
    serializes on one connection and the interleaved A/B measured staged ≈
    inline (tools/exp_r3.py --stage-ab; docs/PERF.md round-3 entry). The loss
    fetch is pipelined ``pipeline_depth`` steps
    behind the dispatch: JAX dispatch is async, so the host enqueues step n+1
    while step n executes, and the
    device-to-host loss read (a full transport round trip under axon) overlaps
    compute instead of serializing with it. The reference's NaN hard stop
    (engine.py:75-77) is preserved — a non-finite loss still raises
    ``NonFiniteLossError``, at most ``pipeline_depth-1`` dispatches later (the
    poisoned later states are abandoned with the raise either way).
    ``pipeline_depth=1`` restores the strictly serial check.
    """
    from collections import deque

    # pin the loader's shuffle epoch to THIS epoch number: the permutation is a
    # pure function of (seed, epoch), so a --resume'd run sees the same data
    # order in epoch e as the uninterrupted run would have (the loader's own
    # counter restarts at 0 in a fresh process and would otherwise diverge).
    # Benches/tests may pass a plain list of host batches instead of a DataLoader.
    if isinstance(loader, DataLoader):
        loader.epoch = epoch

    epoch_loss, n = 0.0, 0
    epoch_key = jax.random.fold_in(key, epoch)
    step0 = int(state.step)  # host-side step mirror: int(state.step) per step would block
    pending: deque = deque()  # (global_step, device_loss)

    def drain_one():
        nonlocal epoch_loss
        i, loss = pending.popleft()
        loss_value = float(loss)
        if not math.isfinite(loss_value):
            # `state` at this point may already include depth-1 updates computed
            # from these non-finite grads — callers must abandon it (see
            # NonFiniteLossError docstring); do not catch-and-checkpoint.
            raise NonFiniteLossError(
                f"Loss is {loss_value} at step {i}, stopping training",
                last_good_step=i - 1,
            )
        epoch_loss += loss_value
        if logger is not None:
            logger.log("train_step", step=i, loss=loss_value, epoch=epoch)

    # Augmentation key: per-host under multi-host dp (each host augments its OWN
    # data rows — the same key on every host would correlate the flips/jitter
    # positionally across the global batch). The STEP key below stays epoch_key
    # on every host: it feeds the single global SPMD program, which requires
    # identical inputs on all processes.
    aug_key = epoch_key
    if jax.process_count() > 1:
        aug_key = jax.random.fold_in(epoch_key, jax.process_index())

    def make_batch(i, host_batch):
        # PRNG key is a pure function of (aug_key, batch index), so building the
        # batch on the staging thread is bit-identical to building it inline.
        b = device_batch(host_batch, train=True, key=jax.random.fold_in(aug_key, i))
        return _shard_batch_on(mesh, b)

    if stage_uploads:
        batches = _staged_batches(loader, make_batch, depth=2)
    else:  # inline upload between dispatches (A/B + debugging path)
        batches = (make_batch(i, hb) for i, hb in enumerate(loader))

    for batch in batches:
        state, loss = step_fn(state, batch, epoch_key)
        n += 1
        pending.append((step0 + n, loss))
        if len(pending) >= max(1, pipeline_depth):
            drain_one()
    while pending:
        drain_one()
    return state, epoch_loss / max(n, 1)


def evaluate(params, cfg: Config, loader: DataLoader, *, eval_step=None, mesh=None,
             pipeline_depth: int = 2) -> float:
    """Validation loss (reference engine.py:89-114); per-batch loss fetches are
    drained ``pipeline_depth - 1`` batches behind the dispatch so the transport
    round trip overlaps compute (``pipeline_depth=1`` is strictly serial)."""
    from collections import deque

    if eval_step is None:
        eval_step = make_eval_step(cfg)
    total, n = 0.0, 0
    pending: deque = deque()

    def drain_one():
        nonlocal total, n
        total += float(pending.popleft())
        n += 1

    for host_batch in loader:
        batch = _shard_batch_on(mesh, device_batch(host_batch, train=False))
        pending.append(eval_step(params, batch))
        if len(pending) >= max(1, pipeline_depth):
            drain_one()
    while pending:
        drain_one()
    return total / max(n, 1)


def normalize_with_tokenizer(sent: str, tokenizer) -> str:
    """Tokenizer encode->decode round trip (engine.py:117-122)."""
    return tokenizer.decode(tokenizer.encode(sent), skip_special_tokens=True)


def eval_model(
    params,
    cfg: Config,
    loader: DataLoader,
    tokenizer,
    *,
    metrics_to_omit: Optional[List[str]] = None,
    print_samples: bool = False,
    decoder: str = "greedy",
    timer=None,
    pipeline_depth: int = 2,
) -> Tuple[Dict[str, float], List[dict]]:
    """Greedy-decode the loader's dataset and score with the NLG suite.

    ``decoder='beam'`` swaps in beam search (beam_size/length_penalty from cfg) and
    ``decoder='sample'`` stochastic sampling (sample_temperature/sample_top_k/
    sample_top_p from cfg, PRNG seeded from cfg.seed per batch) — north-star
    extensions; the reference is greedy-only. Pass a
    utils.profiling.PhaseTimer as ``timer`` for input/decode/fetch phase breakdowns
    (the expressions/sec + p50 instrumentation the north-star metric needs).

    The loop is double-buffered (``pipeline_depth`` batches in flight): decode for
    batch n+1 is dispatched before batch n's tokens are fetched, so device compute
    and the transport round trip overlap host-side prune/detokenize/reference
    normalization. ``pipeline_depth=1`` restores the strictly serial loop.
    """
    from retr_tpu.utils.profiling import PhaseTimer

    timer = timer if timer is not None else PhaseTimer()
    nlgeval = NLGEval(no_skipthoughts=True, no_glove=True, metrics_to_omit=metrics_to_omit or [])

    annotations: Dict[int, List[str]] = defaultdict(list)
    for a in loader.dataset.annot:  # (ann_id, filename, caption, bbox)
        annotations[a[0]].append(a[2])

    pad_id = tokenizer.convert_tokens_to_ids(tokenizer.pad_token)
    bos_id = tokenizer.convert_tokens_to_ids(tokenizer.cls_token)
    eos_id = tokenizer.convert_tokens_to_ids(tokenizer.sep_token)
    compute_dtype = jnp.dtype(cfg.compute_dtype)

    hypotheses: List[str] = []
    ids_hypotheses: List[dict] = []
    references: List[List[str]] = []

    def dispatch(host_batch):
        # Pad ragged trailing batches to the loader batch size so they reuse the
        # full-batch decode executable (data.dataset.pad_host_batch); the
        # duplicate rows are sliced off in collect(), which keys off the
        # ORIGINAL host_batch's ann_ids.
        from retr_tpu.data.dataset import pad_host_batch

        padded = pad_host_batch(host_batch, getattr(loader, "batch_size", 0))
        with timer.phase("input"):
            batch = device_batch(padded, train=False)
        samples = Masked(batch.images, batch.image_masks)
        g = Masked(batch.global_images, batch.global_masks) if batch.global_images is not None else None
        with timer.phase("decode"):
            if decoder == "greedy":
                ids = decode_mod.greedy(
                    params, cfg, samples, global_samples=g, loc_feats=batch.loc_feats,
                    max_len=cfg.max_position_embeddings,
                    bos_token=bos_id, eos_token=eos_id, compute_dtype=compute_dtype,
                )
            elif decoder == "beam":
                tokens, _ = decode_mod.beam_search(
                    params, cfg, samples, global_samples=g, loc_feats=batch.loc_feats,
                    max_len=cfg.max_position_embeddings,
                    bos_token=bos_id, eos_token=eos_id, compute_dtype=compute_dtype,
                    beam_size=cfg.beam_size, length_penalty=cfg.length_penalty,
                )
                ids = tokens[:, 0]
            elif decoder == "sample":
                # deterministic per (cfg.seed, batch index): reruns reproduce
                key = jax.random.fold_in(jax.random.key(cfg.seed), dispatch.counter)
                dispatch.counter += 1
                ids = decode_mod.sample(
                    params, cfg, samples, key,
                    global_samples=g, loc_feats=batch.loc_feats,
                    max_len=cfg.max_position_embeddings,
                    bos_token=bos_id, eos_token=eos_id, compute_dtype=compute_dtype,
                    temperature=cfg.sample_temperature,
                    top_k=cfg.sample_top_k, top_p=cfg.sample_top_p,
                )
            else:
                raise ValueError(f"unknown decoder {decoder!r}")
        return ids, host_batch

    dispatch.counter = 0  # batch index for the sampling decoder's PRNG stream

    def collect(entry):
        ids_dev, host_batch = entry
        with timer.phase("fetch"):
            ids = np.asarray(ids_dev)  # force completion: fetch is the only real barrier
        ids = ids[: len(host_batch.ann_ids)]  # drop pad_ragged's duplicate rows

        pruned = decode_mod.prune_token_ids(
            ids.tolist(), clean=True,
            pad_token=pad_id, bos_token=bos_id, eos_token=eos_id,
        )
        hyps = tokenizer.batch_decode(pruned)
        hypotheses.extend(hyps)

        ids_hyps = [
            {"ann_id": int(i), "expression": h}
            for i, h in zip(host_batch.ann_ids.tolist(), hyps)
        ]
        ids_hypotheses.extend(ids_hyps)
        if print_samples:
            print(*ids_hyps, sep="\n")

        refs = [annotations[int(i)] for i in host_batch.ann_ids]
        references.extend(
            [normalize_with_tokenizer(r, tokenizer) for r in rs] for rs in refs
        )

    from collections import deque

    pending: deque = deque()
    # host_wait = time the loop BLOCKS on the loader (JPEG decode/crop/resize not
    # hidden by the prefetch threads) — one of the per-batch phases docs/E2E.json
    # pins each round (tools/bench_e2e.py --emit-json).
    it = iter(loader)
    while True:
        with timer.phase("host_wait"):
            host_batch = next(it, None)
        if host_batch is None:
            break
        pending.append(dispatch(host_batch))
        if len(pending) >= max(1, pipeline_depth):
            collect(pending.popleft())
    while pending:
        collect(pending.popleft())

    # the reference's zip(*) transposition truncates to the min ref count (engine.py:181)
    transposed_references = list(map(list, zip(*references)))
    with timer.phase("score"):
        metrics = nlgeval.compute_metrics(ref_list=transposed_references, hyp_list=hypotheses)
    return metrics, ids_hypotheses
