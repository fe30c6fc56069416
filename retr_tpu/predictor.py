"""High-level inference API: image + bbox -> referring expression.

The reference exposes inference only through eval scripts and notebook-style helpers
(eval_utils/decode.py greedy_single/greedy_with_att). This wraps the whole pipeline —
host preprocessing (crop/pad/PIL-exact resize via the native core), device
normalization, encode-once KV-cached decode — behind one object suitable for serving:

    pred = Predictor.from_checkpoint("data/models/refcoco/Concat_refcoco_checkpoint_7")
    pred.predict(image, bbox)                      # -> "the woman in the red coat"
    pred.predict_batch(images, bboxes, beam=True)  # -> list[str]

Everything after preprocessing is a single compiled program per (batch-size, decoder)
pair; batches are padded to the configured batch size so the compile cache stays warm.

`ServingQueue` adds an async micro-batcher on top: concurrent callers submit single
requests, a background worker coalesces them (up to `max_batch`, waiting at most
`max_wait_s` for stragglers) into one padded device batch per dispatch — the standard
dynamic-batching pattern for TPU serving, where per-dispatch cost is dominated by the
fixed encode + decode-loop launch, not the batch dimension.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import List, Optional, Sequence

import numpy as np

import jax

from retr_tpu import decode as decode_mod
from retr_tpu.config import Config
from retr_tpu.data.dataset import collate
from retr_tpu.data.pipeline import device_batch
from retr_tpu.data.preprocess import load_image, preprocess_sample
from retr_tpu.data.tokenizer import prepare_tokenizer
from retr_tpu.masking import Masked


class Predictor:
    def __init__(self, params, cfg: Config, tokenizer=None, *, max_batch: int = 8):
        self.params = params
        self.cfg = cfg
        self.max_batch = max_batch
        if tokenizer is None:
            tokenizer, _, _ = prepare_tokenizer(cfg.vocab_file)
        self.tokenizer = tokenizer
        self.bos = tokenizer.convert_tokens_to_ids(tokenizer.cls_token)
        self.eos = tokenizer.convert_tokens_to_ids(tokenizer.sep_token)
        self.pad = tokenizer.convert_tokens_to_ids(tokenizer.pad_token)

    # -- construction ---------------------------------------------------------------
    @classmethod
    def from_checkpoint(cls, path: str, **kw) -> "Predictor":
        """retr_tpu checkpoint directory (config embedded) or reference .pth."""
        from retr_tpu.train import checkpoints as ckpt

        if path.endswith(".pth"):
            cfg = ckpt.override_config_with_reference_filename(Config(), path)
            params, _ = ckpt.import_reference_checkpoint(path, cfg)
            return cls(params, cfg, **kw)

        cfg = ckpt.config_from_checkpoint(path)
        from retr_tpu.models import caption
        from retr_tpu.train.state import TrainState, make_optimizer

        template, _ = caption.build_model(cfg, jax.random.key(0))
        tx = make_optimizer(cfg, steps_per_epoch=1)
        state, _ = ckpt.load_checkpoint(
            path, TrainState(template, tx.init(template), jax.numpy.int32(0))
        )
        return cls(state.params, cfg, **kw)

    # -- inference ------------------------------------------------------------------
    def predict(self, image, bbox, *, beam: bool = False,
                decoder: str = "greedy", seed: int = 0) -> str:
        return self.predict_batch([image], [bbox], beam=beam, decoder=decoder,
                                  seed=seed)[0]

    def predict_batch(
        self, images: Sequence, bboxes: Sequence, *, beam: bool = False,
        decoder: str = "greedy", seed: int = 0,
    ) -> List[str]:
        """images: file paths or HWC uint8 arrays; bboxes: [x, y, w, h] each.

        ``decoder``: 'greedy' | 'beam' | 'sample' (``beam=True`` is shorthand for
        'beam'). 'sample' draws with the cfg sample_* knobs, deterministic per
        ``seed`` and chunk index.
        """
        assert len(images) == len(bboxes)
        if beam:
            decoder = "beam"
        if decoder not in ("greedy", "beam", "sample"):
            raise ValueError(f"unknown decoder {decoder!r}")
        out: List[str] = []
        for chunk, i in enumerate(range(0, len(images), self.max_batch)):
            out += self._run_chunk(images[i : i + self.max_batch],
                                   bboxes[i : i + self.max_batch], decoder,
                                   seed=seed, chunk=chunk)
        return out

    def complete(self, image, bbox, prefix_text: str) -> str:
        """Greedy completion of a partial expression (decode.greedy_with_prefix):
        ``complete(img, bb, "the woman")`` returns a full expression starting
        with the given words. Runs at batch 1 (interactive path)."""
        arr = load_image(image) if isinstance(image, str) else np.asarray(image)
        sample = preprocess_sample(
            arr, bbox, "", self.tokenizer,
            image_size=self.cfg.image_size,
            max_length=self.cfg.max_position_embeddings,
            use_global=self.cfg.use_global_features,
            use_location=self.cfg.use_location_features,
        )
        batch = device_batch(collate([sample]), train=False)
        imgs = Masked(batch.images, batch.image_masks)
        g = (Masked(batch.global_images, batch.global_masks)
             if batch.global_images is not None else None)
        ids = [t for t in self.tokenizer.encode(prefix_text)
               if t not in (self.bos, self.eos, self.pad)]
        max_p = self.cfg.max_position_embeddings - 2
        ids = ids[:max_p]
        prefix = np.zeros((1, max_p), np.int32)
        prefix[0, : len(ids)] = ids
        out = decode_mod.greedy_with_prefix(
            self.params, self.cfg, imgs,
            jax.numpy.asarray(prefix), jax.numpy.asarray([len(ids)], jax.numpy.int32),
            global_samples=g, loc_feats=batch.loc_feats,
            max_len=self.cfg.max_position_embeddings,
            bos_token=self.bos, eos_token=self.eos,
            compute_dtype=jax.numpy.dtype(self.cfg.compute_dtype),
        )
        pruned = decode_mod.prune_token_ids(
            np.asarray(out).tolist(), clean=True,
            pad_token=self.pad, bos_token=self.bos, eos_token=self.eos,
        )
        return self.tokenizer.batch_decode(pruned)[0]

    def score(self, images: Sequence, bboxes: Sequence,
              texts: Sequence[str]) -> List[dict]:
        """Log-likelihoods of candidate expressions for given regions
        (decode.sequence_scores): one dict per request with ``logprob`` (sum over
        real tokens incl. EOS), ``n_tokens``, and ``ppl``. Use to rerank
        candidate expressions or compare phrasings for one region."""
        assert len(images) == len(bboxes) == len(texts)
        out: List[dict] = []
        for i in range(0, len(images), self.max_batch):
            out += self._score_chunk(images[i : i + self.max_batch],
                                     bboxes[i : i + self.max_batch],
                                     texts[i : i + self.max_batch])
        return out

    def _score_chunk(self, images, bboxes, texts) -> List[dict]:
        samples = []
        for im, bb, txt in zip(images, bboxes, texts):
            arr = load_image(im) if isinstance(im, str) else np.asarray(im)
            samples.append(
                preprocess_sample(
                    arr, bb, txt, self.tokenizer,
                    image_size=self.cfg.image_size,
                    max_length=self.cfg.max_position_embeddings,
                    use_global=self.cfg.use_global_features,
                    use_location=self.cfg.use_location_features,
                )
            )
        true_n = len(samples)
        while len(samples) < self.max_batch:
            samples.append(samples[-1])
        batch = device_batch(collate(samples), train=False)
        imgs = Masked(batch.images, batch.image_masks)
        g = (Masked(batch.global_images, batch.global_masks)
             if batch.global_images is not None else None)
        tok_lp, valid = decode_mod.sequence_scores(
            self.params, self.cfg, imgs, batch.caps, batch.cap_masks,
            global_samples=g, loc_feats=batch.loc_feats,
            compute_dtype=jax.numpy.dtype(self.cfg.compute_dtype),
        )
        lp = np.asarray(tok_lp)[:true_n]
        v = np.asarray(valid)[:true_n]
        out = []
        for row_lp, row_v in zip(lp, v):
            total = float(row_lp[row_v].sum())
            n = int(row_v.sum())
            out.append({
                "logprob": total,
                "n_tokens": n,
                "ppl": float(np.exp(-total / max(n, 1))),
            })
        return out

    def predict_with_attention(self, image, bbox):
        """Single-request decode + attention maps (the reference's greedy_with_att,
        eval_utils/decode.py:131-167, as a serving API): returns
        ``(expression, atts)`` with atts mapping enc_tc_self_att /
        dec_exp_self_att / dec_exp_tc_cross_att to ``[layers, T, S]``-shaped
        numpy stacks for this sample (batch dim removed). Runs at batch 1 — an
        analysis path, compiled separately from the serving batch shape."""
        arr = load_image(image) if isinstance(image, str) else np.asarray(image)
        sample = preprocess_sample(
            arr, bbox, "", self.tokenizer,
            image_size=self.cfg.image_size,
            max_length=self.cfg.max_position_embeddings,
            use_global=self.cfg.use_global_features,
            use_location=self.cfg.use_location_features,
        )
        batch = device_batch(collate([sample]), train=False)
        imgs = Masked(batch.images, batch.image_masks)
        g = (Masked(batch.global_images, batch.global_masks)
             if batch.global_images is not None else None)
        ids, atts = decode_mod.greedy_with_attention(
            self.params, self.cfg, imgs,
            global_samples=g, loc_feats=batch.loc_feats,
            max_len=self.cfg.max_position_embeddings,
            bos_token=self.bos, eos_token=self.eos,
            compute_dtype=jax.numpy.dtype(self.cfg.compute_dtype),
        )
        pruned = decode_mod.prune_token_ids(
            np.asarray(ids).tolist(), clean=True,
            pad_token=self.pad, bos_token=self.bos, eos_token=self.eos,
        )
        text = self.tokenizer.batch_decode(pruned)[0]
        return text, {k: np.asarray(v)[:, 0] for k, v in atts.items()}

    def _run_chunk(self, images, bboxes, decoder: str, *, seed: int = 0,
                   chunk: int = 0) -> List[str]:
        return self._collect(*self._dispatch(images, bboxes, decoder, seed=seed,
                                             chunk=chunk))

    def _preprocess_one(self, image, bbox):
        """Host preprocessing for one request (crop/pad/resize/tokenize). Raises
        on malformed input — kept per-request so a batcher can isolate failures
        to the offending request instead of failing its whole coalesced batch."""
        arr = load_image(image) if isinstance(image, str) else np.asarray(image)
        return preprocess_sample(
            arr, bbox, "", self.tokenizer,
            image_size=self.cfg.image_size,
            max_length=self.cfg.max_position_embeddings,
            use_global=self.cfg.use_global_features,
            use_location=self.cfg.use_location_features,
        )

    def _dispatch(self, images, bboxes, decoder: str, *, seed: int = 0,
                  chunk: int = 0):
        """Preprocess + launch the decode; returns (device ids, true_n) WITHOUT
        blocking on the result (the host fetch in _collect is the only barrier),
        so callers can keep batching while the device computes."""
        samples = [self._preprocess_one(im, bb) for im, bb in zip(images, bboxes)]
        return self._dispatch_samples(samples, decoder, seed=seed, chunk=chunk)

    def _dispatch_samples(self, samples, decoder: str, *, seed: int = 0,
                          chunk: int = 0):
        """Launch a decode over already-preprocessed samples (see _preprocess_one)."""
        samples = list(samples)
        true_n = len(samples)
        while len(samples) < self.max_batch:  # static shape -> stable compile cache
            samples.append(samples[-1])
        batch = device_batch(collate(samples), train=False)

        imgs = Masked(batch.images, batch.image_masks)
        g = Masked(batch.global_images, batch.global_masks) if batch.global_images is not None else None
        common = dict(
            global_samples=g, loc_feats=batch.loc_feats,
            max_len=self.cfg.max_position_embeddings,
            bos_token=self.bos, eos_token=self.eos,
            compute_dtype=jax.numpy.dtype(self.cfg.compute_dtype),
        )
        if decoder == "beam":
            tokens, _ = decode_mod.beam_search(
                self.params, self.cfg, imgs,
                beam_size=self.cfg.beam_size, length_penalty=self.cfg.length_penalty,
                **common,
            )
            ids = tokens[:, 0]
        elif decoder == "sample":
            key = jax.random.fold_in(jax.random.key(seed), chunk)
            ids = decode_mod.sample(
                self.params, self.cfg, imgs, key,
                temperature=self.cfg.sample_temperature,
                top_k=self.cfg.sample_top_k, top_p=self.cfg.sample_top_p,
                **common,
            )
        else:
            ids = decode_mod.greedy(self.params, self.cfg, imgs, **common)
        return ids, true_n

    def _collect(self, ids, true_n: int) -> List[str]:
        pruned = decode_mod.prune_token_ids(
            np.asarray(ids)[:true_n].tolist(), clean=True,
            pad_token=self.pad, bos_token=self.bos, eos_token=self.eos,
        )
        return self.tokenizer.batch_decode(pruned)


class ServingOverloaded(RuntimeError):
    """Raised by ServingQueue.submit when the bounded request queue is full.

    Load shedding: rejecting immediately keeps tail latency bounded under
    overload — the alternative (unbounded queueing) "succeeds" every request
    after minutes (measured p99 107 s at offered 400 rps, docs/BENCH_SERVING.json
    pre-shed soak). ``retry_after_s`` is the server's estimate of when capacity
    frees up (drain time of the current queue + in-flight batches), suitable for
    an HTTP Retry-After header.
    """

    def __init__(self, retry_after_s: float):
        super().__init__(f"serving queue full; retry after ~{retry_after_s:.2f}s")
        self.retry_after_s = retry_after_s


class ServingQueue:
    """Async dynamic batcher over a Predictor, pipelined dispatch/collect.

    Requests submitted from any thread are coalesced into device batches of up to
    `predictor.max_batch`; a dispatch fires as soon as the batch is full or the
    oldest queued request has waited `max_wait_s`. Each `submit` returns a
    `concurrent.futures.Future[str]`.

    Admission control: the submit queue is bounded at ``max_queued`` requests
    (default 4 dispatch windows = ``4 * predictor.max_batch``); a submit beyond
    that raises :class:`ServingOverloaded` immediately instead of queueing into
    an ever-growing backlog. ``stats()`` reports accepted/rejected counts and the
    smoothed per-batch service time the Retry-After estimate derives from.

    Two stages run concurrently: the DISPATCHER preprocesses + launches decodes
    (non-blocking — the host fetch is the only real barrier on TPU) and the
    COLLECTOR fetches tokens + detokenizes + resolves futures. Up to
    ``pipeline_depth`` batches stay in flight; when the device is the bottleneck
    the bounded flight queue back-pressures the dispatcher, whose next batching
    window then keeps filling — batch sizes adapt to load automatically instead
    of being capped at what arrives within ``max_wait_s`` (the serial design
    saturated at ~80 req/s because 10 ms windows coalesce only 2-3 requests at
    200 req/s offered; see docs/PERF.md).

        q = ServingQueue(pred)
        futs = [q.submit(img, bbox) for img, bbox in requests]
        texts = [f.result() for f in futs]
        q.close()
    """

    def __init__(self, predictor: Predictor, *, max_wait_s: float = 0.05,
                 beam: bool = False, decoder: str = "greedy",
                 pipeline_depth: int = 2, max_queued: Optional[int] = None):
        self.predictor = predictor
        self.max_wait_s = max_wait_s
        self.decoder = "beam" if beam else decoder
        # Bounded ADMISSION, unbounded container: the shed decision happens in
        # submit() (qsize check under the lock) so close()'s sentinel can always
        # post without deadlocking against a full queue.
        self.max_queued = (max_queued if max_queued is not None
                           else 4 * predictor.max_batch)
        self._q: "queue.Queue" = queue.Queue()
        self._flight: "queue.Queue" = queue.Queue(maxsize=max(pipeline_depth, 1))
        self._closed = False
        self._close_lock = threading.Lock()  # makes the closed-check + enqueue atomic
        self._accepted = 0
        self._rejected = 0
        # EMA of per-batch service time (collect-to-collect interval), seeding the
        # Retry-After estimate before the first batch lands with the window length.
        self._batch_s = max_wait_s
        self._last_collect_t: Optional[float] = None
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._collector = threading.Thread(target=self._collect_loop, daemon=True)
        self._dispatcher.start()
        self._collector.start()

    def _retry_after_estimate(self) -> float:
        """Drain time of the standing queue + in-flight batches at the smoothed
        per-batch service rate — when a shed client retrying after this long
        should find room."""
        batches_ahead = (self._q.qsize() / max(self.predictor.max_batch, 1)
                         + self._flight.qsize() + 1)
        return max(self.max_wait_s, batches_ahead * self._batch_s)

    def submit(self, image, bbox) -> "Future[str]":
        # Lock pairs the closed-check with the enqueue: without it a submit racing
        # with close() could land its request BEHIND the shutdown sentinel and the
        # future would never resolve (callers would block until their timeout).
        with self._close_lock:
            if self._closed:
                raise RuntimeError("ServingQueue is closed")
            # Admission control: submits serialize on this lock and the workers
            # only ever REMOVE items, so qsize() can only over-count here —
            # shedding errs early, never admits past the bound.
            if self._q.qsize() >= self.max_queued:
                self._rejected += 1
                raise ServingOverloaded(self._retry_after_estimate())
            fut: "Future[str]" = Future()
            self._q.put((image, bbox, fut))
            self._accepted += 1
        return fut

    def stats(self) -> dict:
        """Admission/serving counters: accepted/rejected submits, standing queue
        depth, in-flight batches, and the smoothed per-batch service time."""
        return {
            "accepted": self._accepted,
            "rejected": self._rejected,
            "queued": self._q.qsize(),
            "in_flight_batches": self._flight.qsize(),
            "batch_service_s": self._batch_s,
            "max_queued": self.max_queued,
        }

    def close(self, *, wait: bool = True) -> None:
        """Stop accepting requests; drain what is queued, then stop the workers."""
        with self._close_lock:
            already = self._closed
            self._closed = True
            if not already:
                self._q.put(None)
        if wait:
            self._dispatcher.join()
            self._collector.join()

    def _next_batch(self) -> Optional[list]:
        """Block for the first request, then coalesce until full or max_wait_s."""
        first = self._q.get()
        if first is None:
            return None
        batch = [first]
        t_end = time.monotonic() + self.max_wait_s
        while len(batch) < self.predictor.max_batch:
            remaining = t_end - time.monotonic()
            try:
                item = self._q.get(timeout=max(remaining, 0.0))
            except queue.Empty:
                break
            if item is None:
                self._q.put(None)  # re-post the sentinel so the worker exits next round
                break
            batch.append(item)
        return batch

    def _dispatch_loop(self) -> None:
        chunk = 0
        while True:
            batch = self._next_batch()
            if batch is None:
                # Defensive drain: with the submit lock nothing can land behind the
                # sentinel, but if anything is ever left queued, fail it explicitly
                # rather than leaving its future unresolved.
                while True:
                    try:
                        item = self._q.get_nowait()
                    except queue.Empty:
                        break
                    if item is not None:
                        item[2].set_exception(RuntimeError("ServingQueue is closed"))
                self._flight.put(None)  # collector shutdown
                return
            # Preprocess per request so one malformed input (bad bbox, corrupt
            # image) fails only its own future, not every innocent co-batched one.
            samples, ok_futs = [], []
            for image, bbox, fut in batch:
                try:
                    samples.append(self.predictor._preprocess_one(image, bbox))
                    ok_futs.append(fut)
                except Exception as exc:
                    fut.set_exception(exc)
            if not samples:
                continue
            try:
                ids, true_n = self.predictor._dispatch_samples(
                    samples, self.decoder, chunk=chunk
                )
                chunk += 1
            except Exception as exc:  # device dispatch failure: whole batch
                for f in ok_futs:
                    f.set_exception(exc)
                continue
            self._flight.put((ids, true_n, ok_futs))  # blocks at depth -> backpressure

    def _collect_loop(self) -> None:
        while True:
            item = self._flight.get()
            if item is None:
                return
            ids, true_n, futs = item
            try:
                texts = self.predictor._collect(ids, true_n)
            except Exception as exc:
                for f in futs:
                    f.set_exception(exc)
                continue
            # Per-batch service time for the Retry-After estimate: in a saturated
            # pipeline the collect-to-collect interval IS the device batch rate.
            now = time.monotonic()
            if self._last_collect_t is not None:
                dt = now - self._last_collect_t
                self._batch_s = 0.8 * self._batch_s + 0.2 * dt
            self._last_collect_t = now
            for f, t in zip(futs, texts):
                f.set_result(t)
