"""Multi-chip evaluation sweep: dp-sharded batched greedy over a device mesh.

BASELINE.md config 5 — "Full RefCOCO/RefCOCO+/RefCOCOg eval sweep with nlgeval
CIDEr/BLEU on a v5e-4 slice". The reference is strictly single-device
(SURVEY.md §2.2); here the same jit-compiled KV-cached greedy runs with the batch
sharded over the mesh's ``dp`` axis: XLA's SPMD partitioner splits the encoder and
per-step decode across chips and inserts the one collective the loop needs (the
all-reduce of the ``finished`` flags inside the while-loop condition) over ICI.

Host batches are padded to a full, dp-divisible batch (static shapes); padded rows
are dropped when hypotheses are collected.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import numpy as np

from retr_tpu.config import Config
from retr_tpu.data.dataset import DataLoader, HostBatch
from retr_tpu.parallel.mesh import batch_sharding, replicated


from retr_tpu.data.dataset import pad_host_batch  # canonical impl; re-exported


def shard_batch(batch, mesh):
    if jax.process_count() > 1:
        # every process holds an identical (unsharded-loader) batch already padded
        # dp-divisible; each contributes it as its local slice of the global batch
        # (rows duplicated across hosts — hypotheses are read back from the first
        # copy after the pre-fetch all-gather below)
        from retr_tpu.parallel.mesh import global_batch_from_local

        return global_batch_from_local(mesh, batch)
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))) if x is not None else None,
        batch,
        is_leaf=lambda x: x is None,
    )


def eval_model_sharded(
    params,
    cfg: Config,
    loader: DataLoader,
    tokenizer,
    mesh,
    *,
    metrics_to_omit: Optional[List[str]] = None,
    return_hypotheses: bool = False,
    decoder: str = "greedy",
) -> Dict[str, float]:
    """engine.eval_model with dp-sharded decode. Returns the metric dict
    (or ``(metrics, hypotheses)`` with ``return_hypotheses=True`` — used by the
    driver dryrun to assert sharded == single-device tokens).

    ``decoder``: 'greedy' | 'beam' | 'sample' — same dispatch as engine.eval_model
    (beam_size/length_penalty/sample_* from cfg). Beam tiles the sharded batch to
    B*K rows and sampling's counter-based PRNG is sharding-invariant, so both
    produce the same tokens as the single-device path (tests/test_sweep.py)."""
    from collections import defaultdict

    from retr_tpu import decode as decode_mod
    from retr_tpu.data.pipeline import device_batch
    from retr_tpu.engine import normalize_with_tokenizer
    from retr_tpu.masking import Masked
    from retr_tpu.metrics import NLGEval

    leaf = jax.tree.leaves(params)[0]
    if not (hasattr(leaf, "sharding") and getattr(leaf.sharding, "mesh", None) == mesh):
        # keep pre-sharded (mp) params; multi-host must materialize per-process
        # instead of device_put (cross-host transfer — see mesh.multihost_put)
        if jax.process_count() > 1:
            from retr_tpu.parallel.mesh import multihost_put

            params = multihost_put(
                params, jax.tree.map(lambda _: replicated(mesh), params))
        else:
            params = jax.device_put(params, replicated(mesh))

    annotations = defaultdict(list)
    for a in loader.dataset.annot:
        annotations[a[0]].append(a[2])

    pad_id = tokenizer.convert_tokens_to_ids(tokenizer.pad_token)
    bos_id = tokenizer.convert_tokens_to_ids(tokenizer.cls_token)
    eos_id = tokenizer.convert_tokens_to_ids(tokenizer.sep_token)

    dp = mesh.shape["dp"]
    full = ((loader.batch_size + dp - 1) // dp) * dp

    # multi-host: built ONCE (a fresh jit per batch would retrace the all-gather
    # every iteration); shapes are constant across the loop
    gather_replicated = (
        jax.jit(lambda x: x, out_shardings=replicated(mesh))
        if jax.process_count() > 1 else None
    )

    hypotheses, references = [], []
    for batch_i, host in enumerate(loader):
        true_b = host.target_images.shape[0]
        host_p = pad_host_batch(host, full)
        batch = shard_batch(device_batch(host_p, train=False), mesh)
        samples = Masked(batch.images, batch.image_masks)
        g = Masked(batch.global_images, batch.global_masks) if batch.global_images is not None else None
        import jax.numpy as jnp

        common = dict(
            global_samples=g, loc_feats=batch.loc_feats,
            max_len=cfg.max_position_embeddings, bos_token=bos_id, eos_token=eos_id,
            compute_dtype=jnp.dtype(cfg.compute_dtype),
        )
        if decoder == "greedy":
            ids = decode_mod.greedy(params, cfg, samples, **common)
        elif decoder == "beam":
            tokens, _ = decode_mod.beam_search(
                params, cfg, samples,
                beam_size=cfg.beam_size, length_penalty=cfg.length_penalty, **common,
            )
            ids = tokens[:, 0]
        elif decoder == "sample":
            key = jax.random.fold_in(jax.random.key(cfg.seed), batch_i)
            ids = decode_mod.sample(
                params, cfg, samples, key,
                temperature=cfg.sample_temperature,
                top_k=cfg.sample_top_k, top_p=cfg.sample_top_p, **common,
            )
        else:
            raise ValueError(f"unknown decoder {decoder!r}")
        if gather_replicated is not None:
            # a dp-sharded global array spans non-addressable devices, so a host
            # fetch is illegal; the jitted identity with replicated out_shardings
            # inserts the all-gather and makes it locally fetchable everywhere
            ids = gather_replicated(ids)
        pruned = decode_mod.prune_token_ids(
            np.asarray(ids)[:true_b].tolist(), clean=True,
            pad_token=pad_id, bos_token=bos_id, eos_token=eos_id,
        )
        hypotheses += tokenizer.batch_decode(pruned)
        refs = [annotations[int(i)] for i in host.ann_ids[:true_b]]
        references += [[normalize_with_tokenizer(r, tokenizer) for r in rs] for rs in refs]

    transposed = list(map(list, zip(*references)))
    metrics = NLGEval(metrics_to_omit=metrics_to_omit or []).compute_metrics(transposed, hypotheses)
    if return_hypotheses:
        return metrics, hypotheses
    return metrics


def full_eval_sweep(
    params,
    base_cfg: Config,
    tokenizer,
    mesh,
    *,
    datasets: Dict[str, DataLoader],
    decoder: str = "greedy",
    return_hypotheses: bool = False,
):
    """Evaluate every (dataset/split) loader in ``datasets`` on the mesh.

    ``datasets`` maps a label (e.g. 'refcoco/val', 'refcoco+/testA') to its loader;
    build them with data.dataset.build_dataset per prefix/split. Returns
    ``{label: metrics}``, or ``({label: metrics}, {label: hypotheses})`` with
    ``return_hypotheses=True`` (the sweep CLI's --store-generations)."""
    metrics: Dict[str, Dict[str, float]] = {}
    hyps: Dict[str, list] = {}
    for label, loader in datasets.items():
        out = eval_model_sharded(params, base_cfg, loader, tokenizer, mesh,
                                 decoder=decoder,
                                 return_hypotheses=return_hypotheses)
        if return_hypotheses:
            metrics[label], hyps[label] = out
        else:
            metrics[label] = out
    return (metrics, hyps) if return_hypotheses else metrics
