"""Device mesh + sharding rules.

The reference has no working distributed path (vestigial DETR rank helpers only,
models/utils.py:136-151; no process-group init anywhere — SURVEY.md §2.2). Here
multi-chip execution is first-class and TPU-native: a ``(dp, mp)``
``jax.sharding.Mesh``, batch sharded over ``dp`` (data parallel over ICI), and an
optional tensor-parallel ``mp`` axis sharding the widest matmuls — attention heads,
the FFN inner dimension, and the 30k-vocab MLP head — with XLA's SPMD partitioner
inserting the psum/all-gather collectives.

At this model scale (256-dim trunk), dp is what the north-star benchmark uses
(v5e-4 eval sweep = BASELINE.md config 5); mp exists to prove out and test the
tensor-parallel path end-to-end.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: Optional[int] = None, mp: int = 1, devices=None) -> Mesh:
    devices = list(jax.devices()) if devices is None else list(devices)
    n = len(devices)
    if dp is None:
        dp = n // mp
    if dp * mp > n:
        raise ValueError(f"dp({dp}) * mp({mp}) exceeds device count ({n})")
    return Mesh(np.asarray(devices[: dp * mp]).reshape(dp, mp), ("dp", "mp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Leading (batch) axis sharded over dp, the rest replicated."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))


def batch_shard_tree(mesh: Mesh, tree: Any) -> Any:
    """Sharding tree matching `tree` with every leaf's leading axis on dp."""
    return jax.tree.map(lambda x: batch_sharding(mesh, np.ndim(x)), tree)


def _assemble_from_local(mesh: Mesh, tree: Any, sharding_for) -> Any:
    """Shared core of the multi-host batch assemblers: every leaf's process-local
    value becomes its contribution to a global array under ``sharding_for(x)``
    via ``jax.make_array_from_process_local_data``.

    Leaves are staged through host memory (``np.asarray``) before the upload —
    one extra hop when the input already lives on device
    (``data.pipeline.device_batch``); building the global array from the
    existing per-device buffers (``make_array_from_single_device_arrays``) would
    avoid it and is the known optimization if the multi-host upload ever shows
    up in a profile."""

    def put(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(sharding_for(x), np.asarray(x))

    return jax.tree.map(put, tree, is_leaf=lambda x: x is None)


def global_batch_from_local(mesh: Mesh, tree: Any) -> Any:
    """Assemble a dp-sharded GLOBAL batch from each process's local rows.

    Multi-host data parallelism: every host loads its own slice of the dataset
    (``DataLoader(..., shard=(jax.process_index(), jax.process_count()))``) and
    passes its local batch here; the result is a global ``jax.Array`` whose
    leading axis is the concatenation over hosts, dp-sharded with each row
    resident on the devices of the host that loaded it — no cross-host data
    movement. The global batch size is ``process_count * local_batch``.

    Works single-process too (then it equals ``device_put(batch_shard_tree)`` —
    tested in tests/test_sweep.py); on a single host prefer the plain
    ``device_put`` path (see ``_assemble_from_local`` on the host staging hop)."""
    return _assemble_from_local(mesh, tree, lambda x: batch_sharding(mesh, np.ndim(x)))


def global_replicated_from_local(mesh: Mesh, tree: Any) -> Any:
    """Assemble a fully-REPLICATED global batch when every process holds an
    identical copy (the unsharded eval loaders in multi-host ``main()``): for a
    replicated sharding, ``make_array_from_process_local_data`` takes the full
    value from each process. Used by ``engine._shard_batch_on`` as the multi-host
    ragged-batch fallback — value-identical to dp-sharding, just not split.
    ONLY valid for identical per-host data: replicating host-specific rows would
    skip the gradient all-reduce entirely (main.py's launch guard keeps sharded
    TRAIN batches off this path by requiring divisibility)."""
    return _assemble_from_local(mesh, tree, lambda x: replicated(mesh))


# -- tensor-parallel rules ----------------------------------------------------------


def _mha_spec():
    # q/k/v project E -> E(heads): shard output (head) dim; out-proj contracts the
    # sharded dim -> psum, output replicated.
    return {
        "q": {"w": P(None, "mp"), "b": P("mp")},
        "k": {"w": P(None, "mp"), "b": P("mp")},
        "v": {"w": P(None, "mp"), "b": P("mp")},
        "out": {"w": P("mp", None), "b": P()},
    }


def _att_block_spec():
    return {"norm": {"scale": P(), "bias": P()}, "mha": _mha_spec()}


def _ff_spec():
    # lin1 expands d -> dff (shard dff); lin2 contracts dff -> d (psum).
    return {
        "norm": {"scale": P(), "bias": P()},
        "lin1": {"w": P(None, "mp"), "b": P("mp")},
        "lin2": {"w": P("mp", None), "b": P()},
    }


def transformer_specs(params: dict) -> dict:
    spec: dict = {
        "encoder": {
            "layers": [
                {"self_attn": _att_block_spec(), "ff": _ff_spec()}
                for _ in params["encoder"]["layers"]
            ]
        },
        "decoder": {
            "layers": [
                {
                    "self_attn": _att_block_spec(),
                    "cross_attn": _att_block_spec(),
                    "ff": _ff_spec(),
                }
                for _ in params["decoder"]["layers"]
            ],
            "norm": {"scale": P(), "bias": P()},
        },
        "embeddings": {
            "word": {"table": P()},
            "pos": {"table": P()},
            "norm": {"scale": P(), "bias": P()},
        },
    }
    if "norm" in params["encoder"]:
        spec["encoder"]["norm"] = {"scale": P(), "bias": P()}
    if "src_pos" in params:
        spec["src_pos"] = {"table": P(), "norm": {"scale": P(), "bias": P()}}
    return spec


def param_specs(params: dict) -> dict:
    """PartitionSpec tree for the full caption model: backbone replicated (it is
    <60MB and conv-bound), transformer mp-sharded, vocab head column-sharded."""
    spec: dict = {
        "backbone": jax.tree.map(lambda _: P(), params["backbone"]),
        "input_proj": {"w": P(), "b": P()},
        "transformer": transformer_specs(params["transformer"]),
        "mlp": {
            "layers": [
                {"w": P(), "b": P()},
                {"w": P(), "b": P()},
                # the 512 -> 30522 head: shard the vocab dim
                {"w": P(None, "mp"), "b": P("mp")},
            ]
        },
    }
    if "loc_proj" in params:
        spec["loc_proj"] = {"w": P(), "b": P()}
    return spec


def param_shardings(params: dict, mesh: Mesh) -> Any:
    """NamedShardings from param_specs, dropping any spec whose dimension does not
    divide the mesh axis (e.g. an odd test vocab over mp=2) back to replicated."""

    def fit(param, spec: P) -> NamedSharding:
        ok = all(
            axis is None or param.shape[dim] % mesh.shape[axis] == 0
            for dim, axis in enumerate(spec)
        )
        return NamedSharding(mesh, spec if ok else P())

    return jax.tree.map(
        fit, params, param_specs(params),
        is_leaf=lambda x: isinstance(x, P),
    )


def multihost_put(tree: Any, shardings: Any) -> Any:
    """Place HOST-IDENTICAL values onto a global mesh without cross-host
    transfers: every process materializes its own addressable shards from its
    local copy via ``jax.make_array_from_callback``. A plain ``device_put``
    would try to copy the origin process's buffer to other hosts' devices,
    which backends without a DCN transfer service (CPU; TPU without the
    cross-host-transfer flags) reject — the exact failure the true
    multi-process test caught live (tests/test_multiprocess.py). Only valid
    when every process holds the same value (deterministic same-seed init,
    restored checkpoints, replicated eval params)."""

    def put(x, s):
        arr = np.asarray(x)
        return jax.make_array_from_callback(arr.shape, s, lambda idx, a=arr: a[idx])

    return jax.tree.map(put, tree, shardings)


def shard_params(params: dict, mesh: Mesh) -> dict:
    shardings = param_shardings(params, mesh)
    if jax.process_count() > 1:
        return multihost_put(params, shardings)
    return jax.device_put(params, shardings)
