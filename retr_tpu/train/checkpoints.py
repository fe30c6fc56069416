"""Checkpoint / resume via Orbax, with explicit metadata.

Reference: train_utils/checkpoints.py:4-32 (single torch.save dict of model/optimizer/
scheduler state + epoch/train_loss/val_loss/cider_score) and main.py:69-94 (per-epoch
checkpoints named ``{transformer_type}_{prefix}[_loc][_glob]_checkpoint_{epoch}.pth``;
the resume path exists but is dead code, and eval infers model variant flags from
FILENAME SUBSTRINGS, eval_model.py:49-82).

Here:
- the whole TrainState pytree (params + optimizer state + step) is saved with Orbax;
- the Config itself plus epoch/losses/CIDEr ride along as JSON metadata — no filename
  sniffing: ``load_checkpoint`` rebuilds the right model variant from the embedded
  config (the reference's override-by-filename becomes ``config_from_checkpoint``);
- resume is wired for real: ``latest_checkpoint`` + restore give step-exact
  continuation (the reference declares config.start_epoch but never uses it);
- ``import_reference_checkpoint`` converts a reference ``.pth`` (its
  ``model_state_dict``) into our params for parity evaluation, and
  ``export_reference_checkpoint`` writes our params back out as a reference-format
  ``.pth`` (bit-exact round trip) so models trained here load in the reference.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

from retr_tpu.config import Config
from retr_tpu.train.state import TrainState

METADATA_FILE = "retr_metadata.json"


def checkpoint_name(cfg: Config, epoch: int) -> str:
    """Reference filename template (main.py:69-71), as a directory name."""
    loc = "_loc" if cfg.use_location_features else ""
    glob = "_glob" if cfg.use_global_features else ""
    return f"{cfg.transformer_type}_{cfg.prefix}{loc}{glob}_checkpoint_{epoch}"


def save_checkpoint(
    directory: str,
    state: TrainState,
    cfg: Config,
    *,
    epoch: int,
    train_loss: float = float("nan"),
    val_loss: float = float("nan"),
    cider_score: float = float("nan"),
) -> str:
    import jax
    import orbax.checkpoint as ocp

    os.makedirs(directory, exist_ok=True)
    path = os.path.abspath(os.path.join(directory, checkpoint_name(cfg, epoch)))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)  # collective: every process participates
    meta = {
        "epoch": epoch,
        "step": int(state.step),
        "train_loss": float(train_loss),
        "val_loss": float(val_loss),
        "cider_score": float(cider_score),
        "config": cfg.to_dict(),
    }
    # Metadata is written by process 0 ONLY (multi-host runs share the checkpoint
    # directory, docs/MULTIHOST.md) and atomically: tmp file + os.replace, so a
    # crash mid-write or a concurrent reader can never observe a torn
    # retr_metadata.json — latest_checkpoint gates on this file existing, and
    # read_metadata would otherwise die in json.load on a partial file.
    if jax.process_index() == 0:
        final = os.path.join(path, METADATA_FILE)
        tmp = final + f".tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
    return path


class AsyncSaver:
    """Background checkpoint writer: :meth:`submit` snapshots the TrainState with an
    on-device copy (cheap HBM-to-HBM; safe even though the jit train step DONATES the
    live state buffers — the copy is a fresh buffer the donation can't alias) and
    runs the Orbax save + metadata write on a worker thread, so the epoch loop never
    blocks on device->host fetch, serialization, or disk IO. Orbax's own
    write-to-tmp + atomic-rename makes partially-written checkpoints invisible to
    ``latest_checkpoint``; the metadata file is written by the worker only after the
    Orbax commit, so a checkpoint without metadata never becomes 'latest'.

    Call :meth:`wait` before reading checkpoints back (resume) and at training exit —
    it joins every pending save and re-raises the first worker failure. The reference
    has no equivalent (torch.save inline on the epoch loop, main.py:89-94)."""

    def __init__(self) -> None:
        import threading

        self._threads: list = []
        self._errors: list = []
        self._lock = threading.Lock()

    def submit(self, directory: str, state: TrainState, cfg: Config, **meta: Any) -> None:
        import threading

        import jax

        # bound in-flight snapshots to ONE: join the previous save first, so slow
        # checkpoint storage can never pile up HBM-resident state copies (each is
        # params + optimizer moments, ~3x model size). The save still overlaps the
        # whole epoch between submissions.
        for t in self._threads:
            t.join()
        self._threads.clear()
        # A failed PREVIOUS save aborts training at the next epoch, not hours later
        # at the final wait(): every subsequent epoch would otherwise keep running
        # with no checkpoint durably written (broken path, full disk, ...).
        with self._lock:
            if self._errors:
                raise self._errors[0]

        snapshot = jax.tree.map(
            lambda x: x.copy() if isinstance(x, jax.Array) else x, state
        )

        def run():
            try:
                save_checkpoint(directory, snapshot, cfg, **meta)
            except Exception as e:  # surfaced by wait()
                with self._lock:
                    self._errors.append(e)

        t = threading.Thread(target=run, name="retr-ckpt-save", daemon=True)
        t.start()
        self._threads.append(t)

    def wait(self) -> None:
        for t in self._threads:
            t.join()
        self._threads.clear()
        if self._errors:
            raise self._errors[0]


def read_metadata(path: str) -> Dict[str, Any]:
    with open(os.path.join(path, METADATA_FILE)) as f:
        return json.load(f)


def config_from_checkpoint(path: str) -> Config:
    """The sane replacement for the reference's filename sniffing
    (eval_model.py:49-82): the config IS in the checkpoint."""
    return Config.from_dict(read_metadata(path)["config"])


def load_checkpoint(path: str, template: TrainState) -> Tuple[TrainState, Dict[str, Any]]:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        state = ckptr.restore(os.path.abspath(path), template)
    return state, read_metadata(path)


def latest_checkpoint(directory: str, cfg: Optional[Config] = None) -> Optional[str]:
    """Highest-epoch checkpoint dir under `directory` (optionally for cfg's name
    pattern)."""
    if not os.path.isdir(directory):
        return None
    pat = re.compile(r"_checkpoint_(\d+)$")
    best, best_epoch = None, -1
    for name in os.listdir(directory):
        m = pat.search(name)
        if not m:
            continue
        if cfg is not None and not name.startswith(checkpoint_name(cfg, 0).rsplit("_", 1)[0]):
            continue
        full = os.path.join(directory, name)
        if os.path.exists(os.path.join(full, METADATA_FILE)) and int(m.group(1)) > best_epoch:
            best, best_epoch = full, int(m.group(1))
    return best


# ---------------------------------------------------------------------------------
# Reference-checkpoint interop
# ---------------------------------------------------------------------------------


def override_config_with_reference_filename(cfg: Config, checkpoint_path: str) -> Config:
    """Compat shim replicating eval_model.py:49-82's filename sniffing for REFERENCE
    .pth files ('loc_checkpoint' / 'loc_glob_checkpoint' substrings)."""
    name = os.path.basename(checkpoint_path)
    if "loc_glob_checkpoint" in name:
        return cfg.replace(use_location_features=True, use_global_features=True)
    if "loc_checkpoint" in name:
        return cfg.replace(use_location_features=True, use_global_features=False)
    return cfg.replace(use_location_features=False, use_global_features=False)


def import_reference_checkpoint(pth_path: str, cfg: Config):
    """Load a reference torch checkpoint's model_state_dict into our params.

    Requires torch on the host (available in this environment); the framework's
    compute path never touches torch.
    """
    import torch

    from retr_tpu.models.torch_import import import_caption_model

    blob = torch.load(pth_path, map_location="cpu", weights_only=False)
    state_dict = blob.get("model_state_dict", blob)
    np_state = {k: v.detach().numpy() for k, v in state_dict.items()}
    return import_caption_model(np_state, cfg), {
        k: blob[k] for k in ("epoch", "train_loss", "val_loss", "cider_score") if k in blob
    }


def export_reference_checkpoint(
    params,
    cfg: Config,
    pth_path: str,
    *,
    epoch: int = 0,
    train_loss: float = float("nan"),
    val_loss: float = float("nan"),
    cider_score: float = float("nan"),
) -> str:
    """Write our params as a reference-format ``.pth`` (train_utils/checkpoints.py:4-15
    dict layout: model_state_dict + epoch/losses/CIDEr; optimizer and scheduler state
    are framework-specific and saved empty — the reference's eval path reads only
    ``model_state_dict``, eval_model.py:27-28).

    The state dict round-trips bit-exactly through ``import_reference_checkpoint``
    (BN folding inverse documented in models/torch_export.py). Requires torch on the
    host; the framework's compute path never touches torch.
    """
    import torch

    from retr_tpu.models.torch_export import export_caption_model

    state_dict = {
        k: torch.from_numpy(v.copy()) for k, v in export_caption_model(params, cfg).items()
    }
    torch.save(
        {
            "epoch": epoch,
            "model_state_dict": state_dict,
            "optimizer_state_dict": {},
            "lr_scheduler_state_dict": {},
            "train_loss": float(train_loss),
            "val_loss": float(val_loss),
            "cider_score": float(cider_score),
        },
        pth_path,
    )
    return pth_path
