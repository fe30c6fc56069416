"""Subprocess worker for the TRUE multi-process training test (VERDICT r4 item 2).

Launched by tests/test_multiprocess.py as N real OS processes that form one JAX
distributed system over CPU devices:

    python tests/mp_worker.py PROC_ID NPROCS COORD_PORT CFG_JSON DEVICES_PER_PROC

- ``jax.distributed.initialize`` connects the processes (process 0 hosts the
  coordinator on 127.0.0.1:COORD_PORT); each process contributes
  DEVICES_PER_PROC virtual CPU devices, so the global device count is
  NPROCS * DEVICES_PER_PROC and ``jax.devices()[i].process_index`` differs
  across processes — the exact topology ``main()``'s multi-host claims
  (per-host sharded loaders, ``global_batch_from_local`` assembly, process-0
  checkpoint-metadata gating, ``validate_multihost_launch``) were only ever
  simulated against before this test.
- Every ``os.replace`` onto retr_metadata.json is recorded to
  ``meta_writes.p{PROC_ID}.log`` beside the config, proving LIVE which process
  wrote checkpoint metadata.
- NPROCS=1 skips distributed init: the same script then produces the
  single-process baseline trajectory the multi-process run must match.
"""

import os
import sys


def main_worker() -> None:
    pid, nprocs = int(sys.argv[1]), int(sys.argv[2])
    port, cfg_path, devices_per_proc = sys.argv[3], sys.argv[4], int(sys.argv[5])

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}"
    )
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    # the axon plugin overrides JAX_PLATFORMS at import (docs/ROADMAP.md gotcha)
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")

    if nprocs > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{port}",
            num_processes=nprocs,
            process_id=pid,
        )
        assert jax.process_count() == nprocs, jax.process_count()
        assert len(jax.devices()) == nprocs * devices_per_proc
        assert len(jax.local_devices()) == devices_per_proc

    from retr_tpu.config import Config

    cfg = Config.from_json(open(cfg_path).read())

    # Record every metadata write with the writing process id: the test asserts
    # process 0 wrote one per epoch and no other process wrote any.
    root = os.path.dirname(os.path.abspath(cfg_path))
    real_replace = os.replace

    def recording_replace(src, dst):
        if os.path.basename(str(dst)) == "retr_metadata.json":
            with open(os.path.join(root, f"meta_writes.p{pid}.log"), "a") as f:
                f.write(str(dst) + "\n")
        return real_replace(src, dst)

    os.replace = recording_replace

    from retr_tpu.main import main

    main(cfg)


if __name__ == "__main__":
    main_worker()
