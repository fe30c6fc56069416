"""Device placement: the one place that decides where host-built arrays live.

Fresh param inits must be committed to a concrete device because jit keys its
executable cache on argument placement: checkpoint restores come back committed,
and a mixed committed/uncommitted population makes otherwise-identical programs
recompile (~10 s on the CPU test host, minutes through the TPU remote-compile
service — docs/ROADMAP.md gotchas).

The commit targets ``jax.local_devices()[0]``, NOT ``jax.devices()[0]``: under a
multi-process (multi-host) launch the global device list is ordered by process,
so on every process other than 0 ``jax.devices()[0]`` is a *remote, non-
addressable* device and ``device_put`` raises at init. The reference never hits
this (it is strictly single-device, SURVEY.md §2.2); the multi-host path is a
north-star extension (docs/MULTIHOST.md). On single-process runs the two lists
are identical, so behavior is unchanged.
"""

from __future__ import annotations

import jax


def default_local_device() -> jax.Device:
    """First device addressable from THIS process (== jax.devices()[0] when
    single-process)."""
    return jax.local_devices()[0]


def commit_to_local_device(tree):
    """Commit every array leaf of ``tree`` to the default local device."""
    dev = default_local_device()
    return jax.tree.map(lambda x: jax.device_put(x, dev), tree)


def is_sharded_tree(tree) -> bool:
    """True if ANY array leaf of ``tree`` spans more than one device.

    This is the framework's sharding signal for placement normalization: a tree
    with even one multi-device leaf is treated as deliberately mesh-placed and
    must NOT be re-collapsed onto the local device (see
    ``train.state.create_train_state``). The converse heuristic is intentional
    too: a tree whose leaves are each single-device — even if they sit on
    *different* single devices (a state no framework code path produces) — is
    treated as unplaced host data and normalized onto ``local_devices()[0]``.
    Callers constructing mixed trees on purpose should place them on a Mesh
    before handing them over. Non-array leaves (no ``.devices``) count as
    unplaced.
    """
    for leaf in jax.tree.leaves(tree):
        if len(getattr(leaf, "devices", lambda: [None])()) > 1:
            return True
    return False
