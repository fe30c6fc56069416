"""Device-side input pipeline: one jit from uint8 batch to model-ready tensors.

The reference runs ColorJitter/ToTensor/Normalize per sample in Python worker
processes (data_utils/refcoco.py:28-46). Here the uint8 batch is uploaded once and a
single jit does augmentation + normalization for the whole batch on-device, fusing
with nothing in between — the output feeds straight into the backbone conv.

Order matches the reference transform stack (refcoco.py:147-152): resize (host,
PIL-exact) -> ColorJitter (train only) -> ToTensor+Normalize.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from retr_tpu.data.dataset import HostBatch
from retr_tpu.ops import image as imops
from retr_tpu.train.state import Batch


@partial(jax.jit, static_argnames=("train",))
def _finish_images(img_u8: jax.Array, key: Optional[jax.Array], train: bool) -> jax.Array:
    """[B, S, S, 3] uint8 -> [B, 3, S, S] f32 normalized (+ jitter when training)."""
    x = img_u8.astype(jnp.float32)
    if train:
        keys = jax.random.split(key, x.shape[0])
        x = jax.vmap(imops.color_jitter)(x, keys)
    mean = jnp.asarray(imops.IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(imops.IMAGENET_STD, jnp.float32)
    x = (x / 255.0 - mean) / std
    return jnp.moveaxis(x, -1, 1)


def device_batch(host: HostBatch, *, train: bool = False, key: Optional[jax.Array] = None) -> Batch:
    """HostBatch (numpy, uint8) -> train.state.Batch (device, normalized f32)."""
    if train and key is None:
        raise ValueError("training pipeline needs a PRNG key for augmentation")
    k_t = k_c = None
    if train:
        k_t, k_c = jax.random.split(key)
    images = _finish_images(jnp.asarray(host.target_images), k_t, train)
    g_images = None
    if host.context_images is not None:
        g_images = _finish_images(jnp.asarray(host.context_images), k_c, train)
    return Batch(
        images=images,
        image_masks=jnp.asarray(host.target_masks),
        caps=jnp.asarray(host.caps),
        cap_masks=jnp.asarray(host.cap_masks),
        global_images=g_images,
        global_masks=jnp.asarray(host.context_masks) if host.context_masks is not None else None,
        loc_feats=jnp.asarray(host.loc_feats) if host.loc_feats is not None else None,
    )
