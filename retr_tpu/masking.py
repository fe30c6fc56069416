"""Mask substrate: the (array, mask) pytree that replaces the reference's NestedTensor.

Conventions preserved from the reference (models/utils.py:112-133, data_utils/refcoco.py:123-124):
- masks are boolean with ``True == padded / may-not-attend`` (inverted attention masks);
- images travel as a pair ``(pixels, mask)``;
- the decoder uses an additive float causal mask with 0 on/below the diagonal and
  -inf above (models/utils.py:50-57).

Unlike the reference, the pair is a real JAX pytree (NamedTuple), so it flows through
jit/vmap/pjit unchanged; there are no device-transfer methods because placement is the
runtime's job (shardings), not the datatype's.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class Masked(NamedTuple):
    """An array plus its padding mask (True = pad). JAX pytree."""

    tensors: jax.Array
    mask: jax.Array

    def decompose(self):  # reference-compatible accessor (models/utils.py:129-130)
        return self.tensors, self.mask

    @property
    def shape(self):
        return self.mask.shape


def batch_images(images) -> Masked:
    """Pad a list of [3, H, W] arrays to the per-batch max size -> Masked batch.

    Equivalent of the reference's nested_tensor_from_tensor_list
    (models/utils.py:92-109): zero-pad bottom/right, mask True where padded. The main
    pipeline never needs this (everything is resized to a static 224² — the shapes a
    TPU wants); it exists for reference-API completeness and ad-hoc inference on
    unresized imagery.
    """
    import numpy as np

    imgs = [np.asarray(im) for im in images]
    assert all(im.ndim == 3 for im in imgs), "expected [C, H, W] images"
    c = imgs[0].shape[0]
    h = max(im.shape[1] for im in imgs)
    w = max(im.shape[2] for im in imgs)
    out = np.zeros((len(imgs), c, h, w), imgs[0].dtype)
    mask = np.ones((len(imgs), h, w), bool)
    for i, im in enumerate(imgs):
        out[i, :, : im.shape[1], : im.shape[2]] = im
        mask[i, : im.shape[1], : im.shape[2]] = False
    return Masked(jnp.asarray(out), jnp.asarray(mask))


def causal_mask(sz: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask: 0 where key <= query, -inf above the diagonal.

    Matches models/utils.py:50-57 (generate_square_subsequent_mask).
    """
    i = jnp.arange(sz)[:, None]
    j = jnp.arange(sz)[None, :]
    return jnp.where(j <= i, 0.0, NEG_INF).astype(dtype)


def key_padding_bias(pad_mask: jax.Array, dtype=jnp.float32) -> jax.Array:
    """[B, S] bool (True = pad) -> [B, 1, 1, S] additive bias (0 / -inf).

    The -inf matches torch nn.MultiheadAttention's key_padding_mask handling; a fully
    masked row yields NaN post-softmax in both frameworks (the reference guards the one
    place this can occur via ensure_unmasked_values, models/utils.py:60-89).
    """
    return jnp.where(pad_mask, NEG_INF, 0.0).astype(dtype)[:, None, None, :]


def ensure_unmasked_values(
    mask: jax.Array, key: jax.Array, unmasked_ratio: float = 0.01
) -> jax.Array:
    """Deterministic version of models/utils.py:60-89.

    If a sample's [H, W] context mask is entirely True (target bbox covers the whole
    image → attention over the context stream would be all -inf → NaN), replace it with
    a mask that unmasks ``round(H*W*unmasked_ratio)`` positions chosen by a *threaded
    PRNG key* — the reference samples from module-level numpy RNG inside forward
    (models/utils.py:79-87), which is nondeterministic under jit; here determinism is
    restored by making the key explicit.

    Args:
        mask: [B, H, W] bool, True = masked.
        key: PRNG key; the filler pattern is shared across the batch exactly like the
            reference (it builds one filler_mask and assigns it to every all-True row).
    """
    b, h, w = mask.shape
    flat = mask.reshape(b, -1)
    all_masked = jnp.all(flat, axis=1)  # [B]

    n = flat.shape[1]
    n_unmask = max(1, round(n * unmasked_ratio))
    idx = jax.random.choice(key, n, shape=(n_unmask,), replace=False)
    filler = jnp.ones((n,), dtype=bool).at[idx].set(False)

    out = jnp.where(all_masked[:, None], filler[None, :], flat)
    return out.reshape(b, h, w)


def downsample_mask_nearest(mask: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Nearest-neighbour mask downsample to the feature-map size.

    Matches torch F.interpolate(mode='nearest') as used on the image padding mask after
    the backbone (models/backbone.py:75): source index = floor(dst * src/dst_size).
    """
    h, w = mask.shape[-2], mask.shape[-1]
    rows = jnp.floor(jnp.arange(out_h) * (h / out_h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(out_w) * (w / out_w)).astype(jnp.int32)
    return mask[..., rows, :][..., :, cols]


def combine_masks(*biases: Optional[jax.Array]) -> Optional[jax.Array]:
    """Sum additive attention biases, skipping Nones."""
    out = None
    for b in biases:
        if b is None:
            continue
        out = b if out is None else out + b
    return out
