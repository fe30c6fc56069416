"""ResNet backbone with frozen BatchNorm, TPU-first.

Re-implements the reference backbone (models/backbone.py:16-93: torchvision ResNet with
FrozenBatchNorm2d and ``replace_stride_with_dilation=[False, False, dilation]``) as pure
JAX functions:

- FrozenBatchNorm is inference-affine only (``x*scale + bias``; models/backbone.py:41-51,
  eps=1e-5 added before rsqrt). We fold it to per-channel (scale, bias) **once at
  init/import time**, so under jit each BN is a fused multiply-add that XLA folds into
  the surrounding conv — there is no batch-norm op anywhere in the compiled graph.
- Dilation semantics match torchvision exactly: with dilation enabled, layer4's stride
  moves into dilation (first block: stride 1, dilation 1; later blocks dilation 2),
  giving output stride 16 → a 14×14 map for 224×224 inputs (SURVEY.md §3.1).
- Only the ``layer4 -> '0'`` output of the reference's IntermediateLayerGetter is
  produced (models/backbone.py:62-65); intermediate feature maps are a config away if
  ever needed.
- The image padding mask is downsampled with the same nearest-neighbour rule as
  torch F.interpolate (models/backbone.py:75).

Params mirror torchvision state_dict naming so `import_torch_state_dict` is a direct
name map.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, List, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from retr_tpu.masking import Masked, downsample_mask_nearest
from retr_tpu.precision import matmul_precision

Params = Dict[str, Any]

# torchvision layer specs: name -> (block_type, [blocks per stage])
RESNET_SPECS = {
    "ResNet18": ("basic", [2, 2, 2, 2]),
    "ResNet34": ("basic", [3, 4, 6, 3]),
    "ResNet50": ("bottleneck", [3, 4, 6, 3]),
    "ResNet101": ("bottleneck", [3, 4, 23, 3]),
}

BN_EPS = 1e-5  # reference adds eps before rsqrt (models/backbone.py:48-49)


# ---------------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------------


def _kaiming_normal_conv(key, shape, dtype=jnp.float32):
    """torchvision conv init: kaiming_normal_(mode='fan_out', nonlinearity='relu').

    shape is OIHW; fan_out = O * kh * kw.
    """
    o, i, kh, kw = shape
    std = math.sqrt(2.0 / (o * kh * kw))
    return std * jax.random.normal(key, shape, dtype)


def _frozen_bn_identity(n, dtype=jnp.float32) -> Params:
    """Folded (scale, bias) for a fresh FrozenBatchNorm2d (w=1, b=0, rm=0, rv=1)."""
    scale = jnp.full((n,), 1.0 / math.sqrt(1.0 + BN_EPS), dtype)
    return {"scale": scale, "bias": jnp.zeros((n,), dtype)}


def fold_bn(weight, bias, running_mean, running_var) -> Params:
    """Fold BN stats into (scale, bias), replicating models/backbone.py:41-51."""
    weight, bias, running_mean, running_var = (
        jnp.asarray(x, jnp.float32) for x in (weight, bias, running_mean, running_var)
    )
    scale = weight * jax.lax.rsqrt(running_var + BN_EPS)
    return {"scale": scale, "bias": bias - running_mean * scale}


def _bottleneck_init(key, inplanes, planes, stride, dilation, has_downsample, dtype):
    ks = jax.random.split(key, 4)
    p: Params = {
        "conv1": {"w": _kaiming_normal_conv(ks[0], (planes, inplanes, 1, 1), dtype)},
        "bn1": _frozen_bn_identity(planes, dtype),
        "conv2": {"w": _kaiming_normal_conv(ks[1], (planes, planes, 3, 3), dtype)},
        "bn2": _frozen_bn_identity(planes, dtype),
        "conv3": {"w": _kaiming_normal_conv(ks[2], (planes * 4, planes, 1, 1), dtype)},
        "bn3": _frozen_bn_identity(planes * 4, dtype),
    }
    if has_downsample:
        p["downsample"] = {
            "conv": {"w": _kaiming_normal_conv(ks[3], (planes * 4, inplanes, 1, 1), dtype)},
            "bn": _frozen_bn_identity(planes * 4, dtype),
        }
    return p


def _basic_init(key, inplanes, planes, stride, dilation, has_downsample, dtype):
    ks = jax.random.split(key, 3)
    p: Params = {
        "conv1": {"w": _kaiming_normal_conv(ks[0], (planes, inplanes, 3, 3), dtype)},
        "bn1": _frozen_bn_identity(planes, dtype),
        "conv2": {"w": _kaiming_normal_conv(ks[1], (planes, planes, 3, 3), dtype)},
        "bn2": _frozen_bn_identity(planes, dtype),
    }
    if has_downsample:
        p["downsample"] = {
            "conv": {"w": _kaiming_normal_conv(ks[2], (planes, inplanes, 1, 1), dtype)},
            "bn": _frozen_bn_identity(planes, dtype),
        }
    return p


def resnet_structure(name: str, dilation: bool):
    """Static (stride, dilation, has_downsample) plan per block, torchvision semantics."""
    block_type, blocks = RESNET_SPECS[name]
    expansion = 4 if block_type == "bottleneck" else 1
    plan: List[List[Tuple[int, int, bool]]] = []
    inplanes = 64
    cur_dilation = 1
    for stage, (planes, nblocks) in enumerate(zip([64, 128, 256, 512], blocks)):
        stride = 1 if stage == 0 else 2
        dilate = dilation and stage == 3  # replace_stride_with_dilation=[F, F, dilation]
        previous_dilation = cur_dilation
        if dilate:
            cur_dilation *= stride
            stride = 1
        stage_plan = []
        has_ds = stride != 1 or inplanes != planes * expansion
        stage_plan.append((stride, previous_dilation, has_ds))
        inplanes = planes * expansion
        for _ in range(1, nblocks):
            stage_plan.append((1, cur_dilation, False))
        plan.append(stage_plan)
    return block_type, plan


def init(key, name: str = "ResNet101", dilation: bool = True, dtype=jnp.float32) -> Params:
    block_type, plan = resnet_structure(name, dilation)
    block_init = _bottleneck_init if block_type == "bottleneck" else _basic_init
    expansion = 4 if block_type == "bottleneck" else 1

    k0, *stage_keys = jax.random.split(key, 5)
    params: Params = {
        "conv1": {"w": _kaiming_normal_conv(k0, (64, 3, 7, 7), dtype)},
        "bn1": _frozen_bn_identity(64, dtype),
    }
    inplanes = 64
    for stage, (planes, stage_plan) in enumerate(zip([64, 128, 256, 512], plan)):
        bkeys = jax.random.split(stage_keys[stage], len(stage_plan))
        blocks = []
        for bkey, (stride, dil, has_ds) in zip(bkeys, stage_plan):
            blocks.append(block_init(bkey, inplanes, planes, stride, dil, has_ds, dtype))
            inplanes = planes * expansion
        params[f"layer{stage + 1}"] = blocks
    return params


# ---------------------------------------------------------------------------------
# Apply
# ---------------------------------------------------------------------------------


def _conv(w, x, stride=1, padding=0, dilation=1):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )


def _bn(p, x):
    return x * p["scale"][None, :, None, None] + p["bias"][None, :, None, None]


@jax.custom_vjp
def _max_pool_3x3s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1): pads with -inf.

    Custom VJP: the built-in reduce_window gradient lowers to select_and_scatter,
    which (a) fails to compile in this TPU toolchain even at f32 and (b) has no
    bf16 reverse-mode support anywhere. The backward below is scatter-free —
    nine strided window slices with torch's exact tie-break (ALL gradient to the
    first max in row-major window scan order, matching MaxPool2d's stored-argmax
    backward) — so training runs on TPU and under bf16. Forward pools in f32
    (max is order-preserving; the bf16 round trip is bit-exact)."""
    y = jax.lax.reduce_window(
        x.astype(jnp.float32),
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 1, 3, 3),
        window_strides=(1, 1, 2, 2),
        padding=[(0, 0), (0, 0), (1, 1), (1, 1)],
    )
    return y.astype(x.dtype)


def _pool_slices(xpad, oh, ow):
    """The nine strided 3x3-window views of the (-inf padded) input, in row-major
    window scan order — slice (di, dj) holds window element (di, dj) for every
    output position."""
    return [
        jax.lax.slice(
            xpad, (0, 0, di, dj), (xpad.shape[0], xpad.shape[1], di + 2 * oh - 1, dj + 2 * ow - 1),
            (1, 1, 2, 2),
        )
        for di in range(3)
        for dj in range(3)
    ]


def _max_pool_fwd(x):
    return _max_pool_3x3s2(x), x


def _max_pool_bwd(x, g):
    # Recompute the f32 window max from the slices (the saved forward output may
    # be bf16-rounded, which would break the equality test below).
    n, c, h, w = x.shape
    oh = (h - 1) // 2 + 1
    ow = (w - 1) // 2 + 1
    xpad = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, 0), (1, 1), (1, 1)),
                   constant_values=-jnp.inf)
    slices = _pool_slices(xpad, oh, ow)
    y32 = functools.reduce(jnp.maximum, slices)
    g32 = g.astype(jnp.float32)
    taken = jnp.zeros(y32.shape, bool)
    gpad = jnp.zeros(xpad.shape, jnp.float32)
    for idx, sl in enumerate(slices):
        is_max = jnp.logical_and(sl == y32, ~taken)
        taken = jnp.logical_or(taken, is_max)
        di, dj = idx // 3, idx % 3
        contrib = jnp.where(is_max, g32, 0.0)
        gpad = gpad.at[:, :, di : di + 2 * oh - 1 : 2, dj : dj + 2 * ow - 1 : 2].add(contrib)
    return (gpad[:, :, 1 : 1 + h, 1 : 1 + w].astype(x.dtype),)


_max_pool_3x3s2.defvjp(_max_pool_fwd, _max_pool_bwd)


def _bottleneck_apply(p, x, stride, dilation):
    out = jax.nn.relu(_bn(p["bn1"], _conv(p["conv1"]["w"], x)))
    out = jax.nn.relu(
        _bn(p["bn2"], _conv(p["conv2"]["w"], out, stride=stride, padding=dilation, dilation=dilation))
    )
    out = _bn(p["bn3"], _conv(p["conv3"]["w"], out))
    identity = x
    if "downsample" in p:
        identity = _bn(p["downsample"]["bn"], _conv(p["downsample"]["conv"]["w"], x, stride=stride))
    return jax.nn.relu(out + identity)


def _basic_apply(p, x, stride, dilation):
    out = jax.nn.relu(
        _bn(p["bn1"], _conv(p["conv1"]["w"], x, stride=stride, padding=dilation, dilation=dilation))
    )
    out = _bn(p["bn2"], _conv(p["conv2"]["w"], out, padding=dilation, dilation=dilation))
    identity = x
    if "downsample" in p:
        identity = _bn(p["downsample"]["bn"], _conv(p["downsample"]["conv"]["w"], x, stride=stride))
    return jax.nn.relu(out + identity)


def apply(
    params: Params,
    x: jax.Array,
    *,
    name: str = "ResNet101",
    dilation: bool = True,
    compute_dtype=jnp.float32,
    precision: str = "",
    stop_prefix_gradient: bool = False,
    remat: bool = False,
) -> jax.Array:
    """[B, 3, H, W] image -> [B, C, H/s, W/s] layer4 features (C=2048 for 50/101).

    ``precision`` overrides the conv precision ("highest"/"high"/"default"); empty
    picks the compute_dtype's default discipline (see retr_tpu.precision).

    ``stop_prefix_gradient`` puts a ``stop_gradient`` on the layer1 output. The
    reference freezes the whole prefix below layer2 (conv1/bn1/layer1 get
    requires_grad=False, backbone.py:58-60), and torch autograd therefore prunes
    the entire backward subgraph through the stem — no weight grads there and no
    data grads either, since the image itself needs none. stop_gradient is the
    XLA equivalent: forward values are untouched, and the backward pass skips the
    most activation-heavy stages (112^2x64 and 56^2x256 residuals are neither
    saved nor re-walked). Train steps set it; eval never differentiates.

    ``remat`` (Config.remat) wraps every residual block in ``jax.checkpoint``:
    the backward recomputes each block's internals from its input instead of
    keeping conv activations resident — per-block peak memory instead of
    whole-network, ~1 extra forward of FLOPs on the differentiated stages.
    """
    block_type, plan = resnet_structure(name, dilation)
    block_apply = _bottleneck_apply if block_type == "bottleneck" else _basic_apply
    if remat:
        block_apply = jax.checkpoint(block_apply, static_argnums=(2, 3))

    if compute_dtype != jnp.float32:
        params = jax.tree.map(lambda a: a.astype(compute_dtype), params)


    ctx = (
        jax.default_matmul_precision(precision)
        if precision
        else matmul_precision(compute_dtype)
    )
    with ctx:
        x = x.astype(compute_dtype)
        x = jax.nn.relu(_bn(params["bn1"], _conv(params["conv1"]["w"], x, stride=2, padding=3)))
        x = _max_pool_3x3s2(x)
        for stage in range(4):
            for block_p, (stride, dil, _) in zip(params[f"layer{stage + 1}"], plan[stage]):
                x = block_apply(block_p, x, stride, dil)
            if stage == 0 and stop_prefix_gradient:
                x = jax.lax.stop_gradient(x)
    return x


def backbone_forward(
    params: Params,
    samples: Masked,
    *,
    name: str = "ResNet101",
    dilation: bool = True,
    compute_dtype=jnp.float32,
    precision: str = "",
    stop_prefix_gradient: bool = False,
    remat: bool = False,
) -> Masked:
    """Reference BackboneBase.forward (models/backbone.py:68-77): features + mask
    downsampled (nearest) to the feature-map size."""
    feats = apply(
        params, samples.tensors, name=name, dilation=dilation,
        compute_dtype=compute_dtype, precision=precision,
        stop_prefix_gradient=stop_prefix_gradient, remat=remat,
    )
    mask = downsample_mask_nearest(samples.mask, feats.shape[-2], feats.shape[-1])
    return Masked(feats, mask)


# ---------------------------------------------------------------------------------
# Weight import (torchvision / reference .pth state dicts)
# ---------------------------------------------------------------------------------


def import_torch_state_dict(
    state: Mapping[str, np.ndarray], name: str = "ResNet101", dilation: bool = True, prefix: str = ""
) -> Params:
    """Convert a torchvision-ResNet state_dict (numpy-valued) into our param pytree,
    folding every BatchNorm into (scale, bias). ``prefix`` strips e.g. 'backbone.body.'."""

    def get(k):
        return np.asarray(state[prefix + k])

    def bn(k):
        return fold_bn(get(f"{k}.weight"), get(f"{k}.bias"), get(f"{k}.running_mean"), get(f"{k}.running_var"))

    block_type, plan = resnet_structure(name, dilation)
    params: Params = {"conv1": {"w": jnp.array(get("conv1.weight"), copy=True)}, "bn1": bn("bn1")}
    n_convs = 3 if block_type == "bottleneck" else 2
    for stage in range(4):
        blocks = []
        for bi, (_, _, has_ds) in enumerate(plan[stage]):
            base = f"layer{stage + 1}.{bi}"
            bp: Params = {}
            for ci in range(1, n_convs + 1):
                bp[f"conv{ci}"] = {"w": jnp.array(get(f"{base}.conv{ci}.weight"), copy=True)}
                bp[f"bn{ci}"] = bn(f"{base}.bn{ci}")
            if has_ds:
                bp["downsample"] = {
                    "conv": {"w": jnp.array(get(f"{base}.downsample.0.weight"), copy=True)},
                    "bn": bn(f"{base}.downsample.1"),
                }
            blocks.append(bp)
        params[f"layer{stage + 1}"] = blocks
    return params
