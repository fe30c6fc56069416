"""ResNet backbone parity vs the torch oracle (torchvision semantics)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from retr_tpu.models import resnet
from tests.torch_oracle import ResNet as TorchResNet


def state_to_numpy(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def randomize_bn_stats(module, seed=0):
    """Give BN buffers non-trivial values so folding is actually exercised.

    Kept tame (scale ≈ 1) — wildly random BN scales amplify activations
    exponentially through 16+ blocks and drown parity in f32 noise.
    """
    g = torch.Generator().manual_seed(seed)
    for name, buf in module.named_buffers():
        if name.endswith("running_mean"):
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)
        elif name.endswith("running_var"):
            buf.copy_(torch.rand(buf.shape, generator=g) + 0.5)
        elif name.endswith("weight") and buf.dim() == 1:
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.05 + 1.0)
        elif name.endswith("bias") and buf.dim() == 1:
            buf.copy_(torch.randn(buf.shape, generator=g) * 0.1)


@pytest.mark.parametrize(
    "name,dilation",
    [("ResNet18", False), ("ResNet50", True), ("ResNet101", True)],
    # ResNet101+dilation is the reference's default backbone
    # (configuration_template.py:20-22) — checked directly, not just via ResNet50.
)
def test_resnet_parity(name, dilation):
    torch.manual_seed(0)
    tm = TorchResNet(name, dilation=dilation).eval()
    randomize_bn_stats(tm)

    params = resnet.import_torch_state_dict(state_to_numpy(tm), name, dilation)

    x = torch.randn(1, 3, 48, 48)
    with torch.no_grad():
        ref = tm(x).numpy()
    got = np.asarray(resnet.apply(params, jnp.asarray(x.numpy()), name=name, dilation=dilation))

    assert got.shape == ref.shape
    # atol scales with the output magnitude: the randomized BN stats compound
    # activations to ~1e5 through ResNet101's 33 blocks, so the f32 summation-
    # order noise floor is ~2e-6 RELATIVE TO SCALE (measured 1.4e-6); a fixed
    # 1e-4 atol is fine for 18/50 but meaningless at that magnitude.
    scale = float(np.abs(ref).max())
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=max(1e-4, 3e-6 * scale))


def test_dilated_output_stride():
    """dilation=True halves the output stride on layer4: 64px -> 4x4 map (stride 16)."""
    torch.manual_seed(1)
    tm = TorchResNet("ResNet50", dilation=True)
    params = resnet.import_torch_state_dict(state_to_numpy(tm), "ResNet50", True)
    out = resnet.apply(params, jnp.zeros((1, 3, 64, 64)), name="ResNet50", dilation=True)
    assert out.shape == (1, 2048, 4, 4)
    out2 = resnet.apply(
        resnet.import_torch_state_dict(state_to_numpy(TorchResNet("ResNet50", dilation=False)), "ResNet50", False),
        jnp.zeros((1, 3, 64, 64)), name="ResNet50", dilation=False)
    assert out2.shape == (1, 2048, 2, 2)


def test_random_init_shapes_match_import():
    import jax
    init_p = resnet.init(jax.random.key(0), "ResNet18", dilation=False)
    torch_p = resnet.import_torch_state_dict(
        state_to_numpy(TorchResNet("ResNet18", dilation=False)), "ResNet18", False)
    ref_shapes = jax.tree.map(lambda a: a.shape, torch_p)
    got_shapes = jax.tree.map(lambda a: a.shape, init_p)
    assert ref_shapes == got_shapes


def test_mask_downsample_nearest_matches_torch():
    import torch.nn.functional as F
    from retr_tpu.masking import downsample_mask_nearest

    torch.manual_seed(2)
    m = torch.rand(3, 224, 224) > 0.5
    ref = F.interpolate(m[None].float(), size=(14, 14)).to(torch.bool)[0].numpy()
    got = np.asarray(downsample_mask_nearest(jnp.asarray(m.numpy()), 14, 14))
    np.testing.assert_array_equal(got, ref)


def test_maxpool_custom_vjp_matches_torch_including_ties():
    """The pool's custom VJP (resnet._max_pool_3x3s2) must replicate torch
    MaxPool2d's stored-argmax backward: ALL gradient to the FIRST max in
    row-major window order. (The built-in reduce_window VJP lowers to
    select_and_scatter, which this TPU toolchain cannot compile and which has
    no bf16 reverse-mode support — hence the custom rule.)"""
    import jax
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    cases = [
        rng.normal(size=(2, 3, 9, 9)).astype(np.float32),
        np.zeros((2, 3, 8, 8), np.float32),                       # every window ties
        np.round(rng.normal(size=(1, 2, 7, 7))).astype(np.float32),  # frequent ties
    ]
    for x in cases:
        y_j, vjp = jax.vjp(resnet._max_pool_3x3s2, jnp.asarray(x))
        g = rng.normal(size=y_j.shape).astype(np.float32)
        gx = np.asarray(vjp(jnp.asarray(g))[0])
        xt = torch.tensor(x, requires_grad=True)
        y_t = F.max_pool2d(xt, 3, stride=2, padding=1)
        y_t.backward(torch.tensor(g))
        np.testing.assert_array_equal(np.asarray(y_j), y_t.detach().numpy())
        # overlapping windows accumulate in a different order -> 1-ulp tolerance
        np.testing.assert_allclose(gx, xt.grad.numpy(), rtol=2e-7, atol=2e-7)


def test_maxpool_bf16_grad_defined():
    import jax

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 2, 8, 8)), jnp.float32)

    def f(x):
        return jnp.sum(resnet._max_pool_3x3s2(x.astype(jnp.bfloat16)).astype(jnp.float32))

    g = jax.grad(f)(x)
    assert np.isfinite(np.asarray(g)).all()
