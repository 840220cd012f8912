import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusion_image_editing_tpu.ops.groupnorm import (
    group_norm,
    group_norm_pallas,
    group_norm_reference,
)


def _setup(key=0, n=2, h=8, w=8, c=32, groups=4):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    x = jax.random.normal(ks[0], (n, h, w, c), jnp.float32)
    scale = jax.random.normal(ks[1], (c,)) * 0.1 + 1.0
    bias = jax.random.normal(ks[2], (c,)) * 0.1
    return x, scale, bias, groups


def test_reference_matches_torch_groupnorm():
    x, scale, bias, g = _setup()
    out = group_norm_reference(x, scale, bias, g, eps=1e-6, act=None)
    tx = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)  # NCHW
    gn = torch.nn.GroupNorm(g, x.shape[-1], eps=1e-6)
    with torch.no_grad():
        gn.weight.copy_(torch.tensor(np.asarray(scale)))
        gn.bias.copy_(torch.tensor(np.asarray(bias)))
    ref = gn(tx).permute(0, 2, 3, 1).detach().numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_silu_fusion_matches_unfused():
    x, scale, bias, g = _setup(1)
    fused = group_norm_reference(x, scale, bias, g, act="silu")
    unfused = group_norm_reference(x, scale, bias, g, act=None)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(jax.nn.silu(unfused)), rtol=1e-5, atol=1e-6
    )


def test_pallas_interpret_matches_reference():
    x, scale, bias, g = _setup(2, n=2, h=16, w=16, c=128, groups=32)
    out = group_norm_pallas(x, scale, bias, g, act="silu", interpret=True)
    ref = group_norm_reference(x, scale, bias, g, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_custom_vjp_grads_match_autodiff():
    x, scale, bias, g = _setup(3)

    def f_custom(x_, s_, b_):
        return jnp.sum(group_norm(x_, s_, b_, g, act="silu", use_pallas=False) ** 2)

    def f_ref(x_, s_, b_):
        return jnp.sum(group_norm_reference(x_, s_, b_, g, act="silu") ** 2)

    g1 = jax.grad(f_custom, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_single_block_kernel_matches_reference():
    from diffusion_image_editing_tpu.ops.groupnorm import group_norm_single_block

    x, scale, bias, g = _setup(5, n=2, h=8, w=8, c=128, groups=32)
    out = group_norm_single_block(x, scale, bias, g, act="silu", interpret=True)
    ref = group_norm_reference(x, scale, bias, g, act="silu")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)
