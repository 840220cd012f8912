import jax
import jax.numpy as jnp
import numpy as np
import torch

from diffusion_image_editing_tpu.ops.attention import (
    _flash_attention_fwd_impl,
    attention,
    attention_reference,
)


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype=jnp.float32)


def test_reference_matches_torch_sdpa():
    b, s, h, d = 2, 64, 4, 32
    q, k, v = _rand(0, (b, s, h, d)), _rand(1, (b, s, h, d)), _rand(2, (b, s, h, d))
    out = attention_reference(q, k, v)
    tq = torch.tensor(np.asarray(q)).permute(0, 2, 1, 3)
    tk = torch.tensor(np.asarray(k)).permute(0, 2, 1, 3)
    tv = torch.tensor(np.asarray(v)).permute(0, 2, 1, 3)
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv)
    ref = ref.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_causal_matches_torch():
    b, s, h, d = 1, 16, 2, 8
    q, k, v = _rand(3, (b, s, h, d)), _rand(4, (b, s, h, d)), _rand(5, (b, s, h, d))
    out = attention(q, k, v, causal=True)
    tq = torch.tensor(np.asarray(q)).permute(0, 2, 1, 3)
    tk = torch.tensor(np.asarray(k)).permute(0, 2, 1, 3)
    tv = torch.tensor(np.asarray(v)).permute(0, 2, 1, 3)
    ref = torch.nn.functional.scaled_dot_product_attention(tq, tk, tv, is_causal=True)
    ref = ref.permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-5)


def test_flash_kernel_interpret_matches_reference():
    b, s, h, d = 1, 256, 2, 40  # d=40 exercises lane padding (SD head dim)
    q, k, v = _rand(6, (b, s, h, d)), _rand(7, (b, s, h, d)), _rand(8, (b, s, h, d))
    scale = d**-0.5
    out = _flash_attention_fwd_impl(q, k, v, scale, interpret=True)
    ref = attention_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_attention_grads_flow():
    b, s, h, d = 1, 32, 1, 16
    q, k, v = _rand(9, (b, s, h, d)), _rand(10, (b, s, h, d)), _rand(11, (b, s, h, d))

    def f(q_):
        return jnp.sum(attention(q_, k, v, use_pallas=False) ** 2)

    g = jax.grad(f)(q)
    g_ref = jax.grad(lambda q_: jnp.sum(attention_reference(q_, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
