import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from diffusion_image_editing_tpu.ops.attention import (
    _Plan,
    _flash_attention_fwd_impl,
    _flash_bwd,
    _flash_fwd,
    _plan,
    _round_up,
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


@pytest.mark.parametrize("streaming", [False, True])
@pytest.mark.parametrize(
    "b,s,h,d,block_q,block_k",
    [
        (1, 256, 2, 40, 64, 128),  # SD head_dim 40, 2 k-blocks
        (2, 512, 1, 160, 128, 128),  # 4 k-blocks, multi-batch
        (1, 1024, 1, 512, 256, 256),  # VAE-decoder-like: wide single head
    ],
)
def test_flash_forward_matches_reference(b, s, h, d, block_q, block_k, streaming):
    q, k, v = _rand(20, (b, s, h, d)), _rand(21, (b, s, h, d)), _rand(22, (b, s, h, d))
    scale = d**-0.5
    plan = _Plan(block_q, block_k, _round_up(d, 128), streaming)
    assert s // block_k >= 2  # multi-block online softmax actually exercised
    out, _, lse = _flash_fwd(q, k, v, scale, plan, interpret=True, with_lse=True)
    ref = attention_reference(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)
    # lse must equal logsumexp of the scaled logits rowwise (stats are
    # broadcast over a width-8 lane to satisfy TPU block tiling)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
    ref_lse = jax.scipy.special.logsumexp(logits, axis=-1)  # (b, h, s)
    ref_lse = np.asarray(ref_lse).reshape(b * h, s)
    assert lse.shape == (b * h, s, 8)
    np.testing.assert_allclose(np.asarray(lse[..., 0]), ref_lse, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(lse[..., 7]), ref_lse, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(
    "b,s,h,d,block_q,block_k",
    [
        (1, 256, 2, 40, 64, 128),
        (1, 512, 1, 512, 128, 128),  # VAE-decoder shape class
    ],
)
def test_pallas_backward_matches_reference_grads(b, s, h, d, block_q, block_k):
    q, k, v = _rand(30, (b, s, h, d)), _rand(31, (b, s, h, d)), _rand(32, (b, s, h, d))
    g = _rand(33, (b, s, h, d))
    scale = d**-0.5
    plan = _Plan(block_q, block_k, _round_up(d, 128), True)
    _, out_h, lse = _flash_fwd(q, k, v, scale, plan, interpret=True, with_lse=True)
    dq, dk, dv = _flash_bwd(q, k, v, out_h, lse, g, scale, plan, interpret=True)

    _, vjp = jax.vjp(lambda q_, k_, v_: attention_reference(q_, k_, v_, scale), q, k, v)
    dq_ref, dk_ref, dv_ref = vjp(g)
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), rtol=2e-3, atol=2e-4)


def test_custom_vjp_pallas_path_interpret(monkeypatch):
    """End-to-end: attention() with the Pallas path forced, grads via the
    Pallas backward kernels (interpret mode so it runs on CPU)."""
    monkeypatch.setenv("DIE_TPU_ATTN_INTERPRET", "1")
    monkeypatch.setenv("DIE_TPU_ATTN_BLOCK_Q", "64")
    monkeypatch.setenv("DIE_TPU_ATTN_BLOCK_K", "128")
    b, s, h, d = 1, 256, 2, 40
    q, k, v = _rand(40, (b, s, h, d)), _rand(41, (b, s, h, d)), _rand(42, (b, s, h, d))

    def f(q_, k_, v_):
        return jnp.sum(attention(q_, k_, v_, use_pallas=True) ** 2)

    gq, gk, gv = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    gq_r, gk_r, gv_r = jax.grad(
        lambda q_, k_, v_: jnp.sum(attention_reference(q_, k_, v_) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_r), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gk_r), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(gv_r), rtol=2e-3, atol=2e-4)


def test_ragged_kv_falls_back_to_reference():
    """77-token CLIP cross-attention context must route to the exact path."""
    b, s_q, s_k, h, d = 1, 64, 77, 2, 40
    q = _rand(50, (b, s_q, h, d))
    k, v = _rand(51, (b, s_k, h, d)), _rand(52, (b, s_k, h, d))
    assert _plan(s_q, s_k, d) is None
    out = attention(q, k, v, use_pallas=True)  # must not error
    ref = attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_attention_grads_flow():
    b, s, h, d = 1, 32, 1, 16
    q, k, v = _rand(9, (b, s, h, d)), _rand(10, (b, s, h, d)), _rand(11, (b, s, h, d))

    def f(q_):
        return jnp.sum(attention(q_, k, v, use_pallas=False) ** 2)

    g = jax.grad(f)(q)
    g_ref = jax.grad(lambda q_: jnp.sum(attention_reference(q_, k, v) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)
