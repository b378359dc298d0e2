"""Fused training-path memory reconstruction: forward + custom-VJP parity.

Oracle: a plain f32 XLA implementation of the reference train branch
(memory_module.py:37-49 — softmax addressing, hard shrinkage, L1 renorm,
reconstruction), differentiated by jax.grad. The Pallas kernel (interpret
mode on CPU) must match both the forward and the hand-derived backward at
bf16-matmul-rounding tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hvpr_tpu.ops.memory_recon import memory_recon


def _oracle(rows, weight, lam, bf16_logits=False):
    """f32-exact reference chain (optionally bf16-rounded logits: a lam far
    above the softmax scale turns shrinkage into a discrete selection, where
    borderline entries flip with logit rounding — matching the kernel's
    matmul precision isolates the shrink/renorm math under test)."""
    if bf16_logits:
        l = jnp.dot(rows.astype(jnp.bfloat16), weight.astype(jnp.bfloat16).T,
                    preferred_element_type=jnp.float32)
    else:
        l = rows @ weight.T
    att = jax.nn.softmax(l, axis=-1)
    if lam > 0:
        u = att - lam
        att = jnp.maximum(u, 0.0) * att / (jnp.abs(u) + 1e-12)
        att = att / jnp.clip(att.sum(axis=-1, keepdims=True), 1e-12, None)
    return att @ weight


def _data(r=300, m=97, c=33, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    rows = jnp.asarray(rng.standard_normal((r, c)) * scale, jnp.float32)
    w = jnp.asarray(rng.standard_normal((m, c)) / np.sqrt(c), jnp.float32)
    return rows, w


@pytest.mark.parametrize('lam', [0.0, 0.0025, 0.05])
def test_forward_parity(lam):
    rows, w = _data()
    # lam=0.05 >> 1/M: near-total shrinkage makes survival a discrete
    # selection on the logits — compare at the kernel's logit precision
    want = np.asarray(_oracle(rows, w, lam, bf16_logits=lam > 0.01))
    got = np.asarray(memory_recon(rows, w, shrink_thres=lam, block_rows=128,
                                  interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize('lam', [0.0, 0.0025])
def test_grad_parity(lam):
    rows, w = _data(r=260, m=64, c=16, seed=3)

    def loss_oracle(rows, w):
        # a non-uniform cotangent so dW's two terms are both exercised
        y = _oracle(rows, w, lam)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.1))

    def loss_kernel(rows, w):
        y = memory_recon(rows, w, shrink_thres=lam, block_rows=128,
                         interpret=True)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape) * 0.1))

    dr_o, dw_o = jax.grad(loss_oracle, argnums=(0, 1))(rows, w)
    dr_k, dw_k = jax.grad(loss_kernel, argnums=(0, 1))(rows, w)
    # gradients are O(1); bf16 matmul rounding bounds the mismatch
    np.testing.assert_allclose(np.asarray(dr_k), np.asarray(dr_o),
                               rtol=5e-2, atol=5e-2)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_o),
                               rtol=5e-2, atol=5e-2)


def test_grad_multi_block_accumulation():
    """dW must accumulate across row blocks (grid > 1), not overwrite."""
    rows, w = _data(r=384, m=32, c=8, seed=7)

    def loss(fn):
        return lambda rows, w: jnp.sum(fn(rows, w) ** 2)

    kern = loss(lambda r_, w_: memory_recon(r_, w_, shrink_thres=0.0025,
                                            block_rows=128, interpret=True))
    orac = loss(lambda r_, w_: _oracle(r_, w_, 0.0025))
    dw_k = jax.grad(kern, argnums=1)(rows, w)
    dw_o = jax.grad(orac, argnums=1)(rows, w)
    np.testing.assert_allclose(np.asarray(dw_k), np.asarray(dw_o),
                               rtol=5e-2, atol=5e-2)


def test_nondividing_rows_and_padding():
    """Row counts not divisible by block_rows pad with zero rows; padded rows
    must not leak into dW."""
    rows, w = _data(r=130, m=40, c=12, seed=5)

    y = memory_recon(rows, w, shrink_thres=0.0025, block_rows=128,
                     interpret=True)
    assert y.shape == (130, 12)
    want = np.asarray(_oracle(rows, w, 0.0025))
    np.testing.assert_allclose(np.asarray(y), want, rtol=2e-2, atol=2e-2)

    dw_pad = jax.grad(lambda w_: jnp.sum(
        memory_recon(rows, w_, shrink_thres=0.0025, block_rows=128,
                     interpret=True)))(w)
    dw_ref = jax.grad(lambda w_: jnp.sum(_oracle(rows, w_, 0.0025)))(w)
    np.testing.assert_allclose(np.asarray(dw_pad), np.asarray(dw_ref),
                               rtol=5e-2, atol=5e-2)


def test_xla_fallback_matches_kernel():
    """Non-TPU backend (no interpret): the XLA reference path is used and
    matches the kernel's semantics."""
    rows, w = _data(r=64, m=48, c=24, seed=9)
    xla = memory_recon(rows, w, shrink_thres=0.0025)          # CPU -> XLA path
    kern = memory_recon(rows, w, shrink_thres=0.0025, block_rows=64,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(xla), np.asarray(kern),
                               rtol=2e-2, atol=2e-2)
