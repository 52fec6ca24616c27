"""Per-k specialized dw-sandwich kernel (ops/pallas/dw_perk.py): exactness
vs the native-kernel-size XLA chain (interpret mode on CPU) and custom-VJP
grad equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomnas_tpu.ops.pallas import dw_perk as DK
from atomnas_tpu.ops.pallas import fused_dw as FD


def chain_k(x, scale, bias, w, stride, act_name, k):
    """Native lax chain for one branch."""
    act = FD._act(act_name)
    h = act(x.astype(jnp.float32) * scale + bias).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        h, w.reshape(k, k, 1, -1).astype(h.dtype), (stride, stride),
        ((k // 2, k // 2), (k // 2, k // 2)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=h.shape[-1],
    )
    y32 = y.astype(jnp.float32)
    return y, jnp.sum(y32, (0, 1, 2)), jnp.sum(y32**2, (0, 1, 2))


@pytest.mark.parametrize("k", [3, 5, 7])
@pytest.mark.parametrize("stride", [1, 2])
def test_perk_exact_vs_chain(k, stride):
    keys = jax.random.split(jax.random.key(k * 10 + stride), 4)
    c = 24
    x = jax.random.normal(keys[0], (2, 11, 13, c), jnp.float32)
    scale = jax.random.uniform(keys[1], (c,), jnp.float32, 0.5, 1.5)
    bias = jax.random.normal(keys[2], (c,), jnp.float32) * 0.1
    w = jax.random.normal(keys[3], (k * k, c), jnp.float32) / k

    y0, s0, q0 = chain_k(x, scale, bias, w, stride, "relu6", k)
    y1, s1, q1 = DK.dw_sandwich_k(x, scale, bias, w, stride, "relu6", k)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(q0), np.asarray(q1), rtol=1e-4)


def test_perk_grad_equivalence():
    k, stride, c = 3, 1, 16
    keys = jax.random.split(jax.random.key(7), 4)
    x = jax.random.normal(keys[0], (2, 8, 8, c), jnp.float32)
    scale = jax.random.uniform(keys[1], (c,), jnp.float32, 0.5, 1.5)
    bias = jax.random.normal(keys[2], (c,), jnp.float32) * 0.1
    w = jax.random.normal(keys[3], (k * k, c), jnp.float32) / k

    def loss_ref(x, scale, bias, w):
        y, s, q = chain_k(x, scale, bias, w, stride, "swish", k)
        return (y.astype(jnp.float32) ** 2).mean() + s.sum() * 1e-3 + q.sum() * 1e-4

    def loss_perk(x, scale, bias, w):
        y, s, q = DK.dw_sandwich_k(x, scale, bias, w, stride, "swish", k)
        return (y.astype(jnp.float32) ** 2).mean() + s.sum() * 1e-3 + q.sum() * 1e-4

    g0 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, bias, w)
    g1 = jax.grad(loss_perk, argnums=(0, 1, 2, 3))(x, scale, bias, w)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_perk_vmem_fallback_matches():
    """Above the VMEM budget the op silently uses the XLA chain — identical
    results either way."""
    k, c = 5, 8
    keys = jax.random.split(jax.random.key(3), 4)
    x = jax.random.normal(keys[0], (1, 10, 10, c), jnp.float32)
    scale = jnp.ones((c,), jnp.float32)
    bias = jnp.zeros((c,), jnp.float32)
    w = jax.random.normal(keys[3], (k * k, c), jnp.float32) / k
    y0, _, _ = DK.dw_sandwich_k(x, scale, bias, w, 1, "relu6", k, True)
    y1, _, _ = DK.dw_sandwich_k(x, scale, bias, w, 1, "relu6", k, False)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)
