"""Fused dw-sandwich kernel: exactness vs the per-branch XLA chain, pallas
(interpret mode) vs reference, and custom-VJP grad equivalence."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomnas_tpu.ops.pallas import fused_dw as FD


def make_inputs(key, n=2, h=12, w=12, c=40, dtype=jnp.float32):
    ks = jax.random.split(jax.random.key(key), 4)
    x = jax.random.normal(ks[0], (n, h, w, c), dtype)
    scale = jax.random.uniform(ks[1], (c,), jnp.float32, 0.5, 1.5)
    bias = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
    return x, scale, bias, ks[3]


def make_branch_weights(key, kernels, hidden):
    dw = {}
    keys = jax.random.split(key, len(kernels))
    for kk, k, h in zip(keys, kernels, hidden):
        dw[f"k{k}"] = jax.random.normal(kk, (k, k, 1, h), jnp.float32) * (1.0 / k)
    return dw


def branch_chain(x, scale, bias, dw, kernels, hidden, stride, act_name):
    """The real per-branch block math (lax convs with native kernel sizes)."""
    act = FD._act(act_name)
    h = act(x.astype(jnp.float32) * scale + bias).astype(x.dtype)
    outs, off = [], 0
    for k, hc in zip(kernels, hidden):
        sl = h[..., off : off + hc]
        outs.append(
            jax.lax.conv_general_dilated(
                sl, dw[f"k{k}"].astype(sl.dtype), (stride, stride),
                ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=hc,
            )
        )
        off += hc
    y = jnp.concatenate(outs, axis=-1)
    y32 = y.astype(jnp.float32)
    return y, jnp.sum(y32, (0, 1, 2)), jnp.sum(y32**2, (0, 1, 2))


KERNELS = (3, 5, 7)
HIDDEN = (16, 16, 8)  # sums to 40


def test_pack_unpack_roundtrip():
    dw = make_branch_weights(jax.random.key(0), KERNELS, HIDDEN)
    w49 = FD.pack_w49(dw, KERNELS)
    assert w49.shape == (49, 40)
    back = FD.unpack_w49_grad(w49, KERNELS, HIDDEN)
    for k in KERNELS:
        np.testing.assert_array_equal(np.asarray(back[f"k{k}"]), np.asarray(dw[f"k{k}"]))


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("act", ["relu6", "swish"])
def test_unified_7x7_equals_per_branch(stride, act):
    """Zero-padding 3x3/5x5 taps to 7x7 must be EXACTLY the per-branch conv
    (same SAME-offsets once centered) — the kernel's core math claim."""
    x, scale, bias, wkey = make_inputs(0)
    dw = make_branch_weights(wkey, KERNELS, HIDDEN)
    w49 = FD.pack_w49(dw, KERNELS)
    y_ref, s_ref, ss_ref = branch_chain(x, scale, bias, dw, KERNELS, HIDDEN, stride, act)
    y, s, ss = FD.ref_sandwich(x, scale, bias, w49, stride=stride, act_name=act)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s_ref), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(ss_ref), rtol=1e-4)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("act", ["relu6", "swish"])
@pytest.mark.parametrize("hw", [(12, 12), (11, 13)])
def test_pallas_matches_ref(stride, act, hw):
    x, scale, bias, wkey = make_inputs(1, h=hw[0], w=hw[1])
    dw = make_branch_weights(wkey, KERNELS, HIDDEN)
    w49 = FD.pack_w49(dw, KERNELS)
    y_r, s_r, ss_r = FD.ref_sandwich(x, scale, bias, w49, stride=stride, act_name=act)
    y_p, s_p, ss_p = FD._pallas_sandwich(
        x, scale, bias, w49, stride=stride, act_name=act, interpret=True
    )
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss_p), np.asarray(ss_r), rtol=1e-4, atol=1e-3)


def test_pallas_multi_tile_channels():
    """C > 128 exercises multiple lane tiles + masked tail (C=150)."""
    kernels, hidden = (3, 5), (100, 50)
    x, scale, bias, wkey = make_inputs(2, c=150, h=8, w=8)
    dw = make_branch_weights(wkey, kernels, hidden)
    w49 = FD.pack_w49(dw, kernels)
    y_r, s_r, ss_r = FD.ref_sandwich(x, scale, bias, w49, stride=1, act_name="relu6")
    y_p, s_p, ss_p = FD._pallas_sandwich(
        x, scale, bias, w49, stride=1, act_name="relu6", interpret=True
    )
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_r), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_r), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(ss_p), np.asarray(ss_r), rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("act", ["relu6", "swish"])
def test_custom_vjp_matches_autodiff(stride, act):
    """Gradients through (y, sum, sumsq) must match jax.grad of the pure-XLA
    reference — the hand-assembled backward's correctness proof."""
    x, scale, bias, wkey = make_inputs(3, h=10, w=10)
    dw = make_branch_weights(wkey, KERNELS, HIDDEN)
    w49 = FD.pack_w49(dw, KERNELS)

    def loss_custom(x, scale, bias, w49):
        y, s, ss = FD.dw_sandwich(x, scale, bias, w49, stride, act, False)
        return (
            jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
            + jnp.sum(s * 0.3)
            + jnp.sum(ss * 0.1)
        )

    def loss_ref(x, scale, bias, w49):
        y, s, ss = FD.ref_sandwich(x, scale, bias, w49, stride=stride, act_name=act)
        return (
            jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))
            + jnp.sum(s * 0.3)
            + jnp.sum(ss * 0.1)
        )

    g_c = jax.grad(loss_custom, argnums=(0, 1, 2, 3))(x, scale, bias, w49)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, scale, bias, w49)
    for a, b, name in zip(g_c, g_r, ("dx", "dscale", "dbias", "dw49")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4, err_msg=name
        )


def test_vjp_through_pallas_forward():
    """Grad path with the pallas forward (interpret) — same answers."""
    x, scale, bias, wkey = make_inputs(4, h=8, w=8)
    dw = make_branch_weights(wkey, KERNELS, HIDDEN)
    w49 = FD.pack_w49(dw, KERNELS)

    def loss(use_pallas):
        def f(x):
            y, s, ss = FD.dw_sandwich(x, scale, bias, w49, 2, "relu6", use_pallas)
            return jnp.sum(y**2) + jnp.sum(s) + 0.01 * jnp.sum(ss)
        return jax.grad(f)(x)

    np.testing.assert_allclose(
        np.asarray(loss(True)), np.asarray(loss(False)), rtol=1e-4, atol=1e-4
    )
