"""use_pallas block path == XLA block path (forward, stats, grads)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomnas_tpu.config import BlockSetting, ModelConfig
from atomnas_tpu.models import forward, init_masks, init_params, supernet_arch

TINY = (
    BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
    BlockSetting(t=2, c=16, n=2, s=2),
    BlockSetting(t=2, c=24, n=1, s=2),
)


@pytest.mark.parametrize("se,act", [(0.0, "relu6"), (0.25, "swish")])
@pytest.mark.parametrize("training", [True, False], ids=["train", "eval"])
def test_pallas_block_path_equivalence(se, act, training):
    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0, se_ratio=se, active_fn=act,
        inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    masks = dict(masks)
    masks["block_1"] = masks["block_1"].at[3:9].set(0.0)  # exercise masking
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))

    kw = dict(arch=arch, training=training)
    if training:
        kw["rng"] = jax.random.key(2)
    a, stats_a = forward(params, stats, masks, x, use_pallas=False, **kw)
    b, stats_b = forward(params, stats, masks, x, use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)
    # batch-stats updates agree (bn2 comes from kernel sums in pallas path)
    for i in (1, 2):
        for key in ("bn1", "bn2", "bn3"):
            if key not in stats_a["blocks"][i]:
                continue
            np.testing.assert_allclose(
                np.asarray(stats_a["blocks"][i][key]["mean"]),
                np.asarray(stats_b["blocks"][i][key]["mean"]),
                rtol=1e-4, atol=1e-5, err_msg=f"block{i}/{key}",
            )


@pytest.mark.slow
def test_pallas_block_path_grad_equivalence():
    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0,
        inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    x = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
    y = jax.random.randint(jax.random.key(2), (4,), 0, 10)

    def loss(params, use_pallas):
        logits, _ = forward(
            params, stats, masks, x, arch=arch, training=True,
            rng=jax.random.key(3), use_pallas=use_pallas,
        )
        onehot = jax.nn.one_hot(y, 10)
        return -jnp.mean(jnp.sum(jax.nn.log_softmax(logits) * onehot, -1))

    g_x = jax.grad(lambda p: loss(p, False))(params)
    g_p = jax.grad(lambda p: loss(p, True))(params)
    flat_x, _ = jax.tree_util.tree_flatten_with_path(g_x)
    flat_p, _ = jax.tree_util.tree_flatten_with_path(g_p)
    for (path, a), (_, b) in zip(flat_x, flat_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-5,
            err_msg=jax.tree_util.keystr(path),
        )
