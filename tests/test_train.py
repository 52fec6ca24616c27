import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomnas_tpu.config import (
    BlockSetting,
    DataConfig,
    MeshConfig,
    ModelConfig,
    OptimConfig,
    SearchConfig,
)
from atomnas_tpu.models import forward, init_masks, init_params, supernet_arch
from atomnas_tpu.parallel import mesh as meshlib
from atomnas_tpu.search.penalty import penalty_term, penalty_weights
from atomnas_tpu.train import losses, lr as lrlib
from atomnas_tpu.train.optim import make_optimizer, weight_decay_mask
from atomnas_tpu.train.state import create_train_state
from atomnas_tpu.train.step import make_eval_step, make_train_step, mixup

TINY_SETTING = (
    BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
    BlockSetting(t=2, c=16, n=2, s=2),
    BlockSetting(t=2, c=24, n=1, s=2),
)


def make_setup(se=0.0, act="relu6", mixup_alpha=0.0, search=True):
    mcfg = ModelConfig(
        num_classes=10,
        input_size=16,
        stem_channels=8,
        head_channels=32,
        compute_dtype="float32",
        dropout=0.0,
        se_ratio=se,
        active_fn=act,
        inverted_residual_setting=TINY_SETTING,
    )
    ocfg = OptimConfig(
        base_lr=0.1, base_batch=16, warmup_epochs=0.0, epochs=2, ema_decay=0.99
    )
    scfg = SearchConfig(enabled=search, penalty=1e-3, prune_threshold=0.05)
    dcfg = DataConfig(num_classes=10, image_size=16, batch_size=16, mixup_alpha=mixup_alpha)
    arch = supernet_arch(mcfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    schedule = lrlib.make_schedule(ocfg, dcfg.batch_size, total_steps=20, steps_per_epoch=10)
    tx = make_optimizer(ocfg, schedule)
    state = create_train_state(params, stats, masks, tx)
    pw, _ = penalty_weights(arch, mcfg.input_size)
    step = make_train_step(arch, ocfg, scfg, dcfg, tx, schedule, pw, mcfg.input_size)
    return arch, mcfg, state, step, tx


def make_batch(key, n=16, size=16, classes=10):
    kx, ky = jax.random.split(jax.random.key(key))
    return {
        "image": jax.random.normal(kx, (n, size, size, 3)),
        "label": jax.random.randint(ky, (n,), 0, classes),
    }


def test_lr_schedule_shapes():
    ocfg = OptimConfig(base_lr=0.5, base_batch=1024, warmup_epochs=5, lr_schedule="cosine")
    sched = lrlib.make_schedule(ocfg, 2048, total_steps=1000, steps_per_epoch=10)
    assert float(sched(0)) == 0.0
    assert float(sched(50)) == pytest.approx(1.0, rel=1e-5)  # peak = 0.5 * 2048/1024
    assert float(sched(1000)) == pytest.approx(0.0, abs=1e-6)
    assert float(sched(25)) == pytest.approx(0.5, rel=1e-5)  # mid-warmup
    lin = lrlib.make_schedule(
        dataclasses.replace(ocfg, lr_schedule="linear"), 1024, 1000, 10
    )
    assert float(lin(525)) == pytest.approx(0.25, rel=1e-4)


def test_weight_decay_mask():
    arch = supernet_arch(
        ModelConfig(
            num_classes=10, input_size=16, stem_channels=8, head_channels=32,
            se_ratio=0.25, inverted_residual_setting=TINY_SETTING,
        )
    )
    params, _ = init_params(jax.random.key(0), arch)
    mask = weight_decay_mask(params)
    assert mask["stem"]["w"] is True
    assert mask["stem"]["bn"]["scale"] is False
    b = mask["blocks"][1]
    assert b["pw1"] is True and b["pw2"] is True
    assert all(v is False for v in b["dw"].values())  # depthwise excluded
    assert b["bn2"]["scale"] is False and b["bn2"]["bias"] is False
    assert b["se"]["k3"]["w1"] is True and b["se"]["k3"]["b1"] is False
    assert mask["classifier"]["w"] is True and mask["classifier"]["b"] is False


def test_penalty_weights_and_term():
    mcfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        inverted_residual_setting=TINY_SETTING,
    )
    arch = supernet_arch(mcfg)
    pw, norm = penalty_weights(arch, 16)
    # non-searchable block 0 gets zero weights
    assert np.all(pw["block_0"] == 0)
    # normalized to mean 1 over searchable atoms
    allw = np.concatenate([pw[f"block_{i}"] for i in (1, 2, 3)])
    assert allw.mean() == pytest.approx(1.0, rel=1e-6)
    # term: rho * sum w*|gamma| with all-ones masks and gamma=1 everywhere
    params, _ = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    term = penalty_term(params, masks, {k: jnp.asarray(v) for k, v in pw.items()}, 1e-3)
    assert float(term) == pytest.approx(1e-3 * allw.sum(), rel=1e-5)
    # gradient wrt gamma is rho * w * sign(gamma) * mask
    g = jax.grad(
        lambda p: penalty_term(p, masks, {k: jnp.asarray(v) for k, v in pw.items()}, 1e-3)
    )(params)
    got = np.asarray(g["blocks"][1]["bn2"]["scale"])
    np.testing.assert_allclose(got, 1e-3 * pw["block_1"], rtol=1e-6)


def test_penalty_weights_uniform_ablation():
    """search.flops_weighted=false -> plain (uniform) L1, the paper's
    resource-aware-vs-uniform ablation (SURVEY.md sec 2.1 shrinkage row)."""
    mcfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        inverted_residual_setting=TINY_SETTING,
    )
    arch = supernet_arch(mcfg)
    pw, norm = penalty_weights(arch, 16, flops_weighted=False)
    assert norm == 1.0
    assert np.all(pw["block_0"] == 0)  # non-searchable still excluded
    for i in (1, 2, 3):
        assert np.all(pw[f"block_{i}"] == 1.0)
    # differs from the FLOPs-weighted scheme (which is non-constant)
    fw, _ = penalty_weights(arch, 16)
    assert np.asarray(fw["block_1"]).std() > 0


def test_train_step_learns_and_updates():
    arch, mcfg, state, step, _ = make_setup()
    step = jax.jit(step)
    batch = make_batch(1)
    rng = jax.random.key(42)
    losses_seen = []
    for i in range(8):
        state, metrics = step(state, batch, rng)
        losses_seen.append(float(metrics["loss"]))
    assert int(state.step) == 8
    # overfits a fixed batch: loss must drop
    assert losses_seen[-1] < losses_seen[0]
    assert 0.0 <= float(metrics["top1"]) <= 1.0
    assert float(metrics["live_mflops"]) > 0
    # EMA differs from params but tracks them
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state.ema_params)
    assert max(jax.tree.leaves(d)) > 0


def test_masked_atoms_get_no_gradient_and_stay_dead():
    arch, mcfg, state, step, _ = make_setup()
    masks = dict(state.masks)
    masks["block_1"] = masks["block_1"].at[:8].set(0.0)
    state = state.replace(masks=masks)
    step = jax.jit(step)
    batch = make_batch(2)
    p0 = jax.device_get(state.params["blocks"][1])
    for _ in range(3):
        state, _ = step(state, batch, jax.random.key(0))
    p1 = jax.device_get(state.params["blocks"][1])
    # dead atoms' bn2 gamma/beta frozen (no loss grad, no WD on BN)
    np.testing.assert_array_equal(p0["bn2"]["scale"][:8], p1["bn2"]["scale"][:8])
    np.testing.assert_array_equal(p0["bn2"]["bias"][:8], p1["bn2"]["bias"][:8])
    # alive atoms did move
    assert not np.allclose(p0["bn2"]["scale"][8:], p1["bn2"]["scale"][8:])
    # dead pw2 rows only shrink via weight decay (toward zero), never grow
    assert np.all(np.abs(p1["pw2"][:8, :]) <= np.abs(p0["pw2"][:8, :]) + 1e-12)


def test_mixup():
    imgs = jnp.stack([jnp.zeros((4, 4, 3)), jnp.ones((4, 4, 3))])
    targets = jnp.eye(2)
    mixed, t = mixup(jax.random.key(0), imgs, targets, alpha=0.2)
    lam = float(t[0, 0])
    assert 0.5 <= lam <= 1.0
    np.testing.assert_allclose(float(mixed[0].mean()), 1.0 - lam, rtol=1e-5)
    np.testing.assert_allclose(t[1, 1], lam, rtol=1e-5)


def test_mixup_shard_local_grouping():
    """groups=g reverses within each contiguous segment of n/g examples —
    the pairing every data shard can perform locally."""
    n, g = 8, 4
    imgs = jnp.arange(n, dtype=jnp.float32)[:, None, None, None] * jnp.ones(
        (n, 2, 2, 3)
    )
    targets = jnp.eye(n)
    mixed, t = mixup(jax.random.key(1), imgs, targets, alpha=0.2, groups=g)
    lam = float(jnp.max(t[0]))
    # example 0's partner is example 1 (its segment reversed), NOT n-1
    np.testing.assert_allclose(
        float(mixed[0].mean()), lam * 0.0 + (1 - lam) * 1.0, rtol=1e-5
    )
    np.testing.assert_allclose(float(t[0, 1]), 1 - lam, rtol=1e-5)
    assert float(t[0, n - 1]) == 0.0
    # mixing weights always sum to 1
    np.testing.assert_allclose(np.asarray(t.sum(axis=1)), 1.0, rtol=1e-5)


@pytest.mark.slow  # 15 s r4; compile-only HLO invariant
def test_mixup_step_has_no_cross_chip_permute():
    """With shard-local pairing, the compiled train step on the 8-device
    data mesh must contain NO collective-permute (a whole-batch jnp.flip
    would permute the entire image batch across chips every step —
    measured in scripts/scaling_projection.py)."""
    arch, mcfg, state, _, tx = make_setup(mixup_alpha=0.2)
    ocfg = OptimConfig(base_lr=0.1, base_batch=16, warmup_epochs=0.0,
                       epochs=2, ema_decay=0.99)
    scfg = SearchConfig(enabled=True, penalty=1e-3, prune_threshold=0.05)
    dcfg = DataConfig(num_classes=10, image_size=16, batch_size=16,
                      mixup_alpha=0.2)
    schedule = lrlib.make_schedule(ocfg, 16, total_steps=20, steps_per_epoch=10)
    pw, _ = penalty_weights(arch, mcfg.input_size)
    mesh = meshlib.make_mesh(MeshConfig(data=8, model=1))
    state = meshlib.place_state(mesh, state)
    batch = make_batch(0)
    batch = {k: meshlib.host_put(np.asarray(v), meshlib.batch_sharding(mesh))
             for k, v in batch.items()}
    rng = meshlib.host_put(jax.random.key(0), meshlib.replicated(mesh))
    step = jax.jit(
        make_train_step(arch, ocfg, scfg, dcfg, tx, schedule, pw,
                        mcfg.input_size, data_shards=8),
        donate_argnums=0,
    )
    text = step.lower(state, batch, rng).compile().as_text()
    assert "collective-permute" not in text
    # the gradient/sync-BN all-reduces are still there
    assert "all-reduce" in text


def test_eval_step_counts_with_padding():
    arch, mcfg, state, _, _ = make_setup(search=False)
    ev = jax.jit(make_eval_step(arch))
    batch = make_batch(3)
    batch["valid"] = jnp.array([1.0] * 12 + [0.0] * 4)
    out = ev(state.params, state.batch_stats, state.masks, batch)
    assert float(out["count"]) == 12.0
    assert 0 <= float(out["correct1"]) <= 12
    assert float(out["correct5"]) >= float(out["correct1"])


def test_train_step_on_8_device_mesh_matches_single_device():
    """GSPMD data-parallel step == single-device step on the same global
    batch (gradient all-reduce + sync-BN fall out of the sharding)."""
    arch, mcfg, state, step, _ = make_setup(search=True)
    batch = make_batch(4)
    rng = jax.random.key(7)

    single = jax.jit(step)
    s1, m1 = single(state, batch, rng)

    mesh = meshlib.make_mesh(MeshConfig(data=-1, model=1))
    assert mesh.shape["data"] == 8
    sharded_batch = meshlib.shard_batch(mesh, batch)
    rep = meshlib.replicated(mesh)
    state_r = jax.device_put(state, rep)
    dist = jax.jit(step)
    s2, m2 = dist(state_r, sharded_batch, jax.device_put(rng, rep))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=2e-5)
    # sync-BN: running stats identical across the two executions
    a = np.asarray(s1.batch_stats["blocks"][1]["bn2"]["mean"])
    b = np.asarray(s2.batch_stats["blocks"][1]["bn2"]["mean"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
    pa = np.asarray(s1.params["blocks"][1]["pw2"])
    pb = np.asarray(s2.params["blocks"][1]["pw2"])
    np.testing.assert_allclose(pa, pb, rtol=1e-4, atol=1e-5)


def test_model_axis_sharding_runs():
    """2D mesh (4 data x 2 model): head/classifier sharded on model axis,
    and a full TRAIN step preserves the sharded layout."""
    arch, mcfg, state, step, _ = make_setup(search=False)
    mesh = meshlib.make_mesh(MeshConfig(data=4, model=2))
    shardings = meshlib.param_shardings(mesh, state.params)
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert shardings["classifier"]["w"].spec == P(None, "model")
    params = jax.tree.map(jax.device_put, state.params, shardings)
    batch = meshlib.shard_batch(mesh, make_batch(5))
    ev = jax.jit(make_eval_step(arch))
    out = ev(params, state.batch_stats, state.masks, batch)
    assert float(out["count"]) == 16.0

    rep = meshlib.replicated(mesh)
    state = state.replace(
        params=params,
        ema_params=jax.tree.map(jax.device_put, state.ema_params, shardings),
        batch_stats=jax.device_put(state.batch_stats, rep),
        masks=jax.device_put(state.masks, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        step=jax.device_put(state.step, rep),
        shrink_events=jax.device_put(state.shrink_events, rep),
    )
    new_state, metrics = jax.jit(step)(state, batch, jax.device_put(jax.random.key(0), rep))
    assert np.isfinite(float(metrics["loss"]))
    # the classifier kernel stays model-axis sharded through the update
    spec = new_state.params["classifier"]["w"].sharding.spec
    assert "model" in str(spec)
