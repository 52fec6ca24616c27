import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomnas_tpu.config import BlockSetting, ModelConfig
from atomnas_tpu.models import (
    forward,
    init_masks,
    init_params,
    make_divisible,
    supernet_arch,
)

TINY_SETTING = (
    BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
    BlockSetting(t=2, c=16, n=2, s=2),
    BlockSetting(t=2, c=24, n=1, s=2),
)


def tiny_cfg(**kw):
    defaults = dict(
        num_classes=10,
        input_size=32,
        stem_channels=8,
        head_channels=64,
        compute_dtype="float32",
        dropout=0.0,
        inverted_residual_setting=TINY_SETTING,
    )
    defaults.update(kw)
    return ModelConfig(**defaults)


@pytest.fixture(scope="module")
def tiny():
    cfg = tiny_cfg()
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    return cfg, arch, params, stats, masks


def test_make_divisible():
    assert make_divisible(32 * 1.0) == 32
    assert make_divisible(32 * 0.75) == 24
    assert make_divisible(3, 8) == 8  # never below divisor
    assert make_divisible(91, 8) == 88


def test_arch_structure(tiny):
    _, arch, *_ = tiny
    assert arch.num_blocks == 4
    b0 = arch.blocks[0]
    assert not b0.expand and not b0.searchable and b0.hidden == (8,)
    b1 = arch.blocks[1]
    assert b1.expand and b1.kernels == (3, 5, 7)
    assert b1.hidden == (16, 16, 16)  # t=2 * cin=8 per kernel
    assert b1.splits == (0, 16, 32)
    # repeat block is residual (stride 1, cin == cout)
    assert arch.blocks[2].residual and not arch.blocks[1].residual


def test_forward_shapes_train_and_eval(tiny):
    _, arch, params, stats, masks = tiny
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    logits, new_stats = forward(
        params, stats, masks, x, arch=arch, training=True, rng=jax.random.key(2)
    )
    assert logits.shape == (4, 10)
    assert jnp.all(jnp.isfinite(logits))
    # batch stats must have been updated in train mode
    old = stats["stem"]["bn"]["mean"]
    new = new_stats["stem"]["bn"]["mean"]
    assert not np.allclose(old, new)
    logits_e, same_stats = forward(params, stats, masks, x, arch=arch, training=False)
    assert logits_e.shape == (4, 10)
    np.testing.assert_array_equal(
        same_stats["stem"]["bn"]["mean"], stats["stem"]["bn"]["mean"]
    )


def test_bf16_compute_dtype():
    cfg = tiny_cfg(compute_dtype="bfloat16")
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    logits, _ = forward(params, stats, masks, x, arch=arch, training=False)
    assert jnp.all(jnp.isfinite(logits.astype(jnp.float32)))
    # params stay f32 regardless of compute dtype
    assert params["blocks"][1]["pw2"].dtype == jnp.float32


def test_masked_atom_contributes_nothing(tiny):
    """Zeroing a mask entry must equal never having the atom's output."""
    _, arch, params, stats, masks = tiny
    x = jax.random.normal(jax.random.key(3), (2, 32, 32, 3))
    base, _ = forward(params, stats, masks, x, arch=arch, training=False)

    # kill atom 5 of block 1 both via mask and via zeroing its pw2 row:
    # outputs must be identical (the mask is applied right before pw2).
    m2 = dict(masks)
    m2["block_1"] = masks["block_1"].at[5].set(0.0)
    via_mask, _ = forward(params, stats, m2, x, arch=arch, training=False)

    import copy

    p2 = copy.deepcopy(jax.device_get(params))
    p2["blocks"][1]["pw2"] = np.asarray(p2["blocks"][1]["pw2"]).copy()
    p2["blocks"][1]["pw2"][5, :] = 0.0
    p2 = jax.tree.map(jnp.asarray, p2)
    via_zero_w, _ = forward(p2, stats, masks, x, arch=arch, training=False)

    np.testing.assert_allclose(
        np.asarray(via_mask), np.asarray(via_zero_w), rtol=1e-5, atol=1e-5
    )
    assert not np.allclose(np.asarray(base), np.asarray(via_mask))


def test_dead_residual_block_is_identity(tiny):
    """All atoms masked in a residual block => block output == input exactly."""
    _, arch, params, stats, masks = tiny
    x = jax.random.normal(jax.random.key(4), (2, 32, 32, 3))
    # block 2 is the residual repeat; kill it entirely
    m2 = dict(masks)
    m2["block_2"] = jnp.zeros_like(masks["block_2"])
    dead, _ = forward(params, stats, m2, x, arch=arch, training=False)

    # compare against an arch with block 2 removed (pure identity)
    import dataclasses

    arch_wo = dataclasses.replace(
        arch, blocks=tuple(b for i, b in enumerate(arch.blocks) if i != 2)
    )
    params_wo = dict(params)
    params_wo["blocks"] = [p for i, p in enumerate(params["blocks"]) if i != 2]
    stats_wo = dict(stats)
    stats_wo["blocks"] = [s for i, s in enumerate(stats["blocks"]) if i != 2]
    masks_wo = {
        f"block_{j}": m2[f"block_{i}"]
        for j, i in enumerate([0, 1, 3])
    }
    removed, _ = forward(
        params_wo, stats_wo, masks_wo, x, arch=arch_wo, training=False
    )
    np.testing.assert_allclose(
        np.asarray(dead), np.asarray(removed), rtol=1e-5, atol=1e-6
    )


def test_se_and_swish_variant():
    cfg = tiny_cfg(active_fn="swish", se_ratio=0.25)
    arch = supernet_arch(cfg)
    assert arch.blocks[1].se_hidden[0] >= 1
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    assert "se" in params["blocks"][1]
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    logits, _ = forward(params, stats, masks, x, arch=arch, training=False)
    assert logits.shape == (2, 10)
    assert jnp.all(jnp.isfinite(logits))


def test_se_gate_hygiene_knobs():
    """Round-4 SE fix knobs (layers.squeeze_excite docstring): the logit
    cap bounds gates away from hard 0/1, zero-init starts every gate at
    exactly 0.5, and the decoupled inner act + cap keep masked==removed."""
    import dataclasses

    from atomnas_tpu.models import arch as A

    cfg = tiny_cfg(active_fn="swish", se_ratio=0.25, se_logit_cap=4.0,
                   se_inner_act="relu6", se_zero_init=True)
    arch = supernet_arch(cfg)
    assert arch.se_logit_cap == 4.0 and arch.se_inner_act == "relu6"
    assert arch.se_zero_init

    # serialization round-trips, and OLD json (knobs absent) restores to
    # the original unbounded behavior (checkpoint back-compat)
    assert A.ModelArch.from_json(arch.to_json()) == arch
    import json
    d = json.loads(arch.to_json())
    for k in ("se_logit_cap", "se_inner_act", "se_zero_init"):
        d.pop(k)
    old = A.ModelArch.from_json(json.dumps(d))
    assert old.se_logit_cap == 0.0 and old.se_inner_act == ""
    assert not old.se_zero_init

    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    # zero-init: gate projection is exactly zero => gate == 0.5 => with a
    # plain and a zero-init net sharing weights otherwise, SE scales by 0.5
    assert float(jnp.abs(params["blocks"][1]["se"]["k3"]["w2"]).max()) == 0.0
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    logits, _ = forward(params, stats, masks, x, arch=arch, training=False)
    assert jnp.all(jnp.isfinite(logits))

    # the cap bounds gates into (sigmoid(-cap), sigmoid(cap)) even under
    # adversarially huge gate-projection weights
    from atomnas_tpu.models import layers

    se_p = {
        "w1": jnp.ones((6, 4)) * 50.0, "b1": jnp.zeros((4,)),
        "w2": jnp.ones((4, 6)) * 50.0, "b2": jnp.zeros((6,)),
    }
    big = jnp.ones((2, 3, 3, 6))
    capped = layers.squeeze_excite(big, se_p, layers.relu6, logit_cap=4.0)
    gate = capped / big
    lo, hi = jax.nn.sigmoid(-4.0), jax.nn.sigmoid(4.0)
    assert float(gate.max()) <= float(hi) + 1e-6
    uncapped = layers.squeeze_excite(big, se_p, layers.relu6)
    assert float((uncapped / big).max()) > float(hi)  # would saturate

    # dead residual block is still EXACTLY the identity with cap+inner-act
    # (the full masked==re-sliced SE equivalence is pinned by
    # tests/test_shrink.py's re-slice tests, parametrized over se knobs)
    m3 = dict(masks)
    m3["block_2"] = jnp.zeros_like(masks["block_2"])
    dead, _ = forward(params, stats, m3, x, arch=arch, training=False)
    arch_wo = dataclasses.replace(
        arch, blocks=tuple(b for i, b in enumerate(arch.blocks) if i != 2)
    )
    params_wo = dict(params)
    params_wo["blocks"] = [p for i, p in enumerate(params["blocks"]) if i != 2]
    stats_wo = dict(stats)
    stats_wo["blocks"] = [s for i, s in enumerate(stats["blocks"]) if i != 2]
    masks_wo = {f"block_{j}": m3[f"block_{i}"] for j, i in enumerate([0, 1, 3])}
    removed, _ = forward(
        params_wo, stats_wo, masks_wo, x, arch=arch_wo, training=False
    )
    np.testing.assert_allclose(
        np.asarray(dead), np.asarray(removed), rtol=1e-5, atol=1e-6
    )


def test_forward_jits(tiny):
    _, arch, params, stats, masks = tiny
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    fwd = jax.jit(functools.partial(forward, arch=arch, training=False))
    logits, _ = fwd(params, stats, masks, x)
    ref, _ = forward(params, stats, masks, x, arch=arch, training=False)
    # fused-vs-eager conv/BN reassociation differs; logits are ~0 at init so
    # only an absolute tolerance is meaningful here
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), rtol=0, atol=1e-3)


def test_width_mult_variants():
    """width_mult scales all channel counts with divisor rounding."""
    full = supernet_arch(tiny_cfg(width_mult=1.0))
    half = supernet_arch(tiny_cfg(width_mult=0.5, round_divisor=4))
    assert half.stem_channels <= full.stem_channels
    assert half.blocks[1].cout < full.blocks[1].cout
    params, stats = init_params(jax.random.key(0), half)
    masks = init_masks(half)
    x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
    logits, _ = forward(params, stats, masks, x, arch=half, training=False)
    assert logits.shape == (2, 10)


@pytest.mark.slow  # measured 29.9 s in the round-5 quick-tier timing run
def test_se_gate_init_semantics():
    """se_gate_init sets the gate's starting LOGIT (b2) under zero-init,
    and a constant gate is exactly normalized away by bn3 in training
    mode — so trunk gradients at init are bitwise independent of it
    (measured round 4: the plus recipe's early-block gamma-grad
    attenuation is swish's, not the gate level's)."""
    import dataclasses

    cfg0 = tiny_cfg(active_fn="swish", se_ratio=0.25, se_logit_cap=2.0,
                    se_inner_act="relu6", se_zero_init=True)
    cfg3 = dataclasses.replace(cfg0, se_gate_init=3.0)
    a0, a3 = supernet_arch(cfg0), supernet_arch(cfg3)
    p0, s0 = init_params(jax.random.key(0), a0)
    p3, s3 = init_params(jax.random.key(0), a3)
    b2 = p3["blocks"][1]["se"]["k3"]["b2"]
    np.testing.assert_allclose(np.asarray(b2), 3.0)
    # arch JSON round-trip + old-checkpoint back-compat (field absent -> 0)
    from atomnas_tpu.models import arch as A
    import json
    assert A.ModelArch.from_json(a3.to_json()) == a3
    d = json.loads(a3.to_json())
    d.pop("se_gate_init")
    assert A.ModelArch.from_json(json.dumps(d)).se_gate_init == 0.0

    # bn3 invariance: identical trunk grads for gate=0.5 vs gate~0.86
    masks = init_masks(a0)
    x = jax.random.normal(jax.random.key(1), (4, 32, 32, 3))
    y = jnp.arange(4) % 10

    def gamma_grad(p, s, arch):
        def loss(p):
            logits, _ = forward(p, s, masks, x, arch=arch, training=True,
                                rng=jax.random.key(2))
            logp = jax.nn.log_softmax(logits)
            return -jnp.mean(jnp.take_along_axis(logp, y[:, None], 1))
        return jax.grad(loss)(p)

    g0 = gamma_grad(p0, s0, a0)["blocks"][1]["bn2"]["scale"]
    g3 = gamma_grad(p3, s3, a3)["blocks"][1]["bn2"]["scale"]
    # exact in real arithmetic; f32 bn-stat rounding leaves ~1e-7 noise
    np.testing.assert_allclose(np.asarray(g0), np.asarray(g3),
                               rtol=2e-3, atol=2e-6)
