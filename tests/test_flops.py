import numpy as np
import pytest

from atomnas_tpu.config import BlockSetting, ModelConfig
from atomnas_tpu.models import init_masks, supernet_arch
from atomnas_tpu.ops import flops as F


def test_module_latency_and_table_column():
    """Per-module device timing (reference: model_profiling's per-module
    latency) integrates as a ms column in profile_table."""
    import jax

    from atomnas_tpu.models import init_params
    from atomnas_tpu.ops.latency import module_latency

    setting = (
        BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
        BlockSetting(t=2, c=16, n=1, s=2),
    )
    arch = supernet_arch(ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", inverted_residual_setting=setting,
    ))
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    lat = module_latency(arch, params, stats, masks, 16, batch=2, iters=2)
    assert set(lat) == {"stem", "head", "block_0", "block_1"}
    assert all(v > 0 for v in lat.values())
    table = F.profile_table(arch, 16, masks, latency_ms=lat)
    assert table.splitlines()[0].rstrip().endswith("ms")
    assert "modules total" in table


def test_mobilenet_v2_flops_parity():
    """With a single 3x3 branch at t=6 the arch IS MobileNetV2 1.0; the
    counter must land on the published ~300M MACs / ~3.5M params."""
    setting = (
        BlockSetting(t=1, c=16, n=1, s=1, ks=(3,)),
        BlockSetting(t=6, c=24, n=2, s=2, ks=(3,)),
        BlockSetting(t=6, c=32, n=3, s=2, ks=(3,)),
        BlockSetting(t=6, c=64, n=4, s=2, ks=(3,)),
        BlockSetting(t=6, c=96, n=3, s=1, ks=(3,)),
        BlockSetting(t=6, c=160, n=3, s=2, ks=(3,)),
        BlockSetting(t=6, c=320, n=1, s=1, ks=(3,)),
    )
    arch = supernet_arch(ModelConfig(inverted_residual_setting=setting))
    macs = F.model_flops(arch, 224)
    params = F.model_params(arch)
    assert macs == pytest.approx(300e6, rel=0.05)
    assert params == pytest.approx(3.5e6, rel=0.05)


def test_supernet_flops_roughly_triple_expansion():
    arch = supernet_arch(ModelConfig())
    macs = F.model_flops(arch, 224)
    # 3 parallel t=6 branches => hot path ~3x MobileNetV2's expansion cost
    assert 800e6 < macs < 1200e6


def test_masked_flops_linear_in_masks():
    arch = supernet_arch(ModelConfig())
    masks = {k: np.array(v) for k, v in init_masks(arch).items()}
    full = F.model_flops(arch, 224, masks)
    assert full == pytest.approx(F.model_flops(arch, 224))

    # kill half the atoms of block 5, check the exact delta
    per_atom = F.atom_flops(arch, 224)
    key = "block_5"
    n = masks[key].shape[0]
    masks[key][: n // 2] = 0.0
    pruned = F.model_flops(arch, 224, masks)
    expected_delta = per_atom[key][: n // 2].sum()
    assert full - pruned == pytest.approx(expected_delta, rel=1e-9)


def test_atom_flops_formula():
    """Hand-check one atom's cost against the closed form."""
    arch = supernet_arch(ModelConfig())
    sizes = F.spatial_sizes(arch, 224)
    b = arch.blocks[1]  # first searchable block: 16 -> 24, stride 2
    s_in, s_out = sizes[1]
    per_atom = F.atom_flops(arch, 224)["block_1"]
    k = b.kernels[0]
    expected = b.cin * s_in**2 + k * k * s_out**2 + b.cout * s_out**2
    assert per_atom[0] == pytest.approx(expected)
    # last atom belongs to the 7x7 branch
    k7 = b.kernels[-1]
    expected7 = b.cin * s_in**2 + k7 * k7 * s_out**2 + b.cout * s_out**2
    assert per_atom[-1] == pytest.approx(expected7)


def test_live_flops_matches_model_flops():
    import jax.numpy as jnp

    arch = supernet_arch(ModelConfig())
    masks = init_masks(arch)
    masks = {k: v.at[::3].set(0.0) if k == "block_4" else v for k, v in masks.items()}
    per_atom = {k: jnp.asarray(v) for k, v in F.atom_flops(arch, 224).items()}
    const = F.constant_flops(arch, 224)
    live = float(F.live_flops(per_atom, const, masks))
    ref = F.model_flops(arch, 224, {k: np.asarray(v) for k, v in masks.items()})
    assert live == pytest.approx(ref, rel=1e-6)


def test_se_flops_counted():
    plain = supernet_arch(ModelConfig())
    se = supernet_arch(ModelConfig(se_ratio=0.25, active_fn="swish"))
    assert F.model_flops(se, 224) > F.model_flops(plain, 224)
    assert F.model_params(se) > F.model_params(plain)


def test_profile_table_renders():
    arch = supernet_arch(ModelConfig())
    table = F.profile_table(arch, 224, init_masks(arch))
    assert "total:" in table and "MFLOPs" in table
