"""BN-folded inference export == eval-mode training forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atomnas_tpu.config import BlockSetting, ModelConfig
from atomnas_tpu.models import forward, init_masks, init_params, supernet_arch
from atomnas_tpu.models.inference import fold_bn, forward_folded

TINY = (
    BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
    BlockSetting(t=2, c=16, n=2, s=2),
    BlockSetting(t=2, c=24, n=1, s=2),
)


@pytest.mark.parametrize("se,act", [(0.0, "relu6"), (0.25, "swish")])
def test_folded_matches_eval_forward(se, act):
    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0, se_ratio=se, active_fn=act,
        inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    # non-trivial running stats (fresh init has mean=0/var=1 everywhere)
    x_warm = jax.random.normal(jax.random.key(1), (8, 16, 16, 3))
    _, stats = forward(
        params, stats, init_masks(arch), x_warm, arch=arch, training=True,
        rng=jax.random.key(2),
    )

    x = jax.random.normal(jax.random.key(3), (4, 16, 16, 3))
    ref, _ = forward(params, stats, init_masks(arch), x, arch=arch, training=False)
    folded = fold_bn(arch, params, stats)
    got = forward_folded(folded, x, arch=arch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_folded_has_no_bn_leaves():
    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    folded = fold_bn(arch, params, stats)
    paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(folded)[0]
    ]
    assert not any("bn" in p for p in paths)


def test_fold_after_reslice():
    """The export path for a searched model: shrink -> re-slice -> fold."""
    from atomnas_tpu.config import SearchConfig
    from atomnas_tpu.search import shrink

    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0, inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    params = jax.device_get(params)
    rng = np.random.RandomState(0)
    for i in range(len(params["blocks"])):
        g = rng.uniform(0, 0.3, np.asarray(params["blocks"][i]["bn2"]["scale"]).shape)
        params["blocks"][i]["bn2"]["scale"] = jnp.asarray(g, jnp.float32)
    params = jax.tree.map(jnp.asarray, params)
    masks = shrink.update_masks(
        params, init_masks(arch), arch,
        SearchConfig(prune_threshold=0.15, min_atoms_nonresidual=1),
    )
    x = jax.random.normal(jax.random.key(5), (2, 16, 16, 3))
    ref, _ = forward(params, stats, masks, x, arch=arch, training=False)

    res = shrink.reslice(arch, params, stats, masks, params)
    folded = fold_bn(res.arch, res.params, res.batch_stats)
    got = forward_folded(folded, x, arch=res.arch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_predict_cli_on_exported_artifact(tmp_path):
    """cli/predict consumes an export artifact end to end: JPEG file ->
    eval transform -> folded forward -> calibrated top-k JSON."""
    from PIL import Image

    from atomnas_tpu.cli.predict import main as predict_main, preprocess
    from atomnas_tpu.models.export import export_deployment
    from atomnas_tpu.train.state import create_train_state
    import optax

    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0, inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    _, stats = forward(params, stats, masks,
                       jax.random.normal(jax.random.key(1), (8, 16, 16, 3)),
                       arch=arch, training=True, rng=jax.random.key(2))
    state = create_train_state(params, stats, masks, optax.sgd(0.1))
    export_deployment(state, arch, tmp_path / "exp", use_ema=False,
                      input_size=16)

    rng = np.random.RandomState(0)
    img_paths = []
    for i in range(2):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(
            rng.randint(0, 255, (24, 30, 3), dtype=np.uint8)  # non-square
        ).save(p, quality=95)
        img_paths.append(str(p))

    results = predict_main(["--artifact", str(tmp_path / "exp"),
                            *img_paths, "--top", "3"])
    assert len(results) == 2
    for r in results:
        assert len(r["top_classes"]) == 3
        assert all(0 <= c < 10 for c in r["top_classes"])
        probs = r["top_probs"]
        assert probs == sorted(probs, reverse=True)
        assert 0 < sum(probs) <= 1.0 + 1e-5

    # the CLI's probabilities agree with a direct folded forward on the
    # same preprocessed input
    from atomnas_tpu.config import DataConfig
    from atomnas_tpu.models.export import load_deployment
    from atomnas_tpu.models.inference import forward_folded as ff

    arch2, folded, _ = load_deployment(tmp_path / "exp")
    dcfg = DataConfig()
    x = preprocess(img_paths[0], 16, dcfg.mean, dcfg.std)[None]
    logits = ff(jax.tree.map(jnp.asarray, folded), jnp.asarray(x), arch=arch2)
    probs = np.asarray(jax.nn.softmax(logits[0]))
    top = int(np.argmax(probs))
    assert results[0]["top_classes"][0] == top
    np.testing.assert_allclose(results[0]["top_probs"][0], probs[top],
                               rtol=1e-4, atol=1e-5)


def test_export_deployment_roundtrip(tmp_path):
    """export_deployment: masked supernet -> re-slice -> fold -> save ->
    load -> identical logits (the serving hand-off, verified)."""
    from atomnas_tpu.models.export import export_deployment, load_deployment
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.train.state import create_train_state
    import optax

    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0, inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    # warm the stats and kill some atoms so export must re-slice
    _, stats = forward(params, stats, masks, 
                       jax.random.normal(jax.random.key(1), (8, 16, 16, 3)),
                       arch=arch, training=True, rng=jax.random.key(2))
    masks = {k: np.asarray(v).copy() for k, v in masks.items()}
    masks["block_1"][: masks["block_1"].shape[0] // 2] = 0.0
    masks = {k: jnp.asarray(v) for k, v in masks.items()}
    state = create_train_state(params, stats, masks, optax.sgd(0.1))

    manifest = export_deployment(state, arch, tmp_path / "exp",
                                 use_ema=False, input_size=16)
    assert manifest["verify_rel_diff"] < 1e-4
    assert manifest["live_atoms"] < arch.live_atoms()  # actually compacted

    arch2, folded, manifest2 = load_deployment(tmp_path / "exp")
    assert manifest2 == manifest
    x = jax.random.normal(jax.random.key(3), (4, 16, 16, 3))
    from atomnas_tpu.models.inference import forward_folded as ff
    # masked supernet logits == loaded folded-artifact logits
    ref, _ = forward(params, stats, state.masks, x, arch=arch, training=False)
    got = ff(jax.tree.map(jnp.asarray, folded), x, arch=arch2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_export_stablehlo_symbolic_batch(tmp_path):
    """StableHLO serving artifact: export with stablehlo=True writes
    deployment.stablehlo; deserializing the bytes reproduces the folded
    net's logits at MULTIPLE batch sizes (the batch dim is symbolic) with
    no dependence on this package's model code."""
    from atomnas_tpu.models.export import (
        export_deployment,
        load_deployment,
        load_stablehlo,
    )
    from atomnas_tpu.train.state import create_train_state
    import optax

    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0, inverted_residual_setting=TINY,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    _, stats = forward(params, stats, masks,
                       jax.random.normal(jax.random.key(1), (8, 16, 16, 3)),
                       arch=arch, training=True, rng=jax.random.key(2))
    state = create_train_state(params, stats, masks, optax.sgd(0.1))

    manifest = export_deployment(state, arch, tmp_path / "exp",
                                 use_ema=False, input_size=16,
                                 stablehlo=True)
    info = manifest["stablehlo"]
    assert info["verify_rel_diff"] < 1e-4
    assert info["batch"] == "symbolic"
    assert "cpu" in info["platforms"]
    assert (tmp_path / "exp" / "deployment.stablehlo").stat().st_size == \
        info["bytes"]

    exp = load_stablehlo(tmp_path / "exp")
    arch2, folded, _ = load_deployment(tmp_path / "exp")
    folded = jax.tree.map(jnp.asarray, folded)
    for batch in (1, 4, 7):  # symbolic batch: one artifact, any batch
        x = jax.random.normal(jax.random.key(batch), (batch, 16, 16, 3))
        got = np.asarray(exp.call(x))
        ref = np.asarray(forward_folded(folded, x, arch=arch2))
        assert got.shape == (batch, 10)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
