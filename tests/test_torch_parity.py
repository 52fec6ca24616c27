"""Cross-framework parity: our fused TPU supernet vs an independent PyTorch
implementation of the reference's module structure.

The reference (mobilenet_base.py :: InvertedResidualChannels, SURVEY.md
sec 2.1/3.2) runs each kernel branch as its own torch module chain
``1x1 conv -> BN -> act -> kxk depthwise -> BN -> act -> [SE] -> 1x1 conv``
and sums branch outputs. Our supernet fuses the per-branch pointwise convs
into single matmuls over the concatenated hidden channels and keeps ONE BN
over the concat (supernet.py docstring). These tests rebuild the reference's
per-branch structure in PyTorch (written from the SURVEY description — the
reference mount is empty), load OUR weights into it branch-by-branch, and
assert the two frameworks produce the same logits and the same BN
running-stat updates. This pins down, against a fully independent
implementation:

* fused expand/project matmul == per-branch 1x1 convs (the MXU redesign),
* concatenated BN == per-branch BNs,
* torch-style k//2 conv padding (incl. stride-2 window alignment),
* torch BatchNorm2d train/eval semantics (biased norm, unbiased running
  update, momentum),
* ReLU6 / Swish / SqueezeAndExcitation math,
* stem/head/GAP/classifier plumbing.

The ONE deliberate deviation (documented in supernet.py) is also asserted:
the project BN sits after the branch sum, so the torch model here applies a
shared bn3 to the summed projection rather than per-branch-then-sum.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

from atomnas_tpu.config import BlockSetting, ModelConfig
from atomnas_tpu.models import forward, init_masks, init_params, supernet_arch

torch.manual_seed(0)

TINY = (
    BlockSetting(t=1, c=8, n=1, s=1, ks=(3,)),
    BlockSetting(t=2, c=16, n=2, s=2),
    BlockSetting(t=2, c=24, n=1, s=2),
)


def _t(x) -> torch.Tensor:
    # np.array(copy=True): jax.device_get can return a zero-copy view of the
    # JAX buffer, and torch BN updates running stats IN PLACE — without the
    # copy, torch's forward would silently mutate our stats pytree.
    return torch.from_numpy(np.array(jax.device_get(x), np.float32))


def _act(name):
    if name == "relu6":
        return TF.relu6
    if name == "swish":
        return TF.silu
    raise ValueError(name)


class TorchSE(nn.Module):
    """Reference SqueezeAndExcitation: GAP -> fc -> act -> fc -> sigmoid.
    ``logit_cap`` mirrors our round-4 smooth logit bound (cap*tanh(s/cap))."""

    def __init__(self, c, hidden, act, logit_cap=0.0):
        super().__init__()
        self.fc1 = nn.Linear(c, hidden)
        self.fc2 = nn.Linear(hidden, c)
        self.act = act
        self.logit_cap = logit_cap

    def forward(self, x):
        s = x.mean((2, 3))
        s = self.fc2(self.act(self.fc1(s)))
        if self.logit_cap > 0:
            s = self.logit_cap * torch.tanh(s / self.logit_cap)
        gate = torch.sigmoid(s)
        return x * gate[:, :, None, None]


class TorchBranch(nn.Module):
    """One kernel branch of the reference's InvertedResidualChannels."""

    def __init__(self, cin, h, k, stride, cout, expand, se_hidden, act,
                 se_act=None, se_cap=0.0):
        super().__init__()
        self.expand, self.act = expand, act
        if expand:
            self.pw1 = nn.Conv2d(cin, h, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(h)
        self.dw = nn.Conv2d(h, h, k, stride, padding=k // 2, groups=h, bias=False)
        self.bn2 = nn.BatchNorm2d(h)
        self.se = (TorchSE(h, se_hidden, se_act or act, se_cap)
                   if se_hidden else None)
        self.pw2 = nn.Conv2d(h, cout, 1, bias=False)

    def forward(self, x):
        h = self.act(self.bn1(self.pw1(x))) if self.expand else x
        h = self.act(self.bn2(self.dw(h)))
        if self.se is not None:
            h = self.se(h)
        return self.pw2(h)


class TorchBlock(nn.Module):
    def __init__(self, b, act, se_act=None, se_cap=0.0):
        super().__init__()
        self.residual = b.residual
        self.branches = nn.ModuleList(
            TorchBranch(
                b.cin, h, k, b.stride, b.cout, b.expand,
                b.se_hidden[j] if b.se_ratio > 0 else 0, act,
                se_act=se_act, se_cap=se_cap,
            )
            for j, (k, h) in enumerate(zip(b.kernels, b.hidden))
        )
        # deliberate deviation vs the reference: one bn3 after the branch
        # sum instead of per-branch bn3-then-sum (supernet.py docstring)
        self.bn3 = nn.BatchNorm2d(b.cout)

    def forward(self, x):
        y = self.bn3(sum(br(x) for br in self.branches))
        return y + x if self.residual else y


class TorchModel(nn.Module):
    def __init__(self, arch):
        super().__init__()
        act = _act(arch.active_fn)
        self.act = act
        self.stem = nn.Conv2d(3, arch.stem_channels, 3, stride=2, padding=1,
                              bias=False)
        self.stem_bn = nn.BatchNorm2d(arch.stem_channels)
        se_act = _act(arch.se_inner_act) if arch.se_inner_act else act
        self.blocks = nn.ModuleList(
            TorchBlock(b, act, se_act=se_act, se_cap=arch.se_logit_cap)
            for b in arch.blocks)
        c_last = arch.blocks[-1].cout
        self.head = nn.Conv2d(c_last, arch.head_channels, 1, bias=False)
        self.head_bn = nn.BatchNorm2d(arch.head_channels)
        self.classifier = nn.Linear(arch.head_channels, arch.num_classes)

    def forward(self, x):
        h = self.act(self.stem_bn(self.stem(x)))
        for blk in self.blocks:
            h = blk(h)
        h = self.act(self.head_bn(self.head(h)))
        return self.classifier(h.mean((2, 3)))


def _load_bn(bn: nn.BatchNorm2d, p, s, sl=slice(None)):
    bn.weight.data = _t(p["scale"][sl])
    bn.bias.data = _t(p["bias"][sl])
    bn.running_mean.data = _t(s["mean"][sl])
    bn.running_var.data = _t(s["var"][sl])


def build_torch(arch, params, stats) -> TorchModel:
    """Load our fused pytree into the per-branch torch reference model."""
    m = TorchModel(arch)
    m.stem.weight.data = _t(params["stem"]["w"]).permute(3, 2, 0, 1)
    _load_bn(m.stem_bn, params["stem"]["bn"], stats["stem"]["bn"])
    for i, b in enumerate(arch.blocks):
        p, s = params["blocks"][i], stats["blocks"][i]
        blk = m.blocks[i]
        for j, (k, h) in enumerate(zip(b.kernels, b.hidden)):
            off = b.splits[j]
            sl = slice(off, off + h)
            br = blk.branches[j]
            if b.expand:
                # fused (cin, total) expand -> branch Conv2d (h, cin, 1, 1)
                br.pw1.weight.data = _t(p["pw1"][:, sl]).T[:, :, None, None]
                _load_bn(br.bn1, p["bn1"], s["bn1"], sl)
            br.dw.weight.data = _t(p["dw"][f"k{k}"]).permute(3, 2, 0, 1)
            _load_bn(br.bn2, p["bn2"], s["bn2"], sl)
            if b.se_ratio > 0:
                se = p["se"][f"k{k}"]
                br.se.fc1.weight.data = _t(se["w1"]).T
                br.se.fc1.bias.data = _t(se["b1"])
                br.se.fc2.weight.data = _t(se["w2"]).T
                br.se.fc2.bias.data = _t(se["b2"])
            # fused (total, cout) project -> branch Conv2d (cout, h, 1, 1)
            br.pw2.weight.data = _t(p["pw2"][sl, :]).T[:, :, None, None]
        _load_bn(blk.bn3, p["bn3"], s["bn3"])
    m.head.weight.data = _t(params["head"]["w"]).T[:, :, None, None]
    _load_bn(m.head_bn, params["head"]["bn"], stats["head"]["bn"])
    m.classifier.weight.data = _t(params["classifier"]["w"]).T
    m.classifier.bias.data = _t(params["classifier"]["b"])
    return m


def _setup(**model_kw):
    cfg = ModelConfig(
        num_classes=10, input_size=16, stem_channels=8, head_channels=32,
        compute_dtype="float32", dropout=0.0,
        inverted_residual_setting=TINY, **model_kw,
    )
    arch = supernet_arch(cfg)
    params, stats = init_params(jax.random.key(0), arch)
    masks = init_masks(arch)
    x = np.random.RandomState(0).rand(4, 16, 16, 3).astype(np.float32)
    return arch, params, stats, masks, x


def _assert_stats_close(ours, theirs_bn):
    np.testing.assert_allclose(
        np.asarray(ours["mean"]), theirs_bn.running_mean.numpy(),
        rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ours["var"]), theirs_bn.running_var.numpy(),
        rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "model_kw",
    [
        dict(),
        dict(active_fn="swish", se_ratio=0.25),
        # the round-4 plus-recipe SE hygiene knobs (PARITY.md)
        dict(active_fn="swish", se_ratio=0.25, se_logit_cap=4.0,
             se_inner_act="relu6", se_zero_init=True),
    ],
    ids=["relu6", "swish_se", "swish_se_capped"],
)
def test_torch_parity_train_and_eval(model_kw):
    arch, params, stats, masks, x = _setup(**model_kw)
    tm = build_torch(arch, params, stats)
    tx = torch.from_numpy(x).permute(0, 3, 1, 2)

    fwd = jax.jit(
        lambda p, s, m, xx, training: forward(
            p, s, m, xx, arch=arch, training=training
        ),
        static_argnums=4,
    )
    with jax.default_matmul_precision("highest"):
        logits_tr, new_stats = fwd(params, stats, masks, jnp.asarray(x), True)
        tm.train()
        with torch.no_grad():
            t_logits_tr = tm(tx)
        np.testing.assert_allclose(
            np.asarray(logits_tr), t_logits_tr.numpy(), rtol=1e-3, atol=1e-5
        )

        # the train-mode forward must also update running stats identically
        _assert_stats_close(new_stats["stem"]["bn"], tm.stem_bn)
        _assert_stats_close(new_stats["head"]["bn"], tm.head_bn)
        for i, b in enumerate(arch.blocks):
            off, h0 = b.splits[0], b.hidden[0]
            ours = new_stats["blocks"][i]["bn2"]
            theirs = tm.blocks[i].branches[0].bn2
            np.testing.assert_allclose(
                np.asarray(ours["mean"][off : off + h0]),
                theirs.running_mean.numpy(), rtol=1e-4, atol=1e-5)
            _assert_stats_close(new_stats["blocks"][i]["bn3"],
                                tm.blocks[i].bn3)

        # eval mode with the updated stats
        logits_ev, _ = fwd(params, new_stats, masks, jnp.asarray(x), False)
        tm.eval()
        with torch.no_grad():
            t_logits_ev = tm(tx)
        np.testing.assert_allclose(
            np.asarray(logits_ev), t_logits_ev.numpy(), rtol=1e-3, atol=1e-5
        )


@pytest.mark.slow
def test_torch_gradient_parity():
    """Backward parity: d(CE loss)/d(input) and key param grads must match
    torch autograd through the per-branch reference model — this covers the
    train-mode BN backward (gradients through batch moments), the fused
    matmul backward, and the depthwise/residual chain end to end."""
    arch, params, stats, masks, x = _setup()
    tm = build_torch(arch, params, stats)
    tm.train()
    labels = np.arange(4) % 10

    def loss_fn(p, xx):
        logits, _ = forward(p, stats, masks, xx, arch=arch, training=True)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(lp[jnp.arange(4), jnp.asarray(labels)])

    with jax.default_matmul_precision("highest"):
        gx = jax.grad(lambda xx: loss_fn(params, xx))(jnp.asarray(x))
        gp = jax.grad(loss_fn)(params, jnp.asarray(x))

    tx = torch.from_numpy(x.copy()).permute(0, 3, 1, 2).requires_grad_(True)
    loss = TF.cross_entropy(tm(tx), torch.from_numpy(labels))
    loss.backward()

    np.testing.assert_allclose(
        np.asarray(gx), tx.grad.permute(0, 2, 3, 1).numpy(),
        rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gp["classifier"]["w"]),
        tm.classifier.weight.grad.numpy().T, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gp["stem"]["w"]),
        tm.stem.weight.grad.permute(2, 3, 1, 0).numpy(),
        rtol=1e-3, atol=1e-6)
    # fused expand grad slice == branch pw1 grad; dw grad per branch
    b = arch.blocks[1]
    k, h = b.kernels[0], b.hidden[0]
    br = tm.blocks[1].branches[0]
    np.testing.assert_allclose(
        np.asarray(gp["blocks"][1]["pw1"][:, : h]),
        br.pw1.weight.grad.numpy()[:, :, 0, 0].T, rtol=1e-3, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gp["blocks"][1]["dw"][f"k{k}"]),
        br.dw.weight.grad.permute(2, 3, 1, 0).numpy(), rtol=1e-3, atol=1e-6)


def test_torch_sgd_update_parity():
    """Our optax chain (wd-before-momentum, nesterov trace) must reproduce
    torch.optim.SGD(momentum, nesterov, per-group weight decay) exactly —
    the reference's optimizer semantics (SURVEY.md sec 2.1 optim row)."""
    import optax

    from atomnas_tpu.config import OptimConfig
    from atomnas_tpu.train.optim import make_optimizer

    rng = np.random.RandomState(0)
    params = {
        "pw2": rng.randn(6, 4).astype(np.float32),      # decayed (ndim 2)
        "bn1": {"scale": rng.randn(4).astype(np.float32)},  # excluded
    }
    cfg = OptimConfig(momentum=0.9, nesterov=True, weight_decay=1e-2)
    tx = make_optimizer(cfg, lambda step: 0.1)
    jp = jax.tree.map(jnp.asarray, params)
    opt_state = tx.init(jp)

    tp = {k: torch.tensor(v, requires_grad=True) if not isinstance(v, dict)
          else {kk: torch.tensor(vv, requires_grad=True)
                for kk, vv in v.items()}
          for k, v in params.items()}
    topt = torch.optim.SGD(
        [{"params": [tp["pw2"]], "weight_decay": 1e-2},
         {"params": [tp["bn1"]["scale"]], "weight_decay": 0.0}],
        lr=0.1, momentum=0.9, nesterov=True)

    for step in range(3):
        g = {
            "pw2": rng.randn(6, 4).astype(np.float32),
            "bn1": {"scale": rng.randn(4).astype(np.float32)},
        }
        updates, opt_state = tx.update(
            jax.tree.map(jnp.asarray, g), opt_state, jp)
        jp = optax.apply_updates(jp, updates)
        tp["pw2"].grad = torch.tensor(g["pw2"])
        tp["bn1"]["scale"].grad = torch.tensor(g["bn1"]["scale"])
        topt.step()

    np.testing.assert_allclose(
        np.asarray(jp["pw2"]), tp["pw2"].detach().numpy(),
        rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(jp["bn1"]["scale"]), tp["bn1"]["scale"].detach().numpy(),
        rtol=1e-5, atol=1e-7)


def test_torch_training_loop_parity():
    """FOUR full steps of the real jitted train step (make_train_step: label-
    smoothed CE, masked weight decay, nesterov SGD, EMA warmup ramp, BN
    running-stat updates) must track a hand-written torch training loop over
    the per-branch reference model — params, EMA shadow, BN stats, and the
    next-step logits all agree. This pins the END-TO-END training semantics,
    not just one forward/backward."""
    import optax

    from atomnas_tpu.config import DataConfig, OptimConfig, SearchConfig
    from atomnas_tpu.train.optim import make_optimizer
    from atomnas_tpu.train.state import create_train_state
    from atomnas_tpu.train.step import make_train_step

    arch, params, stats, masks, _ = _setup()
    tm = build_torch(arch, params, stats)

    lr, wd, mu, ema_d, smooth = 0.05, 1e-4, 0.9, 0.9, 0.1
    ocfg = OptimConfig(momentum=mu, nesterov=True, weight_decay=wd,
                       ema_decay=ema_d, label_smoothing=smooth)
    scfg = SearchConfig(enabled=False)
    dcfg = DataConfig(mixup_alpha=0.0)
    tx = make_optimizer(ocfg, lambda step: lr)
    state = create_train_state(params, stats, masks, tx)
    step_fn = jax.jit(make_train_step(
        arch, ocfg, scfg, dcfg, tx, lambda step: lr, {}, 16))

    # torch optimizer: decayed = conv/fc kernels except depthwise; excluded
    # = every BN scale/bias, biases, depthwise kernels (weight_decay_mask)
    decayed, excluded = [], []
    for name, p in tm.named_parameters():
        is_dw = name.endswith("dw.weight")
        is_bn = "bn" in name
        is_bias = name.endswith(".bias")
        (excluded if (is_dw or is_bn or is_bias) else decayed).append(p)
    topt = torch.optim.SGD(
        [{"params": decayed, "weight_decay": wd},
         {"params": excluded, "weight_decay": 0.0}],
        lr=lr, momentum=mu, nesterov=True)
    ema_shadow = {n: p.detach().clone() for n, p in tm.named_parameters()}

    rng = np.random.RandomState(0)
    rkey = jax.random.key(0)
    tm.train()
    with jax.default_matmul_precision("highest"):
        for step in range(4):
            x = rng.rand(8, 16, 16, 3).astype(np.float32)  # pre-normalized
            y = rng.randint(0, 10, (8,))
            batch = {"image": jnp.asarray(x), "label": jnp.asarray(y)}
            state, metrics = step_fn(state, batch, rkey)

            topt.zero_grad()
            out = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
            loss = TF.cross_entropy(out, torch.from_numpy(y),
                                    label_smoothing=smooth)
            loss.backward()
            np.testing.assert_allclose(float(metrics["ce"]),
                                       float(loss.detach()),
                                       rtol=1e-4, atol=1e-6)
            topt.step()
            decay = min(ema_d, (1.0 + step) / (10.0 + step))  # warmup ramp
            with torch.no_grad():
                for n, p in tm.named_parameters():
                    ema_shadow[n].mul_(decay).add_(p, alpha=1.0 - decay)

        # params, BN running stats, EMA shadow, and eval logits all agree
        np.testing.assert_allclose(
            np.asarray(state.params["classifier"]["w"]),
            tm.classifier.weight.detach().numpy().T, rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(state.params["stem"]["w"]),
            tm.stem.weight.detach().permute(2, 3, 1, 0).numpy(),
            rtol=1e-3, atol=1e-6)
        b = arch.blocks[1]
        k, h = b.kernels[0], b.hidden[0]
        np.testing.assert_allclose(
            np.asarray(state.params["blocks"][1]["dw"][f"k{k}"]),
            tm.blocks[1].branches[0].dw.weight.detach()
              .permute(2, 3, 1, 0).numpy(), rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(state.batch_stats["stem"]["bn"]["var"]),
            tm.stem_bn.running_var.numpy(), rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(state.ema_params["classifier"]["w"]),
            ema_shadow["classifier.weight"].numpy().T, rtol=1e-3, atol=1e-6)

        xe = np.random.RandomState(9).rand(4, 16, 16, 3).astype(np.float32)
        ours, _ = forward(state.params, state.batch_stats, masks,
                          jnp.asarray(xe), arch=arch, training=False)
        tm.eval()
        with torch.no_grad():
            theirs = tm(torch.from_numpy(xe).permute(0, 3, 1, 2))
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   rtol=1e-3, atol=1e-5)


def test_torch_parity_stride2_window_alignment():
    """The stride-2 conv windows must align with torch's padding=k//2 —
    a pure-XLA "SAME" conv pads (0,1) instead of (1,1) at stride 2 and
    silently shifts every downsampling layer by one input pixel."""
    from atomnas_tpu.models import layers

    x = np.random.RandomState(1).rand(2, 14, 14, 6).astype(np.float32)
    for k in (3, 5, 7):
        w = np.random.RandomState(k).rand(k, k, 1, 6).astype(np.float32)
        ours = layers.depthwise_conv(jnp.asarray(x), jnp.asarray(w), stride=2)
        theirs = TF.conv2d(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            torch.from_numpy(w).permute(3, 2, 0, 1),
            stride=2, padding=k // 2, groups=6,
        )
        np.testing.assert_allclose(
            np.asarray(ours), theirs.permute(0, 2, 3, 1).numpy(),
            rtol=1e-5, atol=1e-5,
        )
