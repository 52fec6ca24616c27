"""Architecture descriptors: the static shape truth for supernet and slices.

The reference mutates ``nn.Module`` trees in place during shrinkage
(mobilenet_base.py :: InvertedResidualChannels compress_* — SURVEY.md sec 3.3).
Under XLA everything must be static, so the architecture lives in an explicit
immutable descriptor. The same functional ``forward`` runs both the full
supernet and any shrunk slice; shrinkage produces a *new* ``ModelArch`` (plus
sliced params) and the step function is re-jitted at the new static shapes.

The descriptor is also what checkpoints store so eval/resume can rebuild the
exact searched model (reference stores it in its checkpoint dict —
SURVEY.md sec 5 checkpoint row).
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

from atomnas_tpu.config import BlockSetting, ModelConfig


def make_divisible(v: float, divisor: int = 8, min_value: Optional[int] = None) -> int:
    """Channel rounding helper (reference: mobilenet_base.py :: _make_divisible)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:  # do not round down by more than 10%
        new_v += divisor
    return new_v


@dataclasses.dataclass(frozen=True)
class BlockArch:
    """Static description of one atomic inverted-residual block.

    ``hidden[i]`` is the number of live expansion channels of kernel branch
    ``kernels[i]``; each such channel is one *atom* (1x1 conv column ->
    depthwise kxk channel -> 1x1 conv row). ``hidden`` shrinks as atoms die.
    """

    cin: int
    cout: int
    stride: int
    kernels: Tuple[int, ...]
    hidden: Tuple[int, ...]
    expand: bool = True  # False => MobileNetV2 t=1 block: no pw1, hidden == cin
    se_ratio: float = 0.0
    # SE bottleneck width per branch, fixed at supernet init so re-slicing
    # never changes SE weight shapes except channel-wise slices.
    se_hidden: Tuple[int, ...] = ()

    @property
    def residual(self) -> bool:
        return self.stride == 1 and self.cin == self.cout

    @property
    def searchable(self) -> bool:
        # no-expand blocks' hidden channels ARE the input channels; they
        # cannot be sliced away, so they are excluded from search.
        return self.expand

    @property
    def total_hidden(self) -> int:
        return sum(self.hidden)

    @property
    def splits(self) -> Tuple[int, ...]:
        """Start offset of each kernel branch inside the concatenated hidden."""
        offs = [0]
        for h in self.hidden:
            offs.append(offs[-1] + h)
        return tuple(offs[:-1])

    def with_hidden(self, hidden: Sequence[int]) -> "BlockArch":
        assert len(hidden) == len(self.kernels)
        return dataclasses.replace(self, hidden=tuple(int(h) for h in hidden))


@dataclasses.dataclass(frozen=True)
class ModelArch:
    stem_channels: int
    head_channels: int
    num_classes: int
    blocks: Tuple[BlockArch, ...]
    active_fn: str = "relu6"
    # SE gate hygiene knobs (round 4, see layers.squeeze_excite docstring):
    # smooth logit bound, decoupled inner activation ("" = trunk active_fn),
    # and zero-init of the gate projection. All default to the original
    # unbounded/coupled behavior so old checkpoints restore unchanged.
    se_logit_cap: float = 0.0
    se_inner_act: str = ""
    se_zero_init: bool = False
    # initial gate LOGIT (b2 init; with se_zero_init the gate starts at
    # exactly sigmoid(cap.tanh(se_gate_init/cap)) everywhere). NOTE: a
    # constant gate is exactly normalized away by the following bn3, so
    # this knob does NOT change trunk gradients at init — it only sets
    # where on the sigmoid the gate itself starts learning (0.5 = max
    # slope, both directions; ~0.9 = near-identity, gates learn to gate
    # DOWN). The measured early-block gamma-grad attenuation in the plus
    # recipe (6.5x at block 1 vs relu6) is entirely the swish trunk's.
    se_gate_init: float = 0.0
    dropout: float = 0.2
    bn_momentum: float = 0.1
    bn_epsilon: float = 1e-5
    compute_dtype: str = "bfloat16"
    # rematerialize block activations in backward (trades ~1/3 more FLOPs
    # for O(depth) less live-activation HBM; essential at 224^2 batch>=128)
    remat: bool = False

    @property
    def num_blocks(self) -> int:
        return len(self.blocks)

    def live_atoms(self) -> int:
        return sum(b.total_hidden for b in self.blocks if b.searchable)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @staticmethod
    def from_json(s: str) -> "ModelArch":
        d = json.loads(s)
        blocks = tuple(
            BlockArch(
                cin=b["cin"],
                cout=b["cout"],
                stride=b["stride"],
                kernels=tuple(b["kernels"]),
                hidden=tuple(b["hidden"]),
                expand=b["expand"],
                se_ratio=b["se_ratio"],
                se_hidden=tuple(b["se_hidden"]),
            )
            for b in d["blocks"]
        )
        d["blocks"] = blocks
        return ModelArch(**d)


def supernet_arch(cfg: ModelConfig) -> ModelArch:
    """Build the full supernet descriptor from a ModelConfig.

    Mirrors the reference model factory (mobilenet_v2.py :: Model reading
    FLAGS.inverted_residual_setting — SURVEY.md sec 2.1 supernet row):
    MobileNetV2 skeleton, each t=6 block replaced by parallel kernel branches
    each with expansion ratio t.
    """
    wm = cfg.width_mult
    div = cfg.round_divisor
    stem = make_divisible(cfg.stem_channels * wm, div)
    head = make_divisible(cfg.head_channels * max(1.0, wm), div)

    blocks: List[BlockArch] = []
    cin = stem
    for setting in cfg.setting():
        cout = make_divisible(setting.c * wm, div)
        for i in range(setting.n):
            stride = setting.s if i == 0 else 1
            expand = setting.t != 1
            if expand:
                per_kernel = int(round(cin * setting.t))
                hidden = tuple(per_kernel for _ in setting.ks)
            else:
                assert len(setting.ks) == 1, "t=1 blocks must be single-kernel"
                hidden = (cin,)
            if cfg.se_ratio > 0:
                se_hidden = tuple(
                    make_divisible(h * cfg.se_ratio, div) for h in hidden
                )
            else:
                se_hidden = tuple(0 for _ in hidden)
            blocks.append(
                BlockArch(
                    cin=cin,
                    cout=cout,
                    stride=stride,
                    kernels=setting.ks,
                    hidden=hidden,
                    expand=expand,
                    se_ratio=cfg.se_ratio,
                    se_hidden=se_hidden,
                )
            )
            cin = cout
    return ModelArch(
        stem_channels=stem,
        head_channels=head,
        num_classes=cfg.num_classes,
        blocks=tuple(blocks),
        active_fn=cfg.active_fn,
        se_logit_cap=cfg.se_logit_cap,
        se_inner_act=cfg.se_inner_act,
        se_zero_init=cfg.se_zero_init,
        se_gate_init=cfg.se_gate_init,
        dropout=cfg.dropout,
        bn_momentum=cfg.bn_momentum,
        bn_epsilon=cfg.bn_epsilon,
        compute_dtype=cfg.compute_dtype,
        remat=cfg.remat,
    )


def arch_summary(arch: ModelArch) -> str:
    lines = [
        f"stem={arch.stem_channels} head={arch.head_channels} "
        f"classes={arch.num_classes} act={arch.active_fn}"
    ]
    for i, b in enumerate(arch.blocks):
        ks = ",".join(f"{k}x{k}:{h}" for k, h in zip(b.kernels, b.hidden))
        tag = "R" if b.residual else " "
        lines.append(
            f"  block[{i:2d}] {tag} {b.cin:4d}->{b.cout:4d} s{b.stride} [{ks}]"
            + (f" se={b.se_hidden}" if b.se_ratio > 0 else "")
        )
    return "\n".join(lines)
