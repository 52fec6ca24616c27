"""Misc utilities (reference: utils/common.py — seeds, small helpers)."""

from __future__ import annotations

import random

import numpy as np


def set_random_seed(seed: int) -> None:
    """Seed host-side RNGs. Device randomness is explicit jax.random keys."""
    random.seed(seed)
    np.random.seed(seed)


def tree_bytes(tree) -> int:
    import jax

    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def keypath_str(path) -> str:
    """jax tree_util keypath -> "a/b/0/c" string (shared by sharding rules
    and the weight-decay mask so they can never diverge)."""
    parts = []
    for p in path:
        parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
    return "/".join(parts)
