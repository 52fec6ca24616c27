"""Training state pytree.

The reference spreads this across ``model.state_dict()``, the EMA shadow,
optimizer state and an architecture descriptor saved ad hoc in train.py's
checkpoint dict (SURVEY.md sec 5 checkpoint row). Here it is one explicit
immutable pytree; the (static) ModelArch travels alongside, not inside.
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array  # int32 scalar
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    masks: Dict[str, jax.Array]
    opt_state: optax.OptState
    ema_params: Dict[str, Any]  # == params copy when EMA disabled
    shrink_events: jax.Array  # int32 scalar: number of mask-update events


def create_train_state(
    params, batch_stats, masks, tx: optax.GradientTransformation
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        masks=masks,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params),
        shrink_events=jnp.zeros((), jnp.int32),
    )
