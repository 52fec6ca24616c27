"""Device mesh + sharding layout.

TPU-native replacement for the reference's distributed runtime
(``utils/distributed.py :: init_dist`` / ``AllReduceDistributedDataParallel``
over NCCL — SURVEY.md sec 2.4). There is no hand-written comm layer: the
batch is sharded over the ``data`` mesh axis and every cross-replica
reduction (gradients, BN moments, metric sums) is inserted by GSPMD and
rides ICI. Gradient all-reduce falls out of jit-ing the global-batch loss;
sync-BN falls out of computing moments over the sharded batch.

A second ``model`` axis is supported (classifier/head kernels sharded on
their output dim) — the reference is DP-only (SURVEY.md sec 2.3), the model
axis simply demonstrates that the layout generalizes.

Replica-consistent shrinkage (SURVEY.md sec 2.4 invariant): under JAX's
single-controller model the masks are one logical (replicated) array, so the
reference's "every rank computes the same mask" invariant holds by
construction rather than by NCCL determinism.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from atomnas_tpu.config import MeshConfig


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = max(cfg.model, 1)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(
            f"mesh {data}x{model} does not tile {n} devices; "
            f"set mesh.data/mesh.model to factor the device count"
        )
    arr = np.array(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over data axis; feature dims replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


from atomnas_tpu.utils.common import keypath_str as _path_str


def param_shardings(mesh: Mesh, params: Dict[str, Any]):
    """Replicate everything; when the mesh has a model axis, shard the wide
    head/classifier kernels on their output dim over it."""
    use_model = mesh.shape.get("model", 1) > 1

    def decide(path, leaf):
        s = _path_str(path)
        if use_model and leaf.ndim == 2 and (
            s == "head/w" or s == "classifier/w"
        ):
            return NamedSharding(mesh, P(None, "model"))
        if use_model and s == "classifier/b":
            return NamedSharding(mesh, P("model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(decide, params)


def host_put(x, sharding: NamedSharding):
    """Put host data onto a mesh sharding, multi-process safe.

    Single-process: plain device_put. Multi-process: the mesh spans devices
    this process cannot address, so device_put is rejected; build the global
    array from the (identical-on-every-process) host value with
    make_array_from_callback instead. Works for replicated AND
    model-axis-sharded leaves (the callback slices per device index)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    import jax.numpy as jnp

    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jax.dtypes.prng_key):
        # typed PRNG keys have no numpy form: ship the raw key data and
        # re-wrap (all processes hold the same key, so this is replicated)
        data = np.asarray(jax.random.key_data(x))
        arr = jax.make_array_from_callback(
            data.shape, sharding, lambda idx: data[idx]
        )
        return jax.random.wrap_key_data(arr)
    xa = np.asarray(x)
    return jax.make_array_from_callback(xa.shape, sharding, lambda idx: xa[idx])


def place_state(mesh: Mesh, state):
    """Place a TrainState on the mesh: params/EMA via the sharding rules
    (model-axis head/classifier when mesh.model > 1), everything else
    replicated. The optimizer state picks up matching shardings on the first
    jitted step via propagation."""
    pshard = param_shardings(mesh, state.params)
    rep = replicated(mesh)
    put_rep = lambda tree: jax.tree.map(lambda a: host_put(a, rep), tree)
    return state.replace(
        params=jax.tree.map(host_put, state.params, pshard),
        ema_params=jax.tree.map(host_put, state.ema_params, pshard),
        batch_stats=put_rep(state.batch_stats),
        masks=put_rep(state.masks),
        opt_state=put_rep(state.opt_state),
        step=host_put(state.step, rep),
        shrink_events=host_put(state.shrink_events, rep),
    )


def assert_replica_consistent(tree, name: str = "tree") -> None:
    """Assert a replicated pytree holds identical bytes on every device.

    Reference parity: the NCCL-determinism invariant that shrink masks are
    identical across ranks (SURVEY.md sec 2.4) was never asserted there;
    here it is checkable. Cheap enough to run at every shrink event for the
    masks. No-op for single-device arrays.
    """
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if not hasattr(leaf, "addressable_shards"):
            continue
        shards = leaf.addressable_shards
        if len(shards) <= 1:
            continue
        first = np.asarray(shards[0].data).tobytes()
        for s in shards[1:]:
            if np.asarray(s.data).tobytes() != first:
                raise AssertionError(
                    f"replica divergence in {name}{jax.tree_util.keystr(path)} "
                    f"between devices {shards[0].device} and {s.device}"
                )


def shard_batch(mesh: Mesh, batch: Dict[str, np.ndarray]):
    """Host batch -> device arrays sharded over the data axis.

    Single-process: a plain device_put. Multi-process (TPU slice): each
    process holds only its LOCAL rows, so the global array must be assembled
    with make_array_from_process_local_data — device_put with a global
    sharding would mistake the local batch for the global one.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda a: jax.device_put(a, sh), batch)
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sh, np.asarray(a)),
        batch,
    )
