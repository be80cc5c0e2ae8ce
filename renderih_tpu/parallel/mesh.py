"""Device mesh and sharding rules (TPU-native replacement for DDP+ZeRO).

The reference scales with one-process-per-GPU DDP over NCCL plus a
ZeroRedundancyOptimizer (`core/lijun_trainer.py:76-144`). The TPU-native
equivalent is SPMD over a `jax.sharding.Mesh`:

  * data axis   — batch sharding (DDP equivalent). Gradients come out of
    `jax.grad` already averaged across the axis because the loss is a mean
    over the global batch; XLA inserts the psum over ICI.
  * model axis  — optional tensor parallelism: attention/MLP weight
    matrices are sharded on their output features; XLA inserts
    all-gathers/reduce-scatters where needed.
  * ZeRO-1      — optimizer *state* leaves are sharded along the data
    axis on their largest divisible dimension, cutting the optimizer
    memory per chip by |data| (reference equivalent:
    `ZeroRedundancyOptimizer`, `core/lijun_trainer.py:136-140`).
"""

from __future__ import annotations

import re

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a (data, model) mesh. data = -1 means all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a host-side batch pytree with the leading axis on 'data'."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)


# Parameters whose *output* feature axis is sharded over the model axis
# when mesh_model > 1 (tensor parallelism). Matched against the flattened
# flax param path. QKV projections and MLP up-projections split cleanly;
# their consumers (fc / down-projection) shard the *input* axis, making
# each attention/MLP block a standard Megatron-style column+row pair.
_TP_COL_PATTERNS = (
    r".*w_qs.*kernel", r".*w_ks.*kernel", r".*w_vs.*kernel",
    r".*ff.*fc1.*kernel", r".*ffL.*fc1.*kernel", r".*ffR.*fc1.*kernel",
)
_TP_ROW_PATTERNS = (
    r".*attn.*fc/kernel", r".*ff.*fc2.*kernel",
    r".*ffL.*fc2.*kernel", r".*ffR.*fc2.*kernel",
)


def param_sharding_rules(path: str, shape: tuple, mesh: Mesh) -> P:
    """PartitionSpec for a parameter given its flax path and shape."""
    if mesh.shape.get("model", 1) > 1 and len(shape) == 2:
        for pat in _TP_COL_PATTERNS:
            if re.fullmatch(pat, path) and shape[1] % mesh.shape["model"] == 0:
                return P(None, "model")
        for pat in _TP_ROW_PATTERNS:
            if re.fullmatch(pat, path) and shape[0] % mesh.shape["model"] == 0:
                return P("model", None)
    return P()  # replicated


def zero1_sharding(pytree, mesh: Mesh):
    """NamedShardings sharding each leaf's largest divisible dim on 'data'.

    Applied to optimizer state (AdamW mu/nu): parameters stay replicated,
    while first/second-moment accumulators are sharded, which is exactly
    ZeRO stage 1 semantics under SPMD (the sharded update is followed by
    an XLA-inserted all-gather of the updated params).
    """
    n_data = mesh.shape["data"]

    def spec_for(x):
        if not hasattr(x, "shape") or x.ndim == 0 or x.size < 2 * n_data:
            return NamedSharding(mesh, P())
        dims = [None] * x.ndim
        # choose the largest axis divisible by the data-axis size
        order = sorted(range(x.ndim), key=lambda i: -x.shape[i])
        for i in order:
            if x.shape[i] % n_data == 0:
                dims[i] = "data"
                break
        return NamedSharding(mesh, P(*dims))

    return jax.tree_util.tree_map(spec_for, pytree)
