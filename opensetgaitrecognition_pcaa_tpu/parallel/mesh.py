"""Device mesh + sharding rules for multi-chip training.

The reference is strictly single-process/single-device (SURVEY.md §2.2) —
parallelism here is new, TPU-native capability:

- **data parallelism**: the batch axis is sharded over the ``data`` mesh
  axis; XLA GSPMD inserts the gradient ``psum`` over ICI automatically once
  inputs carry shardings (the scaling-book recipe: pick a mesh, annotate,
  let XLA place collectives);
- **tensor parallelism**: the wide MLP kernels (the PCAA decoder's final
  layers run up to 9000×18000 at reference dims; the PointNet stack is
  4→512→1024) are sharded on their output axis over the ``model`` mesh
  axis.

No NCCL/MPI translation — everything rides ``jax.sharding`` + ``pjit``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    n_devices: Optional[int] = None,
    *,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """A 2-D ``(data, model)`` mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    grid = mesh_utils.create_device_mesh(
        (n // model_parallel, model_parallel), devices=devices[:n]
    )
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-major arrays: leading axis over ``data``, rest replicated."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(leaf: Any, model_size: int, min_dim: int) -> P:
    """Tensor-parallel rule: shard wide matmul kernels on their output axis.

    2-D kernels whose output dim divides the model-axis size and is at least
    ``min_dim`` get ``P(None, 'model')``; everything else (biases, BN
    vectors, small kernels, optimizer scalars) is replicated. Conv kernels
    ``(k, in, out)`` shard the trailing output axis likewise.
    """
    shape = getattr(leaf, "shape", ())
    if len(shape) >= 2 and shape[-1] % model_size == 0 and shape[-1] >= min_dim:
        return P(*([None] * (len(shape) - 1) + ["model"]))
    return P()


def state_shardings(state: Any, mesh: Mesh, *, min_dim: int = 128) -> Any:
    """Tree of NamedShardings mirroring ``state`` under the TP rule above.

    Optimizer moments follow their parameters automatically because optax
    states are pytrees with the same leaf shapes.
    """
    model_size = mesh.shape["model"]

    def to_sharding(leaf):
        return NamedSharding(mesh, _leaf_spec(leaf, model_size, min_dim))

    return jax.tree_util.tree_map(to_sharding, state)


def shard_state(state: Any, mesh: Mesh, *, min_dim: int = 128) -> Any:
    """Place an existing state pytree onto the mesh per ``state_shardings``."""
    shardings = state_shardings(state, mesh, min_dim=min_dim)
    return jax.tree_util.tree_map(jax.device_put, state, shardings)
