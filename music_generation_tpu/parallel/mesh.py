"""Device mesh + sharding rules (the distributed backbone).

Replaces the reference's dormant torch-DDP plumbing (VISinger/utils/
pl_utils.py:847-903) with jax.sharding: a (data, model) mesh; batches are
sharded over `data` (DP) and large 2-D+ weights are sharded over `model` on
their last axis (TP) — XLA inserts the all-gathers/psums over ICI.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n_total = len(devices)
    if n_data is None:
        n_data = n_total // n_model
    assert n_data * n_model == n_total, (n_data, n_model, n_total)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def param_partition_spec(path: tuple, value: jnp.ndarray, n_model: int,
                         min_size: int = 2 ** 16) -> P:
    """Tensor-parallel rule: shard the last axis of big >=2-D weights over
    `model` when divisible; everything else replicated."""
    if (value.ndim >= 2 and value.size >= min_size
            and value.shape[-1] % n_model == 0 and n_model > 1):
        return P(*([None] * (value.ndim - 1) + ["model"]))
    return P()


def shard_params(params, mesh: Mesh):
    """Apply the TP rule across a param pytree; returns sharded params."""
    n_model = mesh.shape["model"]

    def place(path, x):
        if not hasattr(x, "ndim"):
            return x
        spec = param_partition_spec(path, x, n_model)
        if jax.process_count() > 1:
            # multi-host: hand device_put the host-replicated numpy value
            # (identical on every process — same init seed) so each process
            # places only its addressable shards of the GLOBAL array
            x = np.asarray(x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    flat = jax.tree_util.tree_flatten_with_path(params)
    leaves = [place(p, x) for p, x in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], leaves)


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching `params` (for jit in_shardings)."""
    n_model = mesh.shape["model"]

    def spec(path, x):
        if not hasattr(x, "ndim"):
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, param_partition_spec(path, x, n_model))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    return jax.tree_util.tree_unflatten(treedef, [spec(p, x) for p, x in flat])


def make_hybrid_mesh(n_model: int = 1) -> Mesh:
    """(data, model) mesh for MULTI-HOST runs: `model` is laid out inside a
    host (collectives ride ICI), `data` spans hosts (gradient psum crosses
    DCN once per step) — the standard DP-over-hosts / TP-within-host layout
    for v5e pods (4 chips per host). Single-process falls back to
    :func:`make_mesh`.

    Replaces the reference's multi-node story (torch-DDP `mp.spawn` +
    NCCL, VISinger/utils/pl_utils.py:847-903) with a jax.distributed
    global mesh.
    """
    nproc = jax.process_count()
    if nproc == 1:
        return make_mesh(n_model=n_model)
    local = jax.local_device_count()
    assert local % n_model == 0, (local, n_model)
    n_slices = len({getattr(d, "slice_index", 0) for d in jax.devices()})
    if n_slices > 1:
        # multislice pod: DCN between slices — let jax order the mesh so
        # `data` crosses DCN outermost and `model` stays inside a slice
        from jax.experimental import mesh_utils
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(local // n_model, n_model),
            dcn_mesh_shape=(n_slices, 1))
        return Mesh(devices, axis_names=("data", "model"))
    # single slice (or CPU test fabric): keep each process's devices
    # contiguous along `data` so a host's batch shard lands on its own
    # chips, and `model` never crosses a process boundary
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devices).reshape(nproc * (local // n_model), n_model)
    return Mesh(arr, axis_names=("data", "model"))


def put_global_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Place a PER-PROCESS batch dict onto the mesh as GLOBAL arrays.

    Multi-host: every process passes its own local rows; the global batch
    axis is the concatenation over processes
    (jax.make_array_from_process_local_data — no cross-host data motion,
    each host keeps feeding only its addressable shards). Single-process:
    a plain sharded device_put.
    """
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in batch.items()}
    return {k: jax.make_array_from_process_local_data(sharding,
                                                      np.asarray(v))
            for k, v in batch.items()}
