"""Device mesh construction and sharding rules.

The reference's only parallelism is NCCL data-parallel via
torch.distributed.launch (reference: emnlp2023-topic_segmentation/
run_finetune.sh:61, sld/run.sh:231). The TPU-native replacement is a
jax.sharding.Mesh with a ``data`` axis (DP over ICI) and an optional ``model``
axis (TP for encoders larger than the reference's <=350M models); gradients
reduce via XLA psum — no hand-written communication.

Param partitioning is rule-based on the flattened param path:
  - fused QKV kernels   (H, 3, nh, hd)  -> shard nh over "model"
  - attention out       (nh, hd, H)     -> shard nh over "model"
  - mlp_in kernel       (H, I)          -> shard I  over "model"
  - mlp_out kernel      (I, H)          -> shard I  over "model"
  - embeddings / LayerNorm / heads      -> replicated
Batch tensors shard their leading axis over "data".
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    model_parallel_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Mesh of shape (n_devices // mp, mp) with axes (data, model)."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    assert n % model_parallel_size == 0, (n, model_parallel_size)
    grid = np.asarray(devices).reshape(n // model_parallel_size, model_parallel_size)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def param_partition_spec(path: tuple, value) -> P:
    """Partition rule for one parameter, keyed on its flattened path."""
    names = [getattr(k, "key", str(k)) for k in path]
    leaf = names[-1]
    joined = "/".join(names)
    ndim = getattr(value, "ndim", len(getattr(value, "shape", ())))

    if "qkv" in names:
        # kernel (H, 3, nh, hd) / bias (3, nh, hd): shard heads
        return P(None, None, MODEL_AXIS, None) if ndim == 4 else P(None, MODEL_AXIS, None)
    if "out" in names and "attention" in joined:
        # kernel (nh, hd, H): shard heads; bias (H,) replicated
        return P(MODEL_AXIS, None, None) if ndim == 3 else P(None)
    if "mlp_in" in names:
        return P(None, MODEL_AXIS) if leaf == "kernel" else P(MODEL_AXIS)
    if "mlp_out" in names:
        return P(MODEL_AXIS, None) if leaf == "kernel" else P(None)
    if leaf in ("w_in", "w_out") and any("moe" in n for n in names):
        # expert parallelism: MoE expert stacks (E, ...) shard on "model"
        return P(MODEL_AXIS, *([None] * (ndim - 1)))
    return P(*([None] * ndim))


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh according to the partition rules."""

    def place(path, x):
        spec = param_partition_spec(path, x)
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_sharding_tree(params, mesh: Mesh):
    """NamedSharding pytree matching ``params`` (for jit in/out shardings)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, x: NamedSharding(mesh, param_partition_spec(path, x)), params
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis, rest replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


REPLICATED_BATCH_PREFIXES = ("cssl_", "topic_cl_")
"""Batch keys that are NOT batch-leading: the CSSL list-mode index tensors
are flattened (B*K) / (k, B*K) cross-window gather indices into the whole
batch's eop features (data/cssl_sampling.py) — they replicate, and XLA
inserts the all-gather the cross-shard gathers need."""


def shard_batch(batch, mesh: Mesh):
    """Place batch tensors onto the mesh, leading axis over "data".

    The leading axis must divide evenly into the data-axis size — callers pad
    short batches first (batches_from_docs / predict_windows repeat the last
    row); raising here beats XLA's opaque uneven-shard error. Keys matching
    REPLICATED_BATCH_PREFIXES are replicated instead.
    """
    dp = mesh.shape[DATA_AXIS]
    sh = batch_sharding(mesh)
    replicated = NamedSharding(mesh, P())

    def place(path, x):
        key = getattr(path[-1], "key", str(path[-1])) if path else ""
        if any(str(key).startswith(p) for p in REPLICATED_BATCH_PREFIXES):
            return jax.device_put(x, replicated)
        n = np.shape(x)[0]
        if n % dp != 0:
            raise ValueError(
                f"batch axis {n} (key {key!r}) not divisible by data-parallel "
                f"size {dp}; pad the batch (repeat rows) before sharding"
            )
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map_with_path(place, batch)
