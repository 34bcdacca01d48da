"""Multi-host entry points: jax.distributed bootstrap + metric gathering.

The reference launches one process per GPU with torch.distributed.launch and
gathers eval tensors with accelerator.gather_for_metrics
(reference: emnlp2023-topic_segmentation/run_finetune.sh:61,
sld/.../run_clm.py:680,890-897). The TPU-native equivalents:

- one process per HOST (not per chip); `jax.distributed.initialize` wires the
  hosts into one SPMD world; the mesh then spans all processes' devices.
- eval predictions computed per-process are exchanged with
  `multihost_utils.process_allgather` (XLA all-gather over DCN/ICI), the
  direct counterpart of gather_for_metrics.

Single-host runs (the common case, and all CI) take the no-op paths.
"""

from __future__ import annotations

import logging
import os
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

logger = logging.getLogger("spokennlp_tpu.dist")


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join the multi-host SPMD world; returns True if initialized.

    Arguments default to the standard JAX env vars / TPU metadata; on a
    single host (no coordinator reachable/configured) this is a no-op so the
    same CLI invocation works on a laptop, one chip, or a pod slice.

    IMPORTANT: no JAX API that initializes the XLA backend may run before
    jax.distributed.initialize (it raises once a backend exists), so this
    function decides from env/args alone and treats an
    'already initialized' error as success.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np:
        num_processes = int(env_np)
    if process_id is None and env_pid:
        process_id = int(env_pid)
    if not coordinator_address and num_processes is None:
        return False  # single-host run
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            "jax.distributed initialized: process %d/%d",
            jax.process_index(),
            jax.process_count(),
        )
        return True
    except RuntimeError as e:  # pragma: no cover - needs real multi-host
        if "already" in str(e).lower():
            return True
        raise
    except Exception as e:  # pragma: no cover - needs real multi-host
        logger.warning("jax.distributed.initialize failed: %s", e)
        return False


def allgather_ragged(
    local_lists: Sequence[Sequence[int]],
) -> List[List[int]]:
    """Gather per-process ragged int lists across all processes.

    The multi-host counterpart of accelerator.gather_for_metrics for
    prediction/reference label lists: each process contributes its local
    documents; every process returns the concatenation in process order.
    Single-process: identity (no device traffic).
    """
    if jax.process_count() == 1:
        return [list(x) for x in local_lists]
    from jax.experimental import multihost_utils  # pragma: no cover

    # Fixed-shape exchange: (count, max_len) padded with -1 sentinels.
    max_items = int(
        multihost_utils.process_allgather(
            np.asarray([len(local_lists)], np.int32)
        ).max()
    )
    max_len = max([1] + [len(x) for x in local_lists])
    max_len = int(
        multihost_utils.process_allgather(np.asarray([max_len], np.int32)).max()
    )
    padded = np.full((max_items, max_len + 1), -1, np.int32)
    for i, row in enumerate(local_lists):
        padded[i, 0] = len(row)
        padded[i, 1 : 1 + len(row)] = np.asarray(row, np.int32)
    gathered = multihost_utils.process_allgather(padded)  # (P, max_items, L+1)
    out: List[List[int]] = []
    for proc_block in gathered.reshape(-1, max_items, max_len + 1):
        for row in proc_block:
            n = int(row[0])
            if n >= 0:
                out.append(row[1 : 1 + n].tolist())
    return out
