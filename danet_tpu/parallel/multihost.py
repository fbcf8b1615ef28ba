"""Multi-host bring-up + per-host data sharding.

The reference is strictly single-process (SURVEY.md §2.4).  This module is
the multi-host entry path for pod-scale training: ``initialize()`` wires up
``jax.distributed`` (controller discovery via env or explicit args), and
``host_batch_slice`` computes which rows of the global batch this host
feeds, so the input pipeline shards deterministically across hosts
(each host loads only its slice; GSPMD sees one global array via
``jax.make_array_from_process_local_data``).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if a multi-process env is configured.

    Returns True if distributed mode is active. No-op (False) for
    single-process runs, so the same entry point works everywhere.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "DANET_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        return False
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return True


def host_batch_slice(global_batch: int) -> slice:
    """Rows of the global batch this host is responsible for loading."""
    n_proc = jax.process_count()
    pid = jax.process_index()
    assert global_batch % n_proc == 0, (
        "global batch %d must divide across %d hosts"
        % (global_batch, n_proc))
    per = global_batch // n_proc
    return slice(pid * per, (pid + 1) * per)


def global_batch_from_local(mesh, local_batch_np: np.ndarray):
    """Assemble a globally-sharded array from this host's batch slice."""
    from danet_tpu.parallel.sharding import batch_sharding
    if jax.process_count() == 1:
        return jax.device_put(local_batch_np, batch_sharding(mesh))
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), local_batch_np)
