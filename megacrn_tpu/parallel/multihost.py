"""Multi-host entry: process-group init, global mesh, per-host data sharding.

The reference has no distributed layer (SURVEY.md 2.5); this is the
TPU-native equivalent of its missing NCCL/MPI story: ``jax.distributed``
process groups (DCN rendezvous), a global 2-D ``(data, node)`` mesh over all
hosts' devices laid out so the node axis rides ICI within a slice, and
host-local batch feeding via ``jax.make_array_from_process_local_data``.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from megacrn_tpu.parallel.mesh import DATA_AXIS, NODE_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """``jax.distributed.initialize`` wrapper. On single-host (or under a
    test harness) it is a no-op; on a pod slice pass the coordinator or rely
    on TPU environment auto-detection."""
    if num_processes is not None and num_processes <= 1:
        return
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
    except (RuntimeError, ValueError) as e:  # already initialized
        if "already" not in str(e):
            raise


def global_mesh(data: Optional[int] = None, node: Optional[int] = None) -> Mesh:
    """Build the (data, node) mesh over ALL devices (across hosts).

    Defaults: node axis spans the devices of one host (ICI-adjacent so the
    per-scan-step boundary exchanges stay off DCN), data axis spans hosts.
    """
    devices = jax.devices()
    if node is None:
        node = max(1, jax.local_device_count())
    if data is None:
        data = len(devices) // node
    dev_array = np.asarray(devices[: data * node]).reshape(data, node)
    return Mesh(dev_array, (DATA_AXIS, NODE_AXIS))


def host_local_batch_to_global(mesh: Mesh, arrays):
    """Assemble per-host numpy batch shards into global jax.Arrays sharded
    (data, None, node, None). Each host feeds its own slice of the global
    batch; jax stitches them into one addressable-sharded array."""
    sharding = NamedSharding(mesh, P(DATA_AXIS, None, NODE_AXIS, None))

    def convert(a):
        return jax.make_array_from_process_local_data(sharding, np.asarray(a))

    return jax.tree_util.tree_map(convert, arrays)
