"""Multi-host / multi-slice launch: the `accelerate launch` equivalent.

The reference trains through HF accelerate, whose launcher starts one rank
per GPU and wires torch.distributed/NCCL (/root/reference/train_stage2.py:22-23,99;
README.md:372,390). The TPU-native equivalent is one *process per host*,
`jax.distributed.initialize` for the coordination service, and a global
device mesh whose outermost axis spans hosts/slices (collectives across it
ride DCN, everything inner rides ICI).

Launch contract (mirrors `torchrun`/`accelerate launch` env semantics):

    DIFFBIR_COORDINATOR=host:port    address of process 0
    DIFFBIR_NUM_PROCESSES=N          total processes
    DIFFBIR_PROCESS_ID=i             this process's rank

On a real TPU pod slice none of these are needed: set
``DIFFBIR_AUTO_DISTRIBUTED=1`` and `jax.distributed.initialize()`
auto-detects everything from the TPU runtime metadata.

Mesh layout: ``make_global_mesh`` arranges the global devices as
(dcn, data, tensor) with the process/slice dimension outermost, so

- pure DP: batch sharded over ("dcn", "data") — grad allreduce is a
  hierarchical psum (intra-slice ICI reduce, then one DCN hop),
- FSDP: param/moment shards stay P("data") (intra-slice ICI all-gathers,
  the HBM-heavy traffic) and are *replicated* across "dcn" — the standard
  FSDP-within-slice x DP-across-slices layout from the scaling playbook.

Single-process, the mesh degrades to the ("data", "tensor") layout of
``mesh.make_mesh`` with a size-1 "dcn" axis, so all sharding code paths are
identical in tests and production.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Wire the jax coordination service from the launch env.

    MUST run before any jax backend touch (device queries, config that
    initializes the platform). Returns True iff a multi-process runtime was
    initialized.
    """
    coord = os.environ.get("DIFFBIR_COORDINATOR")
    if coord:
        num = int(os.environ["DIFFBIR_NUM_PROCESSES"])
        pid = int(os.environ["DIFFBIR_PROCESS_ID"])
        jax.distributed.initialize(
            coordinator_address=coord, num_processes=num, process_id=pid
        )
        return True
    if os.environ.get("DIFFBIR_AUTO_DISTRIBUTED"):
        # TPU pod: coordinator/process-id come from the TPU runtime metadata
        jax.distributed.initialize()
        return True
    return False


def is_main_process() -> bool:
    """Process-0 guard for TB writes, deployable exports, prints."""
    return jax.process_index() == 0


def make_global_mesh(n_tensor: int = 1, devices=None) -> Mesh:
    """(dcn, data, tensor) mesh over ALL processes' devices.

    The dcn axis length equals the process count (one row per host/slice);
    each row holds that process's local devices so "data"/"tensor"
    collectives never leave the slice.
    """
    devices = devices if devices is not None else jax.devices()
    procs = sorted({d.process_index for d in devices})
    rows = [[d for d in devices if d.process_index == p] for p in procs]
    per = len(rows[0])
    if any(len(r) != per for r in rows):
        raise ValueError(
            f"make_global_mesh: uneven local device counts "
            f"{[len(r) for r in rows]} across processes"
        )
    if per % n_tensor:
        raise ValueError(f"local devices {per} not divisible by n_tensor={n_tensor}")
    arr = np.array(rows).reshape(len(rows), per // n_tensor, n_tensor)
    return Mesh(arr, axis_names=("dcn", "data", "tensor"))


def batch_pspec(mesh: Mesh) -> P:
    """Batch-axis PartitionSpec for either mesh flavor."""
    if "dcn" in mesh.axis_names:
        return P(("dcn", "data"))
    return P("data")


def shard_global_batch(mesh: Mesh, tree, pspec: Optional[P] = None):
    """Build global device arrays from each process's LOCAL batch shard.

    Every process passes its own ``global_batch // num_processes`` rows;
    the returned arrays are logically global (leading dim = sum over
    processes) and sharded per ``pspec`` (default: the batch axis over
    (dcn, data)). Single-process this is a plain sharded device_put.
    """
    spec = batch_pspec(mesh) if pspec is None else pspec
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), tree
        )
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        tree,
    )


def process_seed(seed: int) -> int:
    """Per-process data seed (accelerate's set_seed(device_specific=True))."""
    return seed + jax.process_index() * 1_000_003


def gather_to_host(mesh: Mesh, tree):
    """Fetch a (possibly FSDP-sharded) pytree to host numpy on EVERY process.

    A sharded leaf is not fully addressable under multihost, so a plain
    ``jax.device_get`` fails there; the jit-identity with replicated
    out_shardings all-gathers once on-device (ICI/DCN), after which every
    host can read its local copy. Used for deployable exports.
    """
    rep = NamedSharding(mesh, P())
    shardings = jax.tree_util.tree_map(lambda _: rep, tree)
    gathered = jax.jit(lambda t: t, out_shardings=shardings)(tree)
    return jax.device_get(gathered)


def sync_processes(tag: str = "barrier") -> None:
    """Cross-process barrier (torch.distributed.barrier equivalent)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)
