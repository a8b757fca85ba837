"""Multi-host (multi-process SPMD) bootstrap and helpers.

Reference parity: none — the reference is strictly single-process; its only
device decision is one ``"cuda" if available else "cpu"`` string
(`Backend/services/__init__.py:35`). Production TPU pods are multi-process
SPMD: one Python process per host, each seeing only its local chips, with
``jax.distributed`` gluing every process's devices into one global device
set. This module is that glue, kept deliberately thin so the SAME jitted
train/encode steps used single-host run unchanged at pod scale:

- :func:`bootstrap` — idempotent ``jax.distributed.initialize``, env-driven
  (``EVR_TPU_COORDINATOR`` / ``EVR_TPU_NUM_PROCESSES`` /
  ``EVR_TPU_PROCESS_ID``) with bare auto-detection on real TPU pods.
- :func:`global_mesh` — mesh over ALL processes' devices.
- :func:`process_slice` — the rows of a global batch this process loads
  (disjoint, covering: the per-host data-loader contract).
- :func:`make_global_batch` — per-process host shards → one global
  ``jax.Array`` per leaf with ``P(axis)`` row sharding; matches the
  ``in_shardings`` the single-host train step already uses, so
  ``make_train_step(..., mesh=global_mesh())`` needs no multi-host branch.
- :func:`broadcast_from_coordinator` — process-0's pytree everywhere
  (identical init / restored checkpoints without seeding discipline).
- :func:`is_coordinator` / :func:`barrier` — checkpoint & log guards.

All cross-process communication rides the compiled computation (XLA
collectives over ICI/DCN on TPU, Gloo TCP on CPU) — no hand-rolled
sockets. Exercised with real separate OS processes in
``tests/test_multihost.py``.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_BOOTSTRAPPED = False


def bootstrap(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> tuple[int, int]:
    """Join the global device set. Returns ``(process_index, process_count)``.

    Explicit args win; otherwise ``EVR_TPU_COORDINATOR`` /
    ``EVR_TPU_NUM_PROCESSES`` / ``EVR_TPU_PROCESS_ID`` are read; if neither
    names a coordinator this is a no-op single-process bootstrap (on real
    TPU pods where the launcher provides cluster metadata, call
    ``jax.distributed.initialize()`` yourself or set the env vars).
    Idempotent: safe to call from every entry point.
    """
    global _BOOTSTRAPPED
    # Idempotency must be checked WITHOUT touching the backend:
    # jax.process_count() initialises XLA, after which
    # jax.distributed.initialize refuses to run. The private
    # global_state probe is backend-free.
    if not _BOOTSTRAPPED:
        try:
            from jax._src import distributed as _jdist

            _BOOTSTRAPPED = _jdist.global_state.client is not None
        except Exception:
            pass
    if _BOOTSTRAPPED:
        return jax.process_index(), jax.process_count()
    coordinator_address = coordinator_address or os.environ.get("EVR_TPU_COORDINATOR")
    if coordinator_address is None:
        return jax.process_index(), jax.process_count()
    if num_processes is None:
        num_processes = int(os.environ["EVR_TPU_NUM_PROCESSES"])
    if process_id is None:
        process_id = int(os.environ["EVR_TPU_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _BOOTSTRAPPED = True
    return jax.process_index(), jax.process_count()


def is_coordinator() -> bool:
    return jax.process_index() == 0


def global_mesh(
    axis_names: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Mesh over every device of every process.

    Single-axis by default (pure dp — the axis that grows in this
    workload); pass ``shape`` for dp×tp etc. Device order keeps each
    process's devices contiguous along the leading axis so ``P("data")``
    row sharding lines up with :func:`process_slice` host feeding.
    """
    devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    return Mesh(np.asarray(devices).reshape(shape), axis_names)


def process_slice(
    global_n: int,
    process_id: int | None = None,
    process_count: int | None = None,
) -> slice:
    """Rows of a size-``global_n`` global batch this process must load.

    Disjoint and covering across processes; ``global_n`` must divide evenly
    (pad the dataset, not the batch — static shapes keep XLA happy).
    """
    p = jax.process_index() if process_id is None else process_id
    n = jax.process_count() if process_count is None else process_count
    if global_n % n:
        raise ValueError(f"global batch {global_n} not divisible by {n} processes")
    per = global_n // n
    return slice(p * per, (p + 1) * per)


def make_global_batch(mesh: Mesh, batch, axis: str = "data"):
    """Per-process host shards → global row-sharded ``jax.Array`` pytree.

    Each process passes only ITS rows (the :func:`process_slice` of the
    global batch); the result is one logical array per leaf whose addressable
    shards are this process's devices. Matches the ``NamedSharding(mesh,
    P(axis))`` batch ``in_shardings`` of ``training.finetune.make_train_step``,
    so the jitted step runs unchanged.
    """
    sharding = NamedSharding(mesh, P(axis))
    nproc = jax.process_count()

    def convert(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * nproc,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(convert, batch)


def broadcast_from_coordinator(tree):
    """Replace every process's pytree with process-0's (exact bytes).

    Use after init or checkpoint-restore so all processes hold identical
    params without relying on seeding/filesystem discipline.
    """
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(tree)


def barrier(name: str = "evr_tpu_barrier") -> None:
    """Block until every process reaches this point."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
