"""Device meshes and sharding helpers.

The reference has no distributed substrate at all — every device decision is
a single ``"cuda" if available else "cpu"`` string
(`Backend/services/__init__.py:35`). Here scale is a mesh-axis change:

- ``data`` axis: data-parallel training batches and the sharded frame index
  (the frame count N is the axis that actually grows in this workload —
  SURVEY.md §5.7).
- ``model`` axis (optional): tensor-parallel sharding of the towers for
  variants large enough to want it.

All collectives ride XLA (psum / all_gather / reduce_scatter over ICI); no
hand-rolled communication.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def local_device_count() -> int:
    return len(jax.devices())


def get_mesh(
    n_devices: int | None = None,
    axis_names: tuple[str, ...] = ("data",),
    shape: tuple[int, ...] | None = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    With the default single axis, all devices go to data parallelism. Pass
    ``shape``/``axis_names`` for 2-D (data, model) layouts.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def get_multislice_mesh(
    n_slices: int,
    chips_per_slice: int,
    axis_names: tuple[str, str] = ("replica", "data"),
) -> Mesh:
    """Multi-slice layout: the outer ``replica`` axis crosses slices (DCN),
    the inner ``data`` axis stays within a slice (ICI). Keep
    bandwidth-hungry collectives (feature all-gathers for the global-batch
    contrastive loss, index row sharding) on the inner axis; only the
    gradient psum crosses the slow outer axis. With real multi-slice
    hardware, construct via jax.experimental.mesh_utils'
    create_hybrid_device_mesh with the same axis semantics.
    """
    devices = jax.devices()
    need = n_slices * chips_per_slice
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:need]).reshape(n_slices, chips_per_slice)
    return Mesh(dev_array, axis_names)


def shard_rows(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (row) dimension across ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
