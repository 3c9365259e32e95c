"""Device mesh construction + multi-host bootstrap.

The reference has NO distributed layer (SURVEY.md §2 rows 15-16 — single
process, OpenMP only). This module is the TPU-native addition: a named
`Mesh` over the slice with axes ("data", "tp"), multi-host process init
via jax.distributed, and helpers to pick a mesh shape from the model.
Collectives ride ICI within a slice; pjit/XLA inserts them from the
shardings in turboinfer_tpu/parallel/shardings.py.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
TP_AXIS = "tp"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bootstrap (the TPU equivalent of the reference's
    absent MPI/NCCL layer). No-op on a single host."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = (DATA_AXIS, TP_AXIS),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a (data, tp) mesh. Default: all devices on the tp axis
    (weight sharding dominates for single-model inference)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names=tuple(axis_names))


def pick_mesh_shape(n_devices: int, num_kv_heads: int,
                    batch_size: int = None) -> Tuple[int, int]:
    """Choose (data, tp): tp = largest divisor of n that also divides
    num_kv_heads (KV cache shards evenly over heads), data = the rest.

    Maximizing tp already MINIMIZES the data degree, so there is no
    batch-aware tradeoff left to make — a former `batch_size`
    preference was provably inert (the first valid tp has the smallest
    possible data; any later candidate only grows it) and is kept only
    as an ignored parameter for callers that still pass it."""
    for tp in range(min(n_devices, num_kv_heads), 0, -1):
        if n_devices % tp or num_kv_heads % tp:
            continue
        return (n_devices // tp, tp)
    return (n_devices, 1)


def single_device_mesh() -> Mesh:
    return make_mesh((1, 1), devices=[jax.devices()[0]])
