"""Mesh construction for the proving workload.

One logical axis pair covers every parallelism mode in SURVEY.md §2.3:

- ``"data"``  — element-parallel work: MSM points, Poseidon batch lanes,
  polynomial coefficients (the TP/SP-analog for this workload);
- ``"expert"`` — independent proofs / circuit replicas routed to different
  device groups (the DP/EP-analog).

Both collapse onto a single flat axis when only one kind of parallelism is
in play; helpers below build either shape.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

DATA_AXIS = "data"
EXPERT_AXIS = "expert"


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over ``n_devices`` with a single "data" axis."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def grid_mesh(n_expert: int, n_data: int, devices=None) -> Mesh:
    """A 2-D (expert, data) mesh: proof replicas x intra-proof sharding."""
    if devices is None:
        devices = jax.devices()[: n_expert * n_data]
    arr = np.asarray(devices).reshape(n_expert, n_data)
    return Mesh(arr, (EXPERT_AXIS, DATA_AXIS))
