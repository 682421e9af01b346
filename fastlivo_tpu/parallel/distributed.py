"""Multi-host initialization and mesh construction.

The reference has no multi-host story (single process, SURVEY.md §2); this
module is the DCN-facing half of the scaling design: initialize
`jax.distributed`, build a (hosts x local-chips) mesh whose point-sharding
axis spans all devices, and keep collectives on ICI within a host where
possible (the innovation psum is a two-stage reduce in XLA's hands once the
mesh axes are laid out devices-innermost).

On a single host this degrades gracefully to the local-device mesh used by
`parallel.make_mesh`.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh

from fastlivo_tpu.parallel.sharded import POINTS_AXIS


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed from args or the standard env variables
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). Returns
    True when running multi-process."""
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    pid = process_id if process_id is not None else int(os.environ.get("JAX_PROCESS_ID", "0"))
    if addr is None or nproc <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=addr, num_processes=nproc, process_id=pid
    )
    return True


def make_global_mesh() -> Mesh:
    """1-D mesh over ALL devices (all hosts), local devices contiguous so
    the point-psum's intra-host stage rides ICI."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return Mesh(np.asarray(devs), (POINTS_AXIS,))


def host_local_slice(n_points: int) -> slice:
    """The slice of a globally-sharded point axis owned by this host (for
    per-host data feeding with jax.make_array_from_process_local_data)."""
    nproc = jax.process_count()
    per = n_points // nproc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)
