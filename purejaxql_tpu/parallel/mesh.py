"""Mesh construction and multi-host initialization.

The reference is single-process single-device (SURVEY.md §2: no
pmap/psum/sharding anywhere); this module is the net-new TPU scaling layer.
Axis convention:

- "env"  — the env/data-parallel axis. Environments, rollouts and learn
           minibatches shard along it; gradients and batch-norm statistics
           reduce over it. On a pod slice this axis should map onto ICI.
- "seed" — optional independent-replica axis for parallel seeds: no
           communication crosses it (each seed is an isolated experiment).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[Sequence[int]] = None) -> None:
    """Initialize jax.distributed for multi-host pods.

    With explicit arguments (or cluster env vars: JAX_COORDINATOR_ADDRESS /
    the Cloud-TPU metadata jax.distributed auto-detects), initialization is
    REQUIRED to succeed — a mis-configured pod must fail loudly, not fall
    back to N isolated single-process runs that silently train N disjoint
    models. Only when no coordinator is discoverable at all does this
    no-op (the ordinary single-host workflow)."""
    import os

    explicit = coordinator_address is not None or any(
        os.environ.get(k)
        for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS")
    )
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    ) or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if explicit:
        jax.distributed.initialize(
            coordinator_address, num_processes, process_id,
            local_device_ids=local_device_ids,
        )
        return
    try:
        jax.distributed.initialize()
    except Exception:  # no cluster metadata discoverable
        if num_processes not in (None, 1):
            raise  # a multi-process run was requested: fail loudly
        # ordinary single-host workflow: run un-distributed


def make_mesh(
    env: Optional[int] = None,
    seed: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (seed, env) mesh over the given (default: all) devices.

    `env=None` uses all remaining devices for the env axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if env is None:
        assert n % seed == 0, f"{n} devices not divisible by seed={seed}"
        env = n // seed
    assert seed * env == n, f"mesh {seed}x{env} != {n} devices"
    dev_array = np.asarray(devices).reshape(seed, env)
    return Mesh(dev_array, axis_names=("seed", "env"))


def is_main_process() -> bool:
    return jax.process_index() == 0
