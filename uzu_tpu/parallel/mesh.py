"""Device mesh construction for multi-chip execution.

The reference is strictly single-device (SURVEY.md §2.7: no process group or
collective anywhere in trymirai/uzu); this layer is the from-scratch TPU
design that wraps its single-chip execution model. Axes:

- ``dp``  — data parallel (independent sequences / continuous-batch slots)
- ``tp``  — tensor parallel (attention heads / MLP hidden / MoE experts)

GSPMD inserts the collectives: weights and KV are annotated with
NamedSharding over ``tp`` and the jitted step is compiled over the mesh, so
all-gathers/reduce-scatters ride ICI without hand-written comms.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"


def make_mesh(
    tp: int | None = None,
    dp: int | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a (dp, tp) mesh over `devices` (default: all).

    If only one of tp/dp is given the other absorbs the remaining devices;
    if neither is given, all devices go to tp (latency-oriented serving).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tp is None and dp is None:
        tp, dp = n, 1
    elif tp is None:
        if n % dp:
            raise ValueError(f"dp={dp} does not divide device count {n}")
        tp = n // dp
    elif dp is None:
        if n % tp:
            raise ValueError(f"tp={tp} does not divide device count {n}")
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def single_device_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), (DP_AXIS, TP_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def tp_size(mesh: Mesh) -> int:
    return mesh.shape[TP_AXIS]


def dp_size(mesh: Mesh) -> int:
    return mesh.shape[DP_AXIS]
