"""Multi-host initialization + mesh construction over ICI/DCN.

No reference counterpart (trymirai/uzu is single-process, SURVEY.md §2.7).
Design for multi-host serving:

- every host runs the same program; `initialize()` wires jax.distributed
  (coordinator = host 0), after which jax.devices() spans the full slice;
- `make_hybrid_mesh(tp, dp)` lays tp over ICI (within-host/slice axes) and
  dp over DCN (across slices) — collectives from TP shardings then ride
  ICI, only data-parallel traffic crosses DCN;
- the serving pattern: one BatchEngine per dp replica, a host-0 HTTP
  frontend routing requests round-robin (each replica is an independent
  batch domain; TP shards within a replica).

This module is exercised single-process in CI (the driver's
dryrun_multichip compiles the sharded step over a virtual mesh); real
multi-host runs need >= 2 hosts, which this environment does not provide.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

from .mesh import DP_AXIS, TP_AXIS


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed init, tolerant of single-process use. Arguments
    default to the standard env vars (JAX_COORDINATOR_ADDRESS etc.) or TPU
    metadata autodetection."""
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return  # single-process: nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_hybrid_mesh(tp: int | None = None, dp: int | None = None) -> Mesh:
    """(dp, tp) mesh with tp innermost so TP collectives map to ICI
    neighbors (jax device order enumerates ICI-adjacent devices first)."""
    devices = jax.devices()
    n = len(devices)
    if tp is None:
        tp = min(n, jax.local_device_count())
    if dp is None:
        dp = n // tp
    if dp * tp != n:
        raise ValueError(f"dp*tp = {dp}*{tp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


def process_local_batch_slots(total_slots: int) -> tuple[int, int]:
    """Continuous-batching slot range owned by this host (dp replica)."""
    per = total_slots // jax.process_count()
    start = per * jax.process_index()
    return start, per


def put_global(x, mesh: Mesh, spec) -> jax.Array:
    """Create a global sharded array in a MULTI-PROCESS program from
    host-local data (every host holds the full value, e.g. weights loaded
    from the same file). jax.device_put cannot target non-addressable
    devices; make_array_from_callback hands each host only its addressable
    shards."""
    from jax.sharding import NamedSharding

    import numpy as np_

    x = np_.asarray(x)
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def shard_params_multihost(cfg, params, mesh: Mesh) -> dict:
    """Multi-process variant of sharding.shard_decoder_params: same spec
    tree, but materialized via put_global so it works when the mesh spans
    hosts. `params` must be identical on every host (normal weight loads)."""
    from .sharding import decoder_param_specs, validate_tp
    from .mesh import tp_size

    from jax.sharding import NamedSharding

    validate_tp(cfg, tp_size(mesh))
    specs = decoder_param_specs(cfg, params, mesh)
    # the spec tree is a pytree PREFIX of params (one spec covers all leaves
    # of a QuantizedTensor); flatten params up to the spec leaves
    flat_specs, treedef = jax.tree.flatten(
        specs, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    groups = treedef.flatten_up_to(params)
    out = [
        jax.tree.map(lambda l, ns=ns: put_global(l, mesh, ns.spec), grp)
        for ns, grp in zip(flat_specs, groups)
    ]
    return jax.tree.unflatten(treedef, out)
