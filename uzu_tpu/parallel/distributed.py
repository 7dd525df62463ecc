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


def _put_tree(params, specs, mesh: Mesh):
    """Materialize a params subtree as global sharded arrays. The spec tree
    is a pytree PREFIX of params (one spec covers all leaves of a
    QuantizedTensor); flatten params up to the spec leaves."""
    from jax.sharding import NamedSharding

    flat_specs, treedef = jax.tree.flatten(
        specs, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    groups = treedef.flatten_up_to(params)
    out = [
        jax.tree.map(lambda l, ns=ns: put_global(l, mesh, ns.spec), grp)
        for ns, grp in zip(flat_specs, groups)
    ]
    return jax.tree.unflatten(treedef, out)


def shard_params_multihost(cfg, params, mesh: Mesh) -> dict:
    """Multi-process variant of sharding.shard_decoder_params: same spec
    tree, but materialized via put_global so it works when the mesh spans
    hosts. `params` must be identical on every host (normal weight loads).

    For models too large for one host's memory, use load_params_sharded,
    which streams group-by-group instead of requiring the full tree."""
    from .sharding import decoder_param_specs, validate_tp
    from .mesh import tp_size

    validate_tp(cfg, tp_size(mesh))
    specs = decoder_param_specs(cfg, params, mesh)
    return _put_tree(params, specs, mesh)


def _tree_host_bytes(tree) -> int:
    return sum(
        int(np.prod(l.shape, dtype=np.int64)) * l.dtype.itemsize
        for l in jax.tree.leaves(tree)
        if hasattr(l, "shape") and hasattr(l, "dtype")
    )


def load_params_sharded(model_dir: str, mesh: Mesh, *,
                        random_seed: int | None = None):
    """Per-process sharded weight loading for >1-host models (the
    BASELINE.md 70B-class functional tier; SURVEY §2.7).

    shard_params_multihost needs the FULL parameter tree on every host
    before sharding — impossible when the model outgrows one host. This
    loader streams the model group-by-group (embedding, each transformer
    layer, output norm, PLE): it builds one group's host tensors from the
    safetensors file (lazy reads, no whole-file prefetch), places ONLY this
    process's addressable shards via put_global, and drops the host copy
    before touching the next group. The full tree never materializes in any
    single process; peak host footprint is one group (~1/L of the model).

    Ref parity: generalizes the reference's single-host direct-into-
    allocation loads (parameters/loader.rs:192-213) to multi-host.

    Returns (config, sharded_params, stats); stats records
    total_file_bytes, peak_group_host_bytes and addressable_param_bytes so
    callers (and tests) can verify the streaming bound held.
    """
    import os

    from .mesh import tp_size
    from .sharding import _layer_specs, _replicate_tree, validate_tp
    from ..config import load_language_model_config
    from ..models.loader import (
        load_embedding,
        load_layer,
        load_norm,
    )
    from ..params.tree import ParameterLoader

    config = load_language_model_config(os.path.join(model_dir, "config.json"))
    cfg = config.decoder_config
    validate_tp(cfg, tp_size(mesh))
    loader = ParameterLoader(
        os.path.join(model_dir, "model.safetensors"),
        random_seed=random_seed,
        prefetch=False,  # lazy: never pull the whole file into host memory
    )
    tree = loader.tree()
    tcfg = cfg.transformer_config
    model_dim = tcfg.model_dim
    peak = 0

    def put(group, specs):
        nonlocal peak
        peak = max(peak, _tree_host_bytes(group))
        return _put_tree(group, specs, mesh)

    emb = load_embedding(tree, cfg.embedding_config, cfg.vocab_size, model_dim)
    params: dict = {"embedding": put(emb, _replicate_tree(emb, mesh))}
    del emb
    layers = []
    for i, lc in enumerate(tcfg.layer_configs):
        p = load_layer(
            tree.subtree(f"transformer.layers.{i}"), lc, model_dim, tcfg.hidden_dim
        )
        layers.append(put(p, _layer_specs(lc, p, mesh)))
        del p
    params["layers"] = layers
    onorm = load_norm(
        tree.subtree("transformer.output_norm"), model_dim, tcfg.output_norm_config
    )
    params["output_norm"] = put(onorm, _replicate_tree(onorm, mesh))
    del onorm
    if cfg.ple_model_config is not None:
        from ..models.ple import load_ple

        ple = load_ple(tree, cfg, tcfg)
        params["per_layer_embedding"] = put(ple, _replicate_tree(ple, mesh))
        del ple
    tree.assert_all_validated()
    addressable = sum(
        sum(s.data.nbytes for s in l.addressable_shards)
        for l in jax.tree.leaves(params)
        if hasattr(l, "addressable_shards")
    )
    stats = {
        "total_file_bytes": sum(
            info.nbytes for info in loader._file.tensors.values()
        ),
        "peak_group_host_bytes": peak,
        "addressable_param_bytes": addressable,
    }
    return config, params, stats
