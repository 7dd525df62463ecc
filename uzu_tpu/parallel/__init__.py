from .distributed import initialize, make_hybrid_mesh, process_local_batch_slots
from .mesh import DP_AXIS, TP_AXIS, dp_size, make_mesh, replicated, single_device_mesh, tp_size
from .sharding import (
    decoder_param_specs,
    shard_decoder_params,
    shard_state,
    state_specs,
    validate_tp,
)

__all__ = [
    "initialize",
    "make_hybrid_mesh",
    "process_local_batch_slots",
    "DP_AXIS",
    "TP_AXIS",
    "dp_size",
    "make_mesh",
    "replicated",
    "single_device_mesh",
    "tp_size",
    "decoder_param_specs",
    "shard_decoder_params",
    "shard_state",
    "state_specs",
    "validate_tp",
]
