from .mesh import DP_AXIS, TP_AXIS, dp_size, make_mesh, replicated, single_device_mesh, tp_size
from .sharding import (
    decoder_param_specs,
    shard_decoder_params,
    shard_state,
    state_specs,
    validate_tp,
)

__all__ = [
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
