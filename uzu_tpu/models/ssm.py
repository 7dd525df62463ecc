"""Hybrid mixer states + forward (Mamba2 / Gated DeltaNet / ShortConv).

Reference: crates/backend-uzu/src/encodable_block/mixer/{mamba2.rs,
delta_net.rs,short_conv.rs}. Implemented incrementally; ShortConv first.
"""

from __future__ import annotations

from ..config.model import DeltaNetConfig, Mamba2Config, ShortConvConfig


def init_ssm_state(layer_cfg, mixer_cfg, dtype):
    raise NotImplementedError(
        f"mixer {type(mixer_cfg).__name__} not implemented yet"
    )


def load_ssm_mixer(tree, mixer_cfg, model_dim):
    raise NotImplementedError(
        f"mixer {type(mixer_cfg).__name__} not implemented yet"
    )


def ssm_forward(mixer_cfg, params, x, positions, state):
    raise NotImplementedError(
        f"mixer {type(mixer_cfg).__name__} not implemented yet"
    )
