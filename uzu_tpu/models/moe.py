"""Mixture-of-experts block (router top-k + bucketed experts).

Reference: crates/backend-uzu/src/encodable_block/mlp/moe/mod.rs:31-354.
TPU design: dense per-token top-k routing with capacity-free gather/scatter
via one-hot matmuls for small expert counts, or ragged/sorted dispatch for
large ones. Implemented in a later milestone.
"""

from __future__ import annotations


def load_moe(tree, cfg, model_dim):
    raise NotImplementedError("MoE not implemented yet")


def moe_forward(cfg, params, x):
    raise NotImplementedError("MoE not implemented yet")
