"""Per-layer embeddings (Gemma-4 PLE).

Reference: crates/backend-uzu/src/encodable_block/per_layer_embedding.rs.
Implemented in a later milestone.
"""

from __future__ import annotations


def load_ple(tree, cfg, tcfg):
    raise NotImplementedError("PLE not implemented yet")
