"""DFlash draft model: target-feature-conditioned block drafting.

Reference: crates/backend-uzu/src/encodable_block/dflash.rs + speculators/
dflash_tfm.rs. The distinctive design (dflash.rs:100-380):

- the draft's per-layer KV cache is written FROM TARGET FEATURES, not from
  its own forward pass: accepted target tokens' tapped hidden states
  (target_layer_ids) are packed, projected (context_projection), normalized,
  and mapped to every draft layer's K/V rows by one state_kv_projection;
  K gets key-norm + RoPE at append (mode.rs:148-171);
- drafting runs the whole lookahead block in ONE forward: tokens =
  [target_output, mask, mask, ...], and each block row attends ONLY itself
  within the block (TrieNodes with trie_end = index + 1, dflash.rs:310-317)
  plus the feature-derived prefix — non-autoregressive block prediction;
- rows 1..block are read out through the TARGET embedding and top-k'd into
  per-depth candidates (the weaver then grows a tree; here the tree is
  assembled host-side from the fetched candidates).

The draft's own block KV writes are NEVER committed (mask tokens are not
context) — functionally free here: the jitted draft step simply does not
return the updated caches.
"""

from __future__ import annotations

import json
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model import (
    AttentionConfig,
    DFlashDraftConfig,
    SpeculatorModelConfig,
)
from ..config.serde import parse
from ..models.decoder import embedding_lookup, embedding_readout, layer_forward
from ..models.kv_cache import append as kv_append
from ..models.loader import load_layer, load_linear, load_norm
from ..ops.linear import linear_apply
from ..ops.norm import normalize
from ..ops.rope import apply_rope, inverse_frequencies, rope_tables
from ..params.tree import ParameterLoader


class DFlashDraft:
    def __init__(self, cfg: DFlashDraftConfig, params: dict, max_context: int = 4096):
        self.cfg = cfg
        self.params = params
        self.max_context = max_context
        first = cfg.layer_configs[0].mixer_config
        assert isinstance(first, AttentionConfig), "DFlash layers must be attention"
        self.num_groups = first.num_groups
        self.head_dim = first.head_dim
        self.key_norm_config = first.key_norm_config
        self._accept_jit = {}
        self._draft_jit = {}

    # -- loading -----------------------------------------------------------

    @classmethod
    def from_dir(cls, model_dir: str, max_context: int = 4096) -> "DFlashDraft":
        with open(os.path.join(model_dir, "config.json")) as f:
            model_cfg = parse(SpeculatorModelConfig, json.load(f))
        cfg = model_cfg.speculator_config.draft_config
        loader = ParameterLoader(os.path.join(model_dir, "model.safetensors"))
        tree = loader.tree().subtree("speculator.draft_model")
        params = cls._load(tree, cfg)
        return cls(cfg, params, max_context=max_context)

    @staticmethod
    def _load(tree, cfg: DFlashDraftConfig) -> dict:
        d = cfg.model_dim
        n_tap = len(cfg.target_layer_ids)
        first = cfg.layer_configs[0].mixer_config
        layer_kv_dim = 2 * first.num_groups * first.head_dim
        return {
            "context_projection": load_linear(
                tree.subtree("context_projection"), d * n_tap, d, False
            ),
            "context_norm": load_norm(tree.subtree("context_norm"), d, cfg.context_norm_config),
            "state_kv_projection": load_linear(
                tree.subtree("state_kv_projection"), d, len(cfg.layer_configs) * layer_kv_dim,
                False,
            ),
            "layers": [
                load_layer(tree.subtree(f"layers.{i}"), lc, d, cfg.hidden_dim)
                for i, lc in enumerate(cfg.layer_configs)
            ],
            "output_norm": load_norm(tree.subtree("output_norm"), d, cfg.output_norm_config),
        }

    # -- state ---------------------------------------------------------------

    def new_state(self) -> dict:
        c = min(self.max_context, self.cfg.rope_config.max_sequence_length)
        layers = [
            {
                "k": jnp.zeros((c, self.num_groups, self.head_dim), jnp.bfloat16),
                "v": jnp.zeros((c, self.num_groups, self.head_dim), jnp.bfloat16),
            }
            for _ in self.cfg.layer_configs
        ]
        return {"layers": layers, "pos": jnp.zeros((), jnp.int32)}

    # -- accept: write target features into the draft KV ---------------------

    def _accept_fn(self, n: int):
        if n not in self._accept_jit:
            cfg = self.cfg
            g, dh = self.num_groups, self.head_dim
            n_layers = len(cfg.layer_configs)
            inv_freq, attn_scale = inverse_frequencies(cfg.rope_config)
            inv_freq = np.asarray(inv_freq)

            @partial(jax.jit, donate_argnums=(1,))
            def accept(params, state, packed, true_length):
                # packed [n, n_tap * D] (token-major, tap chunks in
                # target_layer_ids order — dflash.rs:233-245)
                projected = linear_apply(params["context_projection"]["w"], packed)
                normed = normalize(
                    projected, cfg.context_norm_config,
                    params["context_norm"]["scales"],
                    params["context_norm"].get("biases"),
                )
                kv = linear_apply(params["state_kv_projection"]["w"], normed)
                kv = kv.reshape(n, n_layers, 2, g, dh)
                positions = state["pos"] + jnp.arange(n, dtype=jnp.int32)
                cos, sin = rope_tables(jnp.asarray(inv_freq), attn_scale, positions)
                new_layers = []
                for li, lc in enumerate(cfg.layer_configs):
                    k_new = kv[:, li, 0]
                    v_new = kv[:, li, 1]
                    if self.key_norm_config is not None:
                        k_new = normalize(
                            k_new, self.key_norm_config,
                            params["layers"][li]["mixer"]["k_norm_scales"],
                        )
                    k_new = apply_rope(k_new, cos, sin)
                    new_layers.append(
                        kv_append(state["layers"][li], k_new, v_new, positions, true_length)
                    )
                return {
                    "layers": new_layers,
                    "pos": state["pos"] + true_length.astype(jnp.int32),
                }

            self._accept_jit[n] = accept
        return self._accept_jit[n]

    def accept(self, state: dict, packed_features, n_real: int) -> dict:
        """packed_features [n, n_tap, D] or [n, n_tap*D]; rows beyond n_real
        are padding."""
        packed = jnp.asarray(packed_features)
        if packed.ndim == 3:
            packed = packed.reshape(packed.shape[0], -1)
        fn = self._accept_fn(packed.shape[0])
        return fn(self.params, state, packed, jnp.asarray(n_real, jnp.int32))

    # -- draft: one block forward -> per-depth candidates --------------------

    def _draft_fn(self, candidate_count: int, target_ecfg):
        key = (candidate_count, id(target_ecfg))
        if key not in self._draft_jit:
            cfg = self.cfg
            b = cfg.block_size

            @jax.jit
            def draft(params, state, target_table, root_token):
                tokens = jnp.full((b,), cfg.mask_token_id, jnp.int32)
                tokens = tokens.at[0].set(root_token)
                x = embedding_lookup(target_table, tokens)
                if target_ecfg.input_scale is not None:
                    x = (x.astype(jnp.float32) * target_ecfg.input_scale).astype(x.dtype)
                positions = state["pos"] + jnp.arange(b, dtype=jnp.int32)
                # block rows attend only themselves within the block
                # (dflash.rs:310-317) + the feature prefix
                self_mask = jnp.eye(b, dtype=bool)
                tree = (state["pos"], self_mask)
                for li, lc in enumerate(cfg.layer_configs):
                    x, _ = layer_forward(
                        lc, params["layers"][li], x, positions,
                        state["layers"][li], None, b, None, tree,
                    )
                x = normalize(
                    x, cfg.output_norm_config, params["output_norm"]["scales"],
                    params["output_norm"].get("biases"),
                )
                logits = embedding_readout(
                    target_table, x[1:], target_ecfg.logit_soft_cap
                )  # [b-1, V]
                vals, ids = jax.lax.top_k(logits, candidate_count)
                return ids.astype(jnp.int32), vals

            self._draft_jit[key] = draft
        return self._draft_jit[key]

    def draft(self, state: dict, target_embedding_params, target_ecfg,
              root_token: int, candidate_count: int = 4):
        """-> (ids [block-1, k], logits [block-1, k]) as numpy. The draft
        KV writes are not committed (state is unchanged)."""
        table = target_embedding_params.get("tied", target_embedding_params.get("input"))
        fn = self._draft_fn(candidate_count, target_ecfg)
        ids, vals = fn(self.params, state, table, jnp.asarray(root_token, jnp.int32))
        return np.asarray(jax.device_get(ids)), np.asarray(jax.device_get(vals))
