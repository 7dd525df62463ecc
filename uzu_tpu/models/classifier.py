"""Classifier model: encoder-style transformer + pooling + prediction head.

Reference: crates/backend-uzu/src/engine/classifier_model.rs:97-148 and
encodable_block/{classifier.rs,prediction_head.rs}. Pipeline: embedding
lookup -> embedding norm -> transformer with BIDIRECTIONAL attention (the
reference builds TrieNodes spanning the whole batch, classifier.rs:127-133)
-> mean pooling over real rows -> dense + activation + norm + readout ->
per-label sigmoid probabilities.
"""

from __future__ import annotations

import dataclasses
import json
import os
import types

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model import (
    AttentionConfig,
    ClassifierConfig,
    ClassifierModelConfig,
    PoolingType,
)
from ..config.serde import parse
from ..ops.activation import apply_activation
from ..ops.linear import linear_apply
from ..ops.norm import normalize
from ..params.tree import ParameterLoader
from .decoder import embedding_lookup, layer_forward
from .loader import load_embedding, load_layer, load_linear, load_norm
from .state import init_state


def _noncausal(tcfg):
    layers = tuple(
        dataclasses.replace(
            lc,
            mixer_config=dataclasses.replace(lc.mixer_config, is_causal=False)
            if isinstance(lc.mixer_config, AttentionConfig)
            else lc.mixer_config,
        )
        for lc in tcfg.layer_configs
    )
    return dataclasses.replace(tcfg, layer_configs=layers)


class ClassifierModel:
    def __init__(self, config: ClassifierConfig, params: dict):
        if config.classifier_pooling != PoolingType.MEAN:
            raise ValueError("only mean pooling is supported (matches the reference)")
        self.config = config
        self.tcfg = _noncausal(config.transformer_config)
        self.params = params
        self.output_labels = list(
            config.output_labels or [f"class_{i}" for i in range(config.num_labels)]
        )
        self._jit = {}

    @classmethod
    def from_dir(cls, model_dir: str) -> "ClassifierModel":
        from ..runtime import enable_compilation_cache

        enable_compilation_cache()  # TPU-only; no-op on CPU (runtime.py)
        with open(os.path.join(model_dir, "config.json")) as f:
            model_cfg = parse(ClassifierModelConfig, json.load(f))
        cfg = model_cfg.classifier_config
        loader = ParameterLoader(os.path.join(model_dir, "model.safetensors"))
        tree = loader.tree().subtree("classifier")
        params = cls._load(tree, cfg)
        loader.tree().assert_all_validated()
        return cls(cfg, params)

    @staticmethod
    def _load(tree, cfg: ClassifierConfig) -> dict:
        d = cfg.model_dim
        ph = cfg.prediction_head_config
        head = tree.subtree("prediction_head")
        return {
            "embedding": load_embedding(tree, cfg.embedding_config, cfg.vocab_size, d),
            "embedding_norm": load_norm(
                tree.subtree("embedding_norm"), d, cfg.embedding_norm_config
            ),
            "layers": [
                load_layer(
                    tree.subtree(f"transformer.layers.{i}"),
                    lc,
                    d,
                    cfg.transformer_config.hidden_dim,
                )
                for i, lc in enumerate(cfg.transformer_config.layer_configs)
            ],
            "head": {
                "dense": load_linear(
                    head.subtree("dense"), cfg.hidden_dim, cfg.hidden_dim, ph.use_dense_bias
                ),
                "norm": load_norm(head.subtree("norm"), cfg.hidden_dim, ph.normalization_config),
                "readout": load_linear(
                    head.subtree("readout"), cfg.hidden_dim, cfg.num_labels, False
                ),
            },
        }

    def _forward_fn(self, s: int):
        if s not in self._jit:
            cfg = self.config
            tcfg = self.tcfg
            decoder_shim = types.SimpleNamespace(transformer_config=tcfg)

            @jax.jit
            def forward(params, tokens, true_length):
                x = embedding_lookup(
                    params["embedding"].get("tied", params["embedding"].get("input")),
                    tokens,
                )
                if cfg.embedding_config.input_scale is not None:
                    x = (x.astype(jnp.float32) * cfg.embedding_config.input_scale).astype(x.dtype)
                x = normalize(
                    x,
                    cfg.embedding_norm_config,
                    params["embedding_norm"]["scales"],
                    params["embedding_norm"].get("biases"),
                )
                positions = jnp.arange(s, dtype=jnp.int32)
                state = init_state(decoder_shim, s, x.dtype)
                for i, lc in enumerate(tcfg.layer_configs):
                    x, _ = layer_forward(
                        lc, params["layers"][i], x, positions, state["layers"][i], None,
                        true_length,
                    )
                # padded rows hold garbage under bidirectional attention only
                # if keys beyond true_length leak in — the KV cache slots past
                # true_length are zeros from init, matching the reference's
                # exact-size buffers; mask them out of the pooled mean anyway.
                mask = (jnp.arange(s) < true_length)[:, None]
                pooled = jnp.sum(
                    jnp.where(mask, x.astype(jnp.float32), 0.0), axis=0
                ) / true_length.astype(jnp.float32)
                pooled = pooled.astype(x.dtype)[None]

                ph = cfg.prediction_head_config
                h = linear_apply(
                    params["head"]["dense"]["w"], pooled, params["head"]["dense"].get("b")
                )
                h = apply_activation(ph.activation, h)
                h = normalize(
                    h,
                    ph.normalization_config,
                    params["head"]["norm"]["scales"],
                    params["head"]["norm"].get("biases"),
                )
                logits = linear_apply(params["head"]["readout"]["w"], h)
                return logits[0].astype(jnp.float32)

            self._jit[s] = forward
        return self._jit[s]

    def classify(self, token_ids) -> dict:
        """Returns {"logits": [...], "probabilities": {label: p}} with
        per-label sigmoid (classifier_model.rs:137-141)."""
        ids = np.asarray(token_ids, np.int32)
        if ids.size == 0:
            raise ValueError("empty input")
        s = 1 << max(0, int(ids.size - 1)).bit_length()
        padded = np.zeros(s, np.int32)
        padded[: ids.size] = ids
        logits = np.asarray(
            self._forward_fn(s)(
                self.params, jnp.asarray(padded), jnp.asarray(ids.size, jnp.int32)
            )
        )
        probs = 1.0 / (1.0 + np.exp(-logits))
        return {
            "logits": logits.tolist(),
            "probabilities": {
                label: float(p) for label, p in zip(self.output_labels, probs)
            },
        }
