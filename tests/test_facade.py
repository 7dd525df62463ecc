"""Top-level Engine / registry tests (role parity: crates/uzu Engine +
local registry)."""

import numpy as np
import pytest

from uzu_tpu import Engine
from uzu_tpu.tools.synth import (
    classifier_config,
    llama_config,
    synth_chat_model,
    synthesize,
    synthesize_classifier,
)


@pytest.fixture(scope="module")
def models_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("models")
    synth_chat_model(str(root / "chatty"), num_layers=2, model_dim=64,
                     hidden_dim=160, num_heads=4, num_groups=2, head_dim=16)
    synthesize(llama_config(num_layers=1, model_dim=32, hidden_dim=64, num_heads=2,
                            num_groups=1, head_dim=16, vocab_size=128),
               str(root / "bare"), seed=2)
    synthesize_classifier(classifier_config(labels=["a", "b", "c"]),
                          str(root / "clf"), seed=3)
    (root / "not_a_model").mkdir()
    return str(root)


def test_registry_lists_models(models_root):
    eng = Engine(models_root)
    models = {m.id: m for m in eng.models()}
    assert set(models) == {"chatty", "bare", "clf"}
    assert models["chatty"].kind == "language" and models["chatty"].chat_ready
    assert models["bare"].kind == "language" and not models["bare"].chat_ready
    assert models["clf"].kind == "classifier"
    assert all(m.size_bytes > 0 for m in models.values())


def test_chat_session_factory(models_root):
    eng = Engine(models_root)
    session = eng.chat("chatty", max_context=128)
    reply = session.reply("hello", max_new_tokens=6)
    assert reply.stats.tokens_count_output > 0


def test_classification_factory(models_root):
    eng = Engine(models_root)
    clf = eng.classification("clf")
    out = clf.classify([1, 2, 3])
    assert set(out["probabilities"]) == {"a", "b", "c"}


def test_kind_mismatch_rejected(models_root):
    eng = Engine(models_root)
    with pytest.raises(ValueError):
        eng.classification("chatty")
    with pytest.raises(ValueError):
        eng.language_model("clf")
    with pytest.raises(KeyError):
        eng.model("nonexistent")


def test_model_cache_reuses_instances(models_root):
    eng = Engine(models_root)
    a = eng.language_model("bare", max_context=64)
    b = eng.language_model("bare", max_context=64)
    assert a is b
