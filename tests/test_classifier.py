"""Classifier model tests (reference: engine/classifier_model.rs +
encodable_block/classifier.rs)."""

import numpy as np
import pytest

from uzu_tpu.models.classifier import ClassifierModel
from uzu_tpu.tools.synth import classifier_config, synthesize_classifier


@pytest.fixture(scope="module")
def clf(tmp_path_factory):
    cfg = classifier_config(labels=["pos", "neg", "neutral"])
    d = synthesize_classifier(cfg, str(tmp_path_factory.mktemp("clf")), seed=4, dtype=np.float32)
    return ClassifierModel.from_dir(d)


def test_classify_shapes_and_labels(clf):
    out = clf.classify([1, 2, 3, 4, 5])
    assert len(out["logits"]) == 3
    assert set(out["probabilities"]) == {"pos", "neg", "neutral"}
    assert all(0 <= p <= 1 for p in out["probabilities"].values())


def test_padding_invariance(clf):
    """Pad-to-power-of-two must not change the logits (bidirectional
    attention masks padded KV; pooled mean masks padded rows)."""
    toks5 = [1, 2, 3, 4, 5]  # padded to 8 internally
    out5 = clf.classify(toks5)
    # compare vs an exact power-of-two input truncated to same prefix via
    # direct forward at both paddings
    fn8 = clf._forward_fn(8)
    fn16 = clf._forward_fn(16)
    import jax.numpy as jnp

    p8 = np.zeros(8, np.int32); p8[:5] = toks5
    p16 = np.zeros(16, np.int32); p16[:5] = toks5
    l8 = np.asarray(fn8(clf.params, jnp.asarray(p8), jnp.asarray(5)))
    l16 = np.asarray(fn16(clf.params, jnp.asarray(p16), jnp.asarray(5)))
    np.testing.assert_allclose(l8, l16, rtol=2e-4, atol=2e-4)


def test_order_sensitivity(clf):
    """Bidirectional pooling still depends on token order via attention."""
    a = clf.classify([1, 2, 3, 4])["logits"]
    b = clf.classify([4, 3, 2, 1])["logits"]
    assert not np.allclose(a, b)


def test_empty_input_rejected(clf):
    with pytest.raises(ValueError):
        clf.classify([])
