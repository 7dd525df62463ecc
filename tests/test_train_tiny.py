"""In-repo tiny-model training (tools/train_tiny.py, VERDICT r4 #5).

Pins: the trainer optimizes THROUGH the inference forward (loss drops on
the structured corpus), and write_trained round-trips into servable model
dirs — the bf16 and INT4 arms both load via LanguageModel.from_dir and
generate, with the INT4 arm quantized from the same trained weights.
"""

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.config.model import IntSpec, Layout


DIMS = dict(num_layers=2, model_dim=128, hidden_dim=256, num_heads=4,
            num_groups=2, head_dim=32, vocab_size=256, max_seq=512)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from uzu_tpu.tools.train_tiny import train

    lm, params, losses = train(DIMS, steps=30, batch=8, seq=128,
                               corpus_tokens=100_000, scan_k=10,
                               log=lambda *a: None)
    return lm, params, losses, tmp_path_factory.mktemp("tiny_out")


def test_loss_decreases(trained):
    _, _, losses, _ = trained
    first, last = np.mean(losses[:5]), np.mean(losses[-5:])
    assert last < first * 0.75, (first, last)


def test_write_trained_roundtrip(trained):
    from uzu_tpu.tools.corpus import heldout_prompts
    from uzu_tpu.tools.quality import sequence_nll
    from uzu_tpu.tools.train_tiny import write_trained

    lm, params, _, out = trained
    d_bf = write_trained(lm, params, str(out / "bf16"))
    d_i4 = write_trained(
        lm, params, str(out / "int4"),
        linear_spec=IntSpec(bits=4, group_size=32, is_symmetric=True,
                            layout=Layout.OUTPUT_INPUT))
    p = heldout_prompts(k=1, length=32)[0]
    lm_bf = LanguageModel.from_dir(d_bf, max_context=512,
                                   prefill_buckets=(32,))
    lm_i4 = LanguageModel.from_dir(d_i4, max_context=512,
                                   prefill_buckets=(32,))
    g_bf = lm_bf.generate_list(np.asarray(p), 16, stop_token_ids=[])
    g_i4 = lm_i4.generate_list(np.asarray(p), 16, stop_token_ids=[])
    assert len(g_bf) == 16 and len(g_i4) == 16
    # INT4-from-same-weights tracks the bf16 arm's held-out NLL closely
    from uzu_tpu.tools.corpus import generate_tokens

    ev = generate_tokens(600, seed=12345)
    nll_bf = sequence_nll(lm_bf, ev[:512])["nll"]
    nll_i4 = sequence_nll(lm_i4, ev[:512])["nll"]
    assert abs(nll_i4 - nll_bf) < 0.25 * max(nll_bf, 1.0), (nll_bf, nll_i4)
