"""uzu_tpu: a TPU-native quantized LLM inference engine.

Built from scratch in JAX/XLA/Pallas with the capabilities of trymirai/uzu
(config-driven transformer, INT4/INT8 weight-only quantization, fused
sampling, speculative decoding, chat sessions) plus multi-chip execution the
reference lacks (GSPMD tensor parallelism, continuous batching).
"""

__version__ = "0.1.0"

from .runtime import enable_compilation_cache  # noqa: F401
# NOTE: not called at import — it must inspect the resolved backend (TPU
# only; see runtime.py), and resolving the backend here would lock the
# platform before callers (tests, CPU tools) can force CPU. Model loaders
# (LanguageModel.from_dir, ClassifierModel.from_dir) call it lazily.

from .config import LanguageModelConfig, load_language_model_config  # noqa: F401
from .engine.engine import LanguageModel, StreamMetrics  # noqa: F401
from .engine.sampling import SamplingParams  # noqa: F401
from .engine.facade import Engine, LocalRegistry, ModelInfo  # noqa: F401
from .engine.batch import BatchEngine, Request  # noqa: F401
from .engine.speculation import (  # noqa: F401
    DraftModelSpeculator,
    NgramSpeculator,
    SpeculativeDecoder,
)
from .engine.fused_spec import (  # noqa: F401
    FusedSpeculativeDecoder,
    fused_self_speculative_decoder,
)
from .engine.remote import RemoteChatSession, RemoteConfig  # noqa: F401
from .grammar.decode import constrained_generate  # noqa: F401
from .grammar.matcher import GrammarSession  # noqa: F401
from .sessions.transform import TransformSchema  # noqa: F401
from .sessions.tts import TextToSpeechSession  # noqa: F401
from .engine.paged_batch import PagedBatchEngine  # noqa: F401
