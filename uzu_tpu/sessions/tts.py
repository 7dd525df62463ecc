"""Text-to-speech session: streaming PCM synthesis plumbing.

Role parity with nagare's TextToSpeechSession (crates/nagare/src/
text_to_speech/mod.rs): a session holds a synthesizer instance, exposes an
Idle/Synthesizing state machine, `synthesize` (whole utterance) and
`synthesize_stream` (PCM chunks as they are produced), cancellation, and
per-reply stats. The reference's synthesis backend is an Apple-specific
audio stack; here the synthesizer is a pluggable callable so any TPU TTS
model (audio-codec-token LM + codec decoder) slots in — the session layer
is model-agnostic plumbing in both designs.
"""

from __future__ import annotations

import dataclasses
import threading
import time
from typing import Callable, Iterator, Optional

import numpy as np


@dataclasses.dataclass
class PcmBatch:
    """A chunk of PCM samples (shoji types::basic::PcmBatch)."""

    samples: np.ndarray  # [N] float32 in [-1, 1]
    sample_rate: int

    @property
    def duration_s(self) -> float:
        return len(self.samples) / self.sample_rate if self.sample_rate else 0.0


@dataclasses.dataclass
class TextToSpeechStats:
    """Parity with shoji TextToSpeechStats: wall time vs audio time."""

    synthesis_seconds: float = 0.0
    audio_seconds: float = 0.0

    @property
    def real_time_factor(self) -> float:
        return self.synthesis_seconds / self.audio_seconds if self.audio_seconds else 0.0


@dataclasses.dataclass
class TextToSpeechOutput:
    pcm: PcmBatch
    stats: TextToSpeechStats


class CancelToken:
    def __init__(self):
        self._event = threading.Event()

    def cancel(self) -> None:
        self._event.set()

    @property
    def cancelled(self) -> bool:
        return self._event.is_set()


# A synthesizer turns text into an iterator of PCM chunks.
Synthesizer = Callable[[str], Iterator[PcmBatch]]


class TextToSpeechSession:
    """States: "idle" | "synthesizing" (text_to_speech/mod.rs:58-62)."""

    def __init__(self, synthesizer: Synthesizer):
        self._synthesizer = synthesizer
        self._state = "idle"
        self._lock = threading.Lock()

    @property
    def state(self) -> str:
        return self._state

    def synthesize_stream(
        self, text: str, cancel: Optional[CancelToken] = None
    ) -> Iterator[TextToSpeechOutput]:
        """Yields one TextToSpeechOutput per produced PCM chunk; stats
        accumulate across the stream (the last chunk carries totals)."""
        with self._lock:
            if self._state != "idle":
                raise RuntimeError("session is already synthesizing")
            self._state = "synthesizing"
        stats = TextToSpeechStats()
        t0 = time.perf_counter()
        try:
            for chunk in self._synthesizer(text):
                if cancel is not None and cancel.cancelled:
                    break
                stats.synthesis_seconds = time.perf_counter() - t0
                stats.audio_seconds += chunk.duration_s
                yield TextToSpeechOutput(
                    pcm=chunk,
                    stats=dataclasses.replace(stats),
                )
        finally:
            self._state = "idle"

    def synthesize(self, text: str, cancel: Optional[CancelToken] = None) -> TextToSpeechOutput:
        """Whole-utterance synthesis: concatenates the streamed chunks
        (mod.rs synthesize() folds the stream the same way)."""
        outputs = list(self.synthesize_stream(text, cancel))
        if not outputs:
            raise RuntimeError("no response from synthesizer")
        rate = outputs[0].pcm.sample_rate
        samples = np.concatenate([o.pcm.samples for o in outputs])
        return TextToSpeechOutput(
            pcm=PcmBatch(samples=samples, sample_rate=rate),
            stats=outputs[-1].stats,
        )


def sine_test_synthesizer(sample_rate: int = 16000, chunk_ms: int = 200) -> Synthesizer:
    """Deterministic test synthesizer: one tone per word, pitched by word
    hash — exercises the streaming/cancel/stats plumbing without a model
    (the role of mock-registry's synthetic artifacts in the reference's
    test strategy)."""

    def synth(text: str) -> Iterator[PcmBatch]:
        n = int(sample_rate * chunk_ms / 1000)
        for word in text.split() or [""]:
            freq = 200.0 + (hash(word) % 600)
            t = np.arange(n, dtype=np.float32) / sample_rate
            yield PcmBatch(
                samples=0.2 * np.sin(2 * np.pi * freq * t).astype(np.float32),
                sample_rate=sample_rate,
            )

    return synth
