"""Runtime flags: kernel-dispatch mode and platform detection.

The reference selects its backend (Metal vs CPU) at runtime via the
UZU_BACKEND env var (crates/backend-uzu/src/backends/mod.rs:8-33); we mirror
that with UZU_TPU_KERNELS = auto | pallas | xla:

- auto (default): Pallas kernels when the default JAX backend is a TPU,
  pure-XLA reference ops otherwise (CPU CI, interpreter debugging);
- pallas: force Pallas kernels (interpret-mode on CPU);
- xla: force the pure-XLA reference path everywhere.
"""

from __future__ import annotations

import os
from functools import lru_cache

_CACHE_CONFIGURED = False


def enable_compilation_cache(force: bool = False) -> None:
    """Persistent XLA compilation cache (UZU_TPU_JAX_CACHE overrides the
    location; =0 disables). Remote AOT compiles on the tunnel cost 10-90 s
    PER EXECUTABLE and an engine warms a dozen of them — without this
    cache every fresh process pays minutes of pure recompilation. Keys
    include the HLO, so kernel changes invalidate cleanly.

    TPU-backend only unless `force`: the repo volume is shared across
    machines, and CPU-AOT entries written by one host load on another with
    mismatched machine features (observed: cpu_aot_loader SIGILL warnings
    on every CPU run). CPU compiles are cheap — they neither need nor
    should touch the cache. Called lazily from LanguageModel.from_dir so
    the backend is resolved by then."""
    global _CACHE_CONFIGURED
    if _CACHE_CONFIGURED:
        return
    if not force:
        try:
            import jax

            if jax.default_backend() == "cpu":
                return  # not latched: a forced call can still enable later
        except Exception:
            return
    _CACHE_CONFIGURED = True
    loc = os.environ.get("UZU_TPU_JAX_CACHE")
    if loc == "0":
        return
    if not loc:
        loc = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache")
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", loc)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these knobs: stay with in-process cache


@lru_cache(maxsize=None)
def _platform() -> str:
    import jax

    return jax.default_backend()


def on_tpu() -> bool:
    # the axon tunnel platform exposes TPU devices under a nonstandard name
    import jax

    try:
        dev = jax.devices()[0]
    except Exception:
        return False
    return "tpu" in dev.platform.lower() or "TPU" in str(dev.device_kind)


def kernel_mode() -> str:
    return os.environ.get("UZU_TPU_KERNELS", "auto")


def use_pallas() -> bool:
    mode = kernel_mode()
    if mode == "pallas":
        return True
    if mode == "xla":
        return False
    return on_tpu()


def force_flash() -> bool:
    """UZU_TPU_FLASH=1 overrides the measured-in-context dispatch policy and
    engages the Pallas flash-attention kernel ON TPU (A/B experiments at
    context lengths the default policy was not measured at)."""
    return os.environ.get("UZU_TPU_FLASH", "") == "1"


def force_online() -> bool:
    """UZU_TPU_ONLINE=1 — historical A/B hook; the r4 prefill_attn_ab
    verdict (online 10.79 ms vs einsum 14.78 per 512-chunk) made online
    at every evenly-chunking context the DEFAULT for prefill widths, so
    this is now a no-op kept for script compatibility."""
    return os.environ.get("UZU_TPU_ONLINE", "") == "1"
