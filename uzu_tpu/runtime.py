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
