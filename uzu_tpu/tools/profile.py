"""One-shot device profiling hooks.

The reference arms a one-shot GPU capture of the first prefill and/or
decode command buffer into a Metal .gputrace via env vars
(/root/reference/crates/backend-uzu/src/engine/capture.rs:11-98,
UZU_CAPTURE_FIRST_PREFILL / UZU_CAPTURE_FIRST_DECODE). The TPU-native
equivalent wraps the first dispatch of each armed phase in
`jax.profiler.trace`, producing a TensorBoard/xplane trace directory.

Arming:
    UZU_TPU_PROFILE=prefill,decode   phases to capture (one-shot each)
    UZU_TPU_PROFILE_DIR=/tmp/...     trace output root (default below)

The capture synchronizes the wrapped dispatch (device_get on one leaf) so
the device execution lands inside the trace window — this perturbs
pipelining for that one chunk, which is inherent to profiling a single
dispatch. Unsupported platforms (remote-tunnel PJRT without profiler
support) degrade to running unprofiled with a warning on stderr.
"""

from __future__ import annotations

import os
import sys
import time

_DEFAULT_DIR = "/tmp/uzu_tpu_trace"
_armed: dict[str, bool] | None = None


def _load_armed() -> dict[str, bool]:
    global _armed
    if _armed is None:
        phases = os.environ.get("UZU_TPU_PROFILE", "")
        _armed = {p.strip(): True for p in phases.split(",") if p.strip()}
    return _armed


def trace_dir() -> str:
    return os.environ.get("UZU_TPU_PROFILE_DIR", _DEFAULT_DIR)


def reset() -> None:
    """Re-read the env and re-arm (tests)."""
    global _armed
    _armed = None


def profiled(phase: str, fn, *args):
    """Run fn(*args); if `phase` is armed, capture the call (dispatch +
    device execution) into a one-shot profiler trace and disarm."""
    armed = _load_armed()
    if not armed.get(phase):
        return fn(*args)
    armed[phase] = False  # one-shot, even if the capture itself fails
    import jax

    out_dir = os.path.join(trace_dir(), f"{phase}_{int(time.time())}")
    # start/stop explicitly: fn's args may be donated, so it must run
    # EXACTLY once whether or not the profiler works on this platform
    try:
        jax.profiler.start_trace(out_dir)
        started = True
    except Exception as e:
        print(f"uzu_tpu: {phase} profile capture unavailable ({e}); running "
              "unprofiled", file=sys.stderr)
        started = False
    out = fn(*args)
    if started:
        try:
            # sync so device work lands inside the window (block_until_ready
            # does not wait for real execution on a remote-tunnel PJRT)
            jax.device_get(jax.tree.leaves(out)[0])
            jax.profiler.stop_trace()
            print(f"uzu_tpu: captured first {phase} -> {out_dir}",
                  file=sys.stderr)
        except Exception as e:
            print(f"uzu_tpu: {phase} profile capture failed ({e})",
                  file=sys.stderr)
    return out
