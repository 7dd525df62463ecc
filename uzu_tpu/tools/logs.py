"""File logging + local event journal.

Role parity with the reference's logging/telemetry pair: `logs::start`
(crates/uzu/src/logs/mod.rs:18 — process-wide file logging) and the nagare
telemetry client (events POSTed to sdk.trymirai.com with device context).
The TPU build keeps events LOCAL: a JSONL journal the operator owns —
same observability, no phone-home.
"""

from __future__ import annotations

import json
import logging
import logging.handlers
import os
import threading
import time
from typing import Optional

_journal_lock = threading.Lock()
_journal_path: Optional[str] = None


def start(log_dir: str, *, level: int = logging.INFO,
          max_bytes: int = 16 * 1024 * 1024, backups: int = 3) -> str:
    """Attach a rotating file handler for the uzu_tpu logger tree and open
    the event journal. Returns the log file path."""
    global _journal_path
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, "uzu_tpu.log")
    handler = logging.handlers.RotatingFileHandler(
        path, maxBytes=max_bytes, backupCount=backups
    )
    handler.setFormatter(
        logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
    )
    root = logging.getLogger("uzu_tpu")
    root.setLevel(level)
    root.addHandler(handler)
    _journal_path = os.path.join(log_dir, "events.jsonl")
    return path


def event(name: str, **payload) -> None:
    """Append an event to the local journal (telemetry-event shape:
    name + timestamp + payload + device context)."""
    if _journal_path is None:
        return
    record = {"event": name, "ts": time.time(), **payload}
    try:
        import jax

        record.setdefault("device", str(jax.devices()[0].device_kind))
    except Exception:
        pass
    line = json.dumps(record)
    with _journal_lock:
        with open(_journal_path, "a") as f:
            f.write(line + "\n")


def logger(name: str = "uzu_tpu") -> logging.Logger:
    return logging.getLogger(name)
