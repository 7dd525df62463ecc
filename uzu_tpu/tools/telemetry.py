"""Host/device telemetry: memory, CPU time, device buffer usage.

Role parity with crates/keisoku (Apple thermal/rail-power/memory sensors,
power_meter.rs:18-28) and the allocator's peak-memory tracking
(allocator.rs:199). Apple's private sensor APIs have no TPU-host analogue;
what IS portable and load-bearing for serving: host RSS / peak RSS, process
CPU time, and live device-buffer bytes (the TPU equivalent of the
reference's Context::peak_memory_usage). The PowerMeter start/stop shape is
kept so ChatReplyStats-style consumers can record per-reply deltas.
"""

from __future__ import annotations

import dataclasses
import os
import resource
import time


@dataclasses.dataclass
class HostMemory:
    rss_bytes: int
    peak_rss_bytes: int


@dataclasses.dataclass
class DeviceMemory:
    live_buffer_bytes: int
    num_live_buffers: int


@dataclasses.dataclass
class TelemetrySample:
    wall_time: float
    cpu_seconds: float
    host: HostMemory
    device: DeviceMemory | None


def host_memory() -> HostMemory:
    rss = 0
    try:
        with open(f"/proc/{os.getpid()}/statm") as f:
            rss = int(f.read().split()[1]) * os.sysconf("SC_PAGE_SIZE")
    except (OSError, IndexError, ValueError):
        pass
    # ru_maxrss is KiB on Linux
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
    return HostMemory(rss_bytes=rss, peak_rss_bytes=peak)


def device_memory() -> DeviceMemory | None:
    """Live device buffer bytes (the analogue of the reference allocator's
    peak tracking). Uses jax.live_arrays — works on every backend."""
    try:
        import jax

        arrays = jax.live_arrays()
        return DeviceMemory(
            live_buffer_bytes=sum(a.nbytes for a in arrays),
            num_live_buffers=len(arrays),
        )
    except Exception:
        return None


def sample() -> TelemetrySample:
    ru = resource.getrusage(resource.RUSAGE_SELF)
    return TelemetrySample(
        wall_time=time.time(),
        cpu_seconds=ru.ru_utime + ru.ru_stime,
        host=host_memory(),
        device=device_memory(),
    )


@dataclasses.dataclass
class MeterReading:
    """Per-interval resource deltas (the PowerMeter start/stop contract,
    keisoku power_meter.rs; energy sensors are Apple-only, so the TPU host
    records time + memory + CPU instead)."""

    duration_s: float
    cpu_seconds: float
    cpu_utilization: float
    rss_delta_bytes: int
    peak_rss_bytes: int
    device_buffer_delta_bytes: int


class ResourceMeter:
    """start() ... stop() -> MeterReading."""

    def __init__(self):
        self._t0: TelemetrySample | None = None
        self._wall0 = 0.0

    def start(self) -> None:
        self._wall0 = time.perf_counter()
        self._t0 = sample()

    def stop(self) -> MeterReading:
        if self._t0 is None:
            raise RuntimeError("meter not started")
        t0, self._t0 = self._t0, None
        t1 = sample()
        dur = time.perf_counter() - self._wall0
        dev0 = t0.device.live_buffer_bytes if t0.device else 0
        dev1 = t1.device.live_buffer_bytes if t1.device else 0
        cpu = t1.cpu_seconds - t0.cpu_seconds
        return MeterReading(
            duration_s=dur,
            cpu_seconds=cpu,
            cpu_utilization=cpu / dur if dur > 0 else 0.0,
            rss_delta_bytes=t1.host.rss_bytes - t0.host.rss_bytes,
            peak_rss_bytes=t1.host.peak_rss_bytes,
            device_buffer_delta_bytes=dev1 - dev0,
        )
