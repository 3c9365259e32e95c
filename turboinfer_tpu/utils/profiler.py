"""Profiler — per-op timing stats + jax.profiler trace hooks.

Reference counterpart: util::Profiler / Timer / ScopedProfiler /
MemoryProfiler (include/turboinfer/util/profiler.hpp,
src/util/profiler.cpp). Same surface: opt-in singleton, start/stop or
scoped timing, per-op {count,total,min,max,avg}, text/JSON/CSV export.
TPU addition: `trace()` wraps jax.profiler for XProf/TensorBoard kernel
traces — the thing a wall-clock profiler can't see through XLA.
"""

from __future__ import annotations

import contextlib
import csv
import io
import json
import threading
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


@dataclass
class OpStats:
    count: int = 0
    total_ms: float = 0.0
    min_ms: float = float("inf")
    max_ms: float = 0.0

    @property
    def avg_ms(self) -> float:
        return self.total_ms / max(self.count, 1)

    def record(self, ms: float):
        self.count += 1
        self.total_ms += ms
        self.min_ms = min(self.min_ms, ms)
        self.max_ms = max(self.max_ms, ms)


class Timer:
    """µs-resolution timer (reference: Timer, profiler.cpp:24-52)."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def restart(self):
        self._t0 = time.perf_counter()

    def elapsed_ms(self) -> float:
        return (time.perf_counter() - self._t0) * 1e3

    def elapsed_us(self) -> float:
        return (time.perf_counter() - self._t0) * 1e6


class Profiler:
    """Singleton, disabled by default (reference: profiler.hpp:154)."""

    _instance: Optional["Profiler"] = None
    _lock = threading.Lock()

    def __init__(self):
        self.enabled = False
        self._stats: Dict[str, OpStats] = {}
        self._open: Dict[str, float] = {}
        self._mu = threading.Lock()

    @classmethod
    def instance(cls) -> "Profiler":
        with cls._lock:
            if cls._instance is None:
                cls._instance = cls()
            return cls._instance

    def set_enabled(self, on: bool):
        self.enabled = on

    def reset(self):
        with self._mu:
            self._stats.clear()
            self._open.clear()

    def start(self, name: str):
        if not self.enabled:
            return
        with self._mu:
            self._open[name] = time.perf_counter()

    def stop(self, name: str):
        if not self.enabled:
            return
        with self._mu:
            t0 = self._open.pop(name, None)
            if t0 is None:
                return
            ms = (time.perf_counter() - t0) * 1e3
            self._stats.setdefault(name, OpStats()).record(ms)

    def record(self, name: str, ms: float):
        if not self.enabled:
            return
        with self._mu:
            self._stats.setdefault(name, OpStats()).record(ms)

    @contextlib.contextmanager
    def scope(self, name: str):
        """RAII scope (reference: ScopedProfiler, profiler.hpp:258-265)."""
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.enabled:
                self.record(name, (time.perf_counter() - t0) * 1e3)

    # -- reports (reference: profiler.cpp:146-273) ----------------------

    def report(self) -> str:
        out = io.StringIO()
        out.write("=== TurboInfer-TPU Profiler Report ===\n")
        out.write(f"{'op':<40} {'count':>8} {'total ms':>12} "
                  f"{'avg ms':>10} {'min ms':>10} {'max ms':>10}\n")
        with self._mu:
            for name, s in sorted(self._stats.items(),
                                  key=lambda kv: -kv[1].total_ms):
                out.write(f"{name:<40} {s.count:>8} {s.total_ms:>12.3f} "
                          f"{s.avg_ms:>10.3f} {s.min_ms:>10.3f} "
                          f"{s.max_ms:>10.3f}\n")
        return out.getvalue()

    def save(self, path: str, fmt: str = "text"):
        if fmt == "text":
            data = self.report()
        elif fmt == "json":
            with self._mu:
                data = json.dumps(
                    {k: {"count": s.count, "total_ms": s.total_ms,
                         "avg_ms": s.avg_ms, "min_ms": s.min_ms,
                         "max_ms": s.max_ms}
                     for k, s in self._stats.items()}, indent=2)
        elif fmt == "csv":
            buf = io.StringIO()
            w = csv.writer(buf)
            w.writerow(["op", "count", "total_ms", "avg_ms", "min_ms",
                        "max_ms"])
            with self._mu:
                for k, s in self._stats.items():
                    w.writerow([k, s.count, s.total_ms, s.avg_ms, s.min_ms,
                                s.max_ms])
            data = buf.getvalue()
        else:
            raise ValueError(f"unknown format {fmt!r}")
        with open(path, "w") as f:
            f.write(data)

    def stats(self) -> Dict[str, OpStats]:
        with self._mu:
            return dict(self._stats)


class MemoryProfiler:
    """Tag-based current/peak byte tracking (reference:
    profiler.cpp:287-352). On TPU, device memory comes from
    jax.local_devices()[i].memory_stats() — see device_memory_stats()."""

    _current: Dict[str, int] = {}
    _peak: Dict[str, int] = {}
    _mu = threading.Lock()

    @classmethod
    def record_alloc(cls, tag: str, nbytes: int):
        with cls._mu:
            cur = cls._current.get(tag, 0) + nbytes
            cls._current[tag] = cur
            cls._peak[tag] = max(cls._peak.get(tag, 0), cur)

    @classmethod
    def record_free(cls, tag: str, nbytes: int):
        with cls._mu:
            cls._current[tag] = max(cls._current.get(tag, 0) - nbytes, 0)

    @classmethod
    def current(cls, tag: str) -> int:
        with cls._mu:
            return cls._current.get(tag, 0)

    @classmethod
    def peak(cls, tag: str) -> int:
        with cls._mu:
            return cls._peak.get(tag, 0)

    @classmethod
    def reset(cls):
        with cls._mu:
            cls._current.clear()
            cls._peak.clear()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device HBM stats from the JAX runtime (bytes_in_use etc.)."""
    import jax
    out = {}
    for d in jax.local_devices():
        try:
            ms = d.memory_stats()
        except Exception:
            ms = None
        if ms:
            out[str(d)] = {k: v for k, v in ms.items()
                           if isinstance(v, int)}
    return out


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace scope for XProf/TensorBoard (TPU-native
    equivalent of the reference's wall-clock profiler for kernels)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
