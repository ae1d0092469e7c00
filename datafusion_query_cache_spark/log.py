"""Per-fingerprint decision log.

Analogue of the reference's ``AbstractLog`` / ``LogNoOp`` /
``LogStderrColors`` (``src/log.rs:10-113``): a structured record of *why*
each query was or wasn't cached, with an in-memory ``history()`` used by
tests to assert cache decisions (``src/log.rs:22-24``).
"""

from __future__ import annotations

import logging
import sys
from dataclasses import dataclass
from typing import List, Optional, Tuple

_logger = logging.getLogger("datafusion_query_cache_spark")


@dataclass(frozen=True)
class LogRecord:
    level: str  # "info" | "warn"
    fingerprint: str
    message: str


class AbstractLog:
    def info(self, fingerprint: str, message: str) -> None: ...

    def warn(self, fingerprint: str, message: str) -> None: ...

    def history(self) -> Optional[List[LogRecord]]:
        return None


class LogNoOp(AbstractLog):
    pass


class HistoryLog(AbstractLog):
    """Records every decision; the test oracle for cache behavior."""

    def __init__(self) -> None:
        self._records: List[LogRecord] = []

    def info(self, fingerprint: str, message: str) -> None:
        self._records.append(LogRecord("info", fingerprint, message))

    def warn(self, fingerprint: str, message: str) -> None:
        self._records.append(LogRecord("warn", fingerprint, message))

    def history(self) -> List[LogRecord]:
        return list(self._records)

    def messages(self) -> List[str]:
        return [r.message for r in self._records]


class LogStderr(AbstractLog):
    """Colored stderr log (reference ``LogStderrColors``, ``src/log.rs:50-91``)."""

    def __init__(self, color: bool = True):
        self._color = color and sys.stderr.isatty()

    def _emit(self, level: str, fingerprint: str, message: str) -> None:
        fp = fingerprint[:60]
        if self._color:
            c = "\x1b[36m" if level == "info" else "\x1b[33m"
            print(f"{c}[qc {level}]\x1b[0m {message} \x1b[2m({fp})\x1b[0m", file=sys.stderr)
        else:
            print(f"[qc {level}] {message} ({fp})", file=sys.stderr)

    def info(self, fingerprint: str, message: str) -> None:
        self._emit("info", fingerprint, message)

    def warn(self, fingerprint: str, message: str) -> None:
        self._emit("warn", fingerprint, message)
