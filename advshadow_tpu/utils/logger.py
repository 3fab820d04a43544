"""Logging (re-design of ref: utils/logger.py:16-84).

A logging.Logger subclass with an optional file sink and an in-memory
text accumulator (the reference's "webui" mode).  ANSI-colored console
output replaces the coloredlogs dependency.
"""

from __future__ import annotations

import logging
import sys
from typing import List, Optional

__all__ = ["CustomLogger", "get_logger"]

_COLORS = {
    logging.DEBUG: "\033[36m",
    logging.INFO: "\033[32m",
    logging.WARNING: "\033[33m",
    logging.ERROR: "\033[31m",
    logging.CRITICAL: "\033[35m",
}
_RESET = "\033[0m"
_FMT = "%(asctime)s %(name)s[%(process)d] %(levelname)s %(message)s"


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        color = _COLORS.get(record.levelno, "")
        return f"{color}{msg}{_RESET}" if sys.stderr.isatty() else msg


class _AccumulateHandler(logging.Handler):
    def __init__(self, sink: List[str]):
        super().__init__()
        self.sink = sink

    def emit(self, record):
        self.sink.append(self.format(record))


class CustomLogger(logging.Logger):
    """Logger with optional file sink + webui accumulation
    (ref: utils/logger.py:16-84)."""

    def __init__(self, name: str = "advshadow", level: int = logging.INFO,
                 log_file: Optional[str] = None, is_webui: bool = False):
        super().__init__(name, level)
        self.webui_text: List[str] = []
        console = logging.StreamHandler(sys.stderr)
        console.setFormatter(_ColorFormatter(_FMT))
        self.addHandler(console)
        if log_file:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(logging.Formatter(_FMT))
            self.addHandler(fh)
        if is_webui:
            acc = _AccumulateHandler(self.webui_text)
            acc.setFormatter(logging.Formatter(_FMT))
            self.addHandler(acc)


_loggers = {}


def get_logger(name: str = "advshadow", **kwargs) -> CustomLogger:
    if name not in _loggers:
        _loggers[name] = CustomLogger(name, **kwargs)
    return _loggers[name]
