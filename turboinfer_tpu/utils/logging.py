"""Logging — thin shim over the stdlib, reference-flavored API.

Reference counterpart: util::Logger singleton
(include/turboinfer/util/logging.hpp, src/util/logging.cpp) — levels
Debug..Fatal, timestamped console + optional file sink. Python's logging
module already provides the mutex-guarded singleton machinery, so this
module just configures it and exposes the reference's surface
(set_level / set_log_file / log_debug..log_fatal).
"""

from __future__ import annotations

import logging as _logging
import sys
from typing import Optional

_LOGGER_NAME = "turboinfer_tpu"
_FMT = "[%(asctime)s.%(msecs)03d] [%(levelname)s] %(message)s"
_DATEFMT = "%Y-%m-%d %H:%M:%S"

FATAL = _logging.CRITICAL
ERROR = _logging.ERROR
WARNING = _logging.WARNING
INFO = _logging.INFO
DEBUG = _logging.DEBUG

_file_handler: Optional[_logging.Handler] = None


def get_logger() -> _logging.Logger:
    logger = _logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        h = _logging.StreamHandler(sys.stderr)
        h.setFormatter(_logging.Formatter(_FMT, datefmt=_DATEFMT))
        logger.addHandler(h)
        logger.setLevel(_logging.INFO)
        logger.propagate = False
    return logger


def set_level(level) -> None:
    if isinstance(level, str):
        level = getattr(_logging, level.upper())
    get_logger().setLevel(level)


def set_log_file(path: Optional[str]) -> None:
    """Attach (or with None, detach) an append-mode file sink
    (reference: Logger file sink, logging.cpp:104-116)."""
    global _file_handler
    logger = get_logger()
    if _file_handler is not None:
        logger.removeHandler(_file_handler)
        _file_handler.close()
        _file_handler = None
    if path:
        _file_handler = _logging.FileHandler(path, mode="a")
        _file_handler.setFormatter(_logging.Formatter(_FMT, datefmt=_DATEFMT))
        logger.addHandler(_file_handler)


def log_debug(msg, *a): get_logger().debug(msg, *a)
def log_info(msg, *a): get_logger().info(msg, *a)
def log_warning(msg, *a): get_logger().warning(msg, *a)
def log_error(msg, *a): get_logger().error(msg, *a)
def log_fatal(msg, *a): get_logger().critical(msg, *a)
