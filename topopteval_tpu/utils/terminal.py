"""ANSI-styled terminal logging helpers.

TPU-native re-implementation of the reference's styled log helpers
(reference: src/Utils/TerminalStyle.jl:1-59): colored [INFO]/[ERROR]/
[WARNING]/[SUCCESS]/data lines that preserve leading newlines.

A module-level ``set_verbosity`` gate lets library code emit the same
progress reporting the reference prints (solver telemetry, totals) while
letting tests/benchmarks silence it.
"""

from __future__ import annotations

import os
import re
import sys

_VERBOSE = os.environ.get("TOPOPTEVAL_VERBOSE", "1") != "0"

_LEADING_NL = re.compile(r"^\n*")


def set_verbosity(enabled: bool) -> None:
    global _VERBOSE
    _VERBOSE = bool(enabled)


def verbosity() -> bool:
    return _VERBOSE


def _emit(prefix: str, color: str, msg: str, *, force: bool = False) -> None:
    if not (_VERBOSE or force):
        return
    m = _LEADING_NL.match(msg)
    leading = m.group(0) if m else ""
    cleaned = msg.lstrip("\n")
    body = f"{prefix} {cleaned}" if prefix else f" {cleaned}"
    sys.stdout.write(f"{leading}\033[{color}m{body}\033[0m\n")


def print_info(msg: str) -> None:
    """Blue [INFO] line (reference: TerminalStyle.jl:2-15)."""
    _emit("[INFO]", "1;34", msg)


def print_error(msg: str) -> None:
    """Red [ERROR] line (reference: TerminalStyle.jl:18-26)."""
    _emit("[ERROR]", "1;31", msg, force=True)


def print_warning(msg: str) -> None:
    """Yellow [WARNING] line (reference: TerminalStyle.jl:29-37)."""
    _emit("[WARNING]", "1;33", msg)


def print_success(msg: str) -> None:
    """Green [SUCCESS] line (reference: TerminalStyle.jl:40-48)."""
    _emit("[SUCCESS]", "1;32", msg)


def print_data(msg: str) -> None:
    """Yellow data/highlight line (reference: TerminalStyle.jl:51-59)."""
    _emit("", "33", msg)


def log(msg: str) -> None:
    """Plain progress line (reference uses bare println throughout)."""
    if _VERBOSE:
        sys.stdout.write(msg + "\n")
