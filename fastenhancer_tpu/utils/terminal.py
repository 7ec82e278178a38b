"""ANSI in-place progress helpers + rank-0 printing (reference: utils/terminal.py,
utils/verbose.py)."""
from __future__ import annotations

import sys


def verbose() -> bool:
    """True on the logging process (JAX process 0)."""
    try:
        import jax

        return jax.process_index() == 0
    except Exception:
        return True


def clear_previous_line() -> None:
    sys.stdout.write("\033[F\033[K\r")


def clear_current_line() -> None:
    sys.stdout.write("\033[2K\r")


def progress(msg: str) -> None:
    """Overwrite the current terminal line with msg (rank 0 only)."""
    if verbose():
        sys.stdout.write(f"\r\033[2K{msg}")
        sys.stdout.flush()
