"""Small runtime helpers (reference: deepwmh/utilities/misc.py)."""

from __future__ import annotations

import contextlib
import signal


@contextlib.contextmanager
def ignore_sigint():
    """Defer Ctrl-C while writing non-reentrant artifacts
    (reference misc.py:161-177)."""
    received = []

    def handler(sig, frame):
        received.append((sig, frame))

    try:
        old = signal.signal(signal.SIGINT, handler)
    except ValueError:  # not the main thread
        yield
        return
    try:
        yield
    finally:
        signal.signal(signal.SIGINT, old)
        if received:
            raise KeyboardInterrupt


def remove_duplicates(seq):
    """Order-preserving dedup (reference DCNN_multistage.py:95-96)."""
    return list(dict.fromkeys(seq))


def contain_duplicates(seq) -> bool:
    """(reference misc.py list utils, used by predict.py:91)"""
    return len(set(seq)) != len(seq)


def minibar(progress: float, width: int = 30, msg: str = "") -> str:
    """Tiny text progress bar string (reference misc.py:65-106)."""
    progress = min(max(progress, 0.0), 1.0)
    filled = int(progress * width)
    return "[%s%s] %3d%% %s" % ("#" * filled, "-" * (width - filled),
                                int(progress * 100), msg)
