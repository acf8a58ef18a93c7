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


class BoundedCache:
    """A tiny LRU mapping for compiled-program caches.

    Sliding-window predictors compile one program per (volume shape,
    spacing) key; a long heterogeneous cohort would otherwise accumulate
    compiled executables without bound (each holds device memory for its
    constants). Eviction drops the least-recently-used entry past maxsize.
    """

    def __init__(self, maxsize: int = 8):
        from collections import OrderedDict

        self.maxsize = int(maxsize)
        self._d = OrderedDict()

    def __contains__(self, key):
        return key in self._d

    def __len__(self):
        return len(self._d)

    def __getitem__(self, key):
        self._d.move_to_end(key)
        return self._d[key]

    def __setitem__(self, key, value):
        self._d[key] = value
        self._d.move_to_end(key)
        while len(self._d) > self.maxsize:
            self._d.popitem(last=False)

    def keys(self):
        return list(self._d.keys())
