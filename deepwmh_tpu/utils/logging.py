"""Run logging + timers (reference: deepwmh/utilities/misc.py:109-159)."""

from __future__ import annotations

import datetime
import os
import time


class SimpleTxtLog:
    """Timestamped append-only text log (reference misc.py:109-123)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if not os.path.exists(path):
            with open(path, "w"):
                pass

    def write(self, msg: str, timestamp: bool = True) -> None:
        stamp = ""
        if timestamp:
            stamp = datetime.datetime.now().strftime("[%Y-%m-%d %H:%M:%S] ")
        with open(self.path, "a") as f:
            f.write(stamp + msg + "\n")


class Timer:
    """Wall-clock timer (reference misc.py:125-142)."""

    def __init__(self):
        self.start = time.time()

    def elapsed(self) -> float:
        return time.time() - self.start

    def restart(self) -> float:
        e = self.elapsed()
        self.start = time.time()
        return e


class TimeStamps:
    """Named timestamps for stage bookkeeping (reference misc.py:144-159)."""

    def __init__(self):
        self._stamps = {}

    def record(self, name: str) -> None:
        self._stamps[name] = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")

    def get(self, name: str) -> str:
        return self._stamps.get(name, "<not recorded>")
