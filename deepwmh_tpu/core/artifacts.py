"""Idempotent artifacts + checkpoint markers.

The reference's two load-bearing operational ideas (SURVEY.md §5):
1. marker-file checkpoints that gate every expensive pipeline phase
   (reference: deepwmh/utilities/misc.py:191-211), and
2. content-verified output probing so corrupt/partial artifacts are
   recomputed (reference: deepwmh/utilities/data_io.py:265-283).

Both are preserved here so every stage of the TPU pipeline is re-entrant.
"""

from __future__ import annotations

import json
import os
import tempfile


class Checkpoints:
    """Marker-file resume system (reference misc.py:191-211)."""

    def __init__(self, folder: str, enabled: bool = True):
        self.folder = folder
        self.enabled = enabled
        os.makedirs(folder, exist_ok=True)

    def _path(self, name: str) -> str:
        return os.path.join(self.folder, name)

    def is_finished(self, name: str) -> bool:
        if not self.enabled:
            return False
        return os.path.exists(self._path(name))

    def set_finish(self, name: str) -> None:
        with open(self._path(name), "w") as f:
            f.write("")

    def clear(self, name: str) -> None:
        try:
            os.remove(self._path(name))
        except FileNotFoundError:
            pass


def atomic_write_json(obj, path: str) -> None:
    """Write JSON atomically so a killed process never leaves a truncated
    file that would defeat the loadability probes."""
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f, indent=2)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def load_json(path: str):
    with open(path, "r") as f:
        return json.load(f)


def try_load_json(path: str) -> bool:
    try:
        load_json(path)
        return True
    except Exception:
        return False


def mkdir(path: str) -> str:
    """mkdir -p, returning the path (reference file_ops.py:10-23)."""
    os.makedirs(path, exist_ok=True)
    return path


def join_path(*parts) -> str:
    return os.path.join(*parts)
