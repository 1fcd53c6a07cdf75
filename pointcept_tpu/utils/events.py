"""Scalar event storage with smoothing + writers (tb/json/console).

Parity target: reference `pointcept/utils/events.py` (`EventStorage:296`,
`HistoryBuffer:533`, `JSONWriter:60`, `CommonMetricPrinter:190`,
`ExceptionWriter:599`); the HistoryBuffer/EventStorage API shape follows that
file (itself derived from detectron2, Apache-2.0) — the implementation here is
our own.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
import traceback
from collections import defaultdict, deque
from contextlib import contextmanager
from typing import Deque, Dict, List, Optional, Tuple

_CURRENT_STORAGE_STACK: List["EventStorage"] = []


def get_event_storage() -> "EventStorage":
    assert _CURRENT_STORAGE_STACK, "get_event_storage() has to be called inside a 'with EventStorage(...)' context!"
    return _CURRENT_STORAGE_STACK[-1]


class HistoryBuffer:
    """Bounded scalar series with windowed median/mean and a running global
    average (O(1) update via a deque; the bound only limits memory)."""

    def __init__(self, max_length: int = 1000000):
        self._data: Deque[Tuple[float, float]] = deque(maxlen=max_length)
        self._count = 0
        self._global_avg = 0.0

    def update(self, value: float, iteration: Optional[float] = None):
        self._data.append((value, self._count if iteration is None else iteration))
        self._count += 1
        self._global_avg += (value - self._global_avg) / self._count

    def latest(self) -> float:
        return self._data[-1][0]

    def _window(self, window_size: int) -> List[float]:
        n = min(window_size, len(self._data))
        return [v for v, _ in list(self._data)[-n:]]

    def median(self, window_size: int) -> float:
        vals = sorted(self._window(window_size))
        return vals[len(vals) // 2]

    def avg(self, window_size: int) -> float:
        vals = self._window(window_size)
        return sum(vals) / len(vals)

    def global_avg(self) -> float:
        return self._global_avg

    def values(self) -> List[Tuple[float, float]]:
        return list(self._data)


class EventStorage:
    """The user-facing store for scalars/histories during training."""

    def __init__(self, start_iter: int = 0):
        self._history: Dict[str, HistoryBuffer] = defaultdict(HistoryBuffer)
        self._smoothing_hints: Dict[str, bool] = {}
        self._latest_scalars: Dict[str, Tuple[float, int]] = {}
        self._iter = start_iter
        self._current_prefix = ""

    def put_scalar(self, name: str, value, smoothing_hint: bool = True):
        name = self._current_prefix + name
        value = float(value)
        self._history[name].update(value, self._iter)
        self._latest_scalars[name] = (value, self._iter)
        existing = self._smoothing_hints.get(name)
        if existing is not None:
            assert existing == smoothing_hint, f"Scalar {name} was put with inconsistent smoothing_hint"
        else:
            self._smoothing_hints[name] = smoothing_hint

    def put_scalars(self, *, smoothing_hint: bool = True, **kwargs):
        for k, v in kwargs.items():
            self.put_scalar(k, v, smoothing_hint=smoothing_hint)

    def history(self, name: str) -> HistoryBuffer:
        ret = self._history.get(name)
        if ret is None:
            raise KeyError(f"No history metric available for {name}!")
        return ret

    def histories(self):
        return self._history

    def latest(self):
        return self._latest_scalars

    def latest_with_smoothing_hint(self, window_size: int = 20):
        result = {}
        for k, (v, itr) in self._latest_scalars.items():
            result[k] = (
                self._history[k].median(window_size) if self._smoothing_hints[k] else v,
                itr,
            )
        return result

    def smoothing_hints(self):
        return self._smoothing_hints

    def step(self):
        self._iter += 1

    @property
    def iter(self) -> int:
        return self._iter

    @iter.setter
    def iter(self, val: int):
        self._iter = int(val)

    @contextmanager
    def name_scope(self, name: str):
        old = self._current_prefix
        self._current_prefix = name.rstrip("/") + "/"
        yield
        self._current_prefix = old

    def clear_history(self):
        self._history = defaultdict(HistoryBuffer)

    def reset_history(self, key: str):
        ret = self._history.get(key)
        if ret is None:
            raise KeyError(f"No history metric available for {key}!")
        ret._data.clear()

    def reset_histories(self):
        for v in self._history.values():
            v._data.clear()

    def __enter__(self):
        _CURRENT_STORAGE_STACK.append(self)
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        assert _CURRENT_STORAGE_STACK[-1] == self
        _CURRENT_STORAGE_STACK.pop()


class EventWriter:
    def write(self):
        raise NotImplementedError

    def close(self):
        pass


class JSONWriter(EventWriter):
    """Append scalars to a .json-lines file (reference `utils/events.py:60`)."""

    def __init__(self, json_file: str, window_size: int = 20):
        self._file = open(json_file, "a")
        self._window_size = window_size
        self._last_write = -1

    def write(self):
        storage = get_event_storage()
        to_save = defaultdict(dict)
        for k, (v, itr) in storage.latest_with_smoothing_hint(self._window_size).items():
            if itr <= self._last_write:
                continue
            to_save[itr][k] = v
        if len(to_save):
            self._last_write = max(to_save.keys())
        for itr, scalars in sorted(to_save.items()):
            scalars["iteration"] = itr
            self._file.write(json.dumps(scalars, sort_keys=True) + "\n")
        self._file.flush()
        try:
            os.fsync(self._file.fileno())
        except OSError:
            pass

    def close(self):
        self._file.close()


class CommonMetricPrinter(EventWriter):
    """Log the standard 'eta ... iter ... losses ... lr' line to a logger."""

    def __init__(self, max_iter: Optional[int] = None, window_size: int = 20):
        self.logger = logging.getLogger(__name__)
        self._max_iter = max_iter
        self._window_size = window_size
        self._last_write = None

    def _get_eta(self, storage) -> Optional[str]:
        if self._max_iter is None:
            return ""
        iteration = storage.iter
        try:
            eta_seconds = storage.history("time").median(1000) * (self._max_iter - iteration - 1)
            return str(datetime.timedelta(seconds=int(eta_seconds)))
        except KeyError:
            eta_string = None
            if self._last_write is not None:
                estimate_iter_time = (time.perf_counter() - self._last_write[1]) / (iteration - self._last_write[0])
                eta_seconds = estimate_iter_time * (self._max_iter - iteration - 1)
                eta_string = str(datetime.timedelta(seconds=int(eta_seconds)))
            self._last_write = (iteration, time.perf_counter())
            return eta_string

    def write(self):
        storage = get_event_storage()
        iteration = storage.iter
        if iteration == self._max_iter:
            return
        try:
            lr = "{:.5g}".format(storage.history("lr").latest())
        except KeyError:
            lr = "N/A"
        eta_string = self._get_eta(storage)
        losses = [
            "{}: {:.4g}".format(k, v.median(self._window_size))
            for k, v in storage.histories().items()
            if "loss" in k
        ]
        self.logger.info(
            " {eta}iter: {iter}  {losses}  lr: {lr}".format(
                eta=f"eta: {eta_string}  " if eta_string else "",
                iter=iteration,
                losses="  ".join(losses),
                lr=lr,
            )
        )


class ExceptionWriter:
    """Context manager persisting tracebacks to a log file on crash.

    Parity: reference `utils/events.py:599`.
    """

    def __init__(self, log_dir: Optional[str] = None):
        self.log_dir = log_dir

    def __enter__(self):
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if exc_type is None:
            return False
        tb_text = "".join(traceback.format_exception(exc_type, exc_val, exc_tb))
        logging.getLogger("pointcept_tpu").error(tb_text)
        if self.log_dir is not None:
            os.makedirs(self.log_dir, exist_ok=True)
            stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M%S")
            with open(os.path.join(self.log_dir, f"exception_{stamp}.log"), "w") as f:
                f.write(tb_text)
        return False
