"""Training wrappers with the reference's exact call surface
(reference: core/training.py:49-105) — blocking + streaming (thread/queue log
plumbing, LOG_DONE sentinel, result_holder dict) — but dispatching to the
TPU-native trainer instead of ``from ultralytics import YOLO``.
"""

from __future__ import annotations

import importlib.util
import io
import os
import queue
import re
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path

LOG_DONE = object()


class StreamQueueWriter:
    """Line-buffered stdout/stderr -> queue adapter for live log streaming."""

    def __init__(self, log_queue: "queue.Queue[str]"):
        self.log_queue = log_queue
        self._buffer = ""

    def write(self, data):
        if not data:
            return
        self._buffer += data
        while "\n" in self._buffer:
            line, self._buffer = self._buffer.split("\n", 1)
            self.log_queue.put(line)

    def flush(self):
        if self._buffer:
            self.log_queue.put(self._buffer)
            self._buffer = ""

    def close(self):
        # logging handlers may close their stream at interpreter shutdown
        self.flush()

    def isatty(self):
        return False


def _extract_epoch_info(line: str):
    if not line:
        return None
    match = re.search(r"[Ee]poch\s*(\d+)\s*/\s*(\d+)", line)
    if match:
        return int(match.group(1)), int(match.group(2))
    return None


def check_train_dependencies():
    """TPU stack probe (replaces the reference's ultralytics/torch check)."""
    missing = []
    for mod in ("jax", "flax", "optax"):
        if importlib.util.find_spec(mod) is None:
            missing.append(mod)
    return missing


def _launch(model_path: str, data_yaml: str, train_kwargs: dict, env_vars: dict):
    if env_vars:
        for key, value in env_vars.items():
            if value:
                os.environ[str(key)] = str(value)
    from ..train.trainer import train_run

    result = train_run(model_path, data_yaml, **(train_kwargs or {}))
    return result, result.get("save_dir")


def run_yolo_training(model_path: str, data_yaml: str, train_kwargs: dict, env_vars: dict):
    """Blocking train; returns (results, captured_log, save_dir, error)."""
    buffer = io.StringIO()
    error = None
    results = None
    save_dir = None
    with redirect_stdout(buffer), redirect_stderr(buffer):
        try:
            results, save_dir = _launch(model_path, data_yaml, train_kwargs, env_vars)
        except Exception as exc:
            error = exc
    return results, buffer.getvalue(), save_dir, error


def run_yolo_training_stream(
    model_path: str,
    data_yaml: str,
    train_kwargs: dict,
    env_vars: dict,
    log_queue: "queue.Queue",
    result_holder: dict,
):
    """Streaming train for a worker thread: stdout/stderr -> line queue,
    results/errors -> shared result_holder, LOG_DONE sentinel at the end."""
    writer = StreamQueueWriter(log_queue)
    with redirect_stdout(writer), redirect_stderr(writer):
        try:
            results, save_dir = _launch(model_path, data_yaml, train_kwargs, env_vars)
            result_holder["save_dir"] = save_dir
            result_holder["results"] = results
        except Exception as exc:
            result_holder["error"] = exc
        finally:
            writer.flush()
            log_queue.put(LOG_DONE)


def collect_run_dirs(root_str: str):
    """Completed run dirs (contain results.csv), newest first."""
    root = Path(root_str) if root_str else None
    if not root or not root.exists():
        return []
    run_dirs = {p.parent.resolve() for p in root.rglob("results.csv")}
    return sorted(run_dirs, key=lambda p: p.stat().st_mtime, reverse=True)
