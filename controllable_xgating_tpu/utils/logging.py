"""Structured logging — JSONL scalars + stdout.

The reference logs loss/metrics via bare stdout prints (SURVEY.md §5).
Here: a JSONL scalar logger (one event per line, machine-parseable) that
also mirrors human-readable lines to stdout, plus optional TensorBoard via
tensorflow's summary writer when available.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from typing import Any, Optional

_LOGGERS: dict[str, logging.Logger] = {}


def get_logger(name: str = "cxg") -> logging.Logger:
    if name in _LOGGERS:
        return _LOGGERS[name]
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s")
        )
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
        logger.propagate = False
    _LOGGERS[name] = logger
    return logger


class JsonlLogger:
    """Append-only JSONL event log; one dict per line with ts/step.

    `tensorboard_dir` additionally mirrors numeric scalars to a TensorBoard
    event file via tensorflow's summary writer (SURVEY.md §5 "Metrics/
    logging": the reference optionally used tensorboardX). Gated on the
    tensorflow import so the logger works in minimal environments.
    """

    def __init__(
        self,
        path: Optional[str] = None,
        echo: bool = True,
        tensorboard_dir: Optional[str] = None,
    ):
        self.path = path
        self.echo = echo
        self._fh = None
        self._tb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a", buffering=1)
        if tensorboard_dir:
            try:
                import tensorflow as tf  # CPU build, for summaries only

                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception as e:  # tensorflow absent/broken -> JSONL only
                get_logger().info("tensorboard unavailable (%s)", e)
        self._log = get_logger()

    def log(self, step: int, **scalars: Any) -> None:
        event = {"ts": time.time(), "step": int(step), **scalars}
        if self._fh is not None:
            self._fh.write(json.dumps(event, default=float) + "\n")
        if self._tb is not None:
            import tensorflow as tf

            with self._tb.as_default():
                for k, v in scalars.items():
                    if isinstance(v, (int, float)):
                        tf.summary.scalar(k, float(v), step=int(step))
        if self.echo:
            body = " ".join(
                f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in scalars.items()
            )
            self._log.info("step %d %s", step, body)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
            self._fh = None
        if self._tb is not None:
            self._tb.close()
            self._tb = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
