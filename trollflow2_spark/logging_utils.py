"""Queued, config-driven logging for the daemon (driver-side).

Parity: the reference funnels log records from its per-message worker
processes through a multiprocessing queue into one listener holding the
real handlers (``/root/reference/trollflow2/logging.py:120-162``:
``setup_queued_logging`` / ``queued_logging`` / ``create_logged_process``).

Under Spark the executors log through Spark's own log4j collection, so
the cross-JVM half needs no repo code. What remains driver-side — worker
threads running plugin chains (``_run_with_timeout``), foreachBatch
callbacks, and any helper *process* the driver spawns — is covered here
with the stdlib ``QueueHandler``/``QueueListener`` pair: producers see a
non-blocking, picklable handler; one listener thread owns the real
(possibly slow: file, mail, socket) handlers.

Config is a safe-YAML/dict ``logging.dictConfig`` document (the
launcher's ``-c`` flag), mirroring the reference's YAML log config.
"""

from __future__ import annotations

import logging
import logging.config
import logging.handlers
import queue as _queue
from typing import Sequence

DEFAULT_FORMAT = "[%(asctime)s %(levelname)-8s %(name)s] %(message)s"


def setup_logging(config: dict | None = None, level: int = logging.INFO) -> None:
    """Apply a dictConfig logging document; fall back to a basicConfig
    with the daemon format (≙ ``_set_config`` / default config,
    ``logging.py:35-60``)."""
    if config:
        logging.config.dictConfig(dict(config))
    else:
        logging.basicConfig(level=level, format=DEFAULT_FORMAT)


def remove_handlers_from_config(config: dict) -> dict:
    """Strip handler references so a queued child process doesn't open
    the real handlers itself (≙ ``remove_handlers_from_config``,
    ``logging.py:129-136``). Returns the modified dict."""
    config.pop("handlers", None)
    for name in config.get("loggers", {}):
        config["loggers"][name].pop("handlers", None)
    if config.get("root"):
        config["root"].pop("handlers", None)
    return config


class QueuedLogging:
    """One listener thread owning the real handlers; producers attach a
    queue handler. Usable as a context manager around the daemon run.

    ``start()`` returns the queue — hand it to worker threads or spawned
    processes and call :func:`attach_queue_handler` there.
    """

    def __init__(self, handlers: Sequence[logging.Handler] | None = None):
        self._queue: _queue.Queue = _queue.Queue(-1)
        if handlers is None:
            h = logging.StreamHandler()
            h.setFormatter(logging.Formatter(DEFAULT_FORMAT))
            handlers = [h]
        self._listener = logging.handlers.QueueListener(
            self._queue, *handlers, respect_handler_level=True
        )

    @property
    def queue(self) -> _queue.Queue:
        return self._queue

    def start(self) -> _queue.Queue:
        self._listener.start()
        return self._queue

    def stop(self) -> None:
        # drains the queue before the listener thread exits
        self._listener.stop()

    def __enter__(self) -> _queue.Queue:
        return self.start()

    def __exit__(self, *exc) -> None:
        self.stop()


def attach_queue_handler(
    log_queue, logger: logging.Logger | None = None
) -> logging.handlers.QueueHandler:
    """Point a logger (default: root) at the queue — the producer half
    (≙ ``setup_queued_logging``, ``logging.py:120-127``). Returns the
    handler so callers can detach it."""
    target = logger or logging.getLogger()
    handler = logging.handlers.QueueHandler(log_queue)
    target.addHandler(handler)
    return handler
