"""Queued-logging tests (≙ the reference's cross-process log funnel,
``/root/reference/trollflow2/logging.py:120-162``)."""

import logging
import threading

from trollflow2_spark.logging_utils import (
    QueuedLogging,
    attach_queue_handler,
    remove_handlers_from_config,
    setup_logging,
)


class _Sink(logging.Handler):
    def __init__(self):
        super().__init__()
        self.messages = []

    def emit(self, record):
        self.messages.append(record.getMessage())


def test_queued_logging_funnels_worker_records_once():
    sink = _Sink()
    qlog = QueuedLogging([sink])
    q = qlog.start()
    lg = logging.getLogger("tf2.queued.test")
    lg.setLevel(logging.INFO)
    lg.propagate = False
    handler = attach_queue_handler(q, lg)
    try:
        t = threading.Thread(target=lambda: lg.warning("from-worker"))
        t.start()
        t.join()
        lg.warning("from-main")
    finally:
        qlog.stop()  # drains before the listener exits
        lg.removeHandler(handler)
    assert sorted(sink.messages) == ["from-main", "from-worker"]


def test_queued_logging_context_manager():
    sink = _Sink()
    lg = logging.getLogger("tf2.queued.ctx")
    lg.setLevel(logging.INFO)
    lg.propagate = False
    qlog = QueuedLogging([sink])
    with qlog as q:
        handler = attach_queue_handler(q, lg)
        lg.info("inside")
    lg.removeHandler(handler)
    assert sink.messages == ["inside"]


def test_remove_handlers_from_config():
    config = {
        "version": 1,
        "handlers": {"console": {"class": "logging.StreamHandler"}},
        "loggers": {"x": {"level": "INFO", "handlers": ["console"]}},
        "root": {"level": "INFO", "handlers": ["console"]},
    }
    out = remove_handlers_from_config(config)
    assert "handlers" not in out
    assert "handlers" not in out["loggers"]["x"]
    assert "handlers" not in out["root"]


def test_setup_logging_dict_config():
    sinks = []

    class ListHandler(logging.Handler):
        def emit(self, record):
            sinks.append(record.getMessage())

    import logging as L

    L.test_list_handler = ListHandler  # resolvable path for dictConfig
    try:
        setup_logging(
            {
                "version": 1,
                "disable_existing_loggers": False,
                "handlers": {"mem": {"class": "logging.test_list_handler"}},
                "loggers": {
                    "tf2.cfg.test": {"level": "INFO", "handlers": ["mem"]}
                },
            }
        )
        logging.getLogger("tf2.cfg.test").info("configured")
    finally:
        del L.test_list_handler
    assert sinks == ["configured"]
