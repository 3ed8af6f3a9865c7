"""Logging setup: console + rotating per-run file handler.

Mirrors the reference's dictConfig-driven logger
(/root/reference/logger/logger.py:8-21, logger_config.json) — console
DEBUG with bare messages, rotating ``info.txt`` (10 MB x 20 backups)
inside the run's log dir — without requiring an external JSON file.
"""

import logging
import logging.config
from pathlib import Path

DEFAULT_LOGGING_CONFIG = {
    "version": 1,
    "disable_existing_loggers": False,
    "formatters": {
        "simple": {"format": "%(message)s"},
        "datetime": {
            "format": "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
        },
    },
    "handlers": {
        "console": {
            "class": "logging.StreamHandler",
            "level": "DEBUG",
            "formatter": "simple",
            "stream": "ext://sys.stdout",
        },
        "info_file_handler": {
            "class": "logging.handlers.RotatingFileHandler",
            "level": "INFO",
            "formatter": "datetime",
            "filename": "info.txt",
            "maxBytes": 10485760,
            "backupCount": 20,
            "encoding": "utf8",
        },
    },
    "root": {"level": "INFO", "handlers": ["console", "info_file_handler"]},
}


def setup_logging(log_dir, config_dict=None, default_level=logging.INFO):
    log_dir = Path(log_dir)
    cfg = dict(config_dict or DEFAULT_LOGGING_CONFIG)
    for handler in cfg.get("handlers", {}).values():
        if "filename" in handler:
            handler["filename"] = str(log_dir / Path(handler["filename"]).name)
    try:
        logging.config.dictConfig(cfg)
    except Exception:
        logging.basicConfig(level=default_level)
