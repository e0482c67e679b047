"""stdout + file logger (ref ``vgtk/vgtk/app/logger.py:11-38``)."""
from __future__ import annotations

import logging
import os
import sys


class Logger:
    def __init__(self, log_dir: str | None = None, name: str = "eap_tpu"):
        self._logger = logging.getLogger(name)
        self._logger.setLevel(logging.INFO)
        self._logger.handlers.clear()
        fmt = logging.Formatter("[%(asctime)s] %(message)s", "%H:%M:%S")
        sh = logging.StreamHandler(sys.stdout)
        sh.setFormatter(fmt)
        self._logger.addHandler(sh)
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(log_dir, "log.txt"))
            fh.setFormatter(fmt)
            self._logger.addHandler(fh)

    def info(self, msg: str):
        self._logger.info(msg)

    log = info
