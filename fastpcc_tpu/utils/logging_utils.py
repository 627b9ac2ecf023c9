"""Colorized stderr + per-run-file logging (replaces the reference's loguru
setup, reference: train.py:52-67)."""
import logging
import sys

_COLORS = {'DEBUG': '\033[36m', 'INFO': '\033[32m', 'WARNING': '\033[33m',
           'ERROR': '\033[31m', 'CRITICAL': '\033[41m'}
_RESET = '\033[0m'


class _ColorFormatter(logging.Formatter):
    def format(self, record):
        msg = super().format(record)
        if sys.stderr.isatty():
            color = _COLORS.get(record.levelname, '')
            return f'{color}{msg}{_RESET}'
        return msg


def make_logger(name: str = 'fastpcc', log_file: str = '') -> logging.Logger:
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    logger.handlers.clear()
    fmt = '%(asctime)s | %(levelname)s | %(message)s'
    sh = logging.StreamHandler(sys.stderr)
    sh.setFormatter(_ColorFormatter(fmt))
    logger.addHandler(sh)
    if log_file:
        fh = logging.FileHandler(log_file)
        fh.setFormatter(logging.Formatter(fmt))
        logger.addHandler(fh)
    logger.propagate = False
    return logger
