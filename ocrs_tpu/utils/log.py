"""Logging shim (counterpart of ocrs/src/log.rs:4-26).

The reference's ``log!`` macro routes to ``console.log`` on wasm and
``println!`` natively; here the equivalent seam is a module logger that
plays well with host applications embedding the library (they configure the
root logger; we never write to stdout behind their back unless debug
printing was explicitly requested)."""

from __future__ import annotations

import logging

logger = logging.getLogger("ocrs_tpu")


def log(msg: str, *args) -> None:
    """Info-level framework log message."""
    logger.info(msg, *args)


def debug(msg: str, *args) -> None:
    logger.debug(msg, *args)


def warn(msg: str, *args) -> None:
    logger.warning(msg, *args)
