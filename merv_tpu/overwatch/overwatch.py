"""Process-index-aware logging ("overwatch").

Capability parity with reference ``merv/overwatch/overwatch.py:17-114``: a
rank-aware logger exposing ``rank()``, ``world_size()``, ``is_rank_zero()``,
``rank_zero_only()``, with INFO logging on process 0 and ERROR elsewhere.

TPU-native differences: rank/world-size come from ``jax.process_index()`` /
``jax.process_count()`` (multi-host JAX) instead of accelerate's PartialState
over torch.distributed; there is no process-group side effect — JAX runtime
initialization is handled separately by :func:`merv_tpu.parallel.initialize_runtime`.
"""

from __future__ import annotations

import functools
import logging
import logging.config
import os
import sys
from typing import Any, Callable, ClassVar, Dict, MutableMapping, Optional, TypeVar, Union

T = TypeVar("T")

RICH_AVAILABLE = False
try:  # rich is available in the image (dependency of several baked-in packages)
    import rich.logging  # noqa: F401

    RICH_AVAILABLE = True
except Exception:  # pragma: no cover
    pass

def _stderr_rich_handler():
    from rich.console import Console
    from rich.logging import RichHandler

    return RichHandler(
        console=Console(stderr=True),
        markup=True,
        rich_tracebacks=True,
        show_level=True,
        show_path=True,
        show_time=True,
    )


LOG_CONFIG = {
    "version": 1,
    "disable_existing_loggers": False,
    "formatters": {
        "simple-console": {"format": "%(message)s"},
        "plain": {"format": "%(asctime)s | %(levelname)s | %(name)s :: %(message)s", "datefmt": "%m/%d %H:%M:%S"},
    },
    "handlers": {
        # logs go to STDERR: several entry points (bench.py, eval drivers)
        # have a machine-parsed stdout contract (one JSON line / jsonl), and
        # any library warning routed through the root logger must not
        # pollute it
        "console": (
            {
                "()": "merv_tpu.overwatch.overwatch._stderr_rich_handler",
                "formatter": "simple-console",
            }
            if RICH_AVAILABLE
            else {"class": "logging.StreamHandler", "formatter": "plain", "stream": sys.stderr}
        )
    },
    "root": {"handlers": ["console"], "level": "INFO"},
}


class ContextAdapter(logging.LoggerAdapter):
    """Indentation-prefix adapter: ``ctx_level=N`` indents the message N levels."""

    CTX_PREFIXES: ClassVar[Dict[int, str]] = {0: "[*] "} | {idx: "|=> ".rjust(4 + (idx * 4)) for idx in [1, 2, 3]}

    def process(self, msg: str, kwargs: MutableMapping[str, Any]) -> tuple[str, MutableMapping[str, Any]]:
        ctx_level = kwargs.pop("ctx_level", 0)
        return f"{self.CTX_PREFIXES[ctx_level]}{msg}", kwargs


def _jax_process_info() -> tuple[int, int]:
    """(process_index, process_count) without forcing backend initialization.

    Honors the torchrun-style RANK/WORLD_SIZE env vars first (so pure-CPU unit
    tests can emulate multi-process), falling back to JAX once initialized.
    """
    if "RANK" in os.environ and "WORLD_SIZE" in os.environ:
        return int(os.environ["RANK"]), int(os.environ["WORLD_SIZE"])
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class DistributedOverwatch:
    """Logger facade used when running under a multi-process JAX world."""

    def __init__(self, name: str) -> None:
        logging.config.dictConfig(LOG_CONFIG)
        self.logger = ContextAdapter(logging.getLogger(name), extra={})

        self.debug = self.logger.debug
        self.info = self.logger.info
        self.warning = self.logger.warning
        self.error = self.logger.error
        self.critical = self.logger.critical

        # INFO on rank zero, ERROR everywhere else
        self.logger.logger.setLevel(logging.INFO if self.is_rank_zero() else logging.ERROR)

    @staticmethod
    def rank() -> int:
        return _jax_process_info()[0]

    @staticmethod
    def world_size() -> int:
        return _jax_process_info()[1]

    @classmethod
    def is_rank_zero(cls) -> bool:
        return cls.rank() == 0

    @classmethod
    def local_zero_only(cls, fn: Callable[..., T]) -> Callable[..., Optional[T]]:
        return cls.rank_zero_only(fn)

    @classmethod
    def rank_zero_only(cls, fn: Optional[Callable[..., T]] = None) -> Callable[..., Optional[T]]:
        """Usable both as ``@rank_zero_only`` and ``@rank_zero_only()``
        (the reference uses the call form, ``overwatch.py:65-75``)."""
        if fn is None:
            return cls.rank_zero_only

        @functools.wraps(fn)
        def wrapper(*args: Any, **kwargs: Any) -> Optional[T]:
            if cls.is_rank_zero():
                return fn(*args, **kwargs)
            return None

        return wrapper


class PureOverwatch:
    """Single-process logger facade."""

    def __init__(self, name: str) -> None:
        logging.config.dictConfig(LOG_CONFIG)
        self.logger = ContextAdapter(logging.getLogger(name), extra={})

        self.debug = self.logger.debug
        self.info = self.logger.info
        self.warning = self.logger.warning
        self.error = self.logger.error
        self.critical = self.logger.critical

        self.logger.logger.setLevel(logging.INFO)

    @staticmethod
    def rank() -> int:
        return 0

    @staticmethod
    def world_size() -> int:
        return 1

    @staticmethod
    def is_rank_zero() -> bool:
        return True

    @staticmethod
    def rank_zero_only(fn: Optional[Callable[..., T]] = None) -> Callable[..., T]:
        if fn is None:
            return PureOverwatch.rank_zero_only
        return fn

    local_zero_only = rank_zero_only


def initialize_overwatch(name: str) -> Union[DistributedOverwatch, PureOverwatch]:
    world_size = int(os.environ.get("WORLD_SIZE", -1))
    return DistributedOverwatch(name) if world_size != -1 else PureOverwatch(name)
