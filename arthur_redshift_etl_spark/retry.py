"""Retry with transient-error classification.

Reference parity: ``python/etl/util/retry.py:1-56`` (``call_with_retry``)
and the retriable-error classification in ``dialect/redshift.py:366-369,
507-524``; attempt counts from ``default_settings.yaml:5-16`` (extract 1,
copy 3, insert 3).
"""

from __future__ import annotations

import logging
import time
from typing import Callable, TypeVar

from .errors import TransientETLError

logger = logging.getLogger(__name__)

T = TypeVar("T")

DEFAULT_RETRIES = {"extract": 1, "copy": 3, "insert": 3}


def call_with_retry(
    max_retries: int,
    fn: Callable[[], T],
    sleep_seconds: float = 1.0,
    backoff: float = 2.0,
) -> T:
    """Run ``fn`` up to 1 + max_retries times; only TransientETLError retries.

    >>> attempts = []
    >>> def flaky():
    ...     attempts.append(1)
    ...     if len(attempts) < 3:
    ...         raise TransientETLError("try again")
    ...     return "ok"
    >>> call_with_retry(3, flaky, sleep_seconds=0)
    'ok'
    >>> len(attempts)
    3
    """
    delay = sleep_seconds
    for attempt in range(max_retries + 1):
        try:
            return fn()
        except TransientETLError:
            if attempt == max_retries:
                raise
            logger.warning("transient failure (attempt %d), retrying", attempt + 1)
            if delay:
                time.sleep(delay)
            delay *= backoff
    raise AssertionError("unreachable")
