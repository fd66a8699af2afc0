"""Error-classification filters for source/map stages.

Re-expresses the reference's ``aws_handle_regions`` decorator
(``cartography/util.py:652-760``): a source-stage UDF wrapped with this
decorator turns CLASSIFIED errors (access denied, unauthorized, region
not opted in, ...) into an EMPTY batch instead of failing the pipeline,
logs a warning, and retries TRANSIENT errors with exponential backoff.
Non-classified errors re-raise normally, so genuine bugs still abort.

Ray-native posture: the wrapper runs inside ``map_batches`` workers, so
one denied tenant/region/shard produces an empty block and the stream
keeps flowing — the exact behavior the reference needs for multi-region
sweeps. Ray's own task retries handle worker death; this layer handles
APPLICATION-classified failures Ray cannot know about.
"""

from __future__ import annotations

import functools
import logging
import time
from typing import Callable, Iterable, Type

import pyarrow as pa

logger = logging.getLogger(__name__)


class SourceAccessError(Exception):
    """Raise from a source UDF to signal a classified, skippable failure
    (the AccessDenied / AuthFailure / opt-in-region family)."""


def handle_source_errors(
    empty_schema: pa.Schema,
    *,
    skip_on: tuple[Type[BaseException], ...] = (SourceAccessError, PermissionError),
    skip_messages: Iterable[str] = ("AccessDenied", "AuthFailure", "UnauthorizedOperation",
                                    "InvalidClientTokenId", "UnrecognizedClientException"),
    retry_on: tuple[Type[BaseException], ...] = (ConnectionError, TimeoutError),
    max_tries: int = 5,
    backoff_base: float = 0.2,
    max_backoff: float = 600.0,
) -> Callable:
    """Decorator for a ``map_batches`` UDF returning ``pa.Table``.

    - ``skip_on`` exceptions (or any exception whose message contains one
      of ``skip_messages`` — the reference's error-code list) → warning +
      empty table with ``empty_schema``.
    - ``retry_on`` exceptions → exponential backoff up to ``max_tries``
      (reference: 5 tries, backoff capped at 600 s), then re-raise.
    - anything else re-raises immediately.
    """

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapped(batch, *args, **kwargs):
            tries = 0
            while True:
                try:
                    return fn(batch, *args, **kwargs)
                except skip_on as e:
                    logger.warning("skipping shard after classified error: %r", e)
                    return empty_schema.empty_table()
                except retry_on as e:
                    tries += 1
                    if tries >= max_tries:
                        raise
                    delay = min(max_backoff, backoff_base * (2 ** tries))
                    logger.warning("transient error (%r); retry %d in %.1fs", e, tries, delay)
                    time.sleep(delay)
                except Exception as e:  # message-classified skip (error-code family)
                    msg = str(e)
                    if any(code in msg for code in skip_messages):
                        logger.warning("skipping shard after classified error: %r", e)
                        return empty_schema.empty_table()
                    raise

        return wrapped

    return deco
