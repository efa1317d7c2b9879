"""Error types mirroring the reference's user-facing error taxonomy.

The reference raises readable, named errors for type mismatches
(DataTypeError::DataTypeMismatch, reference src/schema/cell.rs:1404-1417)
and emits a fallback warning when pushdown fails
(fallback_warning!, reference src/hooks/query.rs:28-32).  We keep the
same split: hard errors for schema/type problems, a logged warning +
graceful degradation for optional features.
"""

from __future__ import annotations

import logging

logger = logging.getLogger("pg_analytics_spark")


class EngineError(Exception):
    """Base class for all engine errors."""


class DataTypeMismatch(EngineError):
    """Declared column type cannot be produced from the physical type.

    Mirrors DataTypeError::DataTypeMismatch (reference
    src/schema/cell.rs:1409-1414): names the column, the physical
    (arrow/spark) type and the requested type.
    """

    def __init__(self, column: str, physical: str, requested: str):
        self.column, self.physical, self.requested = column, physical, requested
        super().__init__(
            f"column {column!r}: physical type {physical} cannot be read as "
            f"declared type {requested}"
        )


class UnsupportedFormat(EngineError):
    """Unknown source format or an option the format does not support."""


class MissingDependency(EngineError):
    """An optional integration (delta, iceberg, sedona) is not installed."""


class ConcurrentWriteError(EngineError):
    """Two writers raced to commit the same table version.

    The native Delta writer publishes each commit put-if-absent
    (hard-link onto the final ``{v:020}.json`` name); the loser of a
    version race gets this error instead of silently clobbering the
    winner's commit — the caller re-reads the log and retries.
    """


def fallback_warning(msg: str) -> None:
    """Non-fatal degradation notice.

    The reference warns 'Query times may be impacted' when it falls back
    to the row-at-a-time FDW path (src/hooks/query.rs:28-32).  We have a
    single engine so there is no fallback *executor*, but option
    degradations (e.g. an unsupported CSV option) warn the same way.
    """
    logger.warning("pg_analytics_spark fallback: %s — query times may be impacted", msg)
