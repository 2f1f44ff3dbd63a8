"""Custom connector via the Spark 4 Python DataSource API.

Demonstrates the engine's extension point for sources Spark has no
built-in reader for (internal feeds, bespoke formats): subclass
``DataSource``/``DataSourceReader``, emit ``InputPartition``s so the
planner fans the scan out across tasks, and yield plain tuples per
partition. The same surface the reference fills with HTTP scrapers
(spiders/*.py) — here the Bronze contract is a *connector*, not a
pre-dumped fixture.

The shipped source is a deterministic synthetic-corpus generator: every
field derives from the row index through the corpus-wide sha256 draw
convention (``ops/sampling.hash_uniform01``), so the connector's output
is reproducible ANYWHERE — including in pure SQL, which is what lets the
gate value-oracle a custom connector end to end (DuckDB recomputes the
identical rows from ``range(n)``).

Scale notes: ``partitions()`` is the planner contract — N partitions =
N parallel tasks, so a real connector sizes them to the remote system's
parallelism (file splits, topic partitions, shard ranges). ``read``
streams tuples lazily; nothing materializes per-partition lists.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


def _u01(i: int, salt: str = "synth") -> float:
    """First 8 sha256 hex chars of ``f"{i}{salt}"`` scaled to [0, 1) —
    bit-identical to sampling.hash_uniform01 and to the SQL idiom
    ``('0x' || substr(sha256(CAST(i AS VARCHAR) || 'synth'), 1, 8))::UBIGINT
    / 4294967296.0``."""
    h = hashlib.sha256(f"{i}{salt}".encode()).hexdigest()[:8]
    return int(h, 16) / 4294967296.0


def synth_row(i: int) -> tuple[int, str, int]:
    """(doc_id, lang, n_chars) for row ``i`` — the single definition both
    the connector and its oracle derive from."""
    u = _u01(i)
    lang = "en" if u < 0.6 else ("vi" if u < 0.9 else "zh")
    return i, lang, int(math.floor(u * 1000.0))


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SyntheticCorpusReader(DataSourceReader):
    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.lo = 0          # narrowed by pushFilters
        self.hi = self.n_docs

    def partitions(self):
        lo, hi, p = self.lo, max(self.lo, self.hi), max(1, self.n_partitions)
        n = hi - lo
        if n == 0:
            return [_RangePartition(lo, lo)]
        step = (n + p - 1) // p
        return [_RangePartition(s, min(s + step, hi)) for s in range(lo, hi, step)]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SyntheticCorpusPushdownReader(SyntheticCorpusReader):
    """Opt-in variant (``option("pushdown", "true")``): merely DEFINING
    pushFilters makes Spark's planning worker reject every scan unless
    ``spark.sql.python.filterPushdown.enabled`` is true (session.py sets
    it, but a foreign session — e.g. the driver harness's own — may
    not), so the capability lives on a subclass the caller selects only
    when it knows the session allows it."""

    def pushFilters(self, filters):
        """Filter pushdown INTO the connector (the scale contract: prune
        at the source, not after the shuffle): doc_id comparisons narrow
        the generated [lo, hi) id range, so pruned rows are never even
        created; anything else is returned for Spark to evaluate."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        remaining = []
        for f in filters:
            # type() check, not isinstance: bool is an int subclass, and a
            # pushed boolean comparison must fall through to Spark, not
            # silently narrow the id range to [1, 2).
            if getattr(f, "attribute", None) == ("doc_id",) and type(
                getattr(f, "value", None)
            ) is int:
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                elif isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                elif isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                elif isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                elif isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                else:
                    remaining.append(f)
            else:
                remaining.append(f)
        return remaining


class SyntheticCorpusDataSource(DataSource):
    """``spark.read.format("synthetic_corpus").option("n_docs", ...)`` after
    ``spark.dataSource.register(SyntheticCorpusDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_corpus"

    def schema(self) -> str:
        return "doc_id bigint, lang string, n_chars bigint"

    def reader(self, schema) -> SyntheticCorpusReader:
        if self.options.get("pushdown", "false").lower() == "true":
            return SyntheticCorpusPushdownReader(self.options)
        return SyntheticCorpusReader(self.options)

    def simpleStreamReader(self, schema):
        return SyntheticCorpusStreamReader(self.options)


_REGISTER_LOCK = __import__("threading").Lock()


def register(spark) -> None:
    """Idempotent registration of the connector on a session.

    Thread-safe (r16): two queries registering concurrently can race
    Spark's check-then-act inside ``registerPython`` and the loser gets
    DATA_SOURCE_ALREADY_EXISTS — even though a SEQUENTIAL re-register
    replaces silently. Serialize within this process and treat
    already-exists as success (the connector class is identical)."""
    from pyspark.errors import AnalysisException

    with _REGISTER_LOCK:
        try:
            spark.dataSource.register(SyntheticCorpusDataSource)
        except AnalysisException as e:
            if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
                raise


class SyntheticCorpusStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic corpus: offsets are
    plain row indices ({"next": i}), each planning cycle serves at most
    ``batch_rows`` rows, and ``readBetweenOffsets`` replays any committed
    range bit-identically (the generator is pure) — which is exactly the
    replayability contract Structured Streaming checkpoints rely on."""

    def __init__(self, options):
        self.n_docs = int(options.get("n_docs", 1000))
        self.batch_rows = int(options.get("batch_rows", 250))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        s = int(start["next"])
        e = min(s + self.batch_rows, self.n_docs)
        return iter([synth_row(i) for i in range(s, e)]), {"next": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(int(start["next"]), int(end["next"]))])

    def commit(self, end: dict) -> None:
        pass
