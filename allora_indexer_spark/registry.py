"""Query registry: name → (DataFrame builder, optional DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2) registers here with a
``@query("name", oracle="...")`` decorator. ``__spark_entry__.py`` exposes the
registry to the driver; tests/test_queries_vs_duckdb.py runs the same
comparison locally (row count + order-insensitive exact value match).

Cross-engine determinism contract (applies to every registered query):
- double aggregations go through DECIMAL casts (scale >= 2) and come back as
  DOUBLE. Decimal ties at scale >= 1 are not representable in binary doubles,
  so Spark and DuckDB round identically, and decimal sums are exact and
  therefore independent of Spark partition order;
- no wall-clock, no rand(), no engine-specific hash (md5 only — identical hex
  in both engines);
- window orderings always include a unique tie-break column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str


_REGISTRY: dict[str, RegisteredQuery] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        prev = _REGISTRY.get(name)
        if prev is not None and (
            prev.fn.__module__ != fn.__module__
            or prev.fn.__qualname__ != fn.__qualname__
        ):
            # a DIFFERENT function claiming the name is a real collision;
            # the same module re-registering its own function is a module
            # RE-IMPORT — a failed partial import leaves its entries here
            # while Python drops the module from sys.modules, so the
            # retry re-executes the file and must overwrite, not raise a
            # misleading 'duplicate' that masks the original error
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = RegisteredQuery(
            name=name, fn=fn, oracle=oracle, doc=(fn.__doc__ or "").strip()
        )
        return fn

    return deco


def all_queries() -> dict[str, RegisteredQuery]:
    # Import operator modules lazily so registration happens on first use and
    # plain `import allora_indexer_spark` stays cheap.
    from allora_indexer_spark.operators import (  # noqa: F401
        ann_index,
        curation,
        dedup,
        multimodal,
        relational,
        similarity,
        sketches,
        sniff,
        stateful,
        textstats,
        video,
    )

    return dict(_REGISTRY)
