"""Registry pairing each named query plan with its DuckDB oracle SQL.

The driver contract (``__spark_entry__.py``) re-exports these: every entry
in ``QUERIES`` is a ``(spark, sf_dir) -> DataFrame`` callable; entries in
``ORACLES`` hold equivalent ANSI SQL DuckDB runs on the same parquet
tables. Queries without an oracle get the driver's weaker rows-only check
(reserved for genuinely non-SQL-expressible operators).

Numeric determinism policy (why every aggregate here casts to DECIMAL):
float sums are order-dependent, and Spark and DuckDB will not in general
produce bit-identical doubles from a parallel sum. We therefore cast the
(2-decimal, money-like) input doubles to exact DECIMAL types, aggregate
exactly, and cast the final result back to DOUBLE — both engines then
produce bit-identical values and the driver's value-hash matches.
Precisions are chosen so no intermediate exceeds DECIMAL(38, s) (where
engines would start rounding differently).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register_query(name: str, oracle: str | None = None):
    """Decorator: add a (spark, sf_dir) -> DataFrame plan to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Export-ordering policy: stable registration order. ``QUERIES`` is a
# plain insertion-ordered dict populated at import by the plan modules, so
# the exported ordering is fixed by the source layout and independent of
# any external verification history. Sampling policy (if a harness checks
# only a subset per run) belongs to the harness, not this registry.
#
# Registry size budget: keep the registry at or under ~100 entries; a new
# query must certify a genuinely new operator or plan shape (not a second
# example of an existing one), and must land in the same commit as a
# local oracle-parity run. Redundant rows get retired before new ones
# are added past the budget.


def ordered_queries() -> dict[str, QueryFn]:
    """Registry in stable registration (source) order."""
    return dict(QUERIES)
