"""Skew-mitigation operators: salted two-stage aggregation and salted
(replicated) joins for hot keys.

At 100 TB a handful of hot keys (one dominant ``event_type``, a
celebrity user) turn a single reducer into the job's critical path. AQE
(``spark.sql.adaptive.skewJoin``) already splits skewed *join*
partitions at runtime; these operators cover the cases AQE does not:

- ``salted_agg``: hash aggregation where one group holds most rows.
  Stage 1 aggregates (key, salt) — spreading each hot key over
  ``n_salts`` reducers — stage 2 combines the per-salt partials. Only
  algebraic aggregates compose this way (sum/count/min/max and
  anything built from them, e.g. avg = sum/count).
- ``salted_join``: large⋈large equi-join with a skewed left side. The
  left side gets a deterministic salt in [0, n_salts); the right side
  is replicated once per salt value. Replication costs n_salts × the
  (smaller) right side — use only for the skewed-key subset in
  practice; Spark handles everything else.

Both produce results identical to the unsalted plan (tests assert
equality), so they are safe drop-ins behind a config flag.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_ALGEBRAIC = {"sum", "count", "min", "max"}


def _salt(cols: list[str], n_salts: int) -> Column:
    """Deterministic row salt: spreads rows of one key uniformly without
    RNG (reproducible across retries — important under speculative
    execution)."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: ``aggs`` maps output name -> (fn, col),
    fn in {sum, count, min, max}. count('*') is supported.

    Equivalent single-stage plan: ``df.groupBy(keys).agg(...)`` — the
    salted form trades one extra (tiny) shuffle of per-salt partials
    for even reducer load under key skew.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: {fn!r} is not algebraic; cannot salt")

    all_cols = [c for c in df.columns]
    stage1 = df.withColumn("_salt", _salt(all_cols, n_salts)).groupBy(
        *keys, "_salt"
    )
    partials = stage1.agg(
        *[
            (F.count("*") if fn == "count" and col in ("*", None) else getattr(F, fn)(col)).alias(
                f"_p_{name}"
            )
            for name, (fn, col) in aggs.items()
        ]
    )
    # combine: sum of partial sums/counts; min of mins; max of maxes
    recombine = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    return partials.groupBy(*keys).agg(
        *[
            recombine[fn](f"_p_{name}").alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salts``
    reducers and the right side replicated per salt.

    Output equals ``left.join(right, on, how)`` for inner/left joins
    (replication is on the build side only, so no duplicate matches).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    non_key = [c for c in left.columns if c not in on] or on
    salted_left = left.withColumn("_salt", _salt(non_key, n_salts))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt")
    replicated_right = right.select("*", salts)
    out = salted_left.join(replicated_right, [*on, "_salt"], how)
    return out.drop("_salt")
