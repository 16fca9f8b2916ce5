"""Global top-k rank assignment without a global window.

`Window.orderBy(...)` with no partition spec funnels rows through a
single-partition WindowExec and logs a perf warning on every query.  All
our uses rank an ALREADY-limited result (k rows, post
TakeOrderedAndProject), so the scalable formulation is a single no-key
aggregate: collect the k rows into one array, sort it with an explicit
comparator (score desc, id asc — identical to the orderBy the limit used),
posexplode, and rank = pos + 1.  Pure JVM (whole-stage codegen around a
one-group HashAggregate), no WindowExec, bitwise-identical ordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_desc(
    df: DataFrame, score_col: str, id_col: str, *, rank_col: str = "rank",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Append 1-based `rank` ordered by (score desc, id asc).

    Input is expected to be small (a top-k result); the aggregate runs as
    one group.  Output columns: (id_col, score_col, rank_col) in rank
    order, plus any `extra_cols` carried through the sort struct
    unchanged (they never participate in the ordering).
    """

    def cmp(lft: Column, rgt: Column) -> Column:
        return (
            F.when(lft[score_col] > rgt[score_col], F.lit(-1))
            .when(lft[score_col] < rgt[score_col], F.lit(1))
            .when(lft[id_col] < rgt[id_col], F.lit(-1))
            .when(lft[id_col] > rgt[id_col], F.lit(1))
            .otherwise(F.lit(0))
        )

    extras = list(extra_cols or [])
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col(id_col), F.col(score_col),
                     *[F.col(c) for c in extras])
        ),
        cmp,
    )
    return (
        df.agg(arr.alias("_ranked"))
        .select(F.posexplode("_ranked").alias("_pos", "_row"))
        .select(
            F.col(f"_row.{id_col}").alias(id_col),
            F.col(f"_row.{score_col}").alias(score_col),
            (F.col("_pos") + 1).cast("int").alias(rank_col),
            *[F.col(f"_row.{c}").alias(c) for c in extras],
        )
    )


def ranked_asc(
    df: DataFrame, key_col: str, id_col: str, *, rank_col: str = "rank",
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """Append 1-based `rank` ordered by (key asc, id asc) — the
    ascending twin of :func:`ranked_desc`, same no-window one-group
    aggregate."""

    def cmp(lft: Column, rgt: Column) -> Column:
        return (
            F.when(lft[key_col] < rgt[key_col], F.lit(-1))
            .when(lft[key_col] > rgt[key_col], F.lit(1))
            .when(lft[id_col] < rgt[id_col], F.lit(-1))
            .when(lft[id_col] > rgt[id_col], F.lit(1))
            .otherwise(F.lit(0))
        )

    extras = list(extra_cols or [])
    arr = F.array_sort(
        F.collect_list(
            F.struct(F.col(id_col), F.col(key_col),
                     *[F.col(c) for c in extras])
        ),
        cmp,
    )
    return (
        df.agg(arr.alias("_ranked"))
        .select(F.posexplode("_ranked").alias("_pos", "_row"))
        .select(
            F.col(f"_row.{id_col}").alias(id_col),
            F.col(f"_row.{key_col}").alias(key_col),
            (F.col("_pos") + 1).cast("int").alias(rank_col),
            *[F.col(f"_row.{c}").alias(c) for c in extras],
        )
    )
