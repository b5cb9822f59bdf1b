"""Declarative data-quality constraint checking (Deequ-style).

A constraint suite compiles to the MINIMUM number of passes over the
data: every row-level predicate (completeness, domain membership,
ranges) and every uniqueness check folds into ONE hash-free aggregate
scan (conditional sums + count-distincts side by side), and each
referential-integrity check adds one left-anti join against its
dimension (broadcast when the dimension is small). Output is the
long-form verification report — (check_name, observed, passed) — that
a pipeline gate consumes; at 100 TB the report is constraint-count
rows, the scan is one pass, and nothing collects to the driver.

The check names and observed-value semantics are deliberately plain
arithmetic so the whole report is DuckDB-oracle-able row for row.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Suite:
    """Builder for a constraint suite over one table."""

    df: DataFrame
    _aggs: list = field(default_factory=list)  # (name, observed_col, pass_col)
    _fks: list = field(default_factory=list)   # (name, key, dim, dim_key)

    def unique(self, *cols: str) -> "Suite":
        n = F.count(F.lit(1))
        nd = F.count_distinct(*[F.col(f"`{c}`") for c in cols])
        dup = (n - nd).cast("long")
        self._aggs.append((f"unique({','.join(cols)})", dup, dup == 0))
        return self

    def not_null(self, col: str) -> "Suite":
        nulls = F.sum(
            F.when(F.col(f"`{col}`").isNull(), 1).otherwise(0)
        ).cast("long")
        self._aggs.append((f"not_null({col})", nulls, nulls == 0))
        return self

    def in_set(self, col: str, values: list) -> "Suite":
        bad = F.sum(
            F.when(
                F.col(f"`{col}`").isNotNull()
                & ~F.col(f"`{col}`").isin(values),
                1,
            ).otherwise(0)
        ).cast("long")
        self._aggs.append(
            (f"in_set({col})", bad, bad == 0)
        )
        return self

    def satisfies(self, name: str, predicate: Column) -> "Suite":
        """Row-level predicate; observed = violation count."""
        bad = F.sum(F.when(~predicate, 1).otherwise(0)).cast("long")
        self._aggs.append((f"satisfies({name})", bad, bad == 0))
        return self

    def foreign_key(
        self, col: str, dim: DataFrame, dim_col: str
    ) -> "Suite":
        self._fks.append((f"fk({col})", col, dim, dim_col))
        return self

    def run(self) -> DataFrame:
        """The verification report: (check_name, observed, passed),
        one row per constraint, ordered by constraint name. One
        aggregate scan for all row-level + uniqueness checks, one
        anti-join per FK."""
        parts = []
        if self._aggs:
            # ONE wide aggregate row, unpivoted to long form with a
            # single explode — a union of per-constraint selects would
            # replay the scan once per branch (measured: 6 FileScans
            # for a 5-constraint suite before this formulation)
            wide = self.df.agg(
                *[
                    obs.alias(f"_o{i}")
                    for i, (_, obs, _p) in enumerate(self._aggs)
                ],
                *[
                    p.alias(f"_p{i}")
                    for i, (_, _obs, p) in enumerate(self._aggs)
                ],
            )
            rows = F.array(
                *[
                    F.struct(
                        F.lit(name).alias("check_name"),
                        F.col(f"_o{i}").alias("observed"),
                        F.col(f"_p{i}").alias("passed"),
                    )
                    for i, (name, _, _) in enumerate(self._aggs)
                ]
            )
            parts.append(
                wide.select(F.explode(rows).alias("_r")).select(
                    "_r.check_name", "_r.observed", "_r.passed"
                )
            )
        for name, col, dim, dim_col in self._fks:
            orphans = (
                self.df.select(F.col(f"`{col}`").alias("_k"))
                .where(F.col("_k").isNotNull())
                .join(
                    F.broadcast(
                        dim.select(F.col(f"`{dim_col}`").alias("_k"))
                    ),
                    "_k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("observed"))
            )
            parts.append(
                orphans.select(
                    F.lit(name).alias("check_name"),
                    "observed",
                    (F.col("observed") == 0).alias("passed"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.orderBy("check_name")


def fd_violations(
    df, determinant_cols: list[str], dependent_col: str
):
    """Functional-dependency profiling: the determinant groups that
    VIOLATE ``determinant → dependent`` (more than one distinct
    dependent value), with group size and the distinct count — the
    schema-discovery / constraint-mining sibling of the Deequ-style
    suite above (a violated FD is either a data bug or a wrong
    assumption about the table; both are worth a row). One hash
    aggregate; map-side partial distinct on (det, dep) keeps the
    shuffle at distinct-pair volume; output bounded by the violating
    determinant count. NULL dependents are EXCLUDED from the distinct
    count (COUNT(DISTINCT) semantics, identical in both engines) — an
    all-NULL dependent never flags."""
    from pyspark.sql import functions as F

    dets = [F.col(f"`{c}`") for c in determinant_cols]
    return (
        df.groupBy(*dets)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.col(f"`{dependent_col}`"))
            .cast("bigint")
            .alias("n_dependent_values"),
        )
        .where(F.col("n_dependent_values") > 1)
    )
