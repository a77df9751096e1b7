"""Distributed 2-D skyline (Pareto front) — minimize one column,
maximize another.

Pattern from the published Spark-SQL skyline work (EDBT 2023,
"Integration of Skyline Queries into Spark SQL", retrieved in
PAPERS.md): the skyline operator is DISTRIBUTIVE —
skyline(A ∪ B) = skyline(skyline(A) ∪ skyline(B)) — so it runs as

  1. a LOCAL skyline per partition (Arrow-batched sweep, O(n log n)
     per partition, no shuffle), which shrinks each partition to its
     own Pareto front, then
  2. a GLOBAL skyline over the union of local fronts — a single small
     task, because local fronts are tiny for realistic (even mildly
     correlated) data. The anti-correlated worst case where fronts
     stay large is documented: there the merge input is itself the
     answer's size, so no algorithm does better.

The per-batch sweep is exact under the standard dominance definition:
a dominates b iff a.min_col <= b.min_col AND a.max_col >= b.max_col
AND strict in at least one; points with identical (min,max) do not
dominate each other and are all kept. The sweep sorts by
(min_col asc, max_col desc) and keeps a row iff its max_col equals
its min-value group's maximum AND strictly exceeds every strictly-
cheaper group's maximum — an O(n log n) formulation a SQL oracle can
mirror with two window passes.

The reference (SidetrekAI/target-iceberg, write-only) has no query
surface; engine extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """Exact Pareto front of ``df``: no other row is <= on ``min_col``
    and >= on ``max_col`` with at least one strict. Preserves all
    input columns and duplicate-coordinate ties. Null coordinates are
    dropped (a null is never comparable under dominance)."""
    import pandas as pd  # executor-side; local import for pickling

    cols = df.columns

    def _sweep(pdf: "pd.DataFrame") -> "pd.DataFrame":
        s = pdf.sort_values([min_col, max_col], ascending=[True, False])
        g = s.groupby(min_col, sort=True)[max_col].transform("max")
        # prefix max of group maxima over STRICTLY smaller min values:
        grp_max = s.groupby(min_col, sort=True)[max_col].max()
        prev = grp_max.cummax().shift(1)  # indexed by min value
        m = s[min_col].map(prev)
        keep = (s[max_col] == g) & (m.isna() | (s[max_col] > m))
        return s[keep]

    def local(batches):
        acc = []
        for pdf in batches:
            pdf = pdf.dropna(subset=[min_col, max_col])
            if len(pdf):
                acc.append(_sweep(pdf))
        if acc:
            # re-sweep the union of this partition's batch fronts
            yield _sweep(pd.concat(acc, ignore_index=True))

    schema = df.schema
    partial = df.select(*cols).mapInPandas(local, schema=schema)
    # Global merge: the union of local fronts is small by construction.
    # repartition(1), NOT coalesce(1): coalesce is a narrow dependency
    # that would collapse the scan and BOTH sweeps into one 1-partition
    # task (verified in the executed plan), serializing phase 1. The
    # repartition inserts an exchange, so phase 1 sweeps every scan
    # partition in parallel and only the tiny fronts travel.
    return partial.repartition(1).mapInPandas(local, schema=schema)
