"""Machine-checked contract for driver-side collects (VERDICT r11
task 4).

Every ``.collect()`` in this engine is bounded BY CONSTRUCTION — probe
rows, centroid tables, per-class confusion cells, calendar-bounded
series — but until round 12 that invariant lived in per-site comments,
the last 100 TB-critical discipline enforced only by convention. This
module turns it into the same two-part contract the unpartitioned-
window prover (tests/test_plans.py) applies to windows:

1. STRUCTURAL PROOF (``structural=True``, the default): the optimized
   logical plan must collapse cardinality on every root-to-leaf path —
   an Aggregate, a Limit, a literal relation, or a small Range —
   before any unbounded source (parquet scan, LogicalRDD, stream) is
   reached. Joins are conservative: bounded x unbounded is unbounded.
2. RUNTIME ROW CAP (always): the collected row count must not exceed
   ``cap``. For sites whose bound is a SELECTIVE LITERAL FILTER
   (``vec_id == PROBE``), a fixed-size dimension (nation), or a seeded
   sample — shapes no structural rule can prove — callers pass
   ``structural=False`` and the cap alone is the tripwire. The cap is
   a correctness guard (a corpus-sized collect raises instead of
   silently becoming a driver bottleneck), not OOM armor: rows
   materialize before the check so the plan's deterministic
   partition-order row sequence is preserved (several callers — PQ
   codebook fitting — are order-sensitive, and a ``limit(cap+1)``
   pushdown would re-introduce task-completion-order dependence).

The residual risk mirrors the window prover's documented one: an
Aggregate's group count is trusted (a groupBy(doc_id) collect would
pass structurally) — the ``cap`` is the backstop for exactly that
case, so pick it from the site's real bound, not a round big number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row

_BOUNDED_LEAVES = {"LocalRelation", "OneRowRelation"}
_COLLAPSING = {"Aggregate", "GlobalLimit", "LocalLimit"}
_RANGE_CAP = 100_000


def _subtree_is_bounded(node) -> bool:
    """True iff every root-to-leaf path crosses a cardinality-collapsing
    operator before reaching an unbounded source (same rule as the
    window prover in tests/test_plans.py — kept in the package so the
    check runs in production, with the test suite guarding parity)."""
    name = node.getClass().getSimpleName()
    if name in _COLLAPSING or name in _BOUNDED_LEAVES:
        return True
    if name == "Range":
        n = node.numElements()  # BigInt or plain int depending on py4j
        return (n.longValue() if hasattr(n, "longValue") else int(n)) <= _RANGE_CAP
    children = node.children()
    if children.size() == 0:
        return False  # parquet relation, LogicalRDD, stream source, ...
    return all(
        _subtree_is_bounded(children.apply(i)) for i in range(children.size())
    )


def unbounded_paths(df: DataFrame) -> list[str]:
    """Empty list if ``df``'s optimized plan is structurally bounded;
    otherwise the offending root node's argString for the error."""
    root = df._jdf.queryExecution().optimizedPlan()
    if _subtree_is_bounded(root):
        return []
    return [root.getClass().getSimpleName() + " " + root.argString(120)]


def bounded_collect(
    df: DataFrame, cap: int, why: str, structural: bool = True
) -> list[Row]:
    """Collect ``df`` under the boundedness contract above.

    ``cap``: the site's real row bound (with headroom), not a round
    big number — it is the only guard for selectivity-bounded sites.
    ``why``: one phrase naming the bound (appears in errors/audits).
    ``structural=False``: skip the plan proof for selectivity/sample/
    fixed-dimension bounds the structural rule cannot express.
    """
    if cap <= 0:
        raise ValueError(f"bounded_collect({why}): cap must be positive")
    if structural:
        bad = unbounded_paths(df)
        if bad:
            raise AssertionError(
                f"bounded_collect({why}): plan is not structurally bounded "
                f"(no Aggregate/Limit/literal between collect and source): "
                f"{bad[0]} — collapse the input through an aggregate/limit "
                f"first, or declare structural=False with a selectivity "
                f"argument in `why`"
            )
    rows = df.collect()
    if len(rows) > cap:
        raise RuntimeError(
            f"bounded_collect({why}): {len(rows)} rows exceed the declared "
            f"cap {cap} — this collect is no longer driver-bounded"
        )
    return rows
