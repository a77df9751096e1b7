"""Two-phase exact heavy hitters: per-partition Misra-Gries candidate
generation + exact recount of candidates only.

Why this shape at 100 TB: a plain ``groupBy(token).count()`` shuffles
one partial count per (map task, distinct key) — fine when the key
domain is vocabulary-sized, ruinous when it is web-scale (URLs,
n-grams, user ids: billions of distinct keys, almost all of which
could never be in the top k). Misra-Gries [Misra & Gries 1982, "Finding
repeated elements"] summarizes each partition with at most ``capacity``
candidate keys in one streaming pass (any key with partition frequency
> n_p/(capacity+1) is guaranteed to survive that partition's sketch),
so the shuffle moves O(partitions × capacity) keys instead of the full
key domain; the second pass recounts ONLY the candidate set exactly
(broadcast semi-join, map-side combinable), so every reported count is
exact, not an estimate.

Candidate completeness: a true global top-k key could in principle be
evicted from every partition's sketch if it is uniformly thin
(global frequency ≤ N/(capacity+1) yet still top-k) — the classic MG
caveat. Size ``capacity`` ≥ a small multiple of k × skew so the k-th
hitter's frequency clears N/(capacity+1); the unit tests pin the
candidate-⊇-exact-top-k invariant on the shipped corpus at two scales.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _mg_batches(capacity: int):
    """mapInPandas body factory: stream one partition's values through
    a Misra-Gries sketch, emit the surviving candidate keys."""

    def body(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sketch: dict[str, int] = {}
        for pdf in it:
            for v in pdf["token"]:
                if v in sketch:
                    sketch[v] += 1
                elif len(sketch) < capacity:
                    sketch[v] = 1
                else:
                    # decrement-all step; drop zeros
                    dead = []
                    for k in sketch:
                        sketch[k] -= 1
                        if sketch[k] == 0:
                            dead.append(k)
                    for k in dead:
                        del sketch[k]
        yield pd.DataFrame({"token": list(sketch.keys())})

    return body


def heavy_hitters_exact(
    tokens: DataFrame, k: int, capacity: int = 64
) -> DataFrame:
    """Exact top-k of ``tokens`` (single column ``token``) by the
    two-phase candidate + recount plan.

    Phase 1 streams each partition through a capacity-bounded MG
    sketch (mapInPandas, no shuffle); phase 2 recounts candidates
    exactly with a broadcast semi-join + combinable groupBy, then
    takes the top-k with TakeOrderedAndProject ordering
    (n DESC, token) for determinism under count ties."""
    candidates = (
        tokens.mapInPandas(_mg_batches(capacity), schema="token string")
        .distinct()
    )
    return (
        tokens.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(k)
    )
