"""Property-based checks for the session-3 algorithmic operators:
the distributed implementations must agree with brute-force / numpy
references on randomized inputs (few examples — each example runs
Spark jobs — but adversarially shrunk by hypothesis on failure)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

_point = st.tuples(st.integers(0, 5), st.integers(0, 5))


@given(st.lists(_point, min_size=1, max_size=30))
@settings(max_examples=15, deadline=None)
def test_skyline_matches_bruteforce_dominance(spark, pts):
    """The two-phase sweep equals the O(n²) dominance definition on
    random small point sets — tiny coordinate domain forces heavy
    ties and duplicate coordinates, the sweep's hard cases."""
    from target_iceberg_spark.operators.skyline import skyline_2d

    rows = [(i, float(p), float(q)) for i, (p, q) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id int, price double, qty double")

    def dominated(i):
        p, q = pts[i]
        return any(
            (p2 <= p and q2 >= q and (p2 < p or q2 > q)) for p2, q2 in pts
        )

    want = sorted(i for i in range(len(pts)) if not dominated(i))
    got = sorted(r["id"] for r in skyline_2d(df, "price", "qty").collect())
    assert got == want


_edge = st.tuples(
    st.sampled_from("abcd"), st.sampled_from("abcd"), st.integers(1, 3)
)


@given(st.lists(_edge, min_size=1, max_size=12, unique_by=lambda e: e[:2]))
@settings(max_examples=10, deadline=None)
def test_pagerank_matches_reference_recurrence(spark, edges):
    """The iterative-join PageRank equals a dense numpy evaluation of
    the documented recurrence (teleport/N + d * weighted in-mass,
    dangling mass dropped) on random weighted digraphs — including
    self-loops and nodes appearing only as destinations (dangling)."""
    import numpy as np

    from target_iceberg_spark.operators.pagerank import pagerank

    df = spark.createDataFrame(
        [(s, d, float(w)) for s, d, w in edges],
        "src string, dst string, weight double",
    )
    got = {r["node"]: r["rank"] for r in pagerank(df, iterations=3).collect()}

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0.0) + w
    rank = np.full(n, 1.0 / n)
    for _ in range(3):
        mass = np.zeros(n)
        for s, d, w in edges:
            mass[idx[d]] += (w / out_w[s]) * rank[idx[s]]
        rank = 0.15 / n + 0.85 * mass
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - rank[idx[v]]) < 1e-9, (v, got[v], rank[idx[v]])


# -- mmr_select ------------------------------------------------------------


@st.composite
def _mmr_candidates(draw):
    n = draw(st.integers(min_value=1, max_value=12))
    dims = draw(st.integers(min_value=2, max_value=4))
    out = []
    for vid in range(n):
        vec = [
            draw(
                st.floats(
                    min_value=-2.0,
                    max_value=2.0,
                    allow_nan=False,
                    allow_infinity=False,
                )
            )
            for _ in range(dims)
        ]
        # avoid the zero vector (cosine undefined)
        if all(abs(x) < 1e-6 for x in vec):
            vec[0] = 1.0
        rel = draw(
            st.floats(
                min_value=-1.0, max_value=1.0, allow_nan=False, allow_infinity=False
            )
        )
        out.append((vid, vec, rel))
    return out


@given(cands=_mmr_candidates(), k=st.integers(min_value=1, max_value=12))
@settings(max_examples=60, deadline=None)
def test_mmr_select_invariants(cands, k):
    from target_iceberg_spark.plans.similarity_mmr import mmr_select

    picked = mmr_select(cands, k, 0.5)
    ids = [p[0] for p in picked]
    assert len(picked) == min(k, len(cands))  # exhausts or fills k
    assert len(set(ids)) == len(ids)  # no repeats
    assert set(ids) <= {c[0] for c in cands}  # subset of candidates
    # first pick is the pure-relevance argmax (vec_id tie-break)
    best = min((-c[2], c[0]) for c in cands)[1]
    assert ids[0] == best


@given(cands=_mmr_candidates(), k=st.integers(min_value=1, max_value=12))
@settings(max_examples=60, deadline=None)
def test_mmr_lambda_one_is_pure_relevance(cands, k):
    """lambda=1 removes the diversity term entirely: MMR must reduce
    to relevance ranking exactly (same order, same tie-breaks)."""
    from target_iceberg_spark.plans.similarity_mmr import mmr_select

    picked = mmr_select(cands, k, 1.0)
    want = [c[0] for c in sorted(cands, key=lambda c: (-c[2], c[0]))[:k]]
    assert [p[0] for p in picked] == want


# -- asof_join (all three directions) vs pandas.merge_asof ------------------


@st.composite
def _asof_case(draw):
    n_keys = draw(st.integers(min_value=1, max_value=3))
    probes = []
    refs = []
    pid = 0
    for k in range(n_keys):
        for t in draw(
            st.lists(
                st.integers(min_value=0, max_value=100),
                min_size=0,
                max_size=6,
            )
        ):
            probes.append((k, t, f"p{pid}"))
            pid += 1
        # unique ts per key on the right: pandas merge_asof tie rules
        # for duplicate ts differ from this operator's documented
        # min-payload rule (covered by its own unit test)
        rts = draw(
            st.lists(
                st.integers(min_value=0, max_value=100),
                min_size=0,
                max_size=6,
                unique=True,
            )
        )
        for t in rts:
            refs.append((k, t, pid * 1000 + t))
    return probes, refs


@given(case=_asof_case(), direction=st.sampled_from(["backward", "forward", "nearest"]))
@settings(max_examples=20, deadline=None)
def test_asof_join_fuzz_matches_pandas(spark, case, direction):
    import pandas as pd

    from target_iceberg_spark.operators.asof import asof_join

    probes, refs = case
    if not probes:
        return
    left = spark.createDataFrame(probes, "k int, t long, probe string")
    right = (
        spark.createDataFrame(refs, "k int, t long, rid long")
        if refs
        else spark.createDataFrame([], "k int, t long, rid long")
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        value_cols=("rid",), direction=direction,
    ).collect()
    lp = pd.DataFrame(probes, columns=["k", "t", "probe"]).sort_values(
        ["t", "probe"], kind="mergesort"
    )
    # explicit dtypes: an empty refs list would otherwise build an
    # all-object frame and merge_asof raises MergeError before any
    # comparison (the engine side handles the empty case via its
    # explicit schema; the reference frame must too)
    rp = (
        pd.DataFrame(refs, columns=["k", "t", "rid"])
        .astype({"k": "int64", "t": "int64", "rid": "int64"})
        .sort_values(["t", "rid"], kind="mergesort")
    )
    want = pd.merge_asof(lp, rp, on="t", by="k", direction=direction)
    want_map = dict(zip(want["probe"], want["rid"]))
    assert len(out) == len(probes)
    for r in out:
        w = want_map[r["probe"]]
        if pd.isna(w):
            assert r["rid"] is None, (direction, r["probe"])
        else:
            assert r["rid"] == int(w), (direction, r["probe"], r["rid"], w)
