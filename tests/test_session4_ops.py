"""Semantic invariants for the round-5 session-4 operators — properties
the oracle hash check cannot express (it proves equality with DuckDB,
not that BOTH engines compute the intended statistic)."""

from __future__ import annotations

import datetime as dt
import math

import duckdb

from target_iceberg_spark.plans import all_specs

SPECS = all_specs()


# -- agg_ab_test -----------------------------------------------------------


def test_welch_t_matches_independent_numpy(spark, sf_oracle):
    """Recompute Welch's t and df from raw per-user totals with numpy —
    a from-scratch implementation sharing no code with the plan."""
    import numpy as np

    rows = SPECS["agg_ab_test"].builder(spark, sf_oracle).collect()
    assert rows
    con = duckdb.connect()
    per_user = con.execute(
        f"""
        SELECT event_type, user_id % 2 AS arm, SUM(value) AS v
        FROM read_parquet('{sf_oracle}/events.parquet')
        GROUP BY event_type, user_id
        """
    ).fetchall()
    by_key: dict[tuple[str, int], list[float]] = {}
    for et, arm, v in per_user:
        by_key.setdefault((et, int(arm)), []).append(float(v))
    for r in rows:
        a = np.array(by_key[(r["event_type"], 0)])
        b = np.array(by_key[(r["event_type"], 1)])
        sa = a.var(ddof=1) / len(a)
        sb = b.var(ddof=1) / len(b)
        t = (a.mean() - b.mean()) / math.sqrt(sa + sb)
        df = (sa + sb) ** 2 / (sa**2 / (len(a) - 1) + sb**2 / (len(b) - 1))
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert abs(r["t_stat"] - t) < 1e-3, (r["event_type"], r["t_stat"], t)
        assert abs(r["welch_df"] - df) < 0.51
        # Welch df is bracketed by min(n)-1 and n_a+n_b-2
        assert min(len(a), len(b)) - 1 <= r["welch_df"] <= len(a) + len(b) - 2


# -- agg_weighted_percentile -----------------------------------------------


def test_weighted_percentile_matches_numpy_and_is_ordered(spark, sf_oracle):
    import numpy as np

    rows = SPECS["agg_weighted_percentile"].builder(spark, sf_oracle).collect()
    assert rows
    con = duckdb.connect()
    for r in rows:
        raw = con.execute(
            f"""
            SELECT l_extendedprice, l_quantity
            FROM read_parquet('{sf_oracle}/lineitem.parquet')
            WHERE l_returnflag = ?
            """,
            [r["l_returnflag"]],
        ).fetchnumpy()
        order = np.argsort(raw["l_extendedprice"], kind="stable")
        prices = raw["l_extendedprice"][order]
        cum = np.cumsum(raw["l_quantity"][order].astype(float))
        total = cum[-1]
        for col, q in (("wmedian_price", 0.5), ("wp90_price", 0.9)):
            want = float(prices[np.searchsorted(cum, q * total)])
            assert r[col] == want, (r["l_returnflag"], col, r[col], want)
        assert r["wmedian_price"] <= r["wp90_price"]


# -- agg_max_concurrent ----------------------------------------------------


def test_max_concurrent_matches_day_scan_bruteforce(spark, sf_oracle):
    """The sweep's answer for the top supplier must equal the O(days x
    intervals) brute force: concurrency(day) = #intervals covering it."""
    rows = SPECS["agg_max_concurrent"].builder(spark, sf_oracle).collect()
    assert rows
    top = rows[0]
    con = duckdb.connect()
    ivls = con.execute(
        f"""
        SELECT CAST(l_shipdate AS DATE), l_orderkey % 14 + 1
        FROM read_parquet('{sf_oracle}/lineitem.parquet')
        WHERE l_suppkey = ?
        """,
        [top["l_suppkey"]],
    ).fetchall()
    spans = [(s, s + dt.timedelta(days=int(n))) for s, n in ivls]  # inclusive
    lo = min(s for s, _ in spans)
    hi = max(e for _, e in spans)
    best = 0
    d = lo
    while d <= hi:
        best = max(best, sum(1 for s, e in spans if s <= d <= e))
        d += dt.timedelta(days=1)
    assert top["max_in_transit"] == best
    # descending report with deterministic tie-break
    vals = [r["max_in_transit"] for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_max_concurrent_is_topk_plan(spark, sf_oracle):
    plan = (
        SPECS["agg_max_concurrent"]
        .builder(spark, sf_oracle)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


# -- text_gopher_rules -----------------------------------------------------


def test_gopher_signals_match_pure_python(spark, sf_oracle):
    from target_iceberg_spark.plans.gopher_quality import (
        MAX_MWL,
        MAX_WORDS,
        MIN_MWL,
        MIN_STOP_FRAC,
        MIN_WORDS,
        STOPWORDS,
    )

    rows = SPECS["text_gopher_rules"].builder(spark, sf_oracle).collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_oracle}/documents.parquet')"
        ).fetchall()
    )
    assert len(rows) == len(texts)
    n_fail = 0
    for r in rows[:50]:
        words = texts[r["doc_id"]].split(" ")
        wc = len(words)
        mwl = sum(len(w) for w in words) / wc
        sf = sum(1 for w in words if w in STOPWORDS) / wc
        assert r["word_count"] == wc
        assert abs(r["mean_word_len"] - mwl) < 1e-3
        assert abs(r["stopword_frac"] - sf) < 1e-3
        want = (
            MIN_WORDS <= wc <= MAX_WORDS
            and MIN_MWL <= round(mwl, 4) <= MAX_MWL
            and round(sf, 4) >= MIN_STOP_FRAC
        )
        assert r["passes_gopher"] == want
        n_fail += 0 if want else 1
    # thresholds must actually discriminate on this corpus
    all_pass = sum(1 for r in rows if r["passes_gopher"])
    assert 0 < all_pass < len(rows)


# -- text_lexical_diversity ------------------------------------------------


def test_lexical_diversity_matches_counter(spark, sf_oracle):
    from collections import Counter

    rows = SPECS["text_lexical_diversity"].builder(spark, sf_oracle).collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_oracle}/documents.parquet')"
        ).fetchall()
    )
    for r in rows[:50]:
        c = Counter(texts[r["doc_id"]].split(" "))
        assert r["n_types"] == len(c)
        assert r["n_tokens"] == sum(c.values())
        assert abs(r["ttr"] - len(c) / sum(c.values())) < 1e-3
        hapax = sum(1 for v in c.values() if v == 1)
        assert abs(r["hapax_ratio"] - hapax / len(c)) < 1e-3
        assert 0.0 < r["ttr"] <= 1.0 and 0.0 <= r["hapax_ratio"] <= 1.0


# -- dedup_lines -----------------------------------------------------------


def test_dedup_lines_matches_pure_python_corpus_scan(spark, sf_oracle):
    """Full from-scratch reimplementation: tile every document in
    Python, count distinct docs per segment, and verify drop counts and
    reassembled clean length for a sample of documents."""
    from target_iceberg_spark.plans.dedup_lines import SEG_MIN_DOCS, SEG_WORDS

    rows = SPECS["dedup_lines"].builder(spark, sf_oracle).collect()
    con = duckdb.connect()
    texts = dict(
        con.execute(
            f"SELECT doc_id, text FROM read_parquet('{sf_oracle}/documents.parquet')"
        ).fetchall()
    )

    def tiles(text):
        w = text.split(" ")
        return [
            " ".join(w[i : i + SEG_WORDS]) for i in range(0, len(w), SEG_WORDS)
        ]

    seg_docs: dict[str, set] = {}
    for did, text in texts.items():
        for seg in set(tiles(text)):
            seg_docs.setdefault(seg, set()).add(did)

    total_dropped = 0
    by_id = {r["doc_id"]: r for r in rows}
    for did in list(texts)[:50]:
        segs = tiles(texts[did])
        dropped = [s for s in segs if len(seg_docs[s]) >= SEG_MIN_DOCS]
        kept = [s for s in segs if len(seg_docs[s]) < SEG_MIN_DOCS]
        r = by_id[did]
        assert r["n_segments"] == len(segs)
        assert r["n_dropped"] == len(dropped)
        assert r["clean_len"] == len(" ".join(kept))
        total_dropped += len(dropped)
    # the corpus genuinely contains repeated segments — removal happened
    assert total_dropped > 0
    # removal is surgical: some doc both dropped and kept segments
    assert any(0 < r["n_dropped"] < r["n_segments"] for r in rows)
