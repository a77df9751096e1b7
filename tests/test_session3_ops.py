"""Direct semantic tests for the session-3 operators — properties the
oracle-parity hash check can't articulate (it proves Spark == DuckDB,
not that both compute the intended thing)."""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from pyspark.sql import Window

from target_iceberg_spark.plans import all_specs
from target_iceberg_spark.sources.tables import load_table

SPECS = all_specs()


def test_chunks_cover_every_token_with_exact_overlap(spark, sf_oracle):
    """Every document's chunks: first starts at token 1, consecutive
    chunk starts advance by exactly the stride, the last chunk reaches
    the final token, and every chunk holds <= CHUNK_TOKENS tokens."""
    from target_iceberg_spark.plans.text_chunks import CHUNK_STRIDE, CHUNK_TOKENS

    docs = load_table(spark, sf_oracle, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    chunks = SPECS["text_chunk_overlap"].builder(spark, sf_oracle)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.max("n_tokens").alias("max_len"),
            F.min("n_tokens").alias("min_len"),
        )
        .join(docs, "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r["max_idx"] == r["n_chunks"] - 1  # contiguous indexes
        assert r["max_len"] <= CHUNK_TOKENS
        assert r["min_len"] >= 1
        # last chunk covers through the final token:
        last_start = r["max_idx"] * CHUNK_STRIDE + 1
        assert last_start + CHUNK_TOKENS - 1 >= r["n_tok"]
        # and the previous chunk (if any) did NOT already reach the end
        # with a full stride to spare (no superfluous trailing chunk)
        if r["n_chunks"] > 1:
            assert (r["max_idx"] - 1) * CHUNK_STRIDE + CHUNK_TOKENS < r["n_tok"]


def test_gapfill_days_are_consecutive_and_counts_match_raw(spark, sf_oracle):
    out = SPECS["events_gapfill"].builder(spark, sf_oracle)
    # per user: span length == row count (no holes, no extras)
    spans = (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("day").alias("d0"),
            F.max("day").alias("d1"),
            F.sum(F.when(F.col("n_events") == 0, 1).otherwise(0)).alias("zeros"),
        )
        .collect()
    )
    assert spans
    any_zeros = 0
    for r in spans:
        expected = (r["d1"] - r["d0"]).days + 1
        assert r["n_rows"] == expected, (r["user_id"], r["n_rows"], expected)
        any_zeros += r["zeros"]
    assert any_zeros > 0  # the fill path is actually exercised
    # non-zero days agree with the raw per-day counts
    raw = (
        load_table(spark, sf_oracle, "events")
        .groupBy("user_id", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_raw"))
    )
    mismatch = (
        out.join(raw, ["user_id", "day"], "left")
        .where(F.col("n_events") != F.coalesce("n_raw", F.lit(0)))
        .count()
    )
    assert mismatch == 0


def test_ohlc_open_close_match_windowed_first_last(spark, sf_oracle):
    out = SPECS["events_ohlc"].builder(spark, sf_oracle)
    ev = load_table(spark, sf_oracle, "events")
    w = Window.partitionBy(
        "event_type", F.date_trunc("hour", "ts")
    ).orderBy("ts", "event_id")
    ends = (
        ev.select(
            "event_type",
            F.date_trunc("hour", "ts").alias("hour"),
            F.first("value").over(w).alias("w_open"),
            F.last("value").over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("w_close"),
        )
        .dropDuplicates(["event_type", "hour"])
    )
    joined = out.join(ends, ["event_type", "hour"]).collect()
    assert joined
    for r in joined:
        assert r["open"] == r["w_open"], r
        assert r["close"] == r["w_close"], r


def test_pagerank_two_node_cycle_is_uniform(spark):
    from target_iceberg_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 1.0), ("b", "a", 1.0)], "src string, dst string, weight double"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iterations=5).collect()}
    assert got["a"] == got["b"]
    assert abs(got["a"] - 0.5) < 1e-12  # symmetric cycle fixpoint


def test_pagerank_mass_bounded_and_positive(spark, sf_oracle):
    rows = SPECS["graph_pagerank"].builder(spark, sf_oracle).collect()
    total = sum(r["rank"] for r in rows)
    assert all(r["rank"] > 0 for r in rows)
    # dangling mass is dropped, never created: sum <= 1 (+rounding)
    assert total <= 1.0 + 1e-6
    assert total > 0.5  # and the transition graph keeps most mass


def test_time_weighted_average_hand_case(spark):
    rows = [
        (1, datetime.datetime(2024, 1, 1, 0, 0, 0), 10.0, 1),
        (1, datetime.datetime(2024, 1, 1, 0, 0, 10), 20.0, 2),
        (1, datetime.datetime(2024, 1, 1, 0, 0, 40), 99.0, 3),  # no successor
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double, event_id long"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = df.select(
        "user_id",
        "value",
        (
            F.unix_micros(F.lead("ts").over(w).cast("timestamp"))
            - F.unix_micros(F.col("ts").cast("timestamp"))
        ).alias("dt_us"),
    ).where(F.col("dt_us").isNotNull() & F.col("value").isNotNull())
    got = seg.groupBy("user_id").agg(
        (F.sum(F.col("value") * F.col("dt_us")) / F.sum("dt_us")).alias("twa")
    ).collect()[0]["twa"]
    # 10 held 10s, 20 held 30s -> (10*10 + 20*30)/40 = 17.5
    assert abs(got - 17.5) < 1e-12


def test_skyline_hand_case_with_ties_and_duplicates(spark):
    from target_iceberg_spark.operators.skyline import skyline_2d

    rows = [
        (1, 0.0, 0.0),   # cheapest -> on the front
        (2, 1.0, 1.0),   # dominated by (1.0, 5.0)
        (3, 1.0, 5.0),   # front
        (4, 2.0, 7.0),   # front (duplicate coordinates below)
        (5, 2.0, 7.0),   # duplicate of the front point -> also kept
        (6, 3.0, 7.0),   # dominated by (2.0, 7.0): same qty, cheaper
        (7, 2.0, 5.0),   # dominated by (2.0, 7.0) and (1.0, 5.0)
        (8, None, 9.0),  # null coordinate -> dropped
    ]
    df = spark.createDataFrame(rows, "id int, price double, qty double")
    got = sorted(
        (r["id"],) for r in skyline_2d(df, "price", "qty").collect()
    )
    assert got == [(1,), (3,), (4,), (5,)]


def test_skyline_result_is_undominated_and_maximal(spark, sf_oracle):
    """No skyline row is dominated by ANY input row, and every
    non-skyline row is dominated by some skyline row (front
    completeness) — checked against the full sf0.01 lineitem."""
    out = SPECS["skyline_pareto"].builder(spark, sf_oracle)
    front = [(r["price"], r["qty"]) for r in out.collect()]
    assert front
    pts = (
        load_table(spark, sf_oracle, "lineitem")
        .select(
            F.col("l_extendedprice").alias("p"), F.col("l_quantity").alias("q")
        )
        .collect()
    )
    def dominated(p, q):
        return any(
            fp <= p and fq >= q and (fp < p or fq > q) for fp, fq in front
        )
    for p, q in front:
        assert not dominated(p, q)
    n_dom = sum(1 for r in pts if (r["p"], r["q"]) not in set(front) and dominated(r["p"], r["q"]))
    n_out = sum(1 for r in pts if (r["p"], r["q"]) not in set(front))
    assert n_dom == n_out  # completeness: everything off the front is dominated


def test_recall_audit_equals_manual_intersection(spark, sf_oracle):
    """The registered audit's recall must equal the intersection of
    the two underlying registered queries computed independently."""
    exact = {
        r["vec_id"]
        for r in SPECS["sim_cosine_topk"].builder(spark, sf_oracle).collect()
    }
    ann = {
        r["vec_id"]
        for r in SPECS["sim_ann_rp"].builder(spark, sf_oracle).collect()
    }
    from target_iceberg_spark.plans.similarity import TOP_K

    row = SPECS["sim_recall_audit"].builder(spark, sf_oracle).collect()[0]
    assert row["n_overlap"] == len(exact & ann)
    assert row["recall_at_k"] == round(len(exact & ann) / TOP_K, 4)
