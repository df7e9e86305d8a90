"""Curation operators: benchmark decontamination, repetition profiling,
deterministic stratified sampling (functions/curation.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.functions import curation as cur


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


# ---------------------------------------------------------------------------
# decontamination
# ---------------------------------------------------------------------------

def test_contaminated_docs_finds_shared_ngrams(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(
        spark,
        [
            (1, "x y alpha beta gamma z"),      # shares 1 trigram
            (2, "alpha beta gamma delta run"),  # shares 2 trigrams
            (3, "totally different words here"),
            (4, "beta gamma alpha"),            # same words, different order
        ],
    )
    hits = {
        r["doc_id"]: r["n_hits"]
        for r in cur.contaminated_docs(corpus, bench, n=3).collect()
    }
    assert hits == {1: 1, 2: 2}


def test_decontaminate_removes_exactly_contaminated(spark):
    bench = _docs(spark, [(100, "alpha beta gamma delta")])
    corpus = _docs(
        spark,
        [
            (1, "x y alpha beta gamma z"),
            (2, "clean document one two three"),
            (3, None),  # NULL text: no shingles -> survives
        ],
    )
    kept = sorted(
        r["doc_id"] for r in cur.decontaminate(corpus, bench, n=3).collect()
    )
    assert kept == [2, 3]


def test_contaminated_docs_hash_modes_agree(spark):
    bench = _docs(spark, [(0, "one two three four five")])
    corpus = _docs(
        spark,
        [(i, f"pad{i} one two three four five tail{i}") for i in range(6)]
        + [(99, "unrelated corpus text entirely")],
    )
    a = sorted(
        map(tuple, cur.contaminated_docs(corpus, bench, n=3, hash_mode="xxhash64").collect())
    )
    b = sorted(
        map(tuple, cur.contaminated_docs(corpus, bench, n=3, hash_mode="portable").collect())
    )
    assert a == b and len(a) == 6


def test_contamination_probe_is_broadcast(spark):
    bench = _docs(spark, [(0, "one two three four five")])
    corpus = _docs(spark, [(1, "one two three six")])
    plan = cur.contaminated_docs(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus side never shuffles


# ---------------------------------------------------------------------------
# repetition profiling
# ---------------------------------------------------------------------------

def test_repetition_profile_hand_computed(spark):
    d = _docs(spark, [(1, "a a a b")])
    r = cur.repetition_profile(d).collect()[0]
    assert r["n_words"] == 4
    assert r["distinct_frac"] == 0.5
    assert r["top_word_frac"] == 0.75
    # bigrams: "a a", "a a", "a b" -> 1 - 2/3
    assert abs(r["dup_bigram_frac"] - (1.0 - 2.0 / 3.0)) < 1e-15
    assert r["passes_repetition"] is False  # top_word_frac > 0.20


def test_repetition_profile_degenerate_inputs(spark):
    d = _docs(spark, [(1, ""), (2, "word"), (3, None), (4, "u v w x y")])
    rows = {r["doc_id"]: r for r in cur.repetition_profile(d).collect()}
    # empty / NULL: no words -> NULL metrics, fails closed
    for i in (1, 3):
        assert rows[i]["distinct_frac"] is None
        assert rows[i]["passes_repetition"] is False
    # single word: no bigrams -> dup_bigram_frac 0.0, top_word_frac 1.0
    assert rows[2]["n_words"] == 1
    assert rows[2]["dup_bigram_frac"] == 0.0
    assert rows[2]["top_word_frac"] == 1.0
    # all-distinct doc passes
    assert rows[4]["top_word_frac"] == 0.2
    assert rows[4]["dup_bigram_frac"] == 0.0
    assert rows[4]["passes_repetition"] is True


def test_repetition_profile_partial_aggregated(spark):
    """r6: the shuffle-free HOF-fold formulation was replaced by explode
    + codegen hash aggregates (the fold evaluated an interpreted
    struct-building lambda per word — measured ~6x slower at sf1, see
    OPTIMIZATION_r06.md). The exchanges must carry partial-aggregated
    (doc, word) counts (map-side combine), and the per-word interpreted
    run-length fold must be gone from the plan."""
    d = _docs(spark, [(1, "a b c")])
    plan = cur.repetition_profile(d)._jdf.queryExecution().executedPlan().toString()
    assert "partial_count" in plan, "map-side combine before the exchange"
    assert "greatest(" not in plan, "interpreted run-length fold resurfaced"


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------

def _mix(spark, n=400):
    return spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(n)], "doc_id bigint, source string"
    )


def test_stratified_sample_exact_rates(spark):
    d = _mix(spark)
    out = cur.stratified_sample(
        d, {"s0": 1.0, "s1": 0.0, "s2": 2.0}, strat="source", default_rate=0.5
    )
    per = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert per.get("s0") == 100          # rate 1.0: every row, once
    assert "s1" not in per               # rate 0.0: dropped
    assert per.get("s2") == 200          # rate 2.0: every row, twice
    assert 20 <= per.get("s3", 0) <= 80  # rate 0.5: ~50 of 100


def test_stratified_sample_upsampling_copies(spark):
    d = _mix(spark, 100)
    out = cur.stratified_sample(d, {}, strat="source", default_rate=2.5)
    per_doc = (
        out.groupBy("doc_id").agg(F.count("*").alias("n"), F.max("copy").alias("mx"))
    ).collect()
    assert all(r["n"] in (2, 3) and r["mx"] == r["n"] for r in per_doc)
    n3 = sum(1 for r in per_doc if r["n"] == 3)
    assert 25 <= n3 <= 75  # ~half get the fractional third copy


def test_stratified_sample_deterministic_and_shuffle_free(spark):
    d = _mix(spark)
    kw = dict(strat="source", default_rate=0.3)
    a = sorted(map(tuple, cur.stratified_sample(d, {"s1": 1.5}, **kw).collect()))
    b = sorted(map(tuple, cur.stratified_sample(d, {"s1": 1.5}, **kw).collect()))
    assert a == b and len(a) > 0
    plan = (
        cur.stratified_sample(d, {"s1": 1.5}, **kw)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_stratified_sample_salt_changes_sample_not_size_class(spark):
    d = _mix(spark)
    a = {r["doc_id"] for r in cur.stratified_sample(d, {}, default_rate=0.5, salt="a").collect()}
    b = {r["doc_id"] for r in cur.stratified_sample(d, {}, default_rate=0.5, salt="b").collect()}
    assert a != b  # different salt -> different (still deterministic) sample
