"""Round-4 regressions: as-of hot-key slicing, quarantine retention,
IVF materialized index, and the ADVICE fixes."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F


def _asof_fixture(spark, n_hot=1200, n_cold_keys=25, rows_per_cold=8):
    """90%-one-key skew: versions and probes on one hot key (with
    same-timestamp version ties and probes before any version), a tail
    of cold keys, and a null-key pair."""
    rows = []
    # hot key: versions at t=10,20,... with duplicate-timestamp pairs
    for i in range(n_hot):
        t = 10 + (i // 2) * 10  # every timestamp appears twice (tie)
        rows.append(Row(kind="v", k="hot", t=t, val=i))
    probes = []
    for i in range(n_hot // 2):
        # probes hit before-first, exactly-on, and between timestamps
        probes.append(Row(kind="p", k="hot", t=5 + i * 10, val=None))
    for c in range(n_cold_keys):
        for i in range(rows_per_cold):
            rows.append(Row(kind="v", k=f"c{c}", t=i * 7, val=1000 * c + i))
            probes.append(Row(kind="p", k=f"c{c}", t=i * 7 + 3, val=None))
    rows.append(Row(kind="v", k=None, t=1, val=-1))
    probes.append(Row(kind="p", k=None, t=2, val=None))
    df = spark.createDataFrame(rows + probes)
    versions = df.filter(F.col("kind") == "v").drop("kind")
    probe_df = df.filter(F.col("kind") == "p").drop("kind", "val")
    return probe_df, versions


def _collect_asof(probe_df, versions, **kw):
    from aws_serverless_elt_pipeline_enterprise_spark.operators.asof import asof_join

    out = asof_join(probe_df, versions, key="k", on="t", value_cols=["val"], **kw)
    return sorted(
        [(r["k"], r["t"], r["asof_val"]) for r in out.collect()],
        key=lambda x: (x[0] or "", x[1]),
    )


def test_asof_hot_key_slicing_matches_single_window(spark):
    """The sliced hot-key path must be row-identical to the unmitigated
    single-window carry on a 90%-one-key fixture, including ties,
    before-first-version probes, and the null-key group."""
    probe_df, versions = _asof_fixture(spark)
    base = _collect_asof(probe_df, versions, hot_threshold=None)
    sliced = _collect_asof(probe_df, versions, hot_threshold=50, n_slices=8)
    assert sliced == base
    # explicit hot_keys skips the probe, same result
    explicit = _collect_asof(
        probe_df, versions, hot_threshold=50, n_slices=8, hot_keys=["hot"]
    )
    assert explicit == base


def test_asof_sampled_probe_detects_hot_key(spark):
    from aws_serverless_elt_pipeline_enterprise_spark.operators.asof import (
        _find_hot_keys,
    )

    probe_df, versions = _asof_fixture(spark)
    u = versions.select("k").unionByName(probe_df.select("k"))
    # threshold 100 -> sampled probe (fraction 0.5); hot key has ~1800
    # rows so detection is overwhelmingly certain even sampled
    hot = _find_hot_keys(u, "k", 100)
    assert "hot" in hot
    assert all(k == "hot" for k in hot if k is not None)


def test_asof_slicing_handles_more_slices_than_versions(spark):
    """n_slices far above the per-key row count must not break the
    stitch (slices with zero versions get a carry-in or stay NULL)."""
    probe_df, versions = _asof_fixture(spark, n_hot=6)
    base = _collect_asof(probe_df, versions, hot_threshold=None)
    sliced = _collect_asof(
        probe_df, versions, hot_threshold=2, n_slices=64, hot_keys=["hot"]
    )
    assert sliced == base


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_ivf_materialized_matches_oneshot(spark, sf_dir, tmp_path):
    from aws_serverless_elt_pipeline_enterprise_spark.functions import similarity as S

    e = _emb(spark, sf_dir)
    qv = list(e.filter("vec_id = 0").select("embedding").first()[0])
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(e.filter("vec_id <> 0"), idx, n_centroids=8)
    got = S.ivf_index_topk(spark, idx, qv, k=15, nprobe=3).collect()
    want = S.ivf_topk(
        e.filter("vec_id <> 0"), qv, k=15, nprobe=3, n_centroids=8
    ).collect()
    assert [(r.vec_id, r.score) for r in got] == [(r.vec_id, r.score) for r in want]


def test_ivf_index_probe_is_partition_pruned(spark, sf_dir, tmp_path):
    """The probe must read only the probed centroids' partitions: a cid
    partition filter in the plan AND inputFiles() a strict subset."""
    from aws_serverless_elt_pipeline_enterprise_spark.functions import similarity as S
    from aws_serverless_elt_pipeline_enterprise_spark.plans import checks

    e = _emb(spark, sf_dir)
    qv = list(e.filter("vec_id = 0").select("embedding").first()[0])
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(e.filter("vec_id <> 0"), idx, n_centroids=8)
    probe_df = S.ivf_index_topk(spark, idx, qv, k=15, nprobe=2)
    assert any("cid" in f for f in checks.partition_filters(probe_df))
    # inputFiles() ignores plan filters, so measure the files ACTUALLY
    # read via input_file_name() on the executed pruned scan
    members = spark.read.parquet(os.path.join(idx, "members"))
    q, qn2 = S._quantize_query(qv, 16384)
    qn = F.sqrt(F.lit(float(qn2)))
    cents = spark.read.parquet(os.path.join(idx, "centroids"))
    probe = S._probe_centroids(cents, q, qn, 2)
    pruned = members.filter(F.col("cid").isin(probe))
    files_read = pruned.select(F.input_file_name()).distinct().count()
    total = members.select(F.input_file_name()).distinct().count()
    n_cids = cents.count()
    # nprobe=2 of n_cids centroid dirs, one file set per dir
    assert files_read <= (total * 2 + n_cids - 1) // n_cids, (files_read, total)
    assert files_read < total


def test_ivf_index_degenerate_residue_falls_back_to_brute(spark, tmp_path):
    from pyspark.sql import types as T

    from aws_serverless_elt_pipeline_enterprise_spark.functions import similarity as S

    rows = [(i, [float(i % 5 + 1), float(7 - i % 7)]) for i in range(2, 40, 2)]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    idx = str(tmp_path / "ivf")
    # even ids only, mod 1000 -> no id = 1 (mod 1000): degenerate index
    meta = S.build_ivf_index(df, idx, centroid_mod=1000)
    assert meta["degenerate"]
    got = S.ivf_index_topk(spark, idx, [1.0, 2.0], k=5).collect()
    want = S.ivf_topk(df, [1.0, 2.0], k=5, centroid_mod=1000).collect()
    assert [(r.vec_id, r.score) for r in got] == [(r.vec_id, r.score) for r in want]


def test_star_components_chain_converges_logarithmically(spark):
    """A diameter-100 chain: label propagation needs ~100 rounds; the
    alternating star algorithm must converge in O(log D) — measured 8
    rounds at D=100, 11 at D=1000 (each round = large-star +
    small-star)."""
    from aws_serverless_elt_pipeline_enterprise_spark.functions import dedupe as D

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(100)], ["a", "b"]
    )
    labels, rounds, converged = D._star_components(chain, max_iter=12)
    assert converged and rounds <= 9, (rounds, converged)
    got = {r.node: r.label for r in labels.collect()}
    assert got == {i: 0 for i in range(101)}


def test_dup_clusters_star_equals_propagation(spark):
    """Both algorithms must produce identical clusters on a mixed
    fixture: two cliques, one chain, singleton-free by construction."""
    import warnings

    from aws_serverless_elt_pipeline_enterprise_spark.functions import dedupe as D

    pairs = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]  # clique 0-4
        + [(10 + i, 10 + i + 1) for i in range(30)]  # chain 10..40
        + [(100, 101), (101, 102), (100, 102)]  # triangle
        + [(7, 7)]  # self-loop noise
    )
    df = spark.createDataFrame(pairs, ["a", "b"])
    star = {
        (r.doc_id, r.cluster)
        for r in D.dup_clusters(df, algorithm="star").collect()
    }
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # propagation must converge silently
        prop = {
            (r.doc_id, r.cluster)
            for r in D.dup_clusters(df, max_iter=40, algorithm="propagation").collect()
        }
    assert star == prop


def test_dup_clusters_star_warns_on_truncation(spark):
    import warnings

    from aws_serverless_elt_pipeline_enterprise_spark.functions import dedupe as D

    chain = spark.createDataFrame([(i, i + 1) for i in range(200)], ["a", "b"])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        D.dup_clusters(chain, max_iter=1, algorithm="star").collect()
    assert any("did not converge" in str(x.message) for x in w)


def test_dup_clusters_auto_falls_back_to_star_on_deep_chain(spark):
    """auto = propagation (5-round budget) with star fallback: a
    diameter-200 chain must still produce exact components (via star),
    with no truncation warning."""
    import warnings

    from aws_serverless_elt_pipeline_enterprise_spark.functions import dedupe as D

    chain = spark.createDataFrame([(i, i + 1) for i in range(200)], ["a", "b"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        got = {r.doc_id: r.cluster for r in D.dup_clusters(chain).collect()}
    assert got == {i: 0 for i in range(201)}
