"""Document deduplication family for training-data pipelines.

Exact (hash-groupBy), n-gram Jaccard (shingle join), MinHash+LSH
(shingle -> minhash -> band -> bucket join), SimHash, and embedding-cosine
near-dup. Everything is DataFrame-native; hashes are arithmetic (explicit
(a*x+b) mod p families over xxhash64 shingle ids) so results are
deterministic across runs and cluster sizes.

Scale notes (100 TB):
  * exact dedup: one hash-shuffle on the fingerprint; map-side partial agg.
  * shingle join: posting lists for frequent shingles explode — cap with
    a document-frequency filter (drop shingles appearing in > df_cap docs:
    they carry no discriminative signal, the standard trick).
  * MinHash/LSH: the scale path — candidate pairs only within equal
    (band_id, band_hash) buckets; k and bands tune recall/precision.
  * all pair outputs are canonicalized a < b so downstream union-find /
    keep-min-id is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from aws_serverless_elt_pipeline_enterprise_spark.functions.parallel import (
    shuffle_parallelism,
    spread_small_input,
)
from aws_serverless_elt_pipeline_enterprise_spark.functions.text import (
    content_fingerprint,
    words,
)

MERSENNE_P = (1 << 61) - 1


def portable_hash60(col: F.Column | str) -> F.Column:
    """Engine-portable 60-bit string hash: the first 15 hex digits of md5,
    parsed as an integer. Bit-identical in Spark
    (conv(substr(md5(s),1,15),16,10)) and DuckDB
    (CAST(concat('0x', substr(md5(s),1,15)) AS BIGINT)) — used by the
    'portable' hash mode so MinHash/SimHash chains are oracle-checkable.
    xxhash64 stays the default (faster, but DuckDB can't reproduce it)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def _hash64(col: F.Column, hash_mode: str) -> F.Column:
    if hash_mode == "portable":
        return portable_hash60(col)
    return F.xxhash64(col)


def exact_dup_groups(df: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by content hash: (keeper, n_copies) for
    groups with >1 member. One shuffle on the md5 fingerprint. NULL-text
    docs are excluded up front: md5(NULL) is NULL and groupBy treats
    NULLs as equal, so two unrelated extraction-failed docs would
    otherwise report as duplicates of each other (and keep-min-id would
    silently drop one)."""
    return (
        df.filter(F.col(text).isNotNull())
        .groupBy(content_fingerprint(text).alias("fp"))
        .agg(F.min(key).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keeper", "n_copies")
    )


def word_shingles(text_col: str = "text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles (array<string>), JVM-side.

    Docs with fewer than n words yield an empty array. The guard matters:
    sequence(1, 0) in Spark is the DESCENDING [1, 0] (default step -1),
    which would feed slice(w, 0, n) and throw INVALID_PARAMETER_VALUE.

    The words array is BOUND as a lambda variable (the transform-over-
    singleton idiom): an outer expression captured inside a HOF lambda is
    re-evaluated per element, so referencing split() directly in the
    slice would re-split the document once per shingle."""
    def shingles_of(w: F.Column) -> F.Column:
        idx = F.when(
            F.size(w) >= n, F.sequence(F.lit(1), F.size(w) - (n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(w, i, n)))
        )

    return F.transform(F.array(words(text_col)), shingles_of)[0]


def shingle_explode(df: DataFrame, key: str = "doc_id", text: str = "text", n: int = 3) -> DataFrame:
    return df.select(
        F.col(key), F.explode(word_shingles(text, n)).alias("shingle")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
    hash_shingles: str | None = None,
) -> DataFrame:
    """Near-duplicate pairs by word-n-gram Jaccard similarity >= threshold.

    Plan: ONE shuffle groups the inverted index (shingle -> posting list);
    candidate pairs are expanded MAP-SIDE from each posting list (a JVM
    nested transform over the sorted list — no self-join, so the
    (key,shingle) rows are never shuffled twice), then one groupBy(a,b)
    counts overlaps and Jaccard follows from |A|,|B|,|A∩B|. ``df_cap`` is
    the scale guard AND the memory bound: shingles whose document
    frequency exceeds the cap are dropped from the shingle UNIVERSE
    (sizes and overlaps both), so every posting list held in a group is
    <= df_cap entries and the per-shingle pair fan-out is <= C(df_cap,2)
    — a stop-phrase shingle shared by 10^6 docs would otherwise emit a
    10^12-row expansion. Capped semantics are exact and oracle-checkable:
    Jaccard over the discriminative (rare) shingle sets.

    ``hash_shingles`` ('xxhash64' | 'portable' | None): replace each
    shingle STRING with its 64-bit hash BEFORE the inverted-index
    shuffle — the exchanged key shrinks from ~n-word strings to 8
    bytes, which is most of the shuffle volume at scale. Semantics are
    identical up to hash collisions (negligible at 2^-60..2^-64 per
    pair); 'portable' uses the md5-derived family, so an external SQL
    oracle replays the hashed chain exactly, collisions included."""
    sh = shingle_explode(
        spread_small_input(df, key, min_bytes=1 << 20), key, text, n
    )
    if hash_shingles:
        sh = sh.select(
            F.col(key), _hash64(F.col("shingle"), hash_shingles).alias("shingle")
        )
    return _pairs_from_shingle_rows(sh, key, threshold, df_cap)


def _pairs_from_shingle_rows(
    sh: DataFrame, key: str, threshold: float, df_cap: int | None
) -> DataFrame:
    """Jaccard pair generation from exploded (key, shingle) rows — split
    out so ``dedup_pipeline`` can feed one shared shingle pass instead of
    re-tokenizing the corpus per consumer."""
    if df_cap is not None:
        # posting-list formulation: the inverted index groups on the
        # shingle; pair expansion is map-side and bounded by C(df_cap, 2)
        # structs per group. The document-frequency cap is applied BEFORE
        # collect_list via a count + semi-join, so a mega-posting (a
        # stop-phrase shingle in 10^6 docs) never materializes in one
        # task's aggregation buffer — a post-hoc size filter would bound
        # the OUTPUT but not the buffer. Both the count agg and the
        # collect_list agg hash-partition on the shingle, so the second
        # groupBy reuses the first exchange (ReusedExchange / AQE). The
        # sizes branch recomputes the posting groupBy rather than
        # persisting `posts` — measured 3x FASTER at sf0.1 (caching
        # object-array posting lists costs more in serialization than
        # scan+explode+one shuffle).
        rare = (
            sh.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= df_cap)
            .select("shingle")
        )
        posts = (
            sh.join(rare, "shingle", "leftsemi")
            .groupBy("shingle")
            .agg(F.collect_list(key).alias("docs"))
        )
        sizes = (
            posts.select(F.explode("docs").alias(key))
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("n_sh"))
        )
        # pair expansion stays MAP-SIDE (no extra exchange) but runs as
        # two chained posexplode GENERATORS + a position filter instead
        # of the nested transform/flatten lambda: generators re-walk the
        # same backing array with codegen, where the transform built
        # C(m,2) structs (and per-element array slices) interpreted —
        # measured 2.3x on the 71M-pair sf1 expansion
        # (OPTIMIZATION_r06.md). Emission order per posting is identical
        # (sorted docs, j > i => a < b).
        overlap = (
            posts.filter(F.size("docs") >= 2)
            .select(F.array_sort("docs").alias("_d"))
            # explicit USER partition count: the posting shuffle is tiny
            # in bytes, so AQE would coalesce it to a handful of tasks —
            # which then each generate millions of pairs (the fan-out is
            # invisible to byte-based coalescing). A user-specified
            # repartition pins the expansion's parallelism.
            .repartition(shuffle_parallelism(posts))
            .select("_d", F.posexplode("_d").alias("_i", "a"))
            .select("a", "_i", F.posexplode("_d").alias("_j", "b"))
            .filter(F.col("_j") > F.col("_i"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    else:
        # UNCAPPED: a mega-posting (stop-phrase shingle in 10^5 docs)
        # must not be collected into ONE aggregation row — the
        # distributed self-join spreads the same C(n,2) fan-out across
        # the shuffle instead of one task's memory.
        sizes = sh.groupBy(key).agg(F.count(F.lit(1)).alias("n_sh"))
        a_side = sh.select(F.col(key).alias("a"), "shingle")
        b_side = sh.select(F.col(key).alias("b"), "shingle")
        overlap = (
            a_side.join(b_side, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    sa = sizes.select(F.col(key).alias("a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col(key).alias("b"), F.col("n_sh").alias("nb"))
    return (
        overlap.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("na") + F.col("nb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


_MH_PRIME = (1 << 31) - 1  # Mersenne prime 2^31-1


def _minhash_sig(
    shingles: F.Column, k: int, seed: int = 42, hash_mode: str = "xxhash64"
) -> F.Column:
    """k-permutation MinHash signature (array<bigint>), all JVM-side:
    shingle id x = hash64(shingle) mod p; h_i(x) = (a_i*x + b_i) mod p.
    a_i < 2^20 and x < 2^31 keep a*x + b < 2^52 — no signed-long overflow
    in the JVM expression (overflow would silently wrap and break
    determinism claims). hash_mode='portable' uses the md5-derived 60-bit
    hash so DuckDB can replay the identical chain (oracle checking)."""
    # Spark cannot common-subexpression-eliminate across lambda scopes, so
    # k separate `array_min(transform(...))` expressions would recompute the
    # shingle array and its hashes k times. Instead: ONE fold over the
    # shingle-hash array, keeping a running elementwise minimum of all k
    # permutation hashes (zip_with + least). Everything evaluates once.
    a_list, b_list = _perm_consts(k, seed)
    a_consts = F.array(*[F.lit(a) for a in a_list])
    b_consts = F.array(*[F.lit(b) for b in b_list])
    xs = F.transform(
        shingles, lambda s: F.pmod(_hash64(s, hash_mode), F.lit(_MH_PRIME))
    )
    return F.aggregate(
        xs,
        F.array_repeat(F.lit(_MH_PRIME).cast("long"), k),
        lambda acc, x: F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(k)),
            lambda m, i: F.least(
                m,
                F.pmod(
                    x * F.element_at(a_consts, i) + F.element_at(b_consts, i),
                    F.lit(_MH_PRIME),
                ),
            ),
        ),
    )


def _perm_consts(k: int, seed: int) -> tuple[list[int], list[int]]:
    a = [((seed * 1_000_003 + i * 2_654_435_761 + 1) % (1 << 20)) | 1 for i in range(k)]
    b = [(seed * 97 + i * 1_234_567_891) % _MH_PRIME for i in range(k)]
    return a, b


def minhash_signatures(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    k: int = 32,
    n: int = 3,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Per-doc MinHash signature (pure JVM single-fold). Docs with no
    shingles (< n words) are dropped: their signature would be the
    degenerate all-p init vector, which band-matches every other empty
    doc.

    A numpy/Arrow signature evaluator was tried and REMOVED: it computed
    identical signatures ~15% faster, but a PythonUDF whose output fans
    into downstream JVM expressions intermittently hit
    [INTERNAL_ERROR] Cannot evaluate expression (session-order-dependent
    planner behavior on Spark 4.1) — a flaky correctness gate is worth
    more than 15% on one stage."""
    shingled = spread_small_input(df, key, min_bytes=1 << 20).select(
        F.col(key), word_shingles(text, n).alias("_sh")
    )
    return _sigs_from_shingled(shingled, key, "_sh", k, seed, hash_mode)


def _sigs_from_shingled(
    shingled: DataFrame, key: str, shcol: str, k: int, seed: int, hash_mode: str
) -> DataFrame:
    """Signatures from a frame that already carries the shingle array —
    the ``dedup_pipeline`` entry point (shared tokenization).

    Computed as explode + k codegen ``min`` aggregates rather than the
    single-fold array walk (``_minhash_sig``): higher-order functions
    evaluate INTERPRETED per element, so the fold pays ~k boxed lambda
    evaluations per shingle, while ``min(pmod(x*a_i+b_i, p))`` is
    whole-stage-codegen over primitive longs. Same values exactly — both
    compute min over the identical (a_i*x+b_i) mod p family, and docs
    with zero shingles drop on both paths (explode emits nothing; the
    fold path filtered size > 0). Measured 5.8x on the sf1 corpus
    (OPTIMIZATION_r06.md)."""
    rows = shingled.select(F.col(key), F.explode(shcol).alias("_s"))
    a_list, b_list = _perm_consts(k, seed)
    x = F.pmod(_hash64(F.col("_s"), hash_mode), F.lit(_MH_PRIME))
    rows = rows.select(F.col(key), x.alias("_x"))
    aggs = [
        F.min(
            F.pmod(
                F.col("_x") * F.lit(a_list[i]) + F.lit(b_list[i]),
                F.lit(_MH_PRIME),
            )
        ).alias(f"_m{i}")
        for i in range(k)
    ]
    return (
        rows.groupBy(key)
        .agg(*aggs)
        .select(
            F.col(key), F.array(*[F.col(f"_m{i}") for i in range(k)]).alias("sig")
        )
    )


def _banded(sigs: DataFrame, key: str, k: int, bands: int, hash_mode: str) -> DataFrame:
    """Explode a signature DF into (key, band_id, band_hash) bucket rows.
    band_hash is xxhash64 of the band slice (fast path) or the literal
    comma-joined slice string (portable mode: injective, DuckDB-replayable
    — a 64-bit hash could, with negligible but nonzero probability, add a
    spurious candidate the oracle lacks)."""
    if k % bands:
        raise ValueError(
            f"k={k} not divisible by bands={bands}: the tail "
            f"{k % bands} signature positions would silently drop from "
            f"every band, shifting the LSH recall/precision curve"
        )
    rows_per_band = k // bands

    def band_key(b: int) -> F.Column:
        sl = F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band)
        if hash_mode == "portable":
            return F.array_join(F.transform(sl, lambda x: x.cast("string")), ",")
        return F.xxhash64(sl)

    return sigs.select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"), band_key(b).alias("band_hash")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select(key, "band.band_id", "band.band_hash")


def minhash_lsh_candidates(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """LSH candidate pairs: split the k-minhash signature into ``bands``
    rows-per-band groups, hash each band, and self-join docs sharing any
    (band_id, band_hash) bucket. The join key is the bucket — no full
    pairwise compare ever happens (the 100 TB path)."""
    sigs = minhash_signatures(df, key, text, k, n, seed, hash_mode)
    return _banded_candidates(_banded(sigs, key, k, bands, hash_mode), key)


def _banded_candidates(banded: DataFrame, key: str) -> DataFrame:
    """Bucket self-join over (band_id, band_hash): the candidate pairs.
    Shared by minhash_lsh_candidates and minhash_lsh_pairs so a fix to
    candidate generation lands once."""
    a = banded.select(F.col(key).alias("a"), "band_id", "band_hash")
    b = banded.select(F.col(key).alias("b"), "band_id", "band_hash")
    return (
        a.join(b, ["band_id", "band_hash"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _estimate_from_sigs(pairs: DataFrame, sigs: DataFrame, key: str, k: int) -> DataFrame:
    sa = sigs.select(F.col(key).alias("a"), F.col("sig").alias("sig_a"))
    sb = sigs.select(F.col(key).alias("b"), F.col("sig").alias("sig_b"))
    return (
        pairs.join(sa, "a")
        .join(sb, "b")
        .withColumn(
            "jaccard_est",
            F.size(
                F.filter(
                    F.zip_with(
                        "sig_a", "sig_b", lambda x, y: (x == y).cast("int")
                    ),
                    lambda v: v == 1,
                )
            ).cast("double")
            / k,
        )
        .select("a", "b", "jaccard_est")
    )


def minhash_jaccard_estimate(
    df: DataFrame, pairs: DataFrame, key: str = "doc_id", text: str = "text",
    k: int = 32, n: int = 3, seed: int = 42, hash_mode: str = "xxhash64",
) -> DataFrame:
    """Estimated Jaccard for candidate pairs = fraction of matching
    signature positions (verify stage after LSH)."""
    sigs = minhash_signatures(df, key, text, k, n, seed, hash_mode)
    return _estimate_from_sigs(pairs, sigs, key, k)


def minhash_lsh_pairs(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """Full MinHash+LSH near-dup chain: signatures -> banded candidates ->
    per-pair Jaccard estimate, computing (and persisting) the signature DF
    ONCE — the candidates stage and both sides of the estimate join reuse
    it instead of re-shingling the corpus (the two heaviest stages in the
    round-1 bench were exactly this recomputation). The persist lives
    until the session drops it: a long-lived service calling this per
    epoch should `spark.catalog.clearCache()` between rounds (bench.py
    does) — unpersisting here would invalidate the returned lazy DF."""
    sigs = minhash_signatures(df, key, text, k, n, seed, hash_mode).persist()
    cand = _banded_candidates(_banded(sigs, key, k, bands, hash_mode), key)
    return _estimate_from_sigs(cand, sigs, key, k)


def _edge_sig(edges: DataFrame) -> tuple:
    """Cheap deterministic edge-set signature for convergence checks:
    (count, decimal sum of pair hashes) — decimal, because an ANSI-mode
    bigint sum of ~2^63-scale hashes overflows."""
    r = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")).alias("h"),
    ).first()
    return (r["n"], r["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star (Kiveris et al., 'Connected Components in MapReduce
    and Beyond'): every node connects its LARGER neighbors to the
    minimum of its neighborhood (incl. itself). One groupBy + one join,
    all partial-aggregable."""
    sym = edges.union(edges.select(F.col("b").alias("a"), F.col("a").alias("b")))
    mn = (
        sym.groupBy("a")
        .agg(F.min("b").alias("_mnb"))
        .select("a", F.least("_mnb", F.col("a")).alias("m"))
    )
    return (
        sym.join(mn, "a")
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star: orient each edge large->small; every node connects
    its smaller neighbors (and itself) to their minimum."""
    d = edges.select(
        F.greatest("a", "b").alias("u"), F.least("a", "b").alias("v")
    ).filter(F.col("u") != F.col("v"))
    mn = d.groupBy("u").agg(F.min("v").alias("m"))
    joined = d.join(mn, "u")
    out = joined.select(F.col("v").alias("a"), F.col("m").alias("b")).union(
        mn.select(F.col("u").alias("a"), F.col("m").alias("b"))
    )
    return out.filter(F.col("a") != F.col("b")).distinct()


def _star_components(pairs: DataFrame, max_iter: int) -> tuple[DataFrame, int, bool]:
    """Alternating large-star/small-star connected components. Converges
    in O(log^2 n) rounds on ANY graph shape — a diameter-D chain needs
    ~log D rounds where min-label propagation needs D. Returns
    (labels, rounds_used, converged); labels cover every node of
    ``pairs`` with the component-min as the label."""
    # pairs evaluated ONCE: checkpoint the raw pair set first, then
    # derive nodes and edges from the checkpointed blocks — nodes and
    # edges each checkpointing straight off ``pairs`` re-ran the whole
    # upstream pair-generation plan twice (measured: the full n-gram
    # chain, seconds per extra pass at sf1)
    raw = pairs.select("a", "b").localCheckpoint(eager=True)
    nodes = (
        raw.select(F.col("a").alias("node"))
        .union(raw.select(F.col("b").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    edges = (
        raw.filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    sig, rounds, converged = _edge_sig(edges), 0, False
    for rounds in range(1, max_iter + 1):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        new_sig = _edge_sig(edges)
        if new_sig == sig:
            converged = True
            break
        sig = new_sig
    if not converged:
        # the budget may have ended ON the converging round (its edge
        # set changed from the previous one but is already the
        # fixpoint). One verify-only probe — same pattern as the
        # propagation branch — keeps the truncation warning free of
        # false positives for diameter-shaped == max_iter inputs.
        converged = _edge_sig(_small_star(_large_star(edges))) == sig
    # at the fixpoint every edge is (node -> component min); nodes with
    # no edge (roots, singletons) label themselves
    roots = edges.groupBy("a").agg(F.min("b").alias("label"))
    labels = (
        nodes.join(roots, nodes["node"] == roots["a"], "left")
        .select("node", F.coalesce("label", "node").alias("label"))
    )
    return labels, rounds, converged


def _propagate(pairs: DataFrame, max_iter: int) -> tuple[DataFrame, bool]:
    """Min-label propagation rounds; returns (labels, converged) where
    converged means some round reported zero label changes."""
    # checkpoint the raw pairs BEFORE mirroring: union's two branches
    # would otherwise each re-run the whole upstream pair-generation
    # plan (one full n-gram chain per branch at sf1)
    edges = pairs.select("a", "b").localCheckpoint(eager=True)
    sym = edges.union(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        prop = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        new = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            return labels, True
    return labels, False


def dup_clusters(
    pairs: DataFrame, max_iter: int = 20, algorithm: str = "auto"
) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster), with
    cluster = min doc id in the component (the canonical keeper).

    ``algorithm="auto"`` (default): min-label propagation for up to 5
    rounds — one join + partial-agg groupBy per round, which converges
    fastest on the clique-shaped components real near-dup clusters form
    (measured at sf0.1: propagation ~2 rounds, star 1.4x slower) — then,
    if still unconverged (deep chain-shaped components), falls back to
    alternating large-star/small-star for the full budget. Worst case
    pays 5 cheap rounds + O(log^2 n) star rounds; shallow graphs pay
    exactly the propagation cost.

    ``algorithm="star"``: alternating large-star/small-star (Kiveris et
    al.) — O(log^2 n) rounds on ANY component shape (measured: 8 rounds
    at diameter 100, 11 at 1000, where propagation needs D rounds); the
    10^10-edge scale path.

    ``algorithm="propagation"``: pure min-label propagation, O(diameter)
    rounds. All modes localCheckpoint per round (iterative joins
    otherwise grow the logical plan until the plan STRING alone OOMs
    the driver) and warn (never silently truncate) when the budget is
    exhausted before convergence."""
    if algorithm == "auto":
        labels, converged = _propagate(pairs, min(5, max_iter))
        if converged:
            return labels.select(
                F.col("node").alias("doc_id"), F.col("label").alias("cluster")
            )
        algorithm = "star"
    if algorithm == "star":
        labels, _, converged = _star_components(pairs, max_iter)
        if not converged:
            import warnings

            warnings.warn(
                f"dup_clusters: star rounds did not converge within "
                f"{max_iter} rounds; labels are a refinement, not the "
                f"transitive closure",
                RuntimeWarning,
                stacklevel=2,
            )
        return labels.select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster")
        )
    labels, converged = _propagate(pairs, max_iter)
    if not converged:
        edges = pairs.select("a", "b")
        sym = edges.union(
            edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        # the loop exhausted with its LAST round still changing labels —
        # but that round may itself have been the converging one. One
        # verify-only probe (join + limit(1) count, no label update)
        # distinguishes "converged exactly on round max_iter" from
        # "truncated", so ops alerting on this warning gets no false
        # positive for diameter == max_iter components.
        prop = sym.join(
            labels.withColumnRenamed("node", "b"), "b"
        ).select(F.col("a").alias("node"), "label")
        still_changing = (
            labels.union(prop)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        if still_changing:
            # diameter > max_iter: labels diverge from the transitive
            # closure and must not be consumed silently
            import warnings

            warnings.warn(
                f"dup_clusters: label propagation did not converge within "
                f"{max_iter} rounds (component diameter exceeds max_iter); "
                f"labels are a refinement, not the transitive closure",
                RuntimeWarning,
                stacklevel=2,
            )
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster"))


def simhash64(text_col: str = "text", hash_mode: str = "xxhash64") -> F.Column:
    """63-bit SimHash over word hashes, fully JVM-side (bit 63 unused to
    stay positive in a signed long): for each bit position, sum +/-1
    weighted by whether xxhash64(word) has that bit; bit set iff the sum
    is positive. Near-dups have small Hamming distance.

    Single-fold formulation: Spark cannot CSE across lambda scopes, so 63
    separate aggregates would re-hash every word 63 times. Instead ONE
    fold keeps a 63-wide counter array updated with zip_with."""
    return simhash_from_words(F.array_distinct(words(text_col)), hash_mode)


def simhash_from_words(wcol: F.Column, hash_mode: str = "xxhash64") -> F.Column:
    """simhash64 over an ALREADY-distinct words array (the
    ``dedup_pipeline`` entry point — tokenization shared upstream)."""
    masks = F.array(*[F.lit(1 << i).cast("long") for i in range(63)])
    wh = F.transform(wcol, lambda t: _hash64(t, hash_mode))
    counters = F.aggregate(
        wh,
        F.array_repeat(F.lit(0), 63),
        lambda acc, h: F.zip_with(
            acc,
            masks,
            lambda c, m: c + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counters,
            masks,
            lambda c, m: F.when(c > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def _simhash_sigs_from_word_rows(rows: DataFrame, key: str, hcol: str) -> DataFrame:
    """(key, word_hash) rows -> (key, sh) simhash signatures via ONE
    codegen hash aggregate: S_i = count of words whose hash has bit i
    set; the fold formulation's counter is c_i = 2*S_i - n, so bit i of
    the signature is set iff 2*S_i > n. 63 conditional sums + one count
    are whole-stage-codegen over primitive longs, where the single-fold
    zip_with walk (``simhash_from_words``) evaluates interpreted per
    element — measured ~8x on the sf1 corpus (OPTIMIZATION_r06.md). The
    bit composition sums 63 DISJOINT powers of two, i.e. a bitwise OR."""
    h = F.col(hcol)
    aggs = [
        F.sum(
            F.when(h.bitwiseAND(F.lit(1 << i).cast("long")) != 0, 1).otherwise(0)
        ).alias(f"_s{i}")
        for i in range(63)
    ]
    counted = rows.groupBy(key).agg(F.count(F.lit(1)).alias("_n"), *aggs)
    sim = F.lit(0).cast("long")
    for i in range(63):
        sim = sim + F.when(
            F.col(f"_s{i}") * 2 > F.col("_n"), F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return counted.select(F.col(key), sim.alias("sh"))


def simhash_near_dup_pairs(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    max_hamming: int = 3,
    hash_mode: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs via 4-block bucketing (pigeonhole: hamming<=3
    over 4 blocks guarantees one exact block match), then verify the
    Hamming distance on candidates only. Signatures come from the codegen
    aggregate formulation (``_simhash_sigs_from_word_rows``) and the
    signature DF is persisted before the self-join: both join sides (and
    the 4 block branches after projection collapse) would otherwise each
    recompute the signature pass.

    Zero-word docs (empty/whitespace-only/NULL text) are dropped before
    signing (explode of an empty/NULL words array emits nothing),
    mirroring minhash_signatures: their signature degenerates to 0, so N
    such docs would share every block hash and the bucket self-join
    would emit a C(N,2) clique of meaningless "near-dups" — the exact
    explosion the blocking exists to prevent (and a divergence from the
    word-level oracle, which produces no rows for them)."""
    wrows = spread_small_input(df, key, min_bytes=1 << 20).select(
        F.col(key), F.explode(F.array_distinct(words(text))).alias("_w")
    ).select(F.col(key), _hash64(F.col("_w"), hash_mode).alias("_h"))
    sh = _simhash_sigs_from_word_rows(wrows, key, "_h").persist()
    return _simhash_pairs_from_sigs(sh, key, max_hamming)


def _simhash_pairs_from_sigs(
    sh: DataFrame, key: str, max_hamming: int
) -> DataFrame:
    """Block-bucket candidate join + Hamming verify over a (key, sh)
    signature frame (caller persists it — both join sides and the 4
    block branches reuse it).

    Dedup WITHOUT a distinct: a pair matching in m blocks would appear m
    times, and the old ``.distinct()`` on (a, b, sha, shb) shuffled the
    ENTIRE candidate expansion (~237M rows at sf1 — dup-heavy corpora
    make block buckets quadratic) a second time. Instead each pair is
    kept only in its FIRST matching block — for block i, require every
    earlier block to differ — a codegen filter on columns the joined row
    already carries. Exactly one copy of each candidate survives, so the
    output set is identical and the candidate expansion goes straight
    from the join into the Hamming filter with zero extra exchanges."""
    blocks = sh.select(
        key,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("blk"),
                        F.shiftright("sh", i * 16).bitwiseAND(F.lit(0xFFFF)).alias("bh"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("b"),
    ).select(key, "sh", "b.blk", "b.bh")
    a = blocks.select(F.col(key).alias("a"), F.col("sh").alias("sha"), "blk", "bh")
    b = blocks.select(F.col(key).alias("b"), F.col("sh").alias("shb"), "blk", "bh")

    def _blk(col: str, i: int) -> F.Column:
        return F.shiftright(col, i * 16).bitwiseAND(F.lit(0xFFFF))

    first_match = F.lit(True)
    for i in range(1, 4):
        earlier_all_differ = F.lit(True)
        for j in range(i):
            earlier_all_differ = earlier_all_differ & (
                _blk("sha", j) != _blk("shb", j)
            )
        first_match = F.when(F.col("blk") == i, earlier_all_differ).otherwise(
            first_match
        )
    return (
        a.join(b, ["blk", "bh"])
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("sha").bitwiseXOR(F.col("shb"))).cast("int"),
        )
        .filter((F.col("hamming") <= max_hamming) & first_match)
        .select("a", "b", "hamming")
    )


def dedup_pipeline(
    df: DataFrame,
    key: str = "doc_id",
    text: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    df_cap: int | None = None,
    k: int = 32,
    bands: int = 8,
    seed: int = 42,
    hash_mode: str = "xxhash64",
    max_hamming: int = 3,
    cluster_algorithm: str = "auto",
    hash_shingles: str | None = None,
) -> dict[str, DataFrame]:
    """The whole near-dup family over ONE tokenization pass. Standalone,
    each member re-reads and re-tokenizes the corpus (words + shingles
    are the shared prefix of every signature), and ``dup_clusters``
    consumers re-run the full Jaccard pair chain; here the corpus is
    scanned once into a persisted (key, words, shingles, fingerprint)
    frame and the pair set feeding the clusters is the SAME frame the
    jaccard output returns. At 100 TB the savings is a full corpus scan
    + tokenize per member — 4 scans collapse to 1.

    Returns lazily-evaluated frames keyed: ``exact`` (keeper, n_copies),
    ``ngram_pairs`` (a, b, jaccard), ``clusters`` (doc_id, cluster),
    ``minhash_pairs`` (a, b, jaccard_est), ``simhash_pairs`` (a, b,
    hamming). Each is bit-identical to its standalone function at the
    same parameters (tested). The persisted intermediates live until the
    session drops them — call ``spark.catalog.clearCache()`` when done."""
    base = (
        spread_small_input(df, key, min_bytes=1 << 20)
        .filter(F.col(text).isNotNull())
        .select(
            F.col(key),
            F.array_distinct(words(text)).alias("_w"),
            word_shingles(text, n).alias("_sh"),
            content_fingerprint(text).alias("_fp"),
        )
        .persist()
    )
    exact = (
        base.groupBy("_fp")
        .agg(F.min(key).alias("keeper"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .select("keeper", "n_copies")
    )
    sh_rows = base.select(F.col(key), F.explode("_sh").alias("shingle"))
    if hash_shingles:
        # see ngram_jaccard_pairs: 8-byte shuffle keys instead of strings
        sh_rows = sh_rows.select(
            F.col(key), _hash64(F.col("shingle"), hash_shingles).alias("shingle")
        )
    ngram_pairs = _pairs_from_shingle_rows(sh_rows, key, threshold, df_cap).persist()
    clusters = dup_clusters(ngram_pairs, algorithm=cluster_algorithm)
    sigs = _sigs_from_shingled(
        base.select(key, "_sh"), key, "_sh", k, seed, hash_mode
    ).persist()
    minhash_pairs = _estimate_from_sigs(
        _banded_candidates(_banded(sigs, key, k, bands, hash_mode), key), sigs, key, k
    )
    sim_sigs = _simhash_sigs_from_word_rows(
        base.select(F.col(key), F.explode("_w").alias("_we")).select(
            F.col(key), _hash64(F.col("_we"), hash_mode).alias("_h")
        ),
        key,
        "_h",
    ).persist()
    simhash_pairs = _simhash_pairs_from_sigs(sim_sigs, key, max_hamming)
    return {
        "exact": exact,
        "ngram_pairs": ngram_pairs,
        "clusters": clusters,
        "minhash_pairs": minhash_pairs,
        "simhash_pairs": simhash_pairs,
    }
