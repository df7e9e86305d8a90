"""Snapshot table: an Iceberg-semantics parquet sink for the CDC engine.

The sandbox has no Iceberg runtime jar, so the MERGE target is implemented
as a *bucketed copy-on-write snapshot table* with the same externally
visible semantics Iceberg would give us:

  * atomic commits          — a version manifest (JSON) names the exact
                              files of the snapshot; the manifest file
                              itself is CLAIMED exclusively (hard-link
                              create, fails if the version exists — the
                              local-FS analogue of an object store's
                              conditional PUT / Iceberg's catalog CAS),
                              then a LATEST pointer is swapped via atomic
                              rename. Readers never see a partial commit.
  * optimistic concurrency  — two writers racing for the same version:
                              exactly one wins the claim; the loser gets
                              ``CommitConflictError`` and the merge paths
                              rebase-and-retry (MOR deltas always rebase;
                              COW rebases only when the intervening
                              commits did not touch its read set,
                              otherwise the conflict propagates and the
                              caller re-runs the merge against fresh
                              state — Iceberg's validation semantics).
                              Compactions rebase over concurrent MOR
                              appends too (the live-stream + scheduled-
                              rewrite deployment); bucket-map conflicts
                              raise and the maintenance op is re-run.
  * epoch-idempotent commit — each manifest carries the cumulative set of
                              committed epoch IDs; re-merging an already
                              committed epoch is a no-op. This translates
                              the reference's DynamoDB conditional-put
                              idempotency lock (lambdas/ingest/app.py:84-126,
                              pk = s3://bucket/key#etag) into the sink.
  * time travel             — every version's manifest is retained;
                              ``read(version=v)`` reads any old snapshot
                              (Iceberg ``VERSION AS OF``).
  * schema evolution        — additive nullable columns and integer
                              widening; the manifest schema is the widest
                              seen so far and old files are up-cast on read.
  * partition-scoped writes — rows are hash-bucketed on the merge key; a
                              merge rewrites ONLY the buckets its batch
                              touches and carries all other buckets forward
                              by file reference. At 10^10 rows / 1000
                              executors this is what keeps a small CDC batch
                              from rewriting 100 TB: cost is O(affected
                              buckets), not O(table).

Layout on disk::

    root/
      commits/c_<ver>_<tag>/_bucket=<k>/part-*.parquet
      manifests/v<ver>.json
      LATEST                      <- file containing "v<ver>" (commit point)

The table stores one internal column ``_seq`` — the sequence number of the
last applied change per key — which makes merge-apply order-independent
and replay-idempotent: applying any subset of already-applied events can
never move a row backwards (last-writer-wins on ``(_seq, side)``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

class CommitConflictError(Exception):
    """Another writer claimed this manifest version first.

    Raised by ``_commit_manifest`` when the exclusive version-file claim
    fails. MOR appends catch it and rebase automatically (a global delta
    is position-independent); COW merges rebase only when the conflicting
    commits did not change their read set, otherwise the error propagates
    with the epoch UNCOMMITTED — the data dir is an unreferenced orphan
    (vacuumable by ``expire_orphans``) and re-running the merge against
    fresh state is safe and converges.
    """


class EpochLedger:
    """Compact EXACT set of committed epoch IDs.

    IDs shaped '<prefix>-<int>' (or a bare int, no leading zeros) are kept
    per-prefix as a contiguous high-water-mark plus a sparse set of
    not-yet-contiguous extras; anything else lives in an exact side set.
    For the monotone common case (stream-0, stream-1, ... / batch replay
    indices) the manifest representation is O(1) in epoch count — at 10^6
    epochs the old cumulative list made EVERY manifest carry the full
    history, an O(n^2) total-bytes write path. Membership stays exact, so
    the exactly-once guarantee is unchanged.
    """

    def __init__(self, data: list | dict | None = None):
        self.watermarks: dict[str, int] = {}
        self.extras: dict[str, set[int]] = {}
        self.other: set[str] = set()
        if isinstance(data, list):  # legacy manifest format: plain list
            for e in data:
                self.add(e)
        elif isinstance(data, dict):
            self.watermarks = {
                k: int(v) for k, v in data.get("watermarks", {}).items()
            }
            self.extras = {
                k: set(int(x) for x in v)
                for k, v in data.get("extras", {}).items()
                if v
            }
            self.other = set(data.get("other", []))

    @staticmethod
    def _parse(eid: str) -> tuple[str, int] | None:
        # Alias-safety is the invariant: two DIFFERENT epoch ids must
        # never map to the same (key, n) — a membership false positive
        # is a silently skipped epoch. Canonical suffixes key by the
        # prefix; ZERO-PADDED suffixes (batch_00042 — the replay
        # driver's real naming, which previously fell to the O(n)
        # 'other' set and reinstated the quadratic manifest growth this
        # class exists to prevent) key by (prefix, pad width), encoded
        # with a \x00 separator no real id can contain ('e-07' still
        # cannot collide with 'e-7'). '_'-separated ids keep the
        # separator in the key so 'a_1' cannot alias 'a-1'. Non-ASCII
        # digits ('x-٤') must not alias ASCII ids or crash int().
        def canon(s: str) -> bool:
            return (
                s.isascii()
                and s.isdigit()
                and (s == "0" or not s.startswith("0"))
            )

        def padded(s: str) -> bool:
            return s.isascii() and s.isdigit() and len(s) > 1 and s[0] == "0"

        if "\x00" in eid:
            return None  # keeps the pad-key encoding collision-free
        if canon(eid):
            return "", int(eid)
        i = max(eid.rfind("-"), eid.rfind("_"))
        # prefix must be NON-EMPTY: '-0' would otherwise alias the
        # bare id '0' under ('', 0) (hypothesis-found counterexample)
        if i <= 0:
            return None
        pre, sep, suf = eid[:i], eid[i], eid[i + 1 :]
        key = pre if sep == "-" else pre + "_"
        if canon(suf):
            return key, int(suf)
        if padded(suf):
            return f"{key}\x00pad{len(suf)}", int(suf)
        return None

    def add(self, eid: str) -> None:
        eid = str(eid)
        p = self._parse(eid)
        if p is None:
            self.other.add(eid)
            return
        pre, n = p
        wm = self.watermarks.get(pre, -1)
        if n <= wm:
            return
        ex = self.extras.setdefault(pre, set())
        ex.add(n)
        while wm + 1 in ex:
            wm += 1
            ex.discard(wm)
        self.watermarks[pre] = wm
        if not ex:
            self.extras.pop(pre, None)

    def __contains__(self, eid: object) -> bool:
        eid = str(eid)
        p = self._parse(eid)
        if p is None:
            return eid in self.other
        pre, n = p
        return n <= self.watermarks.get(pre, -1) or n in self.extras.get(pre, set())

    def __len__(self) -> int:
        return (
            sum(w + 1 for w in self.watermarks.values())
            + sum(len(s) for s in self.extras.values())
            + len(self.other)
        )

    def to_json(self) -> dict:
        return {
            "watermarks": dict(self.watermarks),
            "extras": {k: sorted(v) for k, v in self.extras.items()},
            "other": sorted(self.other),
        }


_INT_WIDTH = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
_FLOAT_WIDTH = {"float": 0, "double": 1}


def _widen(a: T.DataType, b: T.DataType) -> T.DataType:
    """Resolve the common (widest) type for schema evolution. Widening
    is LOSSLESS-ONLY and within one numeric family (Iceberg's rule):
    int->long and float->double are exact, but long->float/double is
    NOT — a float holds 24 mantissa bits and a double 53, so a bigint
    counter above 2^53 would silently round (9007199254740993 reads
    back ...992) and the corrupted value would then win LWW merges.
    Cross-family evolution raises like any other incompatible pair."""
    if a == b:
        return a
    an, bn = a.simpleString(), b.simpleString()
    if an in _INT_WIDTH and bn in _INT_WIDTH:
        return a if _INT_WIDTH[an] >= _INT_WIDTH[bn] else b
    if an in _FLOAT_WIDTH and bn in _FLOAT_WIDTH:
        return a if _FLOAT_WIDTH[an] >= _FLOAT_WIDTH[bn] else b
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(_widen(a.elementType, b.elementType), True)
    raise ValueError(f"incompatible schema evolution: {an} vs {bn}")


def unify_schemas(base: T.StructType, incoming: T.StructType) -> T.StructType:
    """Widest-common schema: shared fields widened, new fields appended
    nullable (additive evolution only — dropping columns is rejected, which
    mirrors the reference's LOG/UPDATE_IN_DATABASE crawler policy,
    infra/terraform/modules/glue_catalog/main.tf:77-79)."""
    fields: dict[str, T.StructField] = {f.name: f for f in base.fields}
    order = [f.name for f in base.fields]
    for f in incoming.fields:
        if f.name in fields:
            fields[f.name] = T.StructField(
                f.name, _widen(fields[f.name].dataType, f.dataType), True
            )
        else:
            fields[f.name] = T.StructField(f.name, f.dataType, True)
            order.append(f.name)
    return T.StructType([fields[n] for n in order])


def conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Project/cast a DataFrame to the unified schema (missing -> NULL)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for f in schema.fields:
        if f.name in have:
            c = F.col(f.name)
            if have[f.name].dataType != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _du_parquet(path: str) -> int:
    """Total parquet bytes under a dir (one os.walk of THAT dir only)."""
    total = 0
    for dp, _dn, fn in os.walk(path):
        total += sum(
            os.path.getsize(os.path.join(dp, f))
            for f in fn
            if f.endswith(".parquet")
        )
    return total


def _partition_rows(commit_abs: str, cap: int = 4096) -> dict:
    """Per-output-partition row counts read from parquet FOOTERS only (no
    data scan, no extra Spark job) — the north-rule's per-partition
    lineage surface. For COW commits the keys carry the bucket dir
    (``_bucket=k/part-...``); for MOR deltas they are the task output
    files. Above ``cap`` partitions only the summary is kept (a manifest
    must not grow with file count). Large file sets read footers on a
    thread pool — useful on high-latency object storage where each footer
    is a network round-trip. Small sets stay SERIAL: measured on tmpfs,
    26 files cost 3 ms serial vs 86 ms pooled (pool spawn + GIL-bound
    footer parse dominate when the read itself is a memory copy)."""
    from concurrent.futures import ThreadPoolExecutor

    import pyarrow.parquet as pq

    paths: list[str] = []
    for root, _, files in os.walk(commit_abs):
        for fn in sorted(files):
            if fn.endswith(".parquet"):
                paths.append(os.path.join(root, fn))

    def rows_of(path: str) -> int:
        return pq.ParquetFile(path).metadata.num_rows

    if len(paths) > 256:
        with ThreadPoolExecutor(max_workers=16) as ex:
            counts = list(ex.map(rows_of, paths))
    else:
        counts = [rows_of(p) for p in paths]
    out: dict = {"n_files": len(paths), "total_rows": int(sum(counts))}
    if len(paths) <= cap:
        out["per_partition"] = {
            os.path.relpath(p, commit_abs): int(c) for p, c in zip(paths, counts)
        }
    return out


class SnapshotTable:
    """Bucketed snapshot table with atomic manifest commits.

    Two merge strategies, selectable per table (mixable per epoch):

      * ``mode="cow"`` (copy-on-write): each merge rewrites the affected
        buckets with the post-merge rows. Reads are cheapest (one file set
        per bucket); writes cost O(bucket size) per epoch. Iceberg v1-style.
      * ``mode="mor"`` (merge-on-read): each merge appends a DELTA commit —
        only the batch's reduced rows — and the per-key LWW resolution runs
        at read/compaction time. Writes cost O(batch); this is the only
        sane strategy when a small CDC batch hits a 100 TB table (COW would
        rewrite the world every epoch). Iceberg v2 / Hudi MOR-style.

    Manifests map bucket -> ordered list of commit dirs (base first, then
    deltas). COW keeps the lists at length 1; ``compact()`` collapses MOR
    delta chains back to length 1.
    """

    SEQ_COL = "_seq"
    BUCKET_COL = "_bucket"
    DEL_COL = "_deleted"  # tombstone: key deleted at _seq; kept so a late
    # lower-seq update cannot resurrect the row (LWW against the tombstone)
    # changes(): spans touching at most this many keys narrow via a
    # driver-collected literal IN predicate (parquet row-group skipping);
    # larger spans narrow via a pre-resolve semi-join (bounded collect)
    NARROW_INLIST_MAX = 2000

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        key_col: str = "doc_id",
        n_buckets: int = 32,
        mode: str = "cow",
        bucket_col: str | None = None,
        clock=None,
    ):
        assert mode in ("cow", "mor"), mode
        self.spark = spark
        self.root = root
        self.key_col = key_col
        self.n_buckets = n_buckets
        self.mode = mode
        # commit-timestamp source (epoch seconds). Injectable so tests and
        # deterministic fixtures control the timeline; only ever written
        # into MANIFESTS (never into data), so data fingerprints stay
        # clock-free.
        self.clock = clock or time.time
        # bucket_col defaults to the key (co-locating merges and point
        # lookups). A DIFFERENT bucket_col turns the table into a
        # value-clustered layout (e.g. a secondary index bucketed by the
        # indexed value so value probes prune): the caller must
        # guarantee a key's bucket_col value NEVER changes across its
        # lifetime (for an index, the value is embedded in the key), or
        # COW merges would miss the stored row.
        self.bucket_col = bucket_col or key_col
        os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
        os.makedirs(os.path.join(root, "commits"), exist_ok=True)
        # An existing table's manifest is the source of truth for the
        # bucketing function: reopening with a different n_buckets/key_col
        # would assign keys to the wrong buckets (COW would miss the stored
        # row for a key -> duplicate live rows; lookup() would scan the
        # wrong bucket and silently return nothing). Adopt the stored
        # values over the constructor arguments.
        m = self.manifest()
        if m is not None:
            if "n_buckets" in m:
                self.n_buckets = int(m["n_buckets"])
            if "key_col" in m:
                self.key_col = m["key_col"]
            self.bucket_col = m.get("bucket_col", self.key_col)

    # ---------------------------------------------------------------- meta

    def _latest_path(self) -> str:
        return os.path.join(self.root, "LATEST")

    def current_version(self) -> int | None:
        """Latest committed version. The LATEST pointer is a HINT: the
        manifest claim (``_commit_manifest``'s exclusive link) is the
        real commit point, and a writer can crash — or lose a benign
        pointer race — between claiming v(N+1) and advancing LATEST.
        Claims are serialized by version (claiming v(N+1) requires having
        observed vN), so the manifest chain is contiguous: probing
        FORWARD from the hint self-heals any lag at one extra stat per
        call in the common case (the probe misses immediately)."""
        try:
            with open(self._latest_path()) as f:
                v = int(f.read().strip().lstrip("v"))
        except FileNotFoundError:
            v = -1
        mdir = os.path.join(self.root, "manifests")
        while os.path.exists(os.path.join(mdir, f"v{v + 1:06d}.json")):
            v += 1
        return v if v >= 0 else None

    def version_at(self, ts_ms: int) -> int | None:
        """Timestamp time travel (Delta ``timestampAsOf`` / Iceberg
        ``FOR SYSTEM_TIME AS OF``): the latest version whose commit
        timestamp is <= ``ts_ms``. Commit timestamps are
        monotone-corrected at write (a later version never carries an
        earlier ts), so version order == timestamp order and a reverse
        scan from the newest retained manifest stops at the first hit —
        O(versions newer than ts), typically one or two manifest reads
        for a recent timestamp. Returns None when ``ts_ms`` precedes the
        table's first commit; raises when the version the timestamp
        resolves to has been expired by ``expire_snapshots`` (the state
        is no longer reconstructible — same contract as
        ``read(version=)`` on an expired version)."""
        mdir = os.path.join(self.root, "manifests")
        try:
            names = os.listdir(mdir)
        except FileNotFoundError:
            return None
        versions = sorted(
            int(n[1:-5]) for n in names if n.startswith("v") and n.endswith(".json")
        )
        if not versions:
            return None
        oldest = None
        for v in reversed(versions):
            ts = int((self.manifest(v) or {}).get("committed_at_ms", 0))
            if ts <= ts_ms:
                return v
            oldest = v
        if oldest is not None and oldest > 0:
            raise ValueError(
                f"timestamp {ts_ms} resolves to a version older than the "
                f"retention horizon (oldest retained: v{oldest})"
            )
        return None

    def state_at(self, ts_ms: int) -> DataFrame:
        """Visible state as of a commit timestamp. Raises if the
        timestamp precedes the first commit."""
        v = self.version_at(ts_ms)
        if v is None:
            raise ValueError(f"timestamp {ts_ms} precedes the first commit")
        return self.state(v)

    def changes_between(
        self, ts_from_ms: int, ts_to_ms: int, images: str = "post"
    ) -> DataFrame:
        """Change data feed between two commit TIMESTAMPS. A
        ``ts_from_ms`` before the first commit diffs against the empty
        table (everything is an insert)."""
        v_from = self.version_at(ts_from_ms)
        v_to = self.version_at(ts_to_ms)
        if v_to is None:
            raise ValueError(f"timestamp {ts_to_ms} precedes the first commit")
        return self.changes(v_from, v_to, images=images)

    def manifest(self, version: int | None = None) -> dict | None:
        """Parsed manifest; the LATEST one is cached keyed on version.
        One epoch otherwise re-parses the same JSON ~7 times (has_epoch,
        schema, read, committed_epochs, commit) — at 4096 buckets with
        lineage that is megabytes of driver-side json.load per epoch.
        Manifest files are immutable, so version-keyed caching is safe;
        only the single latest entry is retained (no growth with age)."""
        resolved_latest = version is None
        if version is None:
            version = self.current_version()
        if version is None:
            return None
        cached = getattr(self, "_manifest_cache", None)
        if cached is not None and cached[0] == version:
            # callers treat manifests as read-only (they copy the dicts
            # they mutate), so sharing the parsed object is safe
            return cached[1]
        with open(os.path.join(self.root, "manifests", f"v{version:06d}.json")) as f:
            m = json.load(f)
        if resolved_latest:
            self._manifest_cache = (version, m)
        return m

    def committed_epochs(self) -> EpochLedger:
        """The committed-epoch ledger (exact membership; len() = count)."""
        m = self.manifest()
        return EpochLedger(m["committed_epochs"]) if m else EpochLedger()

    def has_epoch(self, epoch_id: str) -> bool:
        return str(epoch_id) in self.committed_epochs()

    def schema(self) -> T.StructType | None:
        m = self.manifest()
        if not m:
            return None
        return T.StructType.fromJson(json.loads(m["schema"]))

    def lineage(self) -> list[dict]:
        """Per-commit lineage rows across all versions (metrics surface).
        Only canonical ``v*.json`` names are read: a crash between
        _commit_manifest's tmp write and its exclusive link leaves a
        ``v*.json.tmp*`` orphan that must not brick the metrics surface
        (or double-count a version if it was fully written)."""
        out = []
        mdir = os.path.join(self.root, "manifests")
        for name in sorted(os.listdir(mdir)):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f)["lineage"])
        return out

    # ---------------------------------------------------------------- read

    def _read_commit_buckets(
        self, commit_dir: str, buckets: list[int], schema: T.StructType
    ) -> DataFrame:
        paths = [
            os.path.join(self.root, commit_dir, f"{self.BUCKET_COL}={b}") for b in buckets
        ]
        # Explicit manifest schema, never inference: files written before a
        # schema evolution carry narrower types / miss columns, and
        # inference across mixed footers is order-dependent (picks whatever
        # footer it sampled; a narrow pick then crashes on the wide file).
        # The parquet reader up-casts stored narrow ints and fills missing
        # columns with NULL when the read schema is explicit.
        df = (
            self.spark.read.schema(self._data_schema(schema))
            .option("basePath", os.path.join(self.root, commit_dir))
            .parquet(*paths)
        )
        return conform(df, self._data_schema(schema))

    def _data_schema(self, schema: T.StructType) -> T.StructType:
        return T.StructType(
            list(schema.fields)
            + [
                T.StructField(self.SEQ_COL, T.LongType(), True),
                T.StructField(self.DEL_COL, T.BooleanType(), True),
                T.StructField(self.BUCKET_COL, T.IntegerType(), True),
            ]
        )

    def _resolve(self, df: DataFrame, schema: T.StructType) -> DataFrame:
        """Merge-on-read resolution: one row per key = max over stored
        (_seq, payload-hash). Partial-aggregable (map-side combine), so
        delta chains resolve in a single shuffle regardless of depth."""
        payload = [f.name for f in schema.fields if f.name != self.key_col]
        others = payload + [self.SEQ_COL, self.DEL_COL, self.BUCKET_COL]
        tie = F.xxhash64(*[F.col(c) for c in payload], F.col(self.DEL_COL))
        return (
            df.groupBy(self.key_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in others]),
                    F.struct(F.col(self.SEQ_COL), tie),
                ).alias("w")
            )
            .select(self.key_col, *[F.col(f"w.{c}").alias(c) for c in others])
            .select(*[f.name for f in schema.fields], self.SEQ_COL, self.DEL_COL, self.BUCKET_COL)
        )

    def read(
        self,
        version: int | None = None,
        buckets: list[int] | None = None,
        resolve: bool = True,
        key_semi: DataFrame | None = None,
    ) -> DataFrame:
        """Snapshot as a DataFrame (internal cols included). ``buckets``
        limits the scan to those hash buckets — the partition-pruning path
        the merge uses. When any requested bucket carries MOR deltas, the
        LWW resolution is applied (skippable with resolve=False for raw
        delta inspection). ``key_semi`` (a one-column frame named
        ``__dk``) semi-joins the raw rows down to those keys BEFORE the
        LWW resolve — whole-key filtering commutes with per-key max_by,
        and placing it below the aggregate is what keeps the resolve
        shuffle O(matched keys) instead of O(scanned rows) (Catalyst
        does not push a LeftSemi through the Aggregate on its own)."""
        m = self.manifest(version)
        schema = T.StructType.fromJson(json.loads(m["schema"])) if m else None
        if m is None or (not m["buckets"] and not m.get("global_deltas")):
            return self._empty(schema)
        all_buckets = (
            set(int(b) for b in m["buckets"].keys())
            if m["buckets"]
            else set(range(self.n_buckets))
        )
        want = set(int(b) for b in buckets) if buckets is not None else all_buckets
        by_commit: dict[str, list[int]] = {}
        needs_resolve = False
        for b_str, commit_dirs in m["buckets"].items():
            b = int(b_str)
            if b in want:
                if len(commit_dirs) > 1:
                    needs_resolve = True
                for cd in commit_dirs:
                    by_commit.setdefault(cd, []).append(b)
        parts = [
            self._read_commit_buckets(cd, bs, schema) for cd, bs in sorted(by_commit.items())
        ]
        # global deltas apply to every bucket (Iceberg equality-delete
        # style): scan them whole, filter to the wanted buckets
        gdeltas = m.get("global_deltas", [])
        if gdeltas and want:
            needs_resolve = True
            # explicit schema for the same reason as _read_commit_buckets:
            # deltas written pre-evolution have narrower/missing columns
            gdf = self.spark.read.schema(self._data_schema(schema)).parquet(
                *[os.path.join(self.root, d) for d in gdeltas]
            )
            gdf = conform(gdf, self._data_schema(schema))
            if buckets is not None:
                gdf = gdf.filter(F.col(self.BUCKET_COL).isin(*sorted(want)))
            parts.append(gdf)
        if not parts:
            return self._empty(schema)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if key_semi is not None:
            df = df.join(
                key_semi, F.col(self.key_col) == F.col("__dk"), "leftsemi"
            )
        if needs_resolve and resolve:
            df = self._resolve(df, schema)
        return df

    def changes(
        self,
        v_from: int | None,
        v_to: int | None = None,
        images: str = "post",
        narrow: str = "auto",
    ) -> DataFrame:
        """Change data feed between two committed versions (the Delta CDF
        / Iceberg changelog-scan analogue): one row per key whose VISIBLE
        state differs, tagged ``_change_type`` in
        ('insert', 'update', 'delete'). Inserts and updates carry the
        post-image payload; deletes carry the pre-image. ``v_from=None``
        diffs against the empty table (everything visible at v_to is an
        insert); ``v_to=None`` means the latest version.

        ``images='both'`` switches updates to the two-row Delta CDF
        encoding — ``update_preimage`` (old payload, old ``_seq``) then
        ``update_postimage`` (new payload, new ``_seq``) — which is what
        downstream incremental maintenance needs: the pre-image is the
        contribution to RETRACT, the post-image the one to ADD. Inserts
        and deletes are unchanged (one row each).

        Scale shape — the diff never reads two full table states:

        * candidate buckets = buckets whose manifest commit lists DIFFER
          between the versions (covers COW epochs and compaction), plus
          the distinct ``_bucket`` values of global delta dirs ADDED
          between the versions (MOR epochs commit as global deltas; the
          scan is O(new data), and only added dirs are read — dirs
          removed by compaction may be expired from disk, but compaction
          rewrites every touched bucket's commit list, so the bucket
          diff already covers them);
        * both versions are then read with ``buckets=`` pruning, so a
          small CDC epoch against a 10^10-row table diffs only the
          buckets it touched;
        * rows resolved to the SAME ``_seq`` at both versions are
          filtered out, which also makes a pure compaction (state
          preserved, files rewritten) correctly produce zero changes;
        * for a MOR-only span (no bucket rewrite between the versions)
          both sides are additionally semi-joined down to the added
          deltas' key set — see the inline comment. ``narrow`` controls
          it: 'auto' (default) applies a driver-side selectivity gate,
          'on' forces it whenever the span is MOR-only, 'off' disables.
        """
        if images not in ("post", "both"):
            raise ValueError(f"images must be 'post' or 'both', got {images!r}")
        if narrow not in ("auto", "on", "off"):
            raise ValueError(f"narrow must be auto/on/off, got {narrow!r}")
        if v_to is None:
            v_to = self.current_version()
        try:
            m_to = self.manifest(v_to) if v_to is not None else None
        except FileNotFoundError:
            m_to = None
        if m_to is None:
            raise ValueError(f"version {v_to!r} not found")
        try:
            m_from = self.manifest(v_from) if v_from is not None else None
        except FileNotFoundError:
            m_from = None
        if v_from is not None and m_from is None:
            raise ValueError(f"version {v_from!r} not found (expired?)")
        if v_from is not None and v_from > v_to:
            # a reversed span would silently report the diff backwards
            # (inserts as deletes) — e.g. a consumer bookmark that
            # outlived a table reset, or swapped arguments
            raise ValueError(f"v_from {v_from} > v_to {v_to}")
        schema = T.StructType.fromJson(json.loads(m_to["schema"]))
        payload = [
            f.name
            for f in self._data_schema(schema).fields
            if f.name
            not in (self.SEQ_COL, self.DEL_COL, self.BUCKET_COL, self.key_col)
        ]

        fb = dict(m_from["buckets"]) if m_from else {}
        tb = dict(m_to["buckets"])
        cand = {int(b) for b, dirs in tb.items() if fb.get(b) != dirs}
        cand |= {int(b) for b in fb if b not in tb}
        fg = set((m_from or {}).get("global_deltas", []))
        added_g = [d for d in m_to.get("global_deltas", []) if d not in fg]
        delta_keys = None
        key_pred = None
        if added_g:
            gdf = self.spark.read.schema(self._data_schema(schema)).parquet(
                *[os.path.join(self.root, d) for d in added_g]
            )
            # MOR-only span (no bucket rewrite between the versions):
            # every key whose state changed appears in a delta added in
            # the span (minor compaction only folds those same keys), so
            # BOTH sides of the diff can be narrowed to the delta keys —
            # a small epoch against a 10^10-row table then compares
            # O(epoch) keys instead of scanning every touched bucket
            # whole. Gated ('auto') on a driver-side selectivity
            # estimate (added-delta bytes vs table bytes): when the span
            # touched a large fraction of the table, narrowing only adds
            # work.
            narrow_ok = m_from is not None and fb == tb and narrow != "off"
            added_bytes = 0
            if narrow_ok:
                # per-dir sizes come from the manifest (recorded once at
                # commit time): the gate is O(dirs) dict lookups, not an
                # O(table files) driver-side walk per incremental diff.
                # The walk remains only as a fallback for manifests
                # written before dir_bytes existed.
                recorded = m_to.get("dir_bytes", {})

                def _dir_bytes(rel: str) -> int:
                    if rel in recorded:
                        return int(recorded[rel])
                    return _du_parquet(os.path.join(self.root, rel))

                added_bytes = sum(_dir_bytes(d) for d in added_g)
                if narrow != "on":
                    table_dirs = {
                        d for dirs in tb.values() for d in dirs
                    } | set(m_to.get("global_deltas", []))
                    table_bytes = sum(_dir_bytes(d) for d in table_dirs)
                    narrow_ok = added_bytes * 8 < table_bytes
            if narrow_ok:
                # One bounded job: distinct (key, bucket) pairs of the
                # span's deltas, capped at NARROW_INLIST_MAX+1. A small
                # span collapses to a literal IN predicate — pushed into
                # the parquet scan, so sorted-compacted buckets row-group
                # -skip straight to the touched keys — and its pairs
                # already carry the exact touched-bucket set. A larger
                # span keeps a pre-resolve semi-join (read(key_semi=)),
                # broadcast while the delta side is small.
                pairs = (
                    gdf.select(self.key_col, self.BUCKET_COL)
                    .distinct()
                    .limit(self.NARROW_INLIST_MAX + 1)
                    .collect()
                )
                if len(pairs) <= self.NARROW_INLIST_MAX:
                    cand |= {int(r[1]) for r in pairs}
                    key_pred = F.col(self.key_col).isin(
                        list({r[0] for r in pairs})
                    )
                else:
                    cand |= {
                        r[0]
                        for r in gdf.select(self.BUCKET_COL)
                        .distinct()
                        .collect()
                    }
                    delta_keys = gdf.select(
                        F.col(self.key_col).alias("__dk")
                    ).distinct()
                    if added_bytes < (64 << 20):
                        delta_keys = F.broadcast(delta_keys)
            else:
                cand |= {
                    r[0]
                    for r in gdf.select(self.BUCKET_COL).distinct().collect()
                }

        def side(df: DataFrame, tag: str) -> DataFrame:
            return df.select(
                F.col(self.key_col).alias("__k"),
                F.col(self.SEQ_COL).alias(f"__seq_{tag}"),
                F.coalesce(F.col(self.DEL_COL), F.lit(False)).alias(
                    f"__del_{tag}"
                ),
                *[F.col(c).alias(f"__{tag}_{c}") for c in payload],
            )

        empty = self._empty(schema)
        # Single-pass two-version resolve: for a MOR-only span with no
        # in-span schema change (the steady-state incremental-consumer
        # shape), the after-side row set is exactly the before-side rows
        # PLUS the added deltas — so instead of two LWW resolves (each a
        # key shuffle over the overlapping chains) joined full-outer,
        # ONE aggregate over the union computes both winners: wa =
        # max_by restricted to before-visible rows, wb = max_by over
        # all. Identical winners by construction (same ordering struct,
        # max_by ignores NULL-keyed rows), and a key absent at v_from
        # yields wa = NULL exactly where the full-outer join yielded a
        # NULL a-side. Gated off when the span rewrote buckets, evolved
        # the schema (the tie hash is type-sensitive, so the before side
        # must tie-break under its own column types — the two-read path
        # preserves that), or dropped delta dirs (minor compaction):
        # those fall back to the two-read join.
        single_pass = (
            m_from is not None
            and fb == tb
            and bool(added_g)
            and m_from["schema"] == m_to["schema"]
            and fg <= set(m_to.get("global_deltas", []))
        )
        if not cand:
            j = side(empty, "a").join(side(empty, "b"), "__k", "full")
        elif single_pass:
            bs = sorted(cand)
            common = self.read(v_from, buckets=bs, resolve=False)
            added = gdf.filter(F.col(self.BUCKET_COL).isin(*bs))
            rows = common.withColumn(
                "__in_from", F.lit(True)
            ).unionByName(added.withColumn("__in_from", F.lit(False)))
            if delta_keys is not None:
                rows = rows.join(
                    delta_keys, F.col(self.key_col) == F.col("__dk"), "leftsemi"
                )
            if key_pred is not None:
                rows = rows.filter(key_pred)
            others = payload + [self.SEQ_COL, self.DEL_COL, self.BUCKET_COL]
            tie = F.xxhash64(
                *[F.col(c) for c in payload], F.col(self.DEL_COL)
            )
            ordk = F.struct(F.col(self.SEQ_COL), tie)
            val = F.struct(*[F.col(c) for c in others])
            fr = F.col("__in_from")
            j = (
                rows.groupBy(F.col(self.key_col).alias("__k"))
                .agg(
                    F.max_by(
                        F.when(fr, val), F.when(fr, ordk)
                    ).alias("__wa"),
                    F.max_by(val, ordk).alias("__wb"),
                )
                .select(
                    "__k",
                    *[
                        F.col(f"__w{t}.{c}").alias(f"__{t}_{c}")
                        for t in ("a", "b")
                        for c in payload
                    ],
                    F.col(f"__wa.{self.SEQ_COL}").alias("__seq_a"),
                    F.when(
                        F.col("__wa").isNotNull(),
                        F.coalesce(
                            F.col(f"__wa.{self.DEL_COL}"), F.lit(False)
                        ),
                    ).alias("__del_a"),
                    F.col(f"__wb.{self.SEQ_COL}").alias("__seq_b"),
                    F.when(
                        F.col("__wb").isNotNull(),
                        F.coalesce(
                            F.col(f"__wb.{self.DEL_COL}"), F.lit(False)
                        ),
                    ).alias("__del_b"),
                )
            )
        else:
            bs = sorted(cand)
            # the BEFORE side reads under v_from's (possibly narrower)
            # schema: conform to v_to's so columns added by evolution
            # inside the span resolve as NULL instead of crashing side()
            before = (
                conform(
                    self.read(v_from, buckets=bs, key_semi=delta_keys),
                    self._data_schema(schema),
                )
                if m_from
                else empty
            )
            after = self.read(v_to, buckets=bs, key_semi=delta_keys)
            if key_pred is not None:
                # plain grouping-key filter: Catalyst pushes it through
                # the resolve aggregate down to the parquet scan
                before = before.filter(key_pred)
                after = after.filter(key_pred)
            j = side(before, "a").join(side(after, "b"), "__k", "full")

        def vis(tag: str) -> F.Column:
            return F.when(
                F.col(f"__seq_{tag}").isNull(), F.lit(False)
            ).otherwise(~F.col(f"__del_{tag}"))

        va, vb = vis("a"), vis("b")
        change = (
            F.when(~va & vb, F.lit("insert"))
            .when(va & ~vb, F.lit("delete"))
            .when(va & vb & (F.col("__seq_a") != F.col("__seq_b")), F.lit("update"))
        )
        classified = j.withColumn("_change_type", change).filter(
            F.col("_change_type").isNotNull()
        )
        if images == "both":
            # Delta-CDF two-row update encoding via one array+explode —
            # no second join, no union re-scan of the diff frame.
            def img(tag: str, ct) -> F.Column:
                return F.struct(
                    ct.alias("_ct"),
                    *[F.col(f"__{tag}_{c}").alias(c) for c in payload],
                    F.col(f"__seq_{tag}").alias("_sq"),
                )

            ctc = F.col("_change_type")
            rows = (
                F.when(ctc == "insert", F.array(img("b", F.lit("insert"))))
                .when(ctc == "delete", F.array(img("a", F.lit("delete"))))
                .otherwise(
                    F.array(
                        img("a", F.lit("update_preimage")),
                        img("b", F.lit("update_postimage")),
                    )
                )
            )
            e = classified.select(
                F.col("__k"), F.explode(rows).alias("__e")
            )
            return e.select(
                F.col("__k").alias(self.key_col),
                *[F.col(f"__e.{c}").alias(c) for c in payload],
                F.col("__e._sq").alias(self.SEQ_COL),
                F.col("__e._ct").alias("_change_type"),
            )
        is_del = F.col("_change_type") == "delete"
        return classified.select(
            F.col("__k").alias(self.key_col),
            *[
                F.when(is_del, F.col(f"__a_{c}"))
                .otherwise(F.col(f"__b_{c}"))
                .alias(c)
                for c in payload
            ],
            F.coalesce(F.col("__seq_b"), F.col("__seq_a")).alias(self.SEQ_COL),
            F.col("_change_type"),
        )

    def read_changes_since(
        self, last_version: int | None, images: str = "post"
    ) -> tuple[DataFrame, int | None, bool]:
        """Incremental CDF consumption with a consumer bookmark:
        ``(changes, new_bookmark, bootstrapped)``. Pass the version your
        consumer last processed (None on first call); persist the
        returned bookmark after applying the frame.

        If ``last_version`` has been expired by ``expire_snapshots``
        (the consumer fell behind the retention horizon), the diff can
        no longer be computed — the call falls back to a BOOTSTRAP: the
        full current state as inserts, flagged ``bootstrapped=True`` so
        the consumer knows to replace, not patch, its copy. This is the
        same contract as Delta CDF's startingVersion-out-of-range
        re-read. A no-op (bookmark already current) returns an empty
        frame and the same bookmark."""
        cur = self.current_version()
        if cur is None:
            raise ValueError("table has no committed version yet")
        if cur == last_version:
            # empty frame with the changes() output schema (self-diff)
            return self.changes(cur, cur, images=images), last_version, False
        try:
            return self.changes(last_version, cur, images=images), cur, False
        except ValueError:
            if last_version is None:
                raise
            return self.changes(None, cur, images=images), cur, True

    def state(self, version: int | None = None) -> DataFrame:
        """User-facing final state (tombstones hidden, internals dropped)."""
        return (
            self.read(version)
            .filter(~F.coalesce(F.col(self.DEL_COL), F.lit(False)))
            .drop(self.SEQ_COL, self.DEL_COL, self.BUCKET_COL)
        )

    def _next_seq(self) -> int:
        """One seq above every stored row's (raw scan — max over
        unresolved deltas equals max over resolved state)."""
        hi = self.read(resolve=False).agg(F.max(self.SEQ_COL)).first()[0]
        return (hi if hi is not None else 0) + 1

    def delete_where(self, condition, epoch_id: str) -> dict:
        """Bulk row-level DELETE (Delta ``DELETE FROM t WHERE ...``; the
        GDPR right-to-be-forgotten shape — the reference has no
        row-level path, erasure there means rewriting silver wholesale).
        Matching CURRENT-state rows become tombstones in ONE
        ledger-deduped epoch at a seq above every stored one, so the
        operation is idempotent under replay, the CDF reports the rows
        as deletes, and every CDF consumer (maintained aggregates,
        secondary indexes, the outbox) retracts them incrementally. Time
        travel keeps pre-erasure versions readable until they expire:
        the full compliance sequence is ``delete_where`` +
        ``expire_snapshots`` + ``compact(purge_tombstones_below_seq=)``.
        Cost: one state scan (the predicate pushes into it) + a merge of
        O(matches) rows."""
        epoch_id = str(epoch_id)
        if self.has_epoch(epoch_id):
            return {"epoch_id": epoch_id, "skipped": True}
        seq = self._next_seq()
        rows = (
            self.state()
            .filter(condition)
            .withColumn("op", F.lit("delete"))
            .withColumn("seq", F.lit(seq).cast("long"))
        )
        return self.merge_reduced(rows, epoch_id)

    def delete_keys(self, keys: list, epoch_id: str) -> dict:
        """Right-to-be-forgotten by KEY — the common GDPR request shape
        ("erase user X"): like ``delete_where(key IN ...)`` but
        BUCKET-PRUNED for the ROW read: only the probed keys' hash
        buckets are scanned for the rows to tombstone (O(|keys| buckets
        out of n_buckets); files-read-asserted in tests). The tombstone
        seq is the TABLE-GLOBAL ``_next_seq()`` — the same watermark
        ``delete_where`` uses — NOT the probed keys' max: a late-
        replayed event that logically preceded the erasure (seq above
        the key's stored max but below the table's) must lose to the
        tombstone, or erased PII resurrects on replay. The global seq
        probe is a raw unresolved scan of ONLY the ``_seq`` column
        (column-pruned parquet footers + one max), cheap next to the
        row read. Value-clustered tables (bucket_col != key_col) fall
        back to the full row scan, like ``lookup``."""
        epoch_id = str(epoch_id)
        if self.has_epoch(epoch_id):
            return {"epoch_id": epoch_id, "skipped": True}
        buckets = (
            self.buckets_for(keys) if self.bucket_col == self.key_col else None
        )
        seq = self._next_seq()
        rows = (
            self.read(buckets=buckets)
            .filter(F.col(self.key_col).isin(*keys))
            .filter(~F.coalesce(F.col(self.DEL_COL), F.lit(False)))
            .drop(self.SEQ_COL, self.DEL_COL, self.BUCKET_COL)
            .withColumn("op", F.lit("delete"))
            .withColumn("seq", F.lit(seq).cast("long"))
        )
        return self.merge_reduced(rows, epoch_id)

    def update_where(self, condition, assignments: dict, epoch_id: str) -> dict:
        """Bulk row-level UPDATE (Delta ``UPDATE t SET ... WHERE ...``):
        matching CURRENT-state rows are re-emitted with the assignments
        applied (values or Column expressions over the old row) as ONE
        ledger-deduped epoch at a fresh seq — replace-not-patch, same
        LWW semantics as any other update. The key/bucket columns cannot
        be assigned (an identity change is a delete + insert, not an
        update — silently rewriting the key would orphan the stored
        row's bucket)."""
        epoch_id = str(epoch_id)
        if self.has_epoch(epoch_id):
            return {"epoch_id": epoch_id, "skipped": True}
        bad = set(assignments) & {self.key_col, self.bucket_col}
        if bad:
            raise ValueError(f"cannot assign key/bucket columns: {sorted(bad)}")
        seq = self._next_seq()
        rows = self.state().filter(condition)
        for name, value in assignments.items():
            col = value if isinstance(value, Column) else F.lit(value)
            rows = rows.withColumn(name, col)
        rows = rows.withColumn("op", F.lit("update")).withColumn(
            "seq", F.lit(seq).cast("long")
        )
        return self.merge_reduced(rows, epoch_id)

    def lookup(self, keys: list[str], version: int | None = None) -> DataFrame:
        """Point lookups via bucket pruning: only the hash buckets of the
        requested keys are scanned (plus any pending global deltas). At
        10^10 rows / 4096 buckets this reads ~1/4096th of the table per
        distinct bucket instead of scanning it."""
        # key-hash pruning is only valid when the table is bucketed BY
        # the key; a value-clustered table (bucket_col != key_col) falls
        # back to a full scan here — probe such tables by bucket value
        # (buckets_for) instead
        buckets = (
            self.buckets_for(keys, version)
            if self.bucket_col == self.key_col
            else None
        )
        df = self.read(version=version, buckets=buckets)
        return (
            df.filter(F.col(self.key_col).isin(*keys))
            .filter(~F.coalesce(F.col(self.DEL_COL), F.lit(False)))
            .drop(self.SEQ_COL, self.DEL_COL, self.BUCKET_COL)
        )

    def _empty(self, schema: T.StructType | None) -> DataFrame:
        schema = schema or T.StructType([])
        return self.spark.createDataFrame([], self._data_schema(schema))

    # --------------------------------------------------------------- merge

    def bucket_expr(self) -> F.Column:
        return F.pmod(
            F.xxhash64(F.col(self.bucket_col)), F.lit(self.n_buckets)
        ).cast("int")

    def _n_buckets_at(self, version: int | None) -> int:
        """The bucket COUNT in force at a given version — after a
        ``rebucket``, probing an older snapshot with the current count
        would hash to the wrong buckets and silently miss rows."""
        if version is None:
            return self.n_buckets
        m = self.manifest(version)
        if m is None:
            return self.n_buckets
        return int(m.get("n_buckets", self.n_buckets))

    def buckets_for(self, values: list, version: int | None = None) -> list[int]:
        """The bucket ids the given ``bucket_col`` values hash to —
        hashed AS THE STORED COLUMN TYPE (xxhash64('42') != xxhash64(42L),
        so an untyped probe would prune to the wrong buckets and silently
        return nothing) and with the bucket count IN FORCE at the probed
        version. One tiny local-list job; never touches the table."""
        sch = self.schema()
        vtype: T.DataType = T.StringType()
        if sch is not None:
            for f in sch.fields:
                if f.name == self.bucket_col:
                    vtype = f.dataType
        nb = self._n_buckets_at(version)
        rows = self.spark.createDataFrame(
            [(None if v is None else str(v),) for v in values],
            T.StructType([T.StructField("v", T.StringType())]),
        ).select(
            F.pmod(F.xxhash64(F.col("v").cast(vtype)), F.lit(nb))
            .cast("int")
            .alias("b")
        )
        return sorted({r.b for r in rows.distinct().collect() if r.b is not None})

    def merge_reduced(
        self,
        reduced: DataFrame,
        epoch_id: str,
        affected: list[int] | None = None,
        pre_commit=None,
    ) -> dict:
        """MERGE a change batch into the table.

        ``reduced`` needs columns ``op`` (insert/update/delete), ``seq``
        (long), and the payload columns; multiple rows per key are fine —
        the merge aggregate reduces them (dedup + LWW) in the same shuffle
        it uses to apply against the target. Equivalent Iceberg SQL::

            MERGE INTO t USING batch b ON t.doc_id = b.doc_id
            WHEN MATCHED AND b.op = 'delete' AND b.seq > t._seq THEN DELETE
            WHEN MATCHED AND b.seq > t._seq THEN UPDATE SET *
            WHEN NOT MATCHED AND b.op != 'delete' THEN INSERT *

        The ``seq > _seq`` guard is what makes replaying old batches a
        no-op (the reference's idempotency invariant, proven by its
        Makefile:344-359 verify-idempotency target).
        """
        epoch_id = str(epoch_id)
        if self.has_epoch(epoch_id):
            return {"epoch_id": epoch_id, "skipped": True}

        payload_schema = T.StructType(
            [f for f in reduced.schema.fields if f.name not in ("op", "seq", "batch_id")]
        )
        old_schema = self.schema()
        schema = (
            unify_schemas(old_schema, payload_schema) if old_schema else payload_schema
        )
        if old_schema is not None:
            # the bucket column's TYPE is part of the bucketing function:
            # xxhash64(42 as int) != xxhash64(42L), so widening it would
            # re-hash every future row of an existing key into a
            # different bucket (COW would miss the stored row -> duplicate
            # live rows). Evolution of other columns is unaffected.
            old_bt = {f.name: f.dataType for f in old_schema.fields}.get(
                self.bucket_col
            )
            new_bt = {f.name: f.dataType for f in schema.fields}.get(
                self.bucket_col
            )
            if old_bt is not None and new_bt is not None and old_bt != new_bt:
                raise ValueError(
                    f"cannot evolve bucket column {self.bucket_col!r} from "
                    f"{old_bt.simpleString()} to {new_bt.simpleString()}: the "
                    "bucket hash is type-sensitive"
                )

        # adopt a concurrently-evolved bucket count BEFORE hashing: a
        # rebucket committed by another handle since this one was opened
        # would otherwise assign rows under the stale count
        m_entry = self.manifest()
        if m_entry is not None and "n_buckets" in m_entry:
            self.n_buckets = int(m_entry["n_buckets"])
        batch = reduced.withColumn(self.BUCKET_COL, self.bucket_expr())
        if self.mode == "mor":
            # MOR needs no up-front bucket discovery: the delta lands next
            # to existing data, and written buckets are read off the commit
            # dir listing afterwards. Zero extra jobs per epoch.
            affected = None
        elif affected is None:
            affected = sorted(
                r[0] for r in batch.select(self.BUCKET_COL).distinct().collect()
            )
        else:
            affected = sorted(int(b) for b in affected)
        if affected is not None and not affected:
            # empty COW batch: commit the epoch id only (no data); rebase
            # freely on a lost version race — there is no read set
            for _ in range(16):
                # ONE manifest snapshot per attempt (see _merge_mor_append):
                # ledger and version derive from the SAME read, and the
                # claim targets snapshot.version + 1 exactly so any
                # intervening commit forces a conflict instead of being
                # silently dropped by a fresher version number
                old_m = self.manifest()
                ledger = (
                    EpochLedger(old_m["committed_epochs"]) if old_m else EpochLedger()
                )
                if epoch_id in ledger:
                    return {"epoch_id": epoch_id, "skipped": True}
                ledger.add(epoch_id)
                lineage = {
                    "epoch_id": epoch_id,
                    "version": old_m["version"] + 1 if old_m else 0,
                    "affected_buckets": [],
                    "written_buckets": [],
                    "keys_considered": 0,
                    "keys_deleted": 0,
                }
                # commit the CURRENT schema (winner's evolution preserved);
                # an empty batch contributes no columns of its own
                cur_schema = (
                    T.StructType.fromJson(json.loads(old_m["schema"]))
                    if old_m
                    else schema
                )
                if old_m is not None and "n_buckets" in old_m:
                    self.n_buckets = int(old_m["n_buckets"])  # empty: no rows hashed
                try:
                    self._commit_manifest(
                        lineage["version"],
                        cur_schema,
                        dict(old_m["buckets"]) if old_m else {},
                        ledger,
                        lineage,
                    )
                    return lineage
                except CommitConflictError:
                    continue
            raise CommitConflictError(
                f"epoch {epoch_id!r}: lost the version race 16 times in a row"
            )

        # Unified arms: (payload..., __seq, __bucket, __op, __side).
        # __side breaks exact-seq ties in favor of the incoming batch, which
        # is safe because an equal seq can only be the same event replayed.
        ext_schema = T.StructType(
            list(schema.fields)
            + [
                T.StructField("__seq", T.LongType(), True),
                T.StructField("__bucket", T.IntegerType(), True),
                T.StructField("__op", T.StringType(), True),
                T.StructField("__side", T.IntegerType(), True),
            ]
        )
        b_arm = conform(
            batch.withColumnRenamed("seq", "__seq")
            .withColumnRenamed(self.BUCKET_COL, "__bucket")
            .withColumnRenamed("op", "__op")
            .withColumn("__side", F.lit(1)),
            ext_schema,
        )
        if self.mode == "mor":
            return self._merge_mor_append(
                b_arm, schema, epoch_id, pre_commit=pre_commit
            )
        # COW merges against the current target rows of the affected
        # buckets; the resulting commit REPLACES those buckets. The read
        # is PINNED to the manifest observed here: this read set (the
        # affected buckets' dir lists + the global delta chain) is what
        # the commit loop below validates against the then-current
        # manifest to decide whether a lost version race is rebaseable.
        read_m = self.manifest()
        target = self.read(
            version=read_m["version"] if read_m else None, buckets=affected
        )
        t_arm = conform(
            target.withColumnRenamed(self.SEQ_COL, "__seq")
            .withColumnRenamed(self.BUCKET_COL, "__bucket")
            .withColumn(
                # a stored tombstone re-enters the reduction as a delete
                # so it keeps beating stale lower-seq updates
                "__op",
                F.when(
                    F.coalesce(F.col(self.DEL_COL), F.lit(False)), F.lit("delete")
                ).otherwise(F.lit("__current")),
            )
            .withColumn("__side", F.lit(0)),
            ext_schema,
        )
        both = t_arm.unionByName(b_arm)
        w_cols = [f.name for f in schema.fields] + ["__seq", "__bucket", "__op"]
        # One hash aggregate implements dedup + LWW + MERGE in a single
        # shuffle: max_by is partial-aggregable, so map-side combine reduces
        # every key to one row per task BEFORE the exchange — which is also
        # why hot doc_ids don't skew this stage (no salting needed here;
        # salting remains for sort/window/join-shaped paths). Ties:
        # (seq, side, op+payload-hash) is a total order -> deterministic,
        # replay-stable winners even for pathological equal-seq events.
        # __op MUST be in the hash (mirroring _resolve's DEL_COL): an
        # equal-seq delete vs update with identical payload hash would
        # otherwise pick a partition-order-dependent winner.
        tie_hash = F.xxhash64(
            *[F.col(f.name) for f in schema.fields if f.name != self.key_col],
            F.col("__op"),
        )
        winner = (
            both.groupBy(self.key_col)
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in w_cols if c != self.key_col]),
                    F.struct(F.col("__seq"), F.col("__side"), tie_hash),
                ).alias("w")
            )
            .select(
                F.col(self.key_col),
                *[F.col(f"w.{c}").alias(c) for c in w_cols if c != self.key_col],
            )
            .select(
                *[F.col(f.name) for f in schema.fields],
                F.col("__seq").alias(self.SEQ_COL),
                F.col("__bucket").alias(self.BUCKET_COL),
                F.col("__op"),
            )
        )
        observation = Observation(f"merge_{uuid.uuid4().hex[:8]}")
        observed = winner.observe(
            observation,
            F.count(F.lit(1)).alias("keys_considered"),
            F.count_if(F.col("__op") == "delete").alias("keys_deleted"),
        )
        # deletes are NOT dropped: they persist as tombstone rows (_deleted)
        # with their _seq, the anti-resurrection guard for out-of-order logs
        new_rows = observed.withColumn(
            self.DEL_COL, F.col("__op") == "delete"
        ).drop("__op")

        version = (read_m["version"] + 1) if read_m else 0
        tag = "".join(ch for ch in epoch_id if ch.isalnum())[-24:] or "e"
        # attempt-unique dir (see _merge_mor_append): concurrent writers
        # never share a data directory; losers leave vacuumable orphans
        commit_rel = os.path.join(
            "commits", f"c_{version:06d}_{tag}_{uuid.uuid4().hex[:6]}"
        )
        commit_abs = os.path.join(self.root, commit_rel)
        n_out = len(affected) if affected else self.n_buckets
        (
            new_rows.repartition(max(n_out, 1), F.col(self.BUCKET_COL))
            .write.mode("overwrite")
            .partitionBy(self.BUCKET_COL)
            .parquet(commit_abs)
        )
        metrics_row = observation.get
        if pre_commit is not None:
            # transactional DQ gate: raises -> the manifest below is never
            # written, the data files are unreferenced orphans (vacuumable),
            # and the epoch stays uncommitted. The gate's aggregates were
            # observed during the write job itself — zero extra scans.
            pre_commit()
        written_buckets = set()
        for d in os.listdir(commit_abs):
            if d.startswith(f"{self.BUCKET_COL}="):
                written_buckets.add(int(d.split("=", 1)[1]))

        # only COW reaches this point (MOR returned via _merge_mor_append)
        partition_rows = json.dumps(_partition_rows(commit_abs))
        # commit with validate-or-rebase: a COW rewrite baked the READ SET
        # (the affected buckets as of read_m + the then-current delta
        # chain) into its data files. Losing the version race is
        # rebaseable ONLY if the winners did not change that read set —
        # same buckets' dir lists, same global deltas, same bucket count.
        # Otherwise the rewrite is stale: raise with the epoch
        # UNCOMMITTED (the data dir is a vacuumable orphan) and let the
        # caller re-run the merge against fresh state.
        read_gd = list(read_m.get("global_deltas", [])) if read_m else []
        read_bk = {
            str(b): (read_m["buckets"].get(str(b)) if read_m else None)
            for b in affected
        }
        read_nb = int(read_m["n_buckets"]) if read_m else self.n_buckets
        for _ in range(16):
            # ONE manifest snapshot per attempt (see _merge_mor_append)
            old_m = self.manifest()
            committed = (
                EpochLedger(old_m["committed_epochs"]) if old_m else EpochLedger()
            )
            if epoch_id in committed:
                shutil.rmtree(commit_abs, ignore_errors=True)
                return {"epoch_id": epoch_id, "skipped": True}
            committed.add(epoch_id)
            if (old_m["version"] if old_m else None) != (
                read_m["version"] if read_m else None
            ):
                now_gd = list(old_m.get("global_deltas", [])) if old_m else []
                now_bk = {
                    str(b): (old_m["buckets"].get(str(b)) if old_m else None)
                    for b in affected
                }
                now_nb = int(old_m["n_buckets"]) if old_m else self.n_buckets
                if (now_gd, now_bk, now_nb) != (read_gd, read_bk, read_nb):
                    raise CommitConflictError(
                        f"epoch {epoch_id!r}: a concurrent commit changed "
                        f"this COW merge's read set (buckets {affected}); "
                        "the epoch is uncommitted — re-run the merge"
                    )
            # re-unify against the winner's schema: a rebase-eligible
            # intervening commit (e.g. a schema-evolving EMPTY epoch)
            # must not have its evolution dropped by our pre-race schema
            if old_m is not None:
                schema = unify_schemas(
                    T.StructType.fromJson(json.loads(old_m["schema"])), schema
                )
            buckets_map = (
                {k: list(v) for k, v in old_m["buckets"].items()} if old_m else {}
            )
            for b in affected:
                buckets_map.pop(str(b), None)
            for b in written_buckets:
                buckets_map[str(b)] = [commit_rel]
            version = old_m["version"] + 1 if old_m else 0
            lineage = {
                "epoch_id": epoch_id,
                "version": version,
                "mode": self.mode,
                "affected_buckets": affected if affected is not None else sorted(written_buckets),
                "written_buckets": sorted(written_buckets),
                "keys_considered": metrics_row["keys_considered"] if metrics_row else None,
                "keys_deleted": metrics_row["keys_deleted"] if metrics_row else None,
                # JSON string: lineage() rows stay flat enough for
                # spark.createDataFrame (nested variant maps break inference)
                "partition_rows": partition_rows,
            }
            try:
                self._commit_manifest(
                    version, schema, buckets_map, committed, lineage,
                    new_dir=commit_rel, new_dir_kind="base",
                )
                return lineage
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"epoch {epoch_id!r}: lost the version race 16 times in a row"
        )

    def _merge_mor_append(
        self,
        b_arm: DataFrame,
        schema: T.StructType,
        epoch_id: str,
        pre_commit=None,
    ) -> dict:
        """MOR fast path: the normalized batch lands as a raw delta — a
        pure MAP job (scan -> storage form -> partitioned write), ZERO
        shuffles per epoch. Dedup/LWW happens once, at read or compaction
        (``_resolve``), which is where Hudi MOR / Iceberg streaming CDC
        put it too. This is what makes per-epoch cost O(batch) with
        near-perfect parallel scaling; the price is read amplification
        until ``compact()`` runs."""
        delta = (
            b_arm.withColumn(self.DEL_COL, F.col("__op") == "delete")
            .withColumnRenamed("__seq", self.SEQ_COL)
            .withColumnRenamed("__bucket", self.BUCKET_COL)
            .drop("__op", "__side")
        )
        observation = Observation(f"merge_{uuid.uuid4().hex[:8]}")
        observed = delta.observe(
            observation,
            F.count(F.lit(1)).alias("keys_considered"),
            F.count_if(F.col(self.DEL_COL)).alias("keys_deleted"),
        )
        # version here names the data dir only (cosmetic): the COMMIT
        # version is re-derived per attempt inside the retry loop below
        m0 = self.manifest()
        version = m0["version"] + 1 if m0 else 0
        tag = "".join(ch for ch in epoch_id if ch.isalnum())[-24:] or "e"
        # attempt-unique dir: two workers retrying the SAME epoch must not
        # interleave writes into one directory (the loser's manifest claim
        # fails and its dir stays an unreferenced, vacuumable orphan; dir
        # names are opaque — manifests reference them by relative path)
        commit_rel = os.path.join(
            "commits", f"c_{version:06d}_{tag}_{uuid.uuid4().hex[:6]}"
        )
        commit_abs = os.path.join(self.root, commit_rel)
        # UNPARTITIONED delta: zero shuffle AND zero partition fan-out
        # (partitionBy from an unshuffled input would create
        # tasks x buckets tiny files). _bucket rides as a data column; the
        # delta applies table-wide, like Iceberg's equality-delete files.
        observed.write.mode("overwrite").parquet(commit_abs)
        metrics_row = observation.get
        if pre_commit is not None:
            pre_commit()
        empty = bool(metrics_row) and metrics_row["keys_considered"] == 0
        if empty:
            # fully-quarantined / empty epoch: commit the epoch id WITHOUT
            # growing the delta chain — a zero-row delta would still count
            # toward read amplification and maybe_compact's trigger. The
            # emptiness is known from the Observation the write job
            # already ran, so this costs no extra scan (COW has the same
            # short-circuit up front via its affected-bucket probe).
            shutil.rmtree(commit_abs, ignore_errors=True)
        partition_rows = None if empty else json.dumps(_partition_rows(commit_abs))
        # commit with rebase-on-conflict: a MOR delta is position-
        # independent (the LWW resolve is order-free), so losing the
        # version race to ANY other commit just means re-deriving the
        # manifest contents from the winner's state and claiming the next
        # version. Data files are never rewritten on rebase.
        for _ in range(16):
            # ONE manifest snapshot per attempt: ledger, bucket map, delta
            # chain, and version must all come from the SAME manifest — two
            # separate reads could straddle a concurrent commit and write a
            # new manifest whose ledger misses the winner's epoch (silent
            # exactly-once violation) or whose chain drops its delta
            old_m = self.manifest()
            committed = (
                EpochLedger(old_m["committed_epochs"]) if old_m else EpochLedger()
            )
            if epoch_id in committed:
                # a concurrent twin committed this very epoch first:
                # exactly-once wins, our data dir becomes an orphan
                shutil.rmtree(commit_abs, ignore_errors=True)
                return {"epoch_id": epoch_id, "skipped": True}
            committed.add(epoch_id)
            if old_m is not None and int(old_m["n_buckets"]) != self.n_buckets:
                # a concurrent rebucket changed the hash function: adopt
                # the evolved count. An EMPTY epoch commits no data and
                # can proceed; a real delta's _bucket values were
                # computed under the OLD count, so rebasing would poison
                # bucket pruning — make the caller re-run the merge
                # (rows re-hash on the retry).
                self.n_buckets = int(old_m["n_buckets"])
                if not empty:
                    shutil.rmtree(commit_abs, ignore_errors=True)
                    raise CommitConflictError(
                        f"epoch {epoch_id!r}: the table was rebucketted "
                        "concurrently — re-run the merge"
                    )
            # re-unify against the WINNER's schema: rebasing with the
            # pre-race schema would silently drop a concurrent commit's
            # schema evolution (its columns vanish from the read schema)
            if old_m is not None:
                schema = unify_schemas(
                    T.StructType.fromJson(json.loads(old_m["schema"])), schema
                )
            buckets_map = (
                {k: list(v) for k, v in old_m["buckets"].items()} if old_m else {}
            )
            global_deltas = list(old_m.get("global_deltas", [])) if old_m else []
            version = old_m["version"] + 1 if old_m else 0
            if empty:
                lineage = {
                    "epoch_id": epoch_id,
                    "version": version,
                    "mode": "mor",
                    "rows_in_batch": 0,
                    "delete_rows": 0,
                }
                try:
                    self._commit_manifest(
                        version, schema, buckets_map, committed, lineage,
                        global_deltas=global_deltas,
                    )
                    return lineage
                except CommitConflictError:
                    continue
            global_deltas.append(commit_rel)
            lineage = {
                "epoch_id": epoch_id,
                "version": version,
                "mode": "mor",
                "delta_dir": commit_rel,
                "rows_in_batch": metrics_row["keys_considered"] if metrics_row else None,
                "delete_rows": metrics_row["keys_deleted"] if metrics_row else None,
                "partition_rows": partition_rows,
            }
            try:
                self._commit_manifest(
                    version, schema, buckets_map, committed, lineage,
                    new_dir=commit_rel, new_dir_kind="delta",
                    global_deltas=global_deltas,
                )
                return lineage
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"epoch {epoch_id!r}: lost the version race 16 times in a row"
        )

    def _commit_manifest(
        self,
        version: int,
        schema: T.StructType,
        buckets_map: dict,
        committed: EpochLedger,
        lineage: dict,
        new_dir: str | None = None,
        new_dir_kind: str = "base",
        global_deltas: list[str] | None = None,
    ) -> None:
        old_m = self.manifest()
        if global_deltas is None:
            global_deltas = list(old_m.get("global_deltas", [])) if old_m else []
        live = {d for dirs in buckets_map.values() for d in dirs} | set(global_deltas)
        kinds = {
            d: k
            for d, k in (old_m.get("dir_kinds", {}) if old_m else {}).items()
            if d in live
        }
        if new_dir is not None:
            kinds[new_dir] = new_dir_kind
        # per-dir parquet byte sizes, carried forward for live dirs and
        # measured ONCE for the new dir (O(epoch) at commit time): the
        # CDF 'auto' narrowing gate needs table_bytes, and walking every
        # commit dir per diff would be O(table files) on the driver for
        # every incremental refresh
        old_db = old_m.get("dir_bytes", {}) if old_m else {}
        dir_bytes = {d: old_db[d] for d in live if d in old_db}
        if new_dir is not None and new_dir not in dir_bytes:
            dir_bytes[new_dir] = _du_parquet(os.path.join(self.root, new_dir))
        # monotone-corrected commit timestamp: a later version never
        # carries an earlier ts even under clock skew / sub-ms commits,
        # so version order == timestamp order and version_at() is exact
        prev_ts = int(old_m.get("committed_at_ms", 0)) if old_m else 0
        m = {
            "version": version,
            "committed_at_ms": max(int(self.clock() * 1000), prev_ts + 1),
            "schema": json.dumps(schema.jsonValue()),
            "n_buckets": self.n_buckets,
            "key_col": self.key_col,
            "bucket_col": self.bucket_col,
            "buckets": buckets_map,
            "global_deltas": global_deltas,
            "dir_kinds": kinds,
            "dir_bytes": dir_bytes,
            "committed_epochs": (
                committed.to_json()
                if isinstance(committed, EpochLedger)
                else committed
            ),
            "lineage": lineage,
        }
        mpath = os.path.join(self.root, "manifests", f"v{version:06d}.json")
        tmp = mpath + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(m, f)
        # exclusive CLAIM of the version: link fails if another writer
        # already committed this version (POSIX-atomic; the local-FS
        # analogue of a conditional PUT / catalog compare-and-swap — on
        # an object store this line becomes If-None-Match:* or the
        # catalog's CAS). The tmp file is fully written first, so a
        # reader can never observe a partial manifest.
        try:
            os.link(tmp, mpath)
        except FileExistsError:
            raise CommitConflictError(
                f"version {version} was committed by another writer"
            )
        finally:
            os.unlink(tmp)
        # LATEST advance (monotone best-effort: the pointer is a hint and
        # current_version() probes forward past it, so a lost pointer
        # race self-heals; never move the hint backwards)
        try:
            with open(self._latest_path()) as f:
                hint = int(f.read().strip().lstrip("v"))
        except FileNotFoundError:
            hint = -1
        if version > hint:
            ltmp = self._latest_path() + f".tmp{uuid.uuid4().hex[:6]}"
            with open(ltmp, "w") as f:
                f.write(f"v{version:06d}")
            os.replace(ltmp, self._latest_path())

    # ---------------------------------------------------------- maintenance

    def _commit_rewrite(
        self,
        read_m: dict,
        schema: T.StructType,
        buckets_map: dict,
        folded: set,
        lineage_base: dict,
        commit_rel: str,
        own_delta: bool = False,
    ) -> dict:
        """Commit a maintenance rewrite (full or minor compaction) with
        rebase over intervening MOR appends: appenders only EXTEND the
        global delta chain, so the rewrite stays valid — keep the
        interveners' deltas (everything not in ``folded``) on top of the
        rewritten files, take the fresh epoch ledger, claim the next
        version. A concurrent commit that changed the BUCKET MAP
        (another compaction, a COW merge, a rebucket) invalidated the
        rewrite's read set: raise, leaving the written dir a vacuumable
        orphan — re-running the maintenance op is always safe."""
        for _ in range(16):
            old_m = self.manifest()
            if old_m["version"] != read_m["version"] and (
                old_m["buckets"] != read_m["buckets"]
                or int(old_m["n_buckets"]) != int(read_m["n_buckets"])
            ):
                raise CommitConflictError(
                    f"{lineage_base.get('epoch_id')}: a concurrent commit "
                    "rewrote buckets during this maintenance op — re-run it"
                )
            if not folded <= set(old_m.get("global_deltas", [])):
                # someone else already folded (part of) our input chain —
                # e.g. a concurrent minor compaction. Rebasing would stack
                # a duplicate merged span, or worse: a purge compaction
                # would commit on top of a merged delta that still carries
                # the tombstones it just reported purging (silent GDPR
                # resurrection). The op must re-run against fresh state.
                raise CommitConflictError(
                    f"{lineage_base.get('epoch_id')}: a concurrent "
                    "compaction folded this op's input deltas — re-run it"
                )
            # winner's schema evolution survives the rebase
            out_schema = unify_schemas(
                T.StructType.fromJson(json.loads(old_m["schema"])), schema
            )
            survivors = [
                d for d in old_m.get("global_deltas", []) if d not in folded
            ]
            global_deltas = (
                [commit_rel] + survivors if own_delta else survivors
            )
            lineage = dict(lineage_base, version=old_m["version"] + 1)
            try:
                self._commit_manifest(
                    lineage["version"], out_schema, buckets_map,
                    # ledger from the SAME snapshot as version/chain (a
                    # separate read could straddle a concurrent commit
                    # and drop its epoch from the new manifest)
                    EpochLedger(old_m["committed_epochs"]), lineage,
                    new_dir=commit_rel,
                    new_dir_kind="delta" if own_delta else "base",
                    global_deltas=global_deltas,
                )
                return lineage
            except CommitConflictError:
                continue
        raise CommitConflictError(
            f"{lineage_base.get('epoch_id')}: lost the version race 16 times"
        )

    def compact(
        self,
        purge_tombstones_below_seq: int | None = None,
        sort_within_buckets: bool = False,
    ) -> dict:
        """Rewrite the whole snapshot into a single commit dir (the
        reference's small-file compaction job, scripts/compact_silver.py:36-42,
        generalized: Iceberg rewrite_data_files). Tombstones older than the
        given seq horizon can be purged here — safe once no event below that
        seq can still arrive (the watermark contract), exactly like Kafka
        log-compaction's delete.retention.

        ``sort_within_buckets=True`` key-sorts each bucket's rows before
        the write (a sortWithinPartitions — no extra shuffle beyond the
        compaction's own repartition). Parquet row-group min/max stats on
        the key column then become DISJOINT RANGES, so the key-equality
        filters ``lookup()`` pushes down (PushedFilters on the scan) skip
        every row group but the probed keys' — at 10^10 rows a point read
        touches ~1 row group per key instead of the whole bucket. Same
        idea as Iceberg's sort-order table property / Z-order for 1-D.

        Safe to run CONCURRENT with MOR appenders (the 10^10-scale
        deployment: a scheduled rewrite job under a live stream): the
        compaction folds the state as of its read version, and if an
        appender commits meanwhile, the commit loop rebases — the
        compacted base replaces the buckets, folded deltas drop, and
        the interveners' deltas survive on top (LWW is order-free, so
        base ∪ late-delta resolves identically either way). A concurrent
        commit that rewrote BUCKETS (another compaction, a COW merge,
        a rebucket) raises ``CommitConflictError`` instead — re-run."""
        m = self.manifest()
        if m is None:
            return {"skipped": True}
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        df = self.read(version=m["version"])
        if purge_tombstones_below_seq is not None:
            df = df.filter(
                ~(
                    F.coalesce(F.col(self.DEL_COL), F.lit(False))
                    & (F.col(self.SEQ_COL) < purge_tombstones_below_seq)
                )
            )
        version = m["version"] + 1
        commit_rel = os.path.join(
            "commits", f"c_{version:06d}_compact_{uuid.uuid4().hex[:6]}"
        )
        commit_abs = os.path.join(self.root, commit_rel)
        out = df.repartition(self.n_buckets, F.col(self.BUCKET_COL))
        if sort_within_buckets:
            out = out.sortWithinPartitions(self.BUCKET_COL, self.key_col)
        (
            out.write.mode("overwrite")
            .partitionBy(self.BUCKET_COL)
            .parquet(commit_abs)
        )
        buckets_map = {
            d.split("=", 1)[1]: [commit_rel]
            for d in os.listdir(commit_abs)
            if d.startswith(f"{self.BUCKET_COL}=")
        }
        folded = set(m.get("global_deltas", []))
        return self._commit_rewrite(
            m, schema, buckets_map, folded,
            {"epoch_id": "__compaction", "compaction": True},
            commit_rel,
        )

    def rebucket(self, n_buckets: int, sort_within_buckets: bool = False) -> dict:
        """Online bucket-count evolution: rewrite the snapshot under a
        NEW bucket count in one commit (Iceberg's bucket-transform spec
        evolution + rewrite_data_files, as one operation). The 100 TB
        motivation: a table sized at 32 buckets when small eventually
        serves multi-GB buckets — lookups read too much, merges shuffle
        too coarsely — and the fix must not stop ingest.

        Semantics: state-preserving (rows AND tombstones carry over with
        their ``_seq``, so the anti-resurrection guard survives), the
        epoch ledger carries over (replayed epochs still skip), and the
        new count takes effect for every subsequent merge/probe. Older
        snapshots remain readable: per-version probes hash with the
        bucket count IN FORCE at that version (``_n_buckets_at``), and a
        pure rebucket produces ZERO rows in ``changes()`` — the
        cross-boundary diff degrades to a full-state diff (every
        bucket's commit list changed) but filters to same-``_seq``
        nothing, exactly like a pure compaction."""
        if n_buckets < 1:
            raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
        m = self.manifest()
        if m is None:
            # nothing committed yet: the new count simply takes effect
            self.n_buckets = int(n_buckets)
            return {"skipped": True, "n_buckets": self.n_buckets}
        if int(n_buckets) == self.n_buckets:
            return {"skipped": True, "n_buckets": self.n_buckets}
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        df = self.read(version=m["version"])
        old_n = self.n_buckets
        self.n_buckets = int(n_buckets)
        try:
            df = df.drop(self.BUCKET_COL).withColumn(
                self.BUCKET_COL, self.bucket_expr()
            )
            # a rebucket changes the hash function itself, so ANY
            # concurrent commit invalidates it: the claim targets exactly
            # m.version + 1, so an intervening commit forces
            # CommitConflictError and the op must be re-run (stop-the-
            # world by design; appenders can keep running and simply win
            # the race)
            version = m["version"] + 1
            commit_rel = os.path.join(
                "commits", f"c_{version:06d}_rebucket_{uuid.uuid4().hex[:6]}"
            )
            commit_abs = os.path.join(self.root, commit_rel)
            out = df.repartition(self.n_buckets, F.col(self.BUCKET_COL))
            if sort_within_buckets:
                out = out.sortWithinPartitions(self.BUCKET_COL, self.key_col)
            (
                out.write.mode("overwrite")
                .partitionBy(self.BUCKET_COL)
                .parquet(commit_abs)
            )
            buckets_map = {
                d.split("=", 1)[1]: [commit_rel]
                for d in os.listdir(commit_abs)
                if d.startswith(f"{self.BUCKET_COL}=")
            }
            lineage = {
                "epoch_id": "__rebucket",
                "version": version,
                "rebucket": {"from": old_n, "to": self.n_buckets},
            }
            self._commit_manifest(
                version, schema, buckets_map,
                EpochLedger(m["committed_epochs"]), lineage,
                new_dir=commit_rel, new_dir_kind="base", global_deltas=[],
            )
        except BaseException:
            # ANY failure before the manifest claim lands (write error,
            # version conflict, interrupt) leaves the on-disk table at
            # the OLD count: keep the handle consistent with it, or every
            # later merge on this handle would hash rows under the new
            # count and COW would miss stored rows (duplicate live rows)
            self.n_buckets = old_n
            raise
        return lineage

    def compact_minor(self) -> dict:
        """Minor compaction (Hudi-style): collapse the pending DELTA CHAIN
        into one merged delta WITHOUT rewriting the base files — cost is
        O(deltas), not O(table). Correct because the LWW resolve
        (max_by over (_seq, tie)) is associative: resolving the deltas
        among themselves and later resolving against the base gives the
        same winner as resolving everything at once. Tombstones stay as
        rows, so the anti-resurrection guard survives. Use this when the
        chain grows but a full rewrite (``compact``) is too expensive —
        at 100 TB the base rewrite is a rare scheduled job while minor
        compaction can run every few epochs."""
        m = self.manifest()
        gdeltas = m.get("global_deltas", []) if m else []
        if m is None or len(gdeltas) < 2:
            return {"skipped": True}
        schema = T.StructType.fromJson(json.loads(m["schema"]))
        ddf = self.spark.read.schema(self._data_schema(schema)).parquet(
            *[os.path.join(self.root, d) for d in gdeltas]
        )
        ddf = conform(ddf, self._data_schema(schema))
        merged = self._resolve(ddf, schema)
        commit_rel = os.path.join(
            "commits",
            f"c_{m['version'] + 1:06d}_minor_{uuid.uuid4().hex[:6]}",
        )
        commit_abs = os.path.join(self.root, commit_rel)
        merged.write.mode("overwrite").parquet(commit_abs)
        # rebase-safe like compact(): deltas appended by concurrent MOR
        # writers survive AFTER the merged delta (resolve is order-free)
        return self._commit_rewrite(
            m, schema,
            {k: list(v) for k, v in m["buckets"].items()},
            set(gdeltas),
            {"epoch_id": "__minor_compaction", "minor_compaction": True,
             "deltas_merged": len(gdeltas)},
            commit_rel,
            own_delta=True,
        )

    def maybe_compact(self, max_deltas: int = 16, minor: bool = True) -> dict | None:
        """Maintenance policy: compact when the unresolved delta chain
        exceeds ``max_deltas`` — bounds MOR read amplification the way
        Hudi's compaction scheduling / Iceberg's rewrite policies do. Call
        it from the replay loop; it is a no-op otherwise. Defaults to
        MINOR compaction (collapse the delta chain, O(deltas)) — the full
        O(table) base rewrite is a rare scheduled job (``compact()``),
        not an every-few-epochs policy.

        A lost commit race (another worker compacted or rewrote buckets
        concurrently) is swallowed, not raised: this is a POLICY hook —
        the table was maintained either way, and the policy re-evaluates
        on the next epoch. Direct ``compact()``/``compact_minor()``
        calls still raise so a dedicated maintenance job sees the
        conflict."""
        m = self.manifest()
        if m is None or len(m.get("global_deltas", [])) < max_deltas:
            return None
        try:
            return self.compact_minor() if minor else self.compact()
        except CommitConflictError:
            return None

    def expire_snapshots(self, keep_last: int = 8, older_than_s: float = 0.0) -> dict:
        """Metadata + data retention (Iceberg ``expire_snapshots``): keep
        only the newest ``keep_last`` version manifests, then remove every
        commit dir no kept manifest references. Without this, one manifest
        file per version accumulates forever — at an epoch a minute that
        is ~0.5M driver-side files a year — and expired versions' commit
        dirs (which ``expire_orphans`` never touches, since it only reads
        LATEST) pin their data on disk. Time travel stays available within
        the kept horizon and raises FileNotFoundError beyond it.

        Like ``expire_orphans``, the commit-dir sweep can race an
        in-flight writer (its data dir exists before the manifest claim):
        pass ``older_than_s`` greater than the longest expected commit
        duration when writers may be live — Iceberg's
        remove_orphan_files retention interval. ``older_than_s`` also
        guards MANIFEST removal (a manifest file doubles as the
        exclusive version-claim marker: deleting a version a stalled
        writer is about to claim would let the stale claim SUCCEED and
        silently strand its epoch — a writer stalled longer than the
        retention interval is outside the contract, as in Iceberg)."""
        cur = self.current_version()
        out = {"removed_manifests": [], "removed_commits": []}
        if cur is None:
            return out
        # heal the LATEST hint first: a lost pointer race can leave it
        # below cur, and trimming manifests in the gap ABOVE a stale hint
        # would break current_version()'s contiguous forward probe
        try:
            with open(self._latest_path()) as f:
                hint = int(f.read().strip().lstrip("v"))
        except FileNotFoundError:
            hint = -1
        if hint < cur:
            ltmp = self._latest_path() + f".tmp{uuid.uuid4().hex[:6]}"
            with open(ltmp, "w") as f:
                f.write(f"v{cur:06d}")
            os.replace(ltmp, self._latest_path())
        horizon = cur - max(1, keep_last) + 1
        mdir = os.path.join(self.root, "manifests")
        mcutoff = time.time() - older_than_s
        live: set[str] = set()
        for name in sorted(os.listdir(mdir)):
            if not (name.startswith("v") and name.endswith(".json")):
                continue
            v = int(name[1:-5])
            keep = v >= horizon
            if not keep and older_than_s > 0:
                try:
                    keep = os.path.getmtime(os.path.join(mdir, name)) > mcutoff
                except FileNotFoundError:
                    continue
            if keep:
                m = self.manifest(v)
                live |= {d for dirs in m["buckets"].values() for d in dirs}
                live |= set(m.get("global_deltas", []))
            else:
                os.remove(os.path.join(mdir, name))
                out["removed_manifests"].append(name)
        cdir = os.path.join(self.root, "commits")
        # a table whose only committed epochs were empty has manifests but
        # no commits dir (the empty-batch path commits a manifest without
        # ever writing commit data) — nothing to expire there
        cutoff = time.time() - older_than_s
        for d in os.listdir(cdir) if os.path.isdir(cdir) else []:
            rel = os.path.join("commits", d)
            path = os.path.join(cdir, d)
            if rel in live:
                continue
            try:
                if older_than_s > 0 and os.path.getmtime(path) > cutoff:
                    continue  # possibly an in-flight commit: keep
            except FileNotFoundError:
                continue
            shutil.rmtree(path)
            out["removed_commits"].append(rel)
        return out

    def expire_orphans(self, older_than_s: float = 0.0) -> list[str]:
        """Remove commit dirs unreferenced by the latest manifest (vacuum).
        Old manifests lose time-travel to expired commits, like Iceberg's
        expire_snapshots.

        ``older_than_s``: only remove dirs whose mtime is at least this
        old (Iceberg remove_orphan_files' ``older_than``). With
        CONCURRENT writers an in-flight commit's data dir exists before
        its manifest claim, so a zero-interval vacuum racing a writer
        could delete data about to be committed — set this to comfortably
        more than the longest expected commit duration (e.g. 600+) when
        writers may be live; 0 (the default) keeps the single-operator
        semantics where the caller knows no commit is in flight."""
        m = self.manifest()
        if m is None:
            return []
        live = {d for dirs in m["buckets"].values() for d in dirs} | set(
            m.get("global_deltas", [])
        )
        removed = []
        cdir = os.path.join(self.root, "commits")
        # same empty-epochs-only guard as expire_snapshots
        if not os.path.isdir(cdir):
            return removed
        cutoff = time.time() - older_than_s
        for d in os.listdir(cdir):
            rel = os.path.join("commits", d)
            path = os.path.join(cdir, d)
            if rel in live:
                continue
            try:
                if older_than_s > 0 and os.path.getmtime(path) > cutoff:
                    continue  # possibly an in-flight commit: keep
            except FileNotFoundError:
                continue  # a concurrent vacuum got it first
            shutil.rmtree(path)
            removed.append(rel)
        return removed
