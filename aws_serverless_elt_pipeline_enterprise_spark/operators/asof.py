"""As-of join: each probe row joined to the latest versioned row at or
before it — the operator behind point-in-time enrichment (attribution,
slowly-changing-dimension lookups, CDC state-as-of).

Spark has no native ASOF JOIN (DuckDB does; the oracle uses it). A range
join (l.t >= r.t) explodes to O(|L| x |R|) per key, so the
implementation is the union+window trick instead:

  1. tag probe rows side=0, versioned rows side=1, union them
  2. one window per key ordered by (t, side DESC) — a versioned row at
     the same t sorts BEFORE the probe, so "at or before" is inclusive
  3. last(value, ignorenulls) over rows-unbounded-preceding carries the
     latest versioned payload forward
  4. keep only probe rows

Cost: ONE shuffle on the key (the window sort), no join, no row
explosion — the right scale shape for 10^10 rows. Skewed keys: the
window sort on a hot key is a single-task sort; pre-salting can't apply
(the carry-forward needs the full per-key order), so at extreme skew
split hot keys into time-range slices and stitch the boundary rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key: str,
    on: str,
    value_cols: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every probe row: the latest ``versions`` row with the same
    ``key`` and ``versions.on <= probes.on`` (inclusive). Returns all
    probe columns plus ``<prefix><value_col>`` (NULL when no versioned
    row precedes the probe)."""
    probe_cols = probes.columns
    # the payload rides as ONE struct: a struct row is never NULL even if
    # its fields are, so last(ignorenulls) matches the ROW the way a real
    # ASOF JOIN does instead of skipping past null-valued versions
    # a version with no timestamp can never be "at or before" anything —
    # a real ASOF join (and the DuckDB oracle) never matches it, but
    # Spark's nulls-first ascending sort would have carried its payload
    # into every probe that lacks an earlier real version
    r = versions.filter(F.col(on).isNotNull()).select(
        F.col(key),
        F.col(on).alias("_t"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
    ).withColumn("_side", F.lit(1))
    l = probes.withColumn("_t", F.col(on)).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)
    # third sort key: multiple versioned rows sharing one (key, t) —
    # same-timestamp updates are normal in CDC — would otherwise resolve
    # by shuffle arrival order (replay-unstable); the payload hash gives
    # them a deterministic total order, mirroring lww.py's tiebreaker.
    # to_json (not bare xxhash64 of fields) so null-shifted payloads
    # cannot alias. Probes order among themselves irrelevantly (their
    # _payload is NULL and last(ignorenulls) skips them).
    w = (
        Window.partitionBy(key)
        .orderBy(
            F.col("_t"), F.desc("_side"), F.xxhash64(F.to_json(F.struct("_payload")))
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("_payload", ignorenulls=True).over(w)
    return (
        u.select(
            *probe_cols,
            F.col("_side"),
            *[carried[c].alias(f"{prefix}{c}") for c in value_cols],
        )
        .filter(F.col("_side") == 0)
        .drop("_side")
    )
