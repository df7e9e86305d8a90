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
explosion — the right scale shape for 10^10 rows.

Skew: the per-key window cannot be salted (the carry-forward needs the
full per-key order), so a hot key is a single-task sort. Mitigation
(``hot_threshold``): keys above the threshold are split into
``n_slices`` TIME-RANGE slices (percentile_approx boundaries, so bursty
timestamps still balance), the carry runs within each (key, slice)
task, and the boundary is stitched by a tiny per-(key, slice)
"last version payload" table whose running carry-in (a window over at
most n_slices rows per hot key) is broadcast back. Detection is a
sampled count probe sized so the uniform case pays one cheap
partial-aggregable scan and nothing else — the window plan for cold
keys is byte-identical to the unmitigated path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# probe sampling: expect ~this many sampled rows for a key exactly at
# hot_threshold; detection fires at half that (Poisson(50) puts the
# false-negative rate for a truly-hot key below 1e-4). Thresholds
# <= _PROBE_TARGET rows degrade to an exact count (fraction 1.0).
_PROBE_TARGET = 50.0


def _payload_order(t_col: str = "_t"):
    """The total order that resolves same-timestamp versions: (t, payload
    hash). to_json (not bare xxhash64 of fields) so null-shifted payloads
    cannot alias — mirrors lww.py's tiebreaker. Used by BOTH the in-slice
    window sort and the cross-slice stitch aggregate, which must agree."""
    return [
        F.col(t_col),
        F.xxhash64(F.to_json(F.struct("_payload"))),
    ]


def _carry(df: DataFrame, part_cols: list[str]) -> F.Column:
    w = (
        Window.partitionBy(*part_cols)
        .orderBy(F.col("_t"), F.desc("_side"), _payload_order()[1])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.last("_payload", ignorenulls=True).over(w)


def _find_hot_keys(u: DataFrame, key: str, hot_threshold: int) -> list:
    """Keys with (approximately) >= hot_threshold rows. For large
    thresholds this counts a seeded sample (fraction 50/threshold), so
    the probe is one cheap scan + a tiny partial-aggregable count; for
    small thresholds (tests) it is exact. Returns a driver-side list —
    by construction at most |u|/threshold keys qualify."""
    frac = min(1.0, _PROBE_TARGET / hot_threshold)
    sampled = u.select(key) if frac >= 1.0 else u.select(key).sample(frac, seed=7)
    cutoff = hot_threshold if frac >= 1.0 else hot_threshold * frac / 2.0
    hot = (
        sampled.groupBy(key)
        .count()
        .filter(F.col("count") >= cutoff)
        .select(key)
        .collect()
    )
    return [r[key] for r in hot]


def _sliced_carry(
    hot: DataFrame, key: str, n_slices: int
) -> DataFrame:
    """The hot-key path: time-range slices + in-slice carry + boundary
    stitch. Returns ``hot`` plus a ``_carried`` payload column equal to
    what the single-window carry would have produced."""
    # equal-depth slice boundaries per key: percentile_approx is a
    # partial-aggregable sketch, so bursty event-time distributions
    # still yield balanced slices (uniform time-width slicing would not)
    qs = [i / n_slices for i in range(1, n_slices)]
    bounds = hot.groupBy(key).agg(
        F.percentile_approx(F.col("_t").cast("double"), qs, 10_000).alias("_bounds")
    )
    sliced = hot.join(F.broadcast(bounds), key).withColumn(
        # rows with equal _t always land in the same slice (boundary
        # comparison is on the value), so same-timestamp tie-breaks
        # never straddle a slice
        "_slice",
        F.size(F.filter("_bounds", lambda b: b <= F.col("_t").cast("double"))),
    )
    # in-slice carry: the hot key's sort now runs as n_slices tasks
    in_slice = _carry(sliced, [key, "_slice"])
    # stitch: last version payload per (key, slice) — a partial-agg
    # max_by over versions only, n_hot_keys x n_slices rows — then the
    # running carry-in from strictly earlier slices
    lastp = (
        sliced.filter(F.col("_side") == 1)
        .groupBy(key, "_slice")
        .agg(F.max_by("_payload", F.struct(*_payload_order())).alias("_last_p"))
    )
    # the carry-in grid is every (key, slice) pair BY CONSTRUCTION
    # (n_hot x n_slices rows from the tiny bounds table) — no extra
    # distinct-shuffle over the hot rows; version-less slices simply
    # carry the previous slice's payload forward
    grid = bounds.select(
        key, F.explode(F.sequence(F.lit(0), F.lit(n_slices - 1))).alias("_slice")
    ).join(lastp, [key, "_slice"], "left")
    w_in = (
        Window.partitionBy(key)
        .orderBy("_slice")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry_in = grid.select(
        key,
        "_slice",
        F.last("_last_p", ignorenulls=True).over(w_in).alias("_carry_in"),
    )
    return (
        sliced.join(F.broadcast(carry_in), [key, "_slice"], "left")
        .withColumn("_carried", F.coalesce(in_slice, F.col("_carry_in")))
        .drop("_bounds", "_slice", "_carry_in")
    )


def asof_join(
    probes: DataFrame,
    versions: DataFrame,
    key: str,
    on: str,
    value_cols: list[str],
    prefix: str = "asof_",
    hot_threshold: int | None = 2_000_000,
    n_slices: int = 32,
    hot_keys: list | None = None,
) -> DataFrame:
    """For every probe row: the latest ``versions`` row with the same
    ``key`` and ``versions.on <= probes.on`` (inclusive). Returns all
    probe columns plus ``<prefix><value_col>`` (NULL when no versioned
    row precedes the probe).

    ``hot_threshold``: keys with more rows than this take the sliced
    path (module docstring); ``None`` disables the detection PROBE.
    ``hot_keys``: explicit hot-key list, skipping the count probe; an
    explicit list is honored even with ``hot_threshold=None`` (the
    caller asked for slicing). For the guaranteed single-window plan
    pass ``hot_threshold=None, hot_keys=None`` (the probe off and no
    forced keys); for a probe-free uniform plan pass ``hot_keys=[]``."""
    probe_cols = probes.columns
    # the payload rides as ONE struct: a struct row is never NULL even if
    # its fields are, so last(ignorenulls) matches the ROW the way a real
    # ASOF JOIN does instead of skipping past null-valued versions
    # a version with no timestamp can never be "at or before" anything —
    # a real ASOF join (and the DuckDB oracle) never matches it, but
    # Spark's nulls-first ascending sort would have carried its payload
    # into every probe that lacks an earlier real version
    # NULL-key versions can never match any probe: ASOF equality is SQL
    # equality (NULL = NULL is not true — DuckDB's native ASOF JOIN and
    # this operator must agree), but Window.partitionBy groups NULLs
    # into ONE partition, which would have carried a null-key version's
    # payload into every null-key probe. Null-key PROBES still come back
    # (left-join semantics) with a NULL payload.
    r = versions.filter(
        F.col(on).isNotNull() & F.col(key).isNotNull()
    ).select(
        F.col(key),
        F.col(on).alias("_t"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_payload"),
    ).withColumn("_side", F.lit(1))
    l = probes.withColumn("_t", F.col(on)).withColumn("_side", F.lit(0))
    u = l.unionByName(r, allowMissingColumns=True)

    if hot_threshold is not None and hot_keys is None:
        hot_keys = _find_hot_keys(u, key, hot_threshold)

    def finish(df: DataFrame, carried: F.Column) -> DataFrame:
        return (
            df.select(
                *probe_cols,
                F.col("_side"),
                *[carried[c].alias(f"{prefix}{c}") for c in value_cols],
            )
            .filter(F.col("_side") == 0)
            .drop("_side")
        )

    # a NULL key sorts into its own window partition; it always takes the
    # cold path (isin(NULL) is NULL, which would silently DROP those rows
    # from both branches) — a hot null-key group stays a single-task sort
    hot_keys = [k for k in (hot_keys or []) if k is not None]
    if not hot_keys:
        return finish(u, _carry(u, [key]))
    is_hot = F.col(key).isin(hot_keys)
    cold = finish(
        u.filter(~is_hot | F.col(key).isNull()), _carry(u, [key])
    )
    hot_df = _sliced_carry(u.filter(is_hot), key, n_slices)
    hot_out = finish(hot_df, F.col("_carried"))
    return cold.unionByName(hot_out)
