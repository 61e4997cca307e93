"""Incrementally-maintained materialized views over manifest tables.

The reference recomputes derived tables from scratch on every run (its
scripts re-read the full parquet each cycle). At 100 TB a derived
aggregate must instead be maintained from the COMMIT LOG: the manifest
layer (sources/manifest.py) already gives every table an append-log
shape — each append commit adds one immutable segment — so a refresh
only has to aggregate the segments added since the last refresh and
merge those partials into the stored view state. That is the classic
incremental-view-maintenance contract for distributive aggregates
(count / sum / min / max, avg as sum+count), and the per-refresh cost
is O(new data), not O(table).

Correctness at scale hinges on two choices made here:

* **Partials are exact.** SUM/AVG partials are stored as
  DECIMAL(38,6), not DOUBLE — float addition is non-associative, so a
  view merged incrementally in a different order than a from-scratch
  aggregation would drift bitwise. Decimal partials make
  refresh-then-read equal recompute-from-scratch exactly (the gated
  ``mv_event_daily_totals`` query hash-asserts this against DuckDB).
* **Rewrites fall back.** MIN/MAX (and any distributive agg) cannot be
  incrementally maintained under row DELETION. A refresh therefore
  verifies the base's current segment list still EXTENDS the list the
  view last saw; any rewrite commit (delete_rows, compact, overwrite)
  triggers a full recompute instead of a wrong delta-merge. Appends —
  the hot path — stay O(batch).

``approx_distinct`` state is a Datasketches HLL sketch column
(hll_sketch_agg partials, hll_union combine, estimate on read) —
the standard answer to COUNT DISTINCT not being distributive; the
estimate is sketch-deterministic, so incremental == from-scratch
still holds exactly (asserted in tests), while accuracy is the
usual HLL ±2%% band.

``hist`` state is a fixed-bin histogram (array of bins+2 long counts
over a PINNED [lo, hi) range, underflow/overflow bins at the ends) —
the mergeable answer to quantiles not being distributive: partials
add element-wise in any order, and read projects step-quantiles (the
upper edge of the first bucket whose cumulative count reaches
ceil(q*N)). Every piece — the bucket formula, the integer cumsum,
the bin-edge arithmetic — is replayed verbatim by the DuckDB oracle,
so incremental == from-scratch is hash-certified bitwise, while
accuracy is the bin width (pick bins for the dashboard's tolerance).

View state lives in its own manifest table (atomic snapshot commits,
time travel, CAS via ``expect_version``); the view spec rides INSIDE
each state commit's manifest document (``meta["mv_spec"]``), so spec
and state publish in one atomic ``os.replace`` — no window where one
exists without the other.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from asset_prices_parquet_saver_spark.sources import manifest as mf

MV_SPEC = "_MV_SPEC"

#: exact partial type for sum/avg state (order-independent combine)
_DEC = "decimal(38,6)"

_KINDS = ("count", "count_col", "sum", "min", "max", "avg",
          "approx_distinct", "hist")


def _spec_path(mv_table: str) -> str:
    return os.path.join(mv_table, MV_SPEC)


def _spec_snapshot(mv_table: str) -> tuple[int | None, dict]:
    """``(view version, spec)`` from ONE manifest-document read. The
    spec is published ATOMICALLY with its state: it rides in the state
    commit's manifest document (``meta["mv_spec"]``), so a reader can
    never observe state whose spec is missing or stale — the sibling
    ``_MV_SPEC`` file this replaced was deleted by the manifest's
    post-publish legacy sweep on every commit after the first, and a
    crash between the state commit and the spec rewrite bricked the
    view. The file path survives only as a read fallback for views
    created before the migration (their next refresh publishes the
    spec into the manifest).

    Returning the version from the SAME document matters: readers that
    fetched the spec and the state as two separate manifest reads
    could pair version-N spec with version-N+1 state when a concurrent
    refresh landed between them. Pin the data read with
    ``read_versioned(version=...)`` (history copies are immutable) and
    refresh commits with ``expect_version=`` the returned version."""
    doc = mf.manifest_doc(mv_table)
    version = None if doc is None else int(doc["version"])
    meta = (doc or {}).get("meta") or {}
    if "mv_spec" in meta:
        return version, meta["mv_spec"]
    try:
        with open(_spec_path(mv_table)) as fh:
            return version, json.load(fh)
    except FileNotFoundError:
        raise FileNotFoundError(
            f"{mv_table} has no MV spec (not a materialized view?)"
        ) from None


def _read_spec(mv_table: str) -> dict:
    return _spec_snapshot(mv_table)[1]


def _state_cols(aggs: list[list]) -> list[tuple]:
    """Flatten the agg spec into hidden state columns:
    (state_col, combine_kind, input_col, params). ``params`` is the
    optional 4th spec element (only ``hist`` uses it: pinned lo / hi /
    bins / quantiles — pinned so every partial buckets identically and
    the spec survives JSON round-trips)."""
    cols: list[tuple] = []
    for entry in aggs:
        out, kind, col = entry[0], entry[1], entry[2]
        params = entry[3] if len(entry) > 3 else None
        if kind == "count":
            cols.append((f"__{out}_cnt", "add", None, None))
        elif kind == "count_col":
            cols.append((f"__{out}_cnt", "add", col, None))
        elif kind == "sum":
            cols.append((f"__{out}_sum", "addnull", col, None))
        elif kind == "min":
            cols.append((f"__{out}_min", "least", col, None))
        elif kind == "max":
            cols.append((f"__{out}_max", "greatest", col, None))
        elif kind == "avg":
            cols.append((f"__{out}_sum", "addnull", col, None))
            cols.append((f"__{out}_cnt", "add", col, None))
        elif kind == "approx_distinct":
            cols.append((f"__{out}_hll", "hll", col, None))
        elif kind == "hist":
            cols.append((f"__{out}_hist", "histadd", col, params))
        else:
            raise ValueError(f"unknown agg kind {kind!r}; one of {_KINDS}")
    return cols


def _partial_agg(df: DataFrame, spec: dict) -> DataFrame:
    """One map-side-combinable aggregation producing the hidden state
    columns for a slice of the base table (the whole table on create /
    full refresh, only the new segments on incremental refresh)."""
    if spec.get("projection"):
        df = df.selectExpr(*spec["projection"])
    exprs = []
    seen = set()
    for state, kind, col, params in _state_cols(spec["aggs"]):
        if state in seen:  # avg shares its sum with an explicit sum
            continue
        seen.add(state)
        if kind == "add" and col is None:
            exprs.append(F.count(F.lit(1)).alias(state))
        elif kind == "add":
            exprs.append(F.count(F.col(col)).alias(state))
        elif kind == "addnull":
            exprs.append(F.sum(F.col(col).cast(_DEC)).alias(state))
        elif kind == "least":
            exprs.append(F.min(F.col(col)).alias(state))
        elif kind == "greatest":
            exprs.append(F.max(F.col(col)).alias(state))
        elif kind == "hll":
            # Datasketches HLL: the canonical MERGEABLE distinct-count
            # partial — a view can absorb appends without ever seeing
            # the history (exact COUNT DISTINCT is not distributive).
            # The sketch accepts int/long/string/binary only, so hash
            # the value's string form (deterministic per engine; NULLs
            # are ignored, matching COUNT(DISTINCT col))
            exprs.append(
                F.hll_sketch_agg(F.col(col).cast("string")).alias(state)
            )
        elif kind == "histadd":
            # fixed-bin histogram: the mergeable quantile state.
            # bins+2 conditional counts (underflow, B in-range bins,
            # overflow) — every bucket expression is the SAME double
            # arithmetic the oracle replays, so incremental ==
            # from-scratch holds bitwise on the counts; NULLs fall
            # through every WHEN and are never counted.
            lo, hi = float(params["lo"]), float(params["hi"])
            bins = int(params["bins"])
            v = F.col(col).cast("double")
            b = (
                F.when(v < lo, 0)
                .when(v >= hi, bins + 1)
                .otherwise(
                    (F.floor((v - lo) * bins / (hi - lo)) + 1).cast("int")
                )
            )
            exprs.append(
                F.array(
                    *[F.count(F.when(b == i, 1)) for i in range(bins + 2)]
                ).alias(state)
            )
    return df.groupBy(*[F.col(g) for g in spec["group_cols"]]).agg(*exprs)


def _combine(old: DataFrame, delta: DataFrame, spec: dict) -> DataFrame:
    """Merge two partial-state relations: one null-safe full-outer join
    on the group keys, then a combinable expression per state column.
    This is the only shuffle an incremental refresh performs beyond the
    delta aggregation itself, and it is keyed on the view's (small)
    group-key space, not the base table."""
    keys = spec["group_cols"]
    o = old.withColumn("__o", F.lit(True)).alias("o")
    d = delta.withColumn("__d", F.lit(True)).alias("d")
    cond = None
    for k in keys:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    j = o.join(d, cond, "full_outer")
    both = F.col("o.__o").isNotNull() & F.col("d.__d").isNotNull()
    proj = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    seen = set()
    for state, kind, _c, _p in _state_cols(spec["aggs"]):
        if state in seen:
            continue
        seen.add(state)
        ov, dv = F.col(f"o.{state}"), F.col(f"d.{state}")
        if kind == "add":
            merged = F.when(both, ov + dv).otherwise(F.coalesce(ov, dv))
        elif kind == "addnull":
            # SUM keeps NULL for all-NULL groups: combine only treats
            # NULL as zero when the other side has a real partial
            merged = F.when(
                both & ov.isNotNull() & dv.isNotNull(), ov + dv
            ).otherwise(F.coalesce(ov, dv))
        elif kind == "least":
            merged = F.least(ov, dv)  # least/greatest skip NULLs
        elif kind == "hll":
            # hll_sketch_agg over an all-NULL batch yields a NULL
            # partial; union only when BOTH sides hold a real sketch,
            # else keep whichever exists (mirrors the addnull guard —
            # without it the NULL side silently erased the real one)
            merged = F.when(
                both & ov.isNotNull() & dv.isNotNull(), F.hll_union(ov, dv)
            ).otherwise(F.coalesce(ov, dv))
        elif kind == "histadd":
            # element-wise add; a group present on one side only keeps
            # its array (same guard shape as the other kinds)
            merged = F.when(
                both & ov.isNotNull() & dv.isNotNull(),
                F.zip_with(ov, dv, lambda a, b: a + b),
            ).otherwise(F.coalesce(ov, dv))
        else:
            merged = F.greatest(ov, dv)
        if kind == "addnull":
            # decimal add widens precision; pin the state type stable
            merged = merged.cast(_DEC)
        proj.append(merged.alias(state))
    return j.select(*proj)


def _hist_quantile_cols(out: str, params: dict) -> list:
    """Step-quantile projections from a histogram state array: for each
    requested quantile q, the UPPER EDGE of the first bucket whose
    cumulative count reaches ceil(q * N) — integer logic plus one
    double bin-edge formula, both replayed verbatim by the oracle (no
    within-bin interpolation, so there is nothing float-ordering-
    dependent to drift). Underflow clamps to lo, overflow to hi;
    all-NULL groups (N = 0) yield NULL."""
    arr = F.col(f"__{out}_hist")
    lo, hi = float(params["lo"]), float(params["hi"])
    bins = int(params["bins"])
    zero = F.lit(0).cast("long")
    n = F.aggregate(arr, zero, lambda a, x: a + x)
    cols = []
    for name, q in params["quantiles"].items():
        target = F.ceil(F.lit(float(q)) * n)
        # one pass: carry (cumulative, first-index-reaching-target,
        # position); outer refs (target) are legal in HOF lambdas
        idx = F.aggregate(
            arr,
            F.struct(
                zero.alias("cum"),
                F.lit(-1).alias("idx"),
                F.lit(0).alias("pos"),
            ),
            lambda acc, x: F.struct(
                (acc["cum"] + x).alias("cum"),
                F.when(acc["idx"] >= 0, acc["idx"])
                .when(acc["cum"] + x >= target, acc["pos"])
                .otherwise(F.lit(-1))
                .alias("idx"),
                (acc["pos"] + 1).alias("pos"),
            ),
            lambda acc: acc["idx"],
        )
        qcol = (
            F.when(n == 0, F.lit(None).cast("double"))
            .when(idx <= 0, F.lit(lo))
            .when(idx >= bins + 1, F.lit(hi))
            .otherwise(
                F.lit(lo) + (idx * (F.lit(hi) - F.lit(lo))) / F.lit(float(bins))
            )
        )
        cols.append(F.round(qcol, 6).alias(f"{out}_{name}"))
    return cols


def _finalize(state: DataFrame, spec: dict) -> DataFrame:
    """Project the user-facing view columns from the hidden state."""
    proj = [F.col(g) for g in spec["group_cols"]]
    for entry in spec["aggs"]:
        out, kind = entry[0], entry[1]
        if kind in ("count", "count_col"):
            proj.append(F.col(f"__{out}_cnt").alias(out))
        elif kind == "sum":
            proj.append(F.col(f"__{out}_sum").cast("double").alias(out))
        elif kind in ("min", "max"):
            suffix = "min" if kind == "min" else "max"
            proj.append(F.col(f"__{out}_{suffix}").alias(out))
        elif kind == "approx_distinct":
            proj.append(
                F.hll_sketch_estimate(F.col(f"__{out}_hll")).alias(out)
            )
        elif kind == "hist":
            proj.extend(_hist_quantile_cols(out, entry[3]))
        else:  # avg = exact-decimal sum / non-null count
            proj.append(
                (
                    F.col(f"__{out}_sum").cast("double")
                    / F.col(f"__{out}_cnt")
                ).alias(out)
            )
    return state.select(*proj)


def _base_segments(base_table: str) -> tuple[int, list[str]]:
    m = mf._read_manifest(base_table)
    if m is None:
        raise FileNotFoundError(f"base table {base_table} has no manifest")
    return int(m["version"]), list(m["segments"])


def create_mv(
    spark: SparkSession,
    mv_table: str,
    base_table: str,
    group_cols: list[str],
    aggs: list[list],
    projection: list[str] | None = None,
) -> int:
    """Materialize the view from the base table's CURRENT snapshot and
    record which snapshot (version + exact segment list) it reflects.

    ``aggs`` is a JSON-able list of ``[out_col, kind, in_col]`` with
    ``kind`` in count / count_col / sum / min / max / avg /
    approx_distinct / hist (``in_col`` None for bare count). ``hist``
    takes a 4th element ``{"lo", "hi", "bins", "quantiles"}`` —
    ``quantiles`` maps suffix → q (e.g. ``{"p50": 0.5, "p95": 0.95}``,
    read as ``{out}_{suffix}`` columns); lo/hi/bins are PINNED in the
    spec so every partial buckets identically forever. ``projection``
    is an optional list of SQL select-exprs applied before grouping
    (e.g. derive a day column) — kept as strings so the spec survives
    in ``_MV_SPEC``."""
    spec = {
        "base_table": base_table,
        "group_cols": list(group_cols),
        "aggs": [list(a) for a in aggs],
        "projection": list(projection) if projection else None,
    }
    outs = [a[0] for a in spec["aggs"]]
    dups = sorted({o for o in outs if outs.count(o) > 1})
    clash = sorted(set(outs) & set(group_cols))
    if dups or clash:
        raise ValueError(
            f"create_mv: output names must be unique and distinct from "
            f"group columns (duplicates={dups}, clashes={clash})"
        )
    for entry in spec["aggs"]:
        kind = entry[1]
        if kind not in _KINDS:
            raise ValueError(f"unknown agg kind {kind!r}")
        if kind == "hist":
            p = entry[3] if len(entry) > 3 else None
            ok = (
                isinstance(p, dict)
                and float(p.get("lo", 0)) < float(p.get("hi", 0))
                and int(p.get("bins", 0)) >= 1
                and isinstance(p.get("quantiles"), dict)
                and p["quantiles"]
                and all(0 < float(q) <= 1 for q in p["quantiles"].values())
            )
            if not ok:
                raise ValueError(
                    "hist needs params {lo < hi, bins >= 1, quantiles: "
                    f"{{suffix: 0<q<=1}}}}; got {p!r}"
                )
    base_v, base_segs = _base_segments(base_table)
    state = _partial_agg(mf.read_versioned(spark, base_table), spec)
    spec["base_version"], spec["base_segments"] = base_v, base_segs
    return mf.commit_versioned(state, mv_table, meta={"mv_spec": spec})


def refresh_mv(spark: SparkSession, mv_table: str) -> str:
    """Bring the view up to date with its base table. Returns the
    refresh mode actually taken:

    * ``"noop"`` — base unchanged since the last refresh.
    * ``"incremental"`` — base segment list extends the recorded one
      (append commits only): aggregate ONLY the new segments and merge
      the partials into the stored state. O(new data).
    * ``"full"`` — base was rewritten (delete / compact / overwrite):
      distributive state cannot absorb deletions, so recompute.

    The view commit pins ``expect_version`` to the state it read, so a
    concurrent refresher raises :class:`manifest.CommitConflict`
    instead of silently losing one refresh's delta."""
    # version + spec from ONE manifest read: reading them separately
    # let a refresh that landed in between pair a stale spec (whose
    # base_segments were already folded in) with a fresh expect_version
    # — the CAS would pass and the delta would double-count.
    mv_v, spec = _spec_snapshot(mv_table)
    base_v, base_segs = _base_segments(spec["base_table"])
    old_segs = spec["base_segments"]
    if base_v == spec["base_version"] and base_segs == old_segs:
        return "noop"
    if base_segs[: len(old_segs)] == old_segs:
        new_paths = [
            os.path.join(spec["base_table"], s)
            for s in base_segs[len(old_segs):]
        ]
        delta = _partial_agg(spark.read.parquet(*new_paths), spec)
        old = mf.read_versioned(spark, mv_table, version=mv_v)
        state = _combine(old, delta, spec)
        mode = "incremental"
    else:
        state = _partial_agg(
            mf.read_versioned(spark, spec["base_table"]), spec
        )
        mode = "full"
    spec["base_version"], spec["base_segments"] = base_v, base_segs
    mf.commit_versioned(
        state, mv_table, expect_version=mv_v, meta={"mv_spec": spec}
    )
    return mode


def read_mv(spark: SparkSession, mv_table: str) -> DataFrame:
    """Read the view as its user-facing columns (state stays hidden).
    Spec and state come from ONE manifest snapshot (the data read is
    pinned to the version the spec shipped with, and history copies
    are immutable), so a concurrent refresh landing mid-read can never
    pair version-N spec with version-N+1 state."""
    mv_v, spec = _spec_snapshot(mv_table)
    return _finalize(
        mf.read_versioned(spark, mv_table, version=mv_v), spec
    )


def run_streaming_mv_refresh(
    spark: SparkSession,
    stream_df: DataFrame,
    base_table: str,
    mv_table: str,
    checkpoint_dir: str | None = None,
):
    """Keep a materialized view current from a stream: each micro-batch
    appends to the base manifest table (txn-idempotent — a replayed
    epoch is skipped by the commit layer) and then runs one incremental
    refresh. The refresh after a replayed/skipped epoch sees an
    unchanged base and no-ops, so the view never double-counts; a crash
    between the base commit and the refresh self-heals on the next
    batch (refresh folds in ALL unseen segments, not just the latest).

    Per-epoch cost: O(batch) for the append + O(batch ∪ group keys)
    for the refresh — the view never rescans the base table.
    """

    def handle(batch: DataFrame, epoch_id: int) -> None:
        if batch.isEmpty():
            return
        mf.commit_append(batch, base_table, txn=("mv-base", epoch_id))
        refresh_mv(spark, mv_table)

    writer = stream_df.writeStream.outputMode("append").foreachBatch(handle)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def rollup_mv(
    spark: SparkSession, mv_table: str, group_cols: list[str]
) -> DataFrame:
    """Answer a COARSER-grained aggregate from the view's state without
    touching the base table — the aggregate-rollup half of classic
    MV query routing. ``group_cols`` must be a subset of the view's
    group columns; every agg kind re-aggregates exactly from its
    partials: counts/sums add, min/max fold, AVG recombines from the
    exact-decimal sum + count pair (NOT an average of averages), and
    ``approx_distinct`` unions the per-group HLL sketches. So a
    (event_type, day) view answers per-event_type questions with a
    |view|-sized scan — at 100 TB the difference between the query and
    the base table is the whole point of maintaining the view.
    """
    mv_v, spec = _spec_snapshot(mv_table)
    missing = [g for g in group_cols if g not in spec["group_cols"]]
    if missing:
        raise ValueError(
            f"rollup_mv: {missing} not in the view's group columns "
            f"{spec['group_cols']}"
        )
    state = mf.read_versioned(spark, mv_table, version=mv_v)
    exprs = []
    seen = set()
    for st_col, kind, _c, params in _state_cols(spec["aggs"]):
        if st_col in seen:
            continue
        seen.add(st_col)
        c = F.col(st_col)
        if kind == "add":
            exprs.append(F.sum(c).alias(st_col))
        elif kind == "addnull":
            exprs.append(F.sum(c).cast(_DEC).alias(st_col))
        elif kind == "least":
            exprs.append(F.min(c).alias(st_col))
        elif kind == "greatest":
            exprs.append(F.max(c).alias(st_col))
        elif kind == "hll":
            exprs.append(F.hll_union_agg(c).alias(st_col))
        elif kind == "histadd":
            # element-wise sum of the bucket arrays across the rolled
            # groups — histogram partials add exactly like counts
            bins = int(params["bins"])
            exprs.append(
                F.array(
                    *[F.sum(F.element_at(c, i + 1)) for i in range(bins + 2)]
                ).alias(st_col)
            )
    rolled = state.groupBy(*[F.col(g) for g in group_cols]).agg(*exprs)
    narrowed = dict(spec, group_cols=list(group_cols))
    return _finalize(rolled, narrowed)
