"""Output routing: first-match-wins selector grammar → one ``sink`` column.

Re-expresses the reference's ``outil.Selector`` grammar
(``libbeat/outputs/outil/select.go:41-67,258-397``): an ordered list of
rules, each a format string (``fmtSelector``) optionally guarded by a
``when:`` condition (``condSelector``) and/or post-mapped through a
value table (``mapSelector``), with a final ``default`` — compiled into
a single chained ``CASE WHEN`` Column. Constant rules fold to literals
(Catalyst ConstantFolding finishes the job, matching the reference's
build-time const-folding at ``select.go:192-205,230-241``).

Fan-out is **single-pass**: either one ``partitionBy("sink")`` write or
persist + per-sink filter — never re-computing the plan per sink (the
optimization the reference's shared workQueue embodies,
``pipeline/consumer.go:179``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition, make_resolver
from beats_spark.fmtstr import compile_fmtstr

DEAD_LETTER = "_dead_letter"


def compile_selector(
    config: dict,
    df: DataFrame | None = None,
    ts_col: str = "ts",
) -> Column:
    """Selector config → string Column.

    Config shape::

        {"indices": [
            {"index": "errors-%{[source]}", "when": {...}},
            {"index": "%{[env]}-logs", "mappings": {"prod": "hot"},
             "default": "other"},
         ],
         "default": "default-logs"}

    Rule order is first-match-wins; a rule "matches" when its ``when``
    holds AND its computed value is non-null (format-string fields
    null-propagate, mirroring fmt errors falling through).
    """
    resolver = make_resolver(df)
    rules = config.get("indices", config.get("rules", []))
    expr: Column | None = None
    for rule in rules:
        fmt = rule.get("index", rule.get("topic", rule.get("key")))
        if fmt is None:
            raise ValueError(f"selector rule needs index/topic/key: {rule}")
        val = compile_fmtstr(fmt, resolver, ts_col)
        if "mappings" in rule:
            mapped: Column | None = None
            for k, v in rule["mappings"].items():
                c = val == F.lit(k)
                mapped = F.when(c, F.lit(v)) if mapped is None else mapped.when(c, F.lit(v))
            if rule.get("default") is not None:
                mapped = mapped.otherwise(F.lit(rule["default"]))
            val = mapped
        cond = val.isNotNull()
        if "when" in rule:
            cond = compile_condition(rule["when"], df, resolver) & cond
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    # the default is itself a selector in the reference (outil builds it
    # via the same fmt machinery, select.go:258-333) — compile it too
    default = config.get("default")
    default_col = (
        compile_fmtstr(default, resolver, ts_col) if isinstance(default, str)
        else F.lit(default)
    )
    if expr is None:
        return default_col
    return expr.otherwise(default_col)


def add_sink_column(
    df: DataFrame,
    config: dict,
    sink_col: str = "sink",
    ts_col: str = "ts",
    dead_letter: bool = True,
) -> DataFrame:
    """Attach the routed sink column; unroutable rows (null selector and
    null default) divert to the dead-letter sink — the analogue of the
    ES output's non-indexable drop class
    (``outputs/elasticsearch/client.go:403-407``)."""
    col = compile_selector(config, df, ts_col)
    if dead_letter:
        col = F.coalesce(col, F.lit(DEAD_LETTER))
    return df.withColumn(sink_col, col)


def fanout_write(
    df: DataFrame,
    base_dir: str,
    sink_col: str = "sink",
    format: str = "parquet",
    mode: str = "append",
    run_id: str | None = None,
    files_per_sink: int | None = None,
) -> None:
    """Single-pass multi-sink write: one job, ``partitionBy(sink)``.

    Each sink is a partition directory under ``base_dir`` (per-sink
    Iceberg tables in production — same layout contract). ``run_id``
    adds a second partition level making re-runs idempotent: a retried
    run overwrites only its own ``run_id=...`` partitions (dynamic
    partition overwrite), the Spark analogue of the reference's
    at-least-once retry with stable batch identity.

    ``files_per_sink`` bounds the file count: without it, every task
    holding rows for a sink emits a file into that sink's directory —
    at 10^5 tasks × 10^3 sinks that is a small-files catastrophe.
    Repartitioning on (sink, bucket) first costs one shuffle but caps
    output at ``files_per_sink`` files per sink per run.
    """
    if files_per_sink:
        bucket = F.pmod(F.xxhash64(*[c for c in df.columns if c != sink_col][:2]),
                        F.lit(files_per_sink))
        df = df.repartition(F.col(sink_col), bucket)
    writer = df.write.format(format)
    if run_id is not None:
        df = df.withColumn("run_id", F.lit(run_id))
        writer = (
            df.write.format(format)
            .partitionBy(sink_col, "run_id")
            .option("partitionOverwriteMode", "dynamic")
        )
        writer.mode("overwrite").save(base_dir)
        return
    writer.partitionBy(sink_col).mode(mode).save(base_dir)


def fanout_write_table(
    df: DataFrame,
    table: str,
    sink_col: str = "sink",
    run_id: str | None = None,
    provider: str = "iceberg",
) -> None:
    """Catalog-table fan-out via the DataFrameWriterV2 API — the north
    rule's Iceberg sink, executable today: the SAME code path drives
    any V2 table provider, so in-sandbox tests run it against the
    session catalog with ``provider="parquet"`` and production points
    it at an Iceberg catalog (iceberg-spark-runtime jar +
    ``spark.sql.catalog.<name>`` conf) with ``provider="iceberg"`` —
    no code change, only configuration.

    Idempotency contract (same as :func:`fanout_write`): with
    ``run_id``, replays call ``overwritePartitions`` — only the
    (sink, run_id) partitions present in this batch are replaced, so a
    retried batch rewrites itself instead of duplicating (Iceberg makes
    this a snapshot-atomic commit; the reference's analogue is
    guaranteed-send + dedup-by-identity)."""
    from pyspark.errors import AnalysisException

    data = df.withColumn("run_id", F.lit(run_id)) if run_id else df
    parts = [F.col(sink_col)] + ([F.col("run_id")] if run_id else [])
    spark = data.sparkSession
    if not spark.catalog.tableExists(table):
        data.writeTo(table).using(provider).partitionedBy(*parts).create()
        return
    ordered = data.select(*spark.table(table).columns)
    try:
        if run_id:
            ordered.writeTo(table).overwritePartitions()
        else:
            ordered.writeTo(table).append()
    except AnalysisException:
        # V1 session-catalog tables (the in-sandbox parquet stand-in)
        # reject the V2 write — same partition-replacement semantics
        # via classic dynamic partition overwrite (insertInto reads the
        # session conf, not the per-write option)
        conf = "spark.sql.sources.partitionOverwriteMode"
        prev = spark.conf.get(conf, "static")
        spark.conf.set(conf, "dynamic")
        try:
            ordered.write.mode("overwrite" if run_id else "append").insertInto(table)
        finally:
            spark.conf.set(conf, prev)


def fanout_write_snapshot(
    df: DataFrame,
    table,
    run_id: str,
    sink_col: str = "sink",
) -> int:
    """Fan-out write through the snapshot-log table format
    (:class:`beats_spark.snapshots.SnapshotTable`) — ONE job writing
    every sink as a partition of ONE atomic commit, so readers see a
    batch's sinks all-or-nothing (the Iceberg commit guarantee
    ``fanout_write``'s directory layout cannot give: with plain
    dynamic overwrite, a crash mid-write leaves some sinks updated and
    others not).

    ``run_id`` is the commit id: a retried batch replaces its own
    commit's entry in the visible set, so replays stay idempotent
    (same contract as ``fanout_write``); the snapshot log adds time
    travel back to any previous batch. ``run_id`` rides along as a
    plain data column — not a partition level — so it round-trips as
    a string instead of being re-inferred (a numeric-looking run id
    would come back as a long and break unionByName across commits).
    Returns the snapshot id.
    """
    data = df.withColumn("run_id", F.lit(run_id))
    return table.commit(data, commit_id=run_id, partition_by=[sink_col])


def fanout_counts(df: DataFrame, sink_col: str = "sink") -> DataFrame:
    """Per-sink ACK counts (``libbeat/outputs/metrics.go:53-66`` →
    ``events.acked`` per output)."""
    return df.groupBy(sink_col).count().withColumnRenamed("count", "events_acked")


# ---------------------------------------------------------------------------
# ES bulk per-item triage (outputs/elasticsearch/client.go:370-420)
# ---------------------------------------------------------------------------

OUTCOME_ACKED = "acked"          # status < 300
OUTCOME_DUPLICATE = "duplicate"  # 409: already indexed (create op_type)
OUTCOME_TOOMANY = "toomany"      # 429: back-pressure → retry
OUTCOME_DROPPED = "dropped"      # other 4xx: non-indexable → dead letter
OUTCOME_RETRY = "retry"          # 5xx: transient → retry


def classify_item_status(status: Column) -> Column:
    """Per-item bulk-response status → outcome class, exactly the
    reference's ``bulkCollectPublishFails`` ladder
    (``elasticsearch/client.go:390-420``): <300 acked; 409 duplicate
    (ok, not retried); 429 too-many (retried); other <500 hard failure
    (dropped / dead letter); ≥500 transient (retried)."""
    return (
        F.when(status < 300, F.lit(OUTCOME_ACKED))
        .when(status == 409, F.lit(OUTCOME_DUPLICATE))
        .when(status == 429, F.lit(OUTCOME_TOOMANY))
        .when(status < 500, F.lit(OUTCOME_DROPPED))
        .otherwise(F.lit(OUTCOME_RETRY))
    )


def triage_outcomes(
    df: DataFrame,
    status_col: str = "item_status",
    outcome_col: str = "outcome",
    sink_col: str = "sink",
    dead_letter: bool = True,
) -> DataFrame:
    """Attach the per-item outcome column; non-indexable rows divert to
    the dead-letter sink (the ES output's drop class with a dead-letter
    index configured, ``client.go:403-407``), everything else keeps its
    routed sink. Retryable rows (``toomany``/``retry``) are selected by
    :func:`retryable_rows` for the next run — the batch analogue of the
    pipeline's retry queue (``pipeline/retry.go``)."""
    out = df.withColumn(outcome_col, classify_item_status(F.col(status_col)))
    if dead_letter and sink_col in df.columns:
        out = out.withColumn(
            sink_col,
            F.when(F.col(outcome_col) == OUTCOME_DROPPED, F.lit(DEAD_LETTER))
            .otherwise(F.col(sink_col)),
        )
    return out


def retryable_rows(df: DataFrame, outcome_col: str = "outcome") -> DataFrame:
    return df.filter(F.col(outcome_col).isin(OUTCOME_TOOMANY, OUTCOME_RETRY))


def triage_counts(
    df: DataFrame,
    sink_col: str = "sink",
    outcome_col: str = "outcome",
) -> DataFrame:
    """Per-sink outcome counters matching ``outputs/metrics.go:53-66``
    (events.acked/duplicates/toomany/dropped + retryable=failed): ONE
    conditional hash aggregate — partial+final, no pivot shuffle."""

    def n(outcome: str, alias: str) -> Column:
        return F.sum(
            F.when(F.col(outcome_col) == outcome, 1).otherwise(0)
        ).alias(alias)

    return df.groupBy(sink_col).agg(
        n(OUTCOME_ACKED, "events_acked"),
        n(OUTCOME_DUPLICATE, "events_duplicates"),
        n(OUTCOME_TOOMANY, "events_toomany"),
        n(OUTCOME_DROPPED, "events_dropped"),
        F.sum(
            F.when(F.col(outcome_col).isin(OUTCOME_TOOMANY, OUTCOME_RETRY), 1)
            .otherwise(0)
        ).alias("events_failed"),
    )


def sink_window_counts(
    df: DataFrame,
    window: str = "1 hour",
    sink_col: str = "sink",
    source_col: str = "source",
    level_col: str = "level",
    ts_col: str = "ts",
) -> DataFrame:
    """The north-star aggregate: events per (sink, source, level,
    window) — a plain hash aggregate (partial + final via Catalyst).

    For single-unit tumbling windows ("1 minute"/"1 hour"/"1 day") the
    group key is ``date_trunc(unit, ts)`` — one timestamp instead of the
    ``window()`` struct of two, identical semantics, a third less group
    key to hash/compare/shuffle per row at 10^12 scale. "1 week" is
    deliberately NOT on this fast path: ``F.window`` tumbles weeks from
    the epoch (1970-01-01, a Thursday) while ``date_trunc('week')`` is
    Monday-aligned — the two would disagree by 3 days."""
    cols = [c for c in (sink_col, source_col, level_col) if c in df.columns]
    parts = window.strip().lower().split()
    if len(parts) == 2 and parts[0] == "1" and parts[1].rstrip("s") in (
        "minute", "hour", "day",
    ):
        key = F.date_trunc(parts[1].rstrip("s"), F.col(ts_col))
    else:
        key = F.window(ts_col, window)["start"]
    return (
        df.groupBy(*cols, key.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("events"))
        .select(*cols, "window_start", "events")
    )


def sink_window_percentiles(
    df: DataFrame,
    value_col: str = "value",
    window: str = "1 hour",
    sink_col: str = "sink",
    ts_col: str = "ts",
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    exact: bool = True,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-(sink, window) latency/size percentiles + count — the
    observability rollup next to :func:`sink_window_counts`.

    ``exact=True`` uses ``percentile`` (interpolated, bit-identical to
    ANSI ``quantile_cont`` — oracle-hashable), which buffers each
    group's values: right for verification and bounded groups.
    ``exact=False`` is the 10^12-row path: ``percentile_approx``
    (t-digest-style sketch, constant memory per group, mergeable across
    partials); its error bound is 1/accuracy, sanity-tested against
    exact in pytest. Same single partial+final hash aggregate either
    way."""
    parts = window.strip().lower().split()
    if len(parts) == 2 and parts[0] == "1" and parts[1].rstrip("s") in (
        "minute", "hour", "day",
    ):
        key = F.date_trunc(parts[1].rstrip("s"), F.col(ts_col))
    else:
        key = F.window(ts_col, window)["start"]
    cols = [c for c in (sink_col,) if c in df.columns]

    def pct(q: float) -> Column:
        # full-decimal naming so qs like (0.99, 0.995) or (0.999,)
        # never collide: 0.5→p50, 0.995→p99_5, 0.999→p99_9
        name = "p" + f"{q * 100:g}".replace(".", "_")
        if exact:
            return F.expr(f"percentile({value_col}, {q})").alias(name)
        return F.percentile_approx(value_col, q, accuracy).alias(name)

    return (
        df.groupBy(*cols, key.alias("window_start"))
        .agg(F.count(F.lit(1)).alias("events"), *[pct(q) for q in qs])
    )

