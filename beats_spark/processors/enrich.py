"""Lookup / enrichment joins.

Beats has no relational join — enrichment is a per-event lookup against
a cached side table (``add_host_metadata``, ``translate_sid``, ``dns``,
docker/k8s metadata: SURVEY.md §2.6). The Spark-native shape for every
one of them is a **broadcast left join** against a small dim DataFrame:
the dim is shipped once per executor (the analogue of Beats' per-process
cache), the fact side never shuffles.

All lookup processors share one implementation parameterized by the dim,
the join key, and the output column prefix. Live I/O in executors
(IMDS probes, DNS resolution) is out — dims are materialized up front,
which is also the only defensible design at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from beats_spark.processors.base import DFProc, register


class LookupJoin(DFProc):
    """Broadcast left join; dim columns land prefixed (``prefix.col`` →
    ``prefix_col``) so repeated enrichments never collide."""

    def __init__(self, dim: DataFrame, on: str, dim_key: str | None = None,
                 prefix: str = "", fields: list[str] | None = None,
                 overwrite: bool = True):
        self.dim = dim
        self.on = on
        self.dim_key = dim_key or on
        self.prefix = prefix
        self.fields = fields
        self.overwrite = overwrite

    def transform(self, df: DataFrame) -> DataFrame:
        dim = self.dim
        cols = self.fields or [c for c in dim.columns if c != self.dim_key]
        renames = {c: f"{self.prefix}{c}" if self.prefix else c for c in cols}
        if not self.overwrite:
            # add_host_metadata replace_fields=false: keep pre-existing
            # event fields instead of the looked-up values
            renames = {c: n for c, n in renames.items() if n not in df.columns}
            if not renames:
                return df
        sel = [F.col(self.dim_key).alias("_lk_key")] + [
            F.col(c).alias(n) for c, n in renames.items()
        ]
        dim_slim = dim.select(*sel).dropDuplicates(["_lk_key"])
        out = df.join(
            F.broadcast(dim_slim), df[self.on] == dim_slim["_lk_key"], "left"
        ).drop("_lk_key")
        return out


@register("add_host_metadata")
class AddHostMetadata(LookupJoin):
    """Host info enrichment: ``host_*`` fields joined on ``source``.
    Ref: add_host_metadata/add_host_metadata.go:83-100 (cache → broadcast)."""

    def __init__(self, dim: DataFrame, on: str = "source", prefix: str = "host_",
                 fields: list[str] | None = None):
        super().__init__(dim, on=on, prefix=prefix, fields=fields)


@register("add_observer_metadata")
class AddObserverMetadata(LookupJoin):
    """Ref: add_observer_metadata/add_observer_metadata.go:83."""

    def __init__(self, dim: DataFrame, on: str = "source", prefix: str = "observer_"):
        super().__init__(dim, on=on, prefix=prefix)


@register("add_cloud_metadata")
class AddCloudMetadata(DFProc):
    """The reference probes IMDS once and attaches constant ``cloud.*``
    fields (add_cloud_metadata/add_cloud_metadata.go:115) → a constant
    struct literal here."""

    def __init__(self, cloud: dict[str, str]):
        self.cloud = cloud

    def transform(self, df: DataFrame) -> DataFrame:
        return df.withColumns({f"cloud_{k}": F.lit(v) for k, v in self.cloud.items()})


@register("add_docker_metadata")
class AddDockerMetadata(LookupJoin):
    """Container-id → container labels/name (the watcher cache becomes
    the dim). Ref: add_docker_metadata/add_docker_metadata.go:134."""

    def __init__(self, dim: DataFrame, on: str = "container_id",
                 prefix: str = "container_", fields: list[str] | None = None):
        super().__init__(dim, on=on, prefix=prefix, fields=fields)


@register("add_kubernetes_metadata")
class AddKubernetesMetadata(LookupJoin):
    """Pod-key → ``kubernetes.*`` metadata (indexer/matcher cache → dim).
    Ref: add_kubernetes_metadata/kubernetes.go:242."""

    def __init__(self, dim: DataFrame, on: str = "pod_uid",
                 prefix: str = "kubernetes_", fields: list[str] | None = None):
        super().__init__(dim, on=on, prefix=prefix, fields=fields)


@register("add_process_metadata")
class AddProcessMetadata(LookupJoin):
    """PID → process info (process cache → dim).
    Ref: add_process_metadata/add_process_metadata.go:161."""

    def __init__(self, dim: DataFrame, on: str = "pid",
                 prefix: str = "process_", fields: list[str] | None = None):
        super().__init__(dim, on=on, prefix=prefix, fields=fields)


@register("add_nomad_metadata")
class AddNomadMetadata(LookupJoin):
    """Allocation-id → Nomad job/task metadata. The ``logs_path``
    matcher extracts the allocation UUID from the harvested file path
    (x-pack/filebeat/processors/add_nomad_metadata/matchers.go:55-92:
    path must contain logs_path, first UUID in the path is the key;
    otherwise the event stays unenriched), then the broadcast dim
    stands in for the agent's allocation watcher cache."""

    _ALLOC_ID_RX = (
        "[a-fA-F0-9]{8}-[a-fA-F0-9]{4}-[a-fA-F0-9]{4}-"
        "[a-fA-F0-9]{4}-[a-fA-F0-9]{12}"
    )
    _KEY = "_nomad_alloc_id"

    def __init__(self, dim: DataFrame, path_col: str = "source",
                 logs_path: str = "/var/lib/nomad", prefix: str = "nomad_",
                 fields: list[str] | None = None):
        super().__init__(dim, on=self._KEY, dim_key="allocation_id",
                         prefix=prefix, fields=fields)
        self.path_col = path_col
        self.logs_path = logs_path.rstrip("/") + "/"

    def transform(self, df: DataFrame) -> DataFrame:
        extracted = F.regexp_extract(
            F.col(self.path_col), self._ALLOC_ID_RX, 0
        )
        key = F.when(
            F.col(self.path_col).contains(self.logs_path)
            & (extracted != ""),
            extracted,
        )
        return (
            super()
            .transform(df.withColumn(self._KEY, key))
            .drop(self._KEY)
        )


@register("translate")
class Translate(LookupJoin):
    """Generic value→value translation dim join (the translate_sid
    shape, translate_sid/translatesid.go:75)."""

    def __init__(self, dim: DataFrame, field: str, dim_key: str,
                 target: str, dim_value: str):
        super().__init__(dim, on=field, dim_key=dim_key, fields=[dim_value])
        self.target = target
        self.dim_value = dim_value

    def transform(self, df: DataFrame) -> DataFrame:
        out = super().transform(df)
        if self.dim_value != self.target:
            out = out.withColumnRenamed(self.dim_value, self.target)
        return out


@register("dns")
class Dns(DFProc):
    """Reverse-DNS enrichment against a pre-resolved dim (no live I/O in
    executors). ``action: append|replace``, ``tag_on_failure`` appends a
    tag when no mapping exists. Ref: dns/dns.go:81, config.go:32-43."""

    def __init__(self, dim: DataFrame, field: str, target: str,
                 action: str = "append", tag_on_failure: list[str] | None = None,
                 dim_key: str = "ip", dim_value: str = "hostname"):
        self.dim = dim
        self.field = field
        self.target = target
        self.action = action
        self.tags = tag_on_failure or []
        self.dim_key = dim_key
        self.dim_value = dim_value

    def transform(self, df: DataFrame) -> DataFrame:
        dim = self.dim.select(
            F.col(self.dim_key).alias("_dns_key"), F.col(self.dim_value).alias("_dns_val")
        ).dropDuplicates(["_dns_key"])
        out = df.join(F.broadcast(dim), df[self.field] == dim["_dns_key"], "left")
        if self.action == "replace":
            out = out.withColumn(
                self.target, F.coalesce(F.col("_dns_val"), F.col(self.field))
            )
        else:
            out = out.withColumn(self.target, F.col("_dns_val"))
        if self.tags:
            existing = (
                F.coalesce(F.col("tags"), F.array()) if "tags" in df.columns else F.array()
            )
            out = out.withColumn(
                "tags",
                F.when(
                    F.col("_dns_val").isNull(),
                    F.array_union(existing, F.array(*[F.lit(t) for t in self.tags])),
                ).otherwise(existing),
            )
        return out.drop("_dns_key", "_dns_val")


def asof_enrich(
    df: DataFrame,
    dim: DataFrame,
    on: str,
    ts_col: str = "ts",
    dim_key: str | None = None,
    valid_from: str = "valid_from",
    prefix: str = "",
    fields: list[str] | None = None,
    mode: str = "broadcast",
) -> DataFrame:
    """Time-versioned enrichment: join each event to the dim version
    with the greatest ``valid_from`` <= the event's ``ts_col`` for the
    same key (backward as-of join, ``>=`` inclusive) — the
    batch-replay-correct form of the reference's refreshing metadata
    caches (add_host_metadata/add_host_metadata.go:83-100 refreshes on
    a TTL; replaying history through a live cache enriches old events
    with today's metadata, an as-of join enriches them with the
    metadata of their own time).

    Events with a null key or no version at-or-before their timestamp
    get nulls; dim rows with a null key never match (equi-join
    semantics).

    Two scale modes:

    - ``broadcast`` (default): versions are packed per key into one
      sorted array and broadcast; the match is
      ``try_element_at(filter(versions, v -> v.vf <= ts), -1)`` — pure
      JVM expressions inside codegen, NO added shuffle on the fact
      side, cost O(versions-per-key) per event. The right plan whenever
      the dim fits an executor (host/container metadata always does).
    - ``merge``: tag + union dim and event rows, one shuffle on the
      key, and a running ``last(dim, ignorenulls)`` window ordered by
      (time, dim-before-event) — the sort-merge as-of for dims too big
      to broadcast. Hot keys serialize within their partition (window
      scan); skewed fact keys are the broadcast mode's job.
    """
    from pyspark.sql import Window
    from pyspark.sql import types as T

    dim_key = dim_key or on
    cols = fields or [c for c in dim.columns if c not in (dim_key, valid_from)]
    renames = {c: f"{prefix}{c}" if prefix else c for c in cols}
    dim = dim.filter(F.col(dim_key).isNotNull())

    if mode == "broadcast":
        vs = dim.groupBy(F.col(dim_key).alias("_as_key")).agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(valid_from).alias("_vf"),
                             *[F.col(c) for c in cols])
                )
            ).alias("_vs")
        )
        out = df.join(F.broadcast(vs), df[on] == vs["_as_key"], "left")
        match = F.try_element_at(
            F.filter(F.col("_vs"), lambda v: v["_vf"] <= F.col(ts_col)),
            F.lit(-1),
        )
        return out.withColumns(
            {n: match[c] for c, n in renames.items()}
        ).drop("_as_key", "_vs")

    if mode != "merge":
        raise ValueError(f"mode must be broadcast|merge, got {mode!r}")

    dim_struct_t = T.StructType([T.StructField(c, dim.schema[c].dataType)
                                 for c in cols])
    ev_rows = df.select(
        F.col(on).alias("_k"), F.col(ts_col).alias("_t"),
        F.lit(1).alias("_is_ev"), *df.columns,
        F.lit(None).cast(dim_struct_t).alias("_d"),
    )
    dim_rows = dim.select(
        F.col(dim_key).alias("_k"), F.col(valid_from).alias("_t"),
        F.lit(0).alias("_is_ev"),
        *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in df.columns],
        F.struct(*[F.col(c) for c in cols]).alias("_d"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_is_ev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev_rows.unionByName(dim_rows).withColumn(
        "_carry", F.last("_d", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("_is_ev") == 1).select(
        *df.columns,
        *[F.col("_carry")[c].alias(n) for c, n in renames.items()],
    )


@register("asof_lookup")
class AsofLookup(DFProc):
    """Processor-chain face of :func:`asof_enrich` (versioned dim
    lookup in a config pipeline)."""

    def __init__(self, dim: DataFrame, on: str, ts_col: str = "ts",
                 dim_key: str | None = None, valid_from: str = "valid_from",
                 prefix: str = "", fields: list[str] | None = None,
                 mode: str = "broadcast"):
        self.kw = dict(dim=dim, on=on, ts_col=ts_col, dim_key=dim_key,
                       valid_from=valid_from, prefix=prefix, fields=fields,
                       mode=mode)

    def transform(self, df: DataFrame) -> DataFrame:
        return asof_enrich(df, **self.kw)
