"""Hand-translated `script` processors for the standard module pipelines.

The ES ingest pipelines the reference installs (`filebeat/module/*/*/
ingest/pipeline.yml`, rendered by `filebeat/fileset/pipelines.go`)
embed Painless `script` processors for the handful of steps the
declarative processors can't express. The compiler in
`beats_spark/ingest.py` refuses those loudly unless the caller passes
`script_handlers`; this module is the registry of hand-translated
substitutes — each one a pure-column Spark rewrite of the script's
observable semantics, keyed by `(module, fileset)` then by the
processor tag the compiler assigns (`script[<chain position>]`).

`load_module_pipeline(module, fileset)` is the one-call face: it loads
the reference pipeline definition for that fileset, wires in the
translated handlers, and returns the compiled DataFrame transform.

Scale shape: every handler is a narrow projection (array folds /
string splits guarded by the processor's `if`), zero Python, zero
shuffle — the compiled module pipeline stays scan → project×k.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.ingest import IngestPipeline, compile_ingest_pipeline

__all__ = [
    "MODULE_SCRIPT_HANDLERS",
    "load_module_pipeline",
    "module_pipeline_path",
    "REFERENCE_MODULE_ROOT",
]

REFERENCE_MODULE_ROOT = "/root/reference/filebeat/module"


def _c(name: str) -> Column:
    return F.col(f"`{name}`")


def _has(df: DataFrame, name: str) -> bool:
    return name in df.columns


def _guarded(df: DataFrame, act: Column, assigns: dict[str, Column]) -> DataFrame:
    out = {}
    for name, expr in assigns.items():
        old = _c(name) if _has(df, name) else F.lit(None).cast(
            df.select(F.when(act, expr)).schema[0].dataType)
        out[name] = F.when(F.coalesce(act, F.lit(False)), expr).otherwise(old)
    return df.withColumns(out)


# ---------------------------------------------------------------------------
# nginx/access — pick the first public IP from remote_ip_list
# (module/nginx/access/ingest/pipeline.yml, the isPrivate() walker)
# ---------------------------------------------------------------------------

def _ip_is_private(ip: Column) -> Column:
    """The script's isPrivate(): 10.*, 192.168.*, 172.16-31.*, 127.*
    (integer parse of the first two dotted tokens; parse failure →
    public, mirroring the script's catch→false)."""
    b1 = F.try_element_at(F.split(ip, r"\."), F.lit(1)).try_cast("int")
    b2 = F.try_element_at(F.split(ip, r"\."), F.lit(2)).try_cast("int")
    return F.coalesce(
        (b1 == 10)
        | ((b1 == 192) & (b2 == 168))
        | ((b1 == 172) & (b2 >= 16) & (b2 <= 31))
        | (b1 == 127),
        F.lit(False),
    )


def _nginx_pick_source_address(df: DataFrame, act: Column) -> DataFrame:
    lst = (_c("nginx.access.remote_ip_list")
           if _has(df, "nginx.access.remote_ip_list")
           else F.lit(None).cast("array<string>"))
    public = F.filter(lst, lambda ip: ~_ip_is_private(ip))
    pick = F.coalesce(F.try_element_at(public, F.lit(1)),
                      F.try_element_at(lst, F.lit(1)))
    return _guarded(df, act, {"source.address": pick})


# ---------------------------------------------------------------------------
# system/auth — ssh event → ECS categorization
# ---------------------------------------------------------------------------

def _auth_categorize(df: DataFrame, act: Column) -> DataFrame:
    ev = (_c("system.auth.ssh.event")
          if _has(df, "system.auth.ssh.event") else F.lit(None))
    ok = ev == "Accepted"
    bad = ev.isin("Invalid", "Failed")
    hit = act & F.coalesce(ok | bad, F.lit(False))
    return _guarded(df, hit, {
        "event.type": F.when(ok, F.array(F.lit("authentication_success"),
                                         F.lit("info")))
        .otherwise(F.array(F.lit("authentication_failure"), F.lit("info"))),
        "event.category": F.when(
            ok, F.array(F.lit("authentication"), F.lit("session")))
        .otherwise(F.array(F.lit("authentication"))),
        "event.action": F.lit("ssh_login"),
        "event.outcome": F.when(ok, F.lit("success"))
        .otherwise(F.lit("failure")),
    })


# ---------------------------------------------------------------------------
# apache/access — ssl protocol "TLSv1.2" → tls.version/version_protocol
# ---------------------------------------------------------------------------

def _apache_tls_split(df: DataFrame, act: Column) -> DataFrame:
    proto = (_c("apache.access.ssl.protocol")
             if _has(df, "apache.access.ssl.protocol") else F.lit(None))
    parts = F.split(F.lower(proto), "v")
    two = F.size(parts) == 2
    ver = F.element_at(parts, 2)
    ver = F.when(ver.contains("."), ver).otherwise(F.concat(ver, F.lit(".0")))
    hit = act & F.coalesce(two, F.lit(False))
    return _guarded(df, hit, {
        "tls.version": ver,
        "tls.version_protocol": F.element_at(parts, 1),
    })


# ---------------------------------------------------------------------------
# traefik/access — seconds → nanoseconds event.duration
# ---------------------------------------------------------------------------

def _traefik_duration(df: DataFrame, act: Column) -> DataFrame:
    dur = (_c("temp.duration") if _has(df, "temp.duration") else F.lit(None))
    return _guarded(df, act, {
        "event.duration": F.round(dur.cast("double") * 1000000).cast("long"),
    })


# (module, fileset) → {tag: handler}. Tags are the compiler's
# `script[<chain index>]` defaults for the module's pipeline as shipped.
MODULE_SCRIPT_HANDLERS: dict[tuple[str, str], dict] = {
    ("nginx", "access"): {"script": _nginx_pick_source_address},
    ("system", "auth"): {"script": _auth_categorize},
    ("apache", "access"): {"script": _apache_tls_split},
    ("traefik", "access"): {"script": _traefik_duration},
}


def module_pipeline_path(module: str, fileset: str,
                         ref_root: str = REFERENCE_MODULE_ROOT) -> str:
    d = os.path.join(ref_root, module, fileset, "ingest")
    for name in ("pipeline.yml", "pipeline.json"):
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    raise FileNotFoundError(f"no ingest pipeline for {module}/{fileset}")


def load_module_pipeline(module: str, fileset: str, *,
                         ref_root: str = REFERENCE_MODULE_ROOT,
                         **kwargs) -> IngestPipeline:
    """Compile the reference's ingest pipeline for ``module/fileset``
    with this registry's translated script handlers wired in."""
    handlers = dict(MODULE_SCRIPT_HANDLERS.get((module, fileset), {}))
    handlers.update(kwargs.pop("script_handlers", {}) or {})
    return compile_ingest_pipeline(
        module_pipeline_path(module, fileset, ref_root),
        script_handlers=handlers or None, **kwargs)
