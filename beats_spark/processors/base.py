"""Processor base classes, when-guard semantics, and the registry."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from beats_spark.conditions import compile_condition


class Proc:
    """Base processor: a callable DataFrame transform."""

    def __call__(self, df: DataFrame) -> DataFrame:  # pragma: no cover
        raise NotImplementedError


class Project(Proc):
    """Column-assignment processor (the withColumn family).

    Subclasses implement ``assigns`` (new/updated columns) and
    optionally ``drops``. The ``when:`` guard wraps every assignment in
    ``CASE WHEN guard THEN new ELSE old END`` — a per-row conditional
    mutation with zero extra scans (the reference evaluates the guard
    per event the same way, ``conditionals.go:82-87``).
    """

    when: dict | None = None

    def assigns(self, df: DataFrame) -> dict[str, Column]:
        return {}

    def drops(self, df: DataFrame) -> list[str]:
        return []

    def __call__(self, df: DataFrame) -> DataFrame:
        assigns = self.assigns(df)
        drops = self.drops(df)
        if self.when is not None:
            guard = compile_condition(self.when, df)
            wrapped: dict[str, Column] = {}
            for name, expr in assigns.items():
                old = F.col(name) if name in df.columns else F.lit(None)
                wrapped[name] = F.when(guard, expr).otherwise(old)
            assigns = wrapped
            # a guarded drop can't remove the column for only some rows →
            # null it out where the guard holds.
            for name in drops:
                if name in df.columns:
                    assigns[name] = F.when(guard, F.lit(None)).otherwise(F.col(name))
            drops = []
        if assigns:
            df = df.withColumns(assigns)
        if drops:
            df = df.drop(*[d for d in drops if d in df.columns])
        return df


class FilterProc(Proc):
    """Row-dropping processor. ``when:`` restricts the drop to guarded rows."""

    when: dict | None = None

    def keep(self, df: DataFrame) -> Column:
        return F.lit(True)

    def __call__(self, df: DataFrame) -> DataFrame:
        keep = self.keep(df)
        if self.when is not None:
            # null guard (missing field) = condition false = row survives,
            # matching the reference's condition evaluation.
            guard = F.coalesce(compile_condition(self.when, df), F.lit(False))
            keep = ~guard | keep  # rows outside the guard always survive
        return df.filter(keep)


class DFProc(Proc):
    """General DataFrame transform (joins, re-shaping). A ``when:`` guard
    splits the frame, transforms the matching half, and unions back —
    the only processors using this path are enrichment joins, where the
    guard is rare."""

    when: dict | None = None

    def __init__(self, fn: Callable[[DataFrame], DataFrame] | None = None):
        if fn is not None:
            self.transform = fn  # type: ignore[method-assign]

    def transform(self, df: DataFrame) -> DataFrame:
        raise NotImplementedError

    def __call__(self, df: DataFrame) -> DataFrame:
        if self.when is None:
            return self.transform(df)
        guard = compile_condition(self.when, df)
        yes = self.transform(df.filter(guard))
        no = df.filter(~guard | guard.isNull())
        return yes.unionByName(no, allowMissingColumns=True)


REGISTRY: dict[str, Callable[..., Proc]] = {}


def register(name: str):
    def deco(factory: Callable[..., Proc]):
        REGISTRY[name] = factory
        return factory

    return deco


def build_processor(entry: dict) -> Proc:
    """One config entry ``{name: {...cfg}}`` (plus optional nested
    ``when``) → processor instance (``libbeat/processors/processor.go:86-116``)."""
    if "if" in entry:
        from beats_spark.pipeline import IfThenElse

        return IfThenElse(entry)
    names = [k for k in entry if k != "when"]
    if len(names) != 1:
        raise ValueError(f"processor entry must have exactly one key: {entry}")
    name = names[0]
    if name not in REGISTRY:
        raise ValueError(f"unknown processor {name!r}")
    cfg = dict(entry[name] or {})
    when = cfg.pop("when", None) or entry.get("when")
    proc = REGISTRY[name](**cfg)
    proc.when = when
    return proc
