"""beats_spark — a PySpark-native log/telemetry analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the Beats harvest → process → publish pipeline
(reference: elastic/beats fork, read-only at /root/reference — studied
for semantics only; no code copied).

Architecture: everything is a lazy DataFrame program. Sources load into
DataFrames, processors are ``DataFrame -> DataFrame`` closures built
from a Beats-shaped config dict, conditions compile to a single
``pyspark.sql.Column`` boolean expression, routing compiles to one
``sink`` column (a chained CASE WHEN), and fan-out is a single-pass
multi-sink write. Catalyst handles predicate pushdown, column pruning
and join strategy; we handle skew (salting), broadcast hints, and
checkpoint/resume semantics.
"""

from beats_spark.session import get_spark
from beats_spark.conditions import compile_condition
from beats_spark.fmtstr import compile_fmtstr
from beats_spark.pipeline import build_pipeline

__all__ = ["get_spark", "compile_condition", "compile_fmtstr", "build_pipeline"]
__version__ = "0.1.0"
