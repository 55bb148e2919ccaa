"""SparkSession helpers: package shipping + tuned session defaults.

``ensure_package_shipped`` zips the resin_spark package and registers it
with ``sc.addPyFile`` so Arrow/pandas UDF closures (which reference
resin_spark modules) import cleanly on every executor — the programmatic
equivalent of ``spark-submit --py-files resin_spark.zip`` (north rule
packaging requirement).  Called automatically by build_index and
SearchEngine, idempotent per session.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import SparkSession

_SHIPPED_ATTR = "_resin_spark_shipped"


_PKG_ZIP: str | None = None


def package_zip() -> str:
    """Create (once per process) a zip of the resin_spark package."""
    global _PKG_ZIP
    if _PKG_ZIP is not None and os.path.exists(_PKG_ZIP):
        return _PKG_ZIP
    import resin_spark

    pkg_dir = os.path.dirname(os.path.abspath(resin_spark.__file__))
    parent = os.path.dirname(pkg_dir)
    out_dir = tempfile.mkdtemp(prefix="resin_spark_pkg_")
    base = os.path.join(out_dir, "resin_spark")
    _PKG_ZIP = shutil.make_archive(base, "zip", root_dir=parent,
                                   base_dir="resin_spark")
    return _PKG_ZIP


def ensure_package_shipped(spark: SparkSession) -> None:
    if getattr(spark, _SHIPPED_ATTR, False):
        return
    import resin_spark

    pkg_dir = os.path.dirname(os.path.abspath(resin_spark.__file__))
    if not os.path.isdir(pkg_dir):
        # imported from a zip: we ARE running under spark-submit
        # --py-files (or a prior addPyFile) - the zip is already on every
        # executor's PYTHONPATH, and re-archiving a zip member would fail
        setattr(spark, _SHIPPED_ATTR, True)
        return
    spark.sparkContext.addPyFile(package_zip())
    setattr(spark, _SHIPPED_ATTR, True)


def make_session(
    master: str = "local[*]",
    app_name: str = "resin_spark",
    shuffle_partitions: int | None = None,
    memory: str | None = None,
    extra: dict | None = None,
) -> SparkSession:
    """Tuned session: AQE on (runtime re-plan + skew splitting), Arrow on,
    UTC.  shuffle_partitions defaults to 2x cores locally; on a real
    cluster leave it to AQE coalescing.  In local mode the driver JVM is
    the whole cluster — size its heap accordingly (only effective when the
    JVM hasn't started yet, i.e. fresh process)."""
    memory = memory or os.environ.get("RESIN_SPARK_DRIVER_MEM", "12g")
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.driver.memory", memory)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # dimension joins (conv_dim in the build, top-k fetch in queries)
        # should broadcast well past the 10 MB default; AQE checks the
        # RUNTIME size, so an over-threshold dim still degrades to SMJ —
        # stage profiling showed conv_dim at ~13 MB forcing a full-corpus
        # sort-merge shuffle in the docs path (scripts/stage_breakdown.py)
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 << 20))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow input batches are bounded two ways: a high record cap for
        # narrow occurrence rows (the merge-encoder wants big batches) and
        # a byte cap so posting-block rows with KB-size binary cells can't
        # balloon a decode batch to record-cap x cell-size
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        .config("spark.sql.execution.arrow.maxBytesPerBatch", str(16 << 20))
        # NOTE: the index build deliberately contains NO ObjectHashAggregate
        # (posting merge = repartition-and-sort + streaming mapInPandas), so
        # the sort-based fallback threshold stays at its safe default — the
        # remaining collect_list users (dedup groups, char-bag classes) keep
        # their spill path for high-cardinality keys.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
    )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    ensure_package_shipped(spark)
    return spark
