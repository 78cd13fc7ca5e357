"""Hadoop-FS probes with a documented Spark Connect fallback.

Several sinks need a *reliable* "does this table exist yet" answer before
they overwrite (``upsert_parquet_sink``, the quarantine ``_hwm`` fast path,
``write_ivf_index``'s append guard): a transient read failure silently
treated as "no table" is a data-loss path (r9's ``upsert_parquet_sink``
bug).  The classic-JVM route (``spark._jvm`` → ``FileSystem.exists``) gives
that answer exactly, but those private accessors do not exist under Spark
Connect — code that reaches for them unconditionally hard-fails there.

This module centralizes the probe:

* JVM gateway available → ``FileSystem.exists`` / ``listStatus``, the
  precise answer (distinguishes "absent", "hidden-entries-only after a
  kill mid-write", and "has data").
* No gateway (Spark Connect) → a schema-probe read.  The fallback maps
  only the two *definitive* "no table" signals to ``False``
  (``PATH_NOT_FOUND`` and ``UNABLE_TO_INFER_SCHEMA`` — the latter is what
  a directory holding only ``_temporary``/``_SUCCESS`` raises) and
  re-raises anything else, preserving the fail-the-batch-on-transient-
  error guarantee the JVM path gives.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_NO_TABLE_MARKERS = (
    "PATH_NOT_FOUND",
    "UNABLE_TO_INFER_SCHEMA",
    "Unable to infer schema",
    "Path does not exist",
)


def hadoop_fs(spark: SparkSession, path: str):
    """Return ``(fs, jpath)`` via the JVM gateway, or ``None`` when the
    session has no gateway (Spark Connect)."""
    try:
        jvm = spark._jvm  # noqa: SLF001 - deliberate, gated
        jsc = spark._jsc  # noqa: SLF001
        if jvm is None or jsc is None:
            return None
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        return jpath.getFileSystem(jsc.hadoopConfiguration()), jpath
    except AttributeError:
        return None


def _error_condition(exc: Exception) -> str:
    # getCondition is the Spark 4 name; getErrorClass the deprecated alias
    for attr in ("getCondition", "getErrorClass"):
        get = getattr(exc, attr, None)
        if callable(get):
            try:
                return get() or ""
            except Exception:  # pragma: no cover - defensive
                return ""
    return ""


def _is_no_table_error(exc: Exception) -> bool:
    text = f"{_error_condition(exc)} {exc}"
    return any(m in text for m in _NO_TABLE_MARKERS)


def _table_exists_by_read(spark: SparkSession, path: str) -> bool:
    """Connect fallback: schema-probe the path.  Definitive "no table"
    signals → False; any OTHER failure re-raises (transient IO must fail
    the caller's batch, never read as an empty table)."""
    from pyspark.errors import AnalysisException

    try:
        spark.read.parquet(path).schema
        return True
    except AnalysisException as exc:
        if _is_no_table_error(exc):
            return False
        raise


def table_exists(spark: SparkSession, path: str, *, visible_prefix: str | None = None) -> bool:
    """True iff ``path`` holds a readable table: the directory exists AND
    has at least one non-hidden entry (a kill mid-overwrite leaves just
    ``_temporary`` — that must read as "no table yet" so replay rebuilds
    instead of failing forever).

    ``visible_prefix`` additionally requires a visible entry starting with
    that prefix (e.g. ``"ingest_batch="`` for partitioned incremental
    layouts).  Under the Connect fallback the prefix cannot be checked
    without a listing; the schema probe stands in (a partitioned table
    read exposes the partition column, which downstream reads validate).
    """
    handle = hadoop_fs(spark, path)
    if handle is None:
        return _table_exists_by_read(spark, path)
    fs, jpath = handle
    if not fs.exists(jpath):
        return False
    for st in fs.listStatus(jpath):
        name = st.getPath().getName()
        if name.startswith(("_", ".")):
            continue
        if visible_prefix is None or name.startswith(visible_prefix):
            return True
    return False


def dir_exists(spark: SparkSession, path: str) -> bool:
    """Plain existence probe (the directory may hold only hidden files).
    Connect fallback: ``UNABLE_TO_INFER_SCHEMA`` proves the directory
    exists (just unreadable), ``PATH_NOT_FOUND`` proves it doesn't."""
    handle = hadoop_fs(spark, path)
    if handle is None:
        from pyspark.errors import AnalysisException

        try:
            spark.read.parquet(path).schema
            return True
        except AnalysisException as exc:
            text = f"{_error_condition(exc)} {exc}"
            if "PATH_NOT_FOUND" in text or "Path does not exist" in text:
                return False
            if "UNABLE_TO_INFER" in text or "Unable to infer schema" in text:
                return True
            raise
    fs, jpath = handle
    return bool(fs.exists(jpath))


def list_visible(spark: SparkSession, path: str):
    """List ``(name, is_dir)`` for non-hidden entries, or ``None`` when no
    JVM gateway is available (Connect) — callers holding a layout *guard*
    (not a correctness read) should skip the guard in that case."""
    handle = hadoop_fs(spark, path)
    if handle is None:
        return None
    fs, jpath = handle
    if not fs.exists(jpath):
        return []
    return [
        (st.getPath().getName(), bool(st.isDirectory()))
        for st in fs.listStatus(jpath)
        if not st.getPath().getName().startswith(("_", "."))
    ]
