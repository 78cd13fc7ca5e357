"""Generic manifest-backed batch table: rename-free streaming at rest.

The corpus-shaped sinks (streamed corpus, star fact, quarantine) get
exactly-once from per-batch PARTITION overwrite and bounded aging from
``compact_table``'s two-RENAME swap — both local-fs idioms.  This is the
same at-rest contract rebuilt on the :mod:`..manifest` commit protocol
(fresh-path generations + atomic manifest PUT, every primitive with a
1:1 object-store analogue; see that module's table), for deployments
where the table lives on an object store:

Layout::

    {root}/_manifest/v{seq:08d}.json   # commit log; newest valid = live
    {root}/data/g={gen}/               # immutable data generations

The manifest carries ``gens`` (the live generation list — a read unions
exactly those dirs) and ``batches`` (``{batch_id: gen}`` — the
exactly-once ledger).  Compared to the partition-overwrite sinks, the
exactly-once guarantee is STRONGER here: a replayed ``foreachBatch``
delivery is detected by the ledger and skipped outright, rather than
relying on the rewrite being byte-idempotent, and a crash between data
write and publish leaves orphan dirs no reader ever resolves (the retry
overwrites them at the same target generation — a per-generation static
overwrite of a gen-specific fresh path).

Aging: every batch is one generation, so a long-lived stream is O(age)
directories — the same shape the partition sinks have —
:func:`compact_manifest_table` merges all but the newest ``keep_last``
BATCH generations into one (publish supersedes; nothing deleted until
:func:`vacuum_manifest_table`).  ``keep_last`` here protects nothing
(the ledger already makes replays no-ops) but is kept for operational
symmetry: the newest batches stay byte-verbatim for audit/debug.

Reference lineage: the reference's sink is five JDBC INSERTs per tuple
with autocommit (StreamGeneratorThread.java:134-158) — no atomicity at
any granularity; this store and the partition sinks are the two
engine-side answers, local-fs and object-store flavored.
"""

from __future__ import annotations

import math
import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..manifest import (
    _delete,
    _ls_names,
    manifest_publish,
    manifest_read,
    manifest_vacuum,
)

_DATA = "data"


def _data_root(root: str) -> str:
    return f"{root.rstrip('/')}/{_DATA}"


def _gen_dir(root: str, gen: int) -> str:
    return f"{_data_root(root)}/g={int(gen)}"


def _live(spark: SparkSession, root: str, at: int | None = None) -> dict:
    m = manifest_read(spark, root, at=at)
    if m is None and at is not None:
        raise ValueError(
            f"no retained manifest at or before seq {at} at {root!r} — "
            "the snapshot window is bounded by manifest retention "
            "(manifest_vacuum keep_last)"
        )
    if m is None:
        raise ValueError(
            f"no table manifest at {root!r} — the first "
            "manifest_table_append creates it"
        )
    if m.get("table") != "batch-table":
        # same protocol, different table kind (e.g. an ivf-index root):
        # fail with the actual mismatch, not a KeyError on 'gens'
        raise ValueError(
            f"manifest at {root!r} is a {m.get('table')!r} table, not a "
            "batch-table — wrong store for this root"
        )
    return m


def _publish(spark, root, gens, batches, seq) -> int:
    return manifest_publish(
        spark, root,
        {
            "table": "batch-table",
            "gens": sorted(int(g) for g in gens),
            "batches": {str(b): int(g) for b, g in batches.items()},
        },
        seq=seq,
    )


def manifest_table_append(
    df: DataFrame, root: str, batch_id: int
) -> int | None:
    """EXACTLY-ONCE batch append: write the batch at one fresh
    generation, then publish a manifest adding it to ``gens`` and
    recording ``batch_id`` in the ledger.  A re-delivery of an
    already-committed ``batch_id`` (foreachBatch replay after a lost
    checkpoint commit) is detected in the ledger and SKIPPED — returns
    None; otherwise returns the published seq.  Suitable directly as a
    ``foreachBatch`` body: ``lambda b, i: manifest_table_append(b, root, i)``.
    """
    if "g" in df.columns:
        raise ValueError(
            "the manifest table reserves column name 'g' for its "
            "generation partition — rename the input column first "
            "(reads resolve generations as a partition column and would "
            "collide)"
        )
    spark = df.sparkSession
    live = manifest_read(spark, root)
    if live is not None and live.get("table") != "batch-table":
        raise ValueError(
            f"manifest at {root!r} is a {live.get('table')!r} table, not "
            "a batch-table — appending here would publish over the other "
            "store's commit log"
        )
    if live is not None and str(int(batch_id)) in live["batches"]:
        return None  # replay of a committed batch: exactly-once no-op
    seq = (live["seq"] + 1) if live else 1
    # static overwrite of the gen-specific fresh path: delete-then-write,
    # both object-store-safe; idempotent for a crashed attempt's retry
    df.write.mode("overwrite").parquet(_gen_dir(root, seq))
    gens = (list(live["gens"]) if live else []) + [seq]
    batches = dict(live["batches"]) if live else {}
    batches[str(int(batch_id))] = seq
    return _publish(spark, root, gens, batches, seq)


def read_manifest_table(
    spark: SparkSession, root: str, *, as_of: int | None = None
) -> DataFrame:
    """Union of exactly the LIVE generations — orphans from crashed
    appends/compactions are invisible by construction.

    ``as_of`` (r11) reads the SNAPSHOT as of commit seq ``as_of``
    instead (newest manifest ≤ it): time travel for free, because every
    retained manifest fully describes the table at its commit.  The
    window is what retention kept — a vacuumed snapshot's generation
    dirs surface as a clear error here rather than a silent partial
    read."""
    m = _live(spark, root, at=as_of)
    if not m["gens"]:
        raise ValueError(f"table manifest at {root!r} lists no generations")
    dirs = [_gen_dir(root, g) for g in m["gens"]]
    if as_of is not None:
        from ..fsutil import dir_exists

        gone = [d for d in dirs if not dir_exists(spark, d)]
        if gone:
            raise ValueError(
                f"snapshot seq {m['seq']} of {root!r} is no longer fully "
                f"readable — {len(gone)} of its generation dirs were "
                "vacuumed (time travel reaches only what "
                "vacuum_manifest_table retained)"
            )
    return spark.read.option("basePath", _data_root(root)).parquet(
        *dirs
    ).drop("g")


def compact_manifest_table(
    spark: SparkSession,
    root: str,
    *,
    keep_last: int = 2,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> dict[str, int]:
    """Merge all but the newest ``keep_last`` generations into ONE fresh
    generation, bin-packed to ~``target_file_mb`` files (sized from the
    file listing, like ``compact_table``) and optionally range-sorted on
    ``sort_by`` so footer stats stay selective.  Commit is one manifest
    publish; the superseded dirs await :func:`vacuum_manifest_table`.  A
    crash leaves the live table untouched — no staging validation, no
    rollback, no brief-absence window (``compact_lsh_index``'s rename
    caveats), because nothing was published.  The batch ledger is
    unchanged: exactly-once survives any number of compactions."""
    live = _live(spark, root)
    gens = sorted(int(g) for g in live["gens"])
    old = gens[: len(gens) - keep_last] if keep_last > 0 else gens
    files_before = len(
        read_manifest_table(spark, root).inputFiles()
    )
    if len(old) < 2:
        return {
            "files_before": files_before,
            "files_after": files_before,
            "rows": read_manifest_table(spark, root).count(),
            "gens_before": len(gens),
            "gens_after": len(gens),
        }
    seq = live["seq"] + 1
    merged = spark.read.option("basePath", _data_root(root)).parquet(
        *(_gen_dir(root, g) for g in old)
    ).drop("g")
    files = merged.inputFiles()
    total_bytes = 0
    for f in files:
        try:
            total_bytes += _os.path.getsize(f.removeprefix("file:"))
        except OSError:
            total_bytes = 0  # non-local: ~8 inputs per output heuristic
            break
    n_out = (
        max(1, math.ceil(total_bytes / (target_file_mb << 20)))
        if total_bytes
        else max(1, len(files) // 8)
    )
    rows = merged.count()
    packed = (
        merged.repartitionByRange(n_out, *[F.col(c) for c in sort_by])
        .sortWithinPartitions(*sort_by)
        if sort_by
        else merged.repartition(n_out)
    )
    packed.write.mode("overwrite").parquet(_gen_dir(root, seq))
    new_gens = [seq] + [g for g in gens if g not in old]
    _publish(spark, root, new_gens, dict(live["batches"]), seq)
    return {
        "files_before": files_before,
        "files_after": len(read_manifest_table(spark, root).inputFiles()),
        "rows": rows,
        "gens_before": len(gens),
        "gens_after": len(new_gens),
    }


def vacuum_manifest_table(
    spark: SparkSession, root: str, *, keep_manifests: int = 3
) -> dict[str, int]:
    """Reclaim what no RETAINED snapshot references: first expire
    manifest files beyond the newest ``keep_manifests`` (shrinking the
    time-travel window, Iceberg's expire-snapshots step), then delete
    every generation dir referenced by none of the manifests that
    remain — superseded generations past the window and crash orphans
    alike.  Every retained manifest therefore stays FULLY readable via
    ``read_manifest_table(as_of=...)``; the snapshot window and the
    storage bound are the same ``keep_manifests`` knob.  Single-writer
    contract, as everywhere in the manifest protocol."""
    from ..manifest import manifest_history

    _live(spark, root)  # kind check + fail loudly on an empty root
    n_manifests = len(manifest_vacuum(spark, root, keep_last=keep_manifests))
    keep = {
        int(g)
        for m in manifest_history(spark, root)
        for g in m.get("gens", ())
    }
    dropped = 0
    for name in _ls_names(spark, _data_root(root)):
        if not name.startswith("g="):
            continue
        try:
            g = int(name.split("=", 1)[1])
        except ValueError:
            continue
        if g not in keep and _delete(
            spark, f"{_data_root(root)}/{name}", recursive=True
        ):
            dropped += 1
    return {
        "data_dirs_deleted": dropped,
        "manifests_deleted": n_manifests,
    }
