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
exactly-once ledger).  Generation ids are ATTEMPT-UNIQUE
(``manifest.fresh_gen``: seq-major with a random component), so no two
write attempts ever share a data path — the property the multi-writer
conditional PUT needs, since it protects the manifest but not the data
dirs.  Compared to the partition-overwrite sinks, the exactly-once
guarantee is STRONGER here: a replayed ``foreachBatch`` delivery is
detected by the ledger and skipped outright, rather than relying on
the rewrite being byte-idempotent, and a crash between data write and
publish leaves orphan dirs no reader ever resolves (the retry lands at
a fresh generation; the orphans await vacuum).

Aging: every batch is one generation, so a long-lived stream is O(age)
directories — the same shape the partition sinks have —
:func:`compact_manifest_table` merges the SMALL generations older than
the newest ``keep_last`` into one (size-TIERED since r12: generations
already at ``min_merge_mb`` are frozen, so a row is rewritten a
CONSTANT number of times however long the stream runs; publish
supersedes, nothing deleted until :func:`vacuum_manifest_table`).
``keep_last`` here protects nothing (the ledger already makes replays
no-ops) but is kept for operational symmetry: the newest batches stay
byte-verbatim for audit/debug.

Reference lineage: the reference's sink is five JDBC INSERTs per tuple
with autocommit (StreamGeneratorThread.java:134-158) — no atomicity at
any granularity; this store and the partition sinks are the two
engine-side answers, local-fs and object-store flavored.
"""

from __future__ import annotations

import json
import math
import os as _os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType

from ..manifest import (
    MAX_REBASES,
    ManifestConflictError,
    _delete,
    _ls_names,
    fresh_gen,
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


def _publish(spark, root, gens, batches, seq, schema=None) -> int:
    payload = {
        "table": "batch-table",
        "gens": sorted(int(g) for g in gens),
        "batches": {str(b): int(g) for b, g in batches.items()},
    }
    if schema is not None:
        payload["schema"] = (
            schema if isinstance(schema, dict) else json.loads(schema.json())
        )
    return manifest_publish(spark, root, payload, seq=seq)


def _merge_schema(old: StructType | None, new: StructType) -> StructType:
    """ADDITIVE schema evolution (r12): reconcile a batch's schema with
    the table's recorded one.  New columns are appended (forced nullable
    — older generations lack them, so reads must fill null); a column a
    batch omits stays, turned nullable for the same reason; a TYPE
    change or any other narrowing is refused loudly, because it would
    make already-committed generations unreadable under the merged
    schema.  Read-time reconciliation is the parquet reader's
    missing-column-to-null rule under the recorded schema — the
    ``unionByName(allowMissingColumns=True)`` semantics without N
    per-generation unions."""
    if old is None:
        return new
    remaining = {f.name: f for f in new.fields}
    fields = []
    for f in old.fields:
        g = remaining.pop(f.name, None)
        if g is None:
            fields.append(StructField(f.name, f.dataType, True, f.metadata))
        elif g.dataType != f.dataType:
            raise ValueError(
                f"schema evolution refused for column {f.name!r}: "
                f"{f.dataType.simpleString()} -> "
                f"{g.dataType.simpleString()} — the manifest table "
                "supports ADDITIVE evolution only (new nullable "
                "columns); a type change would make already-committed "
                "generations unreadable"
            )
        else:
            fields.append(
                StructField(
                    f.name, f.dataType, f.nullable or g.nullable, f.metadata
                )
            )
    for g in remaining.values():
        fields.append(StructField(g.name, g.dataType, True, g.metadata))
    return StructType(fields)


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

    Schema (r12): each manifest records the table's merged schema, and
    appends reconcile additively — a batch may ADD nullable columns or
    OMIT existing ones (older/missing columns read as null under the
    recorded schema); type changes are refused loudly
    (:func:`_merge_schema`).  Recording the schema also makes
    generations with no parquet footers (all-empty batches under
    committers that skip empty files) readable.  Tables whose manifests
    predate schema recording stay on read-time inference, unchanged.
    """
    if "g" in df.columns:
        raise ValueError(
            "the manifest table reserves column name 'g' for its "
            "generation partition — rename the input column first "
            "(reads resolve generations as a partition column and would "
            "collide)"
        )
    spark = df.sparkSession
    # optimistic-concurrency rebase loop (r12): a lost conditional PUT
    # means another writer committed first — re-resolve the head; the
    # ledger decides whether OUR batch is now committed (their replay of
    # it won: exactly-once no-op) or disjoint (re-derive at a fresh seq
    # — the losing attempt's generation dir is an orphan vacuum
    # reclaims).  Both racing commits land; none is silently dropped.
    last_conflict: ManifestConflictError | None = None
    for _ in range(MAX_REBASES):
        live = manifest_read(spark, root)
        if live is not None and live.get("table") != "batch-table":
            raise ValueError(
                f"manifest at {root!r} is a {live.get('table')!r} table, "
                "not a batch-table — appending here would publish over "
                "the other store's commit log"
            )
        if live is not None and str(int(batch_id)) in live["batches"]:
            return None  # replay of a committed batch: exactly-once no-op
        # additive evolution against the recorded schema; legacy tables
        # (manifest without a schema) stay inference-read and unrecorded
        if live is None:
            merged = df.schema
        elif live.get("schema") is not None:
            merged = _merge_schema(
                StructType.fromJson(live["schema"]), df.schema
            )
        else:
            merged = None
        seq = (live["seq"] + 1) if live else 1
        # ATTEMPT-UNIQUE generation path (fresh_gen docstring): the
        # conditional PUT protects the manifest, not the data dirs — a
        # seq-derived path would let a losing writer's late data write
        # overwrite the winner's committed generation in place.  A
        # crashed/losing attempt's dir is an orphan vacuum reclaims.
        gen = fresh_gen(seq)
        df.write.mode("overwrite").parquet(_gen_dir(root, gen))
        gens = (list(live["gens"]) if live else []) + [gen]
        batches = dict(live["batches"]) if live else {}
        batches[str(int(batch_id))] = gen
        try:
            return _publish(spark, root, gens, batches, seq, schema=merged)
        except ManifestConflictError as exc:
            last_conflict = exc
    raise ManifestConflictError(
        f"append of batch {batch_id} to {root!r} lost the conditional "
        f"PUT {MAX_REBASES} times in a row — sustained "
        "multi-writer contention on one table; last conflict: "
        f"{last_conflict}"
    )


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
    read.

    When the resolved manifest records a schema (r12), the union is
    read under THAT schema: generations missing later-added columns
    fill null (additive evolution), footerless all-empty generations
    stay readable, and an ``as_of`` read returns the snapshot's own
    schema, not today's."""
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
    if m.get("schema") is not None:
        # each dir is read as its own root (no basePath): no partition
        # column is discovered, so the recorded schema IS the result
        return spark.read.schema(StructType.fromJson(m["schema"])).parquet(
            *dirs
        )
    return spark.read.option("basePath", _data_root(root)).parquet(
        *dirs
    ).drop("g")


def _gen_bytes(spark: SparkSession, root: str, g: int) -> int:
    """On-disk bytes of one generation dir — the size-tiering input.
    Hadoop ``getContentSummary`` (one RPC; LIST on object stores) with a
    local ``os.walk`` fallback for Connect sessions."""
    from ..fsutil import hadoop_fs

    path = _gen_dir(root, g)
    got = hadoop_fs(spark, path)
    if got is not None:
        fs, jpath = got
        if not fs.exists(jpath):
            return 0
        return int(fs.getContentSummary(jpath).getLength())
    lp = path.removeprefix("file://").removeprefix("file:")
    total = 0
    for dirpath, _dirs, files in _os.walk(lp):
        for f in files:
            try:
                total += _os.path.getsize(_os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def compact_manifest_table(
    spark: SparkSession,
    root: str,
    *,
    keep_last: int = 2,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
    min_merge_mb: float | None = None,
) -> dict[str, int]:
    """Merge the SMALL generations older than the newest ``keep_last``
    into ONE fresh generation, bin-packed to ~``target_file_mb`` files
    (sized from the file listing, like ``compact_table``) and optionally
    range-sorted on ``sort_by`` so footer stats stay selective.  Commit
    is one manifest publish; the superseded dirs await
    :func:`vacuum_manifest_table`.  A crash leaves the live table
    untouched — no staging validation, no rollback, no brief-absence
    window (``compact_lsh_index``'s rename caveats), because nothing was
    published.  The batch ledger is unchanged: exactly-once survives any
    number of compactions.

    Size tiering (r12): generations at or above ``min_merge_mb``
    (default ``target_file_mb``) are FROZEN — already compact, never
    re-merged.  Without the tier, every scheduled pass re-merged the
    previously-merged big generation with the new small ones, so the
    total bytes a maintained stream rewrites grows QUADRATICALLY in
    stream age (measured: the r12 20×/20-batch probe paid ~6.4 s per
    cadence pass, most of it re-rewriting already-compacted rows) — a
    scale-killer at 10⁵ batches.  With the tier, a row is rewritten at
    most ~``min_merge_mb / batch_mb`` times ever, CONSTANT in stream
    age, and the generation-dir count stays O(table_size/min_merge_mb +
    keep_last + cadence) — bounded listing growth, bounded rewrite."""
    live = _live(spark, root)
    gens = sorted(int(g) for g in live["gens"])
    old = gens[: max(0, len(gens) - keep_last)] if keep_last > 0 else gens
    limit = int(
        (target_file_mb if min_merge_mb is None else min_merge_mb)
        * (1 << 20)
    )
    old = [g for g in old if _gen_bytes(spark, root, g) < limit]
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
    gen = fresh_gen(seq)  # attempt-unique: see fresh_gen docstring
    old_dirs = [_gen_dir(root, g) for g in old]
    if live.get("schema") is not None:
        # recorded schema: evolved/footerless generations merge cleanly
        merged = spark.read.schema(
            StructType.fromJson(live["schema"])
        ).parquet(*old_dirs)
    else:
        merged = spark.read.option("basePath", _data_root(root)).parquet(
            *old_dirs
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
    packed.write.mode("overwrite").parquet(_gen_dir(root, gen))
    new_gens = [gen] + [g for g in gens if g not in old]
    _publish(
        spark, root, new_gens, dict(live["batches"]), seq,
        schema=live.get("schema"),
    )
    return {
        "files_before": files_before,
        "files_after": len(read_manifest_table(spark, root).inputFiles()),
        "rows": rows,
        "gens_before": len(gens),
        "gens_after": len(new_gens),
    }


def vacuum_manifest_table(
    spark: SparkSession,
    root: str,
    *,
    keep_manifests: int = 3,
    live_stream: bool = False,
) -> dict[str, int]:
    """Reclaim what no RETAINED snapshot references: first expire
    manifest files beyond the newest ``keep_manifests`` (shrinking the
    time-travel window, Iceberg's expire-snapshots step), then delete
    every generation dir referenced by none of the manifests that
    remain — superseded generations past the window and crash orphans
    alike.  Every retained manifest therefore stays FULLY readable via
    ``read_manifest_table(as_of=...)``; the snapshot window and the
    storage bound are the same ``keep_manifests`` knob.

    Snapshot-read vs vacuum race (r12, the classic Iceberg retention
    race): a reader that resolved manifest ``v=k`` — a pinned ``as_of``
    or simply a long-running live read — scans k's generation dirs for
    as long as its job runs; a concurrent vacuum can reclaim those dirs
    mid-read once newer commits push k outside the retention window.
    THE CONTRACT IS TIME-BASED: keep the retention window (the wall
    time ``keep_manifests`` commits span) longer than the longest read
    you run against the table.  ``live_stream=True`` declares that the
    table's owning stream is committing concurrently (what
    ``make_maintenance_sink`` passes) and REFUSES ``keep_manifests``
    below 2 — with only the newest manifest retained, every new commit
    immediately invalidates the manifest any in-flight reader resolved,
    so even instant reads race."""
    from ..manifest import manifest_history

    if live_stream and keep_manifests < 2:
        raise ValueError(
            f"keep_manifests={keep_manifests} on a LIVE stream's table: "
            "every new commit would immediately reclaim the generations "
            "of the manifest any concurrent reader just resolved "
            "(snapshot-read/vacuum race) — keep at least 2, sized so "
            "the retention window outlasts your longest read"
        )
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
