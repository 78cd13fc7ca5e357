"""IVF id-Bloom sidecars + point fetch (r13, VERDICT r12 #4).

"Fetch vector(s) by id" used to scan every (cell, generation) dir —
the cell of an id is unknown at fetch time.  Each dir now carries a
Bloom sidecar over the id column, so the fetch plans with pure driver
bit math (KB-scale sidecar GETs, no Spark job) and reads only the dirs
that might hold the ids.  The contract: ZERO false negatives across
the whole lifecycle (enable-backfill, append, compaction, split,
rebuild), torn sidecars degrade to scan, and the executed read touches
exactly the planned dirs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datawarehouse_etl_using_hyperjoin_spark.operators.ivf_store import (
    compact_ivf_index_manifest,
    ivf_append_manifest,
    ivf_enable_id_blooms,
    ivf_fetch_by_id,
    ivf_split_oversized_manifest,
    ivf_vacuum,
    plan_ivf_fetch,
    read_ivf_index_manifest,
    write_ivf_index_manifest,
)
from datawarehouse_etl_using_hyperjoin_spark.sources.fixtures import load_table


@pytest.fixture(scope="module")
def em(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def _build(spark, em, root, n_batches=3):
    base = em.filter(F.col("vec_id") % (n_batches + 1) == 0)
    write_ivf_index_manifest(base, root, n_centroids=4)
    for b in range(1, n_batches + 1):
        ivf_append_manifest(
            em.filter(F.col("vec_id") % (n_batches + 1) == b),
            root, batch_id=b,
        )


def _all_ids(spark, root):
    return [
        r.vec_id
        for r in read_ivf_index_manifest(spark, root).select("vec_id").collect()
    ]


@pytest.mark.slow  # soak tier (pytest.ini): run with -m ""
def test_enable_backfill_then_fetch_zero_false_negatives(
    spark, em, tmp_path
):
    root = str(tmp_path / "ivf")
    _build(spark, em, root)
    out = ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)
    assert out["gens_built"] == 4  # initial build + 3 appends
    ids = _all_ids(spark, root)
    # every committed id is findable through the pruned fetch
    for v in ids[:: max(1, len(ids) // 20)]:
        got = ivf_fetch_by_id(spark, root, [v])
        assert [r.vec_id for r in got.collect()] == [v]
    # a single-id fetch prunes most (cell, generation) dirs
    plan = plan_ivf_fetch(spark, root, [ids[0]])
    assert plan["skipped"] > plan["scanned"]
    # an id that was never ingested prunes EVERYTHING (no false "hit"
    # guarantee is probabilistic, but 2^14 bits over these counts makes
    # a stray survivor vanishingly unlikely — allow a couple)
    ghost = plan_ivf_fetch(spark, root, [10_000_019])
    assert ghost["scanned"] <= 2
    assert ivf_fetch_by_id(spark, root, [10_000_019]).count() == 0


@pytest.mark.slow  # soak tier (pytest.ini): run with -m ""
def test_fetch_reads_exactly_the_planned_dirs(spark, em, tmp_path):
    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=2)
    ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)
    ids = _all_ids(spark, root)[:3]
    def norm(p):
        return p.removeprefix("file://").removeprefix("file:")

    plan = plan_ivf_fetch(spark, root, ids)
    got = ivf_fetch_by_id(spark, root, ids)
    read_dirs = {norm(f).rsplit("/", 1)[0] for f in got.inputFiles()}
    assert read_dirs == {norm(d) for d in plan["dirs_scan"]}
    assert sorted(r.vec_id for r in got.collect()) == sorted(ids)


@pytest.mark.slow  # soak tier (pytest.ini): run with -m ""
def test_blooms_sticky_across_append_compact_split_rebuild(
    spark, em, tmp_path
):
    from datawarehouse_etl_using_hyperjoin_spark.manifest import manifest_read

    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=1)
    ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)

    # append after enable (disjoint ids — the IVF append is not keyed):
    # the new generation self-maintains sidecars
    ivf_append_manifest(
        em.filter(F.col("vec_id") % 2 == 1).withColumn(
            "vec_id", F.col("vec_id") + 1_000_000
        ),
        root, batch_id=50,
    )
    m = manifest_read(spark, root)
    live_gens = {int(g) for gs in m["cells"].values() for g in gs}
    assert {int(g) for g in m["blooms"]} == live_gens

    # compaction: merged generation gets fresh sidecars; superseded
    # generations' bloom entries drop out with their gens
    compact_ivf_index_manifest(spark, root)
    m = manifest_read(spark, root)
    live_gens = {int(g) for gs in m["cells"].values() for g in gs}
    assert {int(g) for g in m["blooms"]} == live_gens

    # split: the re-celled generation carries sidecars too
    sizes = (
        read_ivf_index_manifest(spark, root)
        .groupBy("centroid_id").count().collect()
    )
    max_rows = max(int(r["count"]) for r in sizes) - 1
    split = ivf_split_oversized_manifest(spark, root, max_rows=max_rows, k=2)
    assert split
    m = manifest_read(spark, root)
    live_gens = {int(g) for gs in m["cells"].values() for g in gs}
    assert {int(g) for g in m["blooms"]} == live_gens

    # zero false negatives over the whole lifecycle
    ids = _all_ids(spark, root)
    for v in ids[:: max(1, len(ids) // 25)]:
        assert ivf_fetch_by_id(spark, root, [v]).count() == 1
    # still pruning after all the rewrites
    plan = plan_ivf_fetch(spark, root, [ids[0]])
    assert plan["skipped"] > 0

    # vacuum reclaims superseded dirs; sidecars ride along inside them
    ivf_vacuum(spark, root, keep_manifests=1)
    for v in ids[:: max(1, len(ids) // 25)]:
        assert ivf_fetch_by_id(spark, root, [v]).count() == 1

    # full rebuild keeps the setting
    write_ivf_index_manifest(
        read_ivf_index_manifest(spark, root).drop("cell_id", "centroid_id"),
        root, n_centroids=4,
    )
    m = manifest_read(spark, root)
    assert m["bloom_cols"] == ["vec_id"]
    assert len(m["blooms"]) == 1  # the rebuild generation


def test_huge_id_list_skips_probing_but_stays_exact(spark, em, tmp_path):
    """ADVICE r13: the fetch plan hashes each id ONCE (not per dir) and
    applies the batch table's ``_BLOOM_PROBE_MAX`` ceiling — an id list
    past the ceiling is not probed at all (|ids| x k hashes per dir of
    driver CPU buys little pruning on a huge list): every dir is kept
    for the scan, and the answer is still exact."""
    from datawarehouse_etl_using_hyperjoin_spark.sources.manifest_table import (
        _BLOOM_PROBE_MAX,
    )

    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=1)
    ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)
    ids = _all_ids(spark, root)
    huge = ids[:3] + list(range(50_000_000, 50_000_000 + _BLOOM_PROBE_MAX))
    assert len(huge) > _BLOOM_PROBE_MAX
    plan = plan_ivf_fetch(spark, root, huge)
    assert plan["skipped"] == 0 and plan["scanned"] == plan["total"]
    got = ivf_fetch_by_id(spark, root, huge)
    assert sorted(r.vec_id for r in got.collect()) == sorted(ids[:3])
    # at the ceiling, probing still prunes
    at_cap = ids[:1] + list(range(60_000_000, 60_000_000 + _BLOOM_PROBE_MAX - 1))
    plan2 = plan_ivf_fetch(spark, root, at_cap)
    assert plan2["skipped"] > 0
    got2 = ivf_fetch_by_id(spark, root, at_cap)
    assert [r.vec_id for r in got2.collect()] == ids[:1]


def test_torn_sidecar_degrades_to_scan_never_misses(spark, em, tmp_path):
    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=1)
    ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)
    ids = _all_ids(spark, root)
    plan = plan_ivf_fetch(spark, root, [ids[0]])
    # tear EVERY sidecar of one scanned dir's generation
    import glob

    victim = sorted(glob.glob(f"{root}/data/centroid_id=*/g=*/_bloom_*.json"))
    with open(victim[0], "w") as fh:
        fh.write('{"format": "gen-blo')  # torn mid-write
    # the torn dir is scanned (degrade), never mis-skipped
    from datawarehouse_etl_using_hyperjoin_spark.sources import (
        manifest_table as mt,
    )

    mt._BLOOM_CACHE.clear()
    plan2 = plan_ivf_fetch(spark, root, [ids[0]])
    assert plan2["scanned"] >= plan["scanned"]
    assert ivf_fetch_by_id(spark, root, [ids[0]]).count() == 1


def test_enable_is_idempotent_and_refuses_bad_id_type(
    spark, em, tmp_path
):
    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=1)
    ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)
    again = ivf_enable_id_blooms(spark, root)
    assert again == {"gens_built": 0, "published_seq": 0}

    # an unsupported id type (float) is refused at enable time — its
    # CAST-to-string form diverges from the driver probe's hashing
    root2 = str(tmp_path / "ivf2")
    bad = em.withColumn("vec_id", F.col("vec_id").cast("double"))
    write_ivf_index_manifest(bad, root2, n_centroids=2, id_col="vec_id")
    with pytest.raises(ValueError, match="integral/string/date"):
        ivf_enable_id_blooms(spark, root2, id_col="vec_id")


def test_unbloomed_fetch_degrades_to_full_listing_but_exact(
    spark, em, tmp_path
):
    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=1)
    ids = _all_ids(spark, root)
    plan = plan_ivf_fetch(spark, root, [ids[0]])
    assert plan["skipped"] == 0  # nothing to prune with: full listing
    got = ivf_fetch_by_id(spark, root, ids[:3])
    assert sorted(r.vec_id for r in got.collect()) == sorted(ids[:3])
    with pytest.raises(ValueError, match="at least one id"):
        ivf_fetch_by_id(spark, root, [])


# ---------------------------------------------------------------------------
# CoW vector erasure (ivf_delete_by_id)


def test_delete_by_id_rewrites_only_holder_dirs(spark, em, tmp_path):
    from datawarehouse_etl_using_hyperjoin_spark.manifest import manifest_read
    from datawarehouse_etl_using_hyperjoin_spark.operators.ivf_store import (
        ivf_delete_by_id,
    )

    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=2)
    ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)
    ids = _all_ids(spark, root)
    n_before = len(ids)
    victims = ids[:2]
    pre = manifest_read(spark, root)
    pre_dirs = {
        (int(c), int(g))
        for c, gs in pre["cells"].items()
        for g in gs
    }
    out = ivf_delete_by_id(spark, root, victims)
    assert out["rows_deleted"] == 2
    assert out["dirs_rewritten"] <= 2 + 2  # true holders + rare bloom FPs
    post = manifest_read(spark, root)
    post_dirs = {
        (int(c), int(g))
        for c, gs in post["cells"].items()
        for g in gs
    }
    # untouched dirs keep their (cell, gen) ids byte-identical
    assert len(pre_dirs & post_dirs) == out["dirs_untouched"]
    t = read_ivf_index_manifest(spark, root)
    assert t.count() == n_before - 2
    assert t.where(F.col("vec_id").isin(victims)).count() == 0
    # rewritten sidecars: a fetch of an erased id prunes to nothing
    for v in victims:
        assert ivf_fetch_by_id(spark, root, [v]).count() == 0
    plan = plan_ivf_fetch(spark, root, [victims[0]])
    assert plan["scanned"] <= 2  # bloom FPs only
    # time travel still shows the vectors until vacuum
    snap = read_ivf_index_manifest(spark, root, as_of=pre["seq"])
    assert snap.where(F.col("vec_id").isin(victims)).count() == 2
    ivf_vacuum(spark, root, keep_manifests=1)
    assert read_ivf_index_manifest(spark, root).count() == n_before - 2
    # survivors all still fetchable after the vacuum
    rest = _all_ids(spark, root)
    for v in rest[:: max(1, len(rest) // 10)]:
        assert ivf_fetch_by_id(spark, root, [v]).count() == 1


def test_delete_by_id_nothing_matches_publishes_nothing(
    spark, em, tmp_path
):
    from datawarehouse_etl_using_hyperjoin_spark.manifest import manifest_read
    from datawarehouse_etl_using_hyperjoin_spark.operators.ivf_store import (
        ivf_delete_by_id,
    )

    root = str(tmp_path / "ivf")
    _build(spark, em, root, n_batches=1)
    ivf_enable_id_blooms(spark, root, bloom_bits=1 << 14)
    seq = manifest_read(spark, root)["seq"]
    out = ivf_delete_by_id(spark, root, [987_654_321])
    assert out["rows_deleted"] == 0 and out["dirs_rewritten"] == 0
    assert manifest_read(spark, root)["seq"] == seq
    import pytest as _pytest

    with _pytest.raises(ValueError, match="at least one id"):
        ivf_delete_by_id(spark, root, [])
