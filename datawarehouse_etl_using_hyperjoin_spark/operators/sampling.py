"""Deterministic sampling / mixing / packing for training-data pipelines.

Every operator here is RNG-free: membership decisions hash the row's
content or key, so assignments are reproducible across runs, engines,
partitionings and cluster sizes, and survive backfills (the property
`train_eval_split` already establishes for splits).  All are pure column
expressions — no shuffle beyond what the semantics require.

- :func:`hash_sample` — Bernoulli-style sampling at a fixed rate.
- :func:`stratified_sample` — per-stratum rates (the "data mixture
  weights ≤ 1" case: downsample over-represented sources).
- :func:`upsample` — per-stratum repetition weights ≥ 0 (epoch factors:
  2.7 means every doc appears twice and 70% of docs a third time,
  chosen deterministically).
- :func:`pack_documents` — greedy sequence packing: assign docs to
  fixed-token-budget bins per partition key (one window cumsum — no
  Python, no driver loop).
- :func:`temperature_rates` / :func:`temperature_sample` — XLM-R-style
  p_i^alpha temperature mixing, derived from the data's own stratum
  counts and applied via :func:`stratified_sample`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _hash_bucket(col: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from md5(salt || value) — 48-bit prefix
    stays inside BIGINT, matching the q_scalar_funcs shard idiom."""
    h48 = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 12), 16, 10
    ).cast("long")
    return F.pmod(h48, F.lit(_BUCKETS))


def hash_sample(
    df: DataFrame, rate: float, key_col: str, salt: str = "sample"
) -> DataFrame:
    """Keep ≈``rate`` of rows, deterministically by key hash.

    Unlike ``df.sample()`` (seeded per-partition RNG — resample on every
    repartition), the decision depends only on (salt, key): stable under
    shuffles, retries and incremental reruns, and different salts give
    independent samples.
    """
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.filter(_hash_bucket(F.col(key_col), salt) < int(rate * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str,
    default_rate: float = 1.0,
    salt: str = "stratified",
) -> DataFrame:
    """Per-stratum deterministic sampling — the mixture-reweighting step
    (e.g. ``{"web": 0.3, "code": 1.0}``) applied in ONE scan, no
    per-stratum jobs.  Strata absent from ``rates`` keep ``default_rate``.
    """
    threshold = F.lit(int(default_rate * _BUCKETS))
    for stratum, rate in rates.items():
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * _BUCKETS))
        ).otherwise(threshold)
    return df.filter(_hash_bucket(F.col(key_col), salt) < threshold)


def upsample(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    salt: str = "upsample",
) -> DataFrame:
    """Repeat rows per stratum weight (epoch factors for data mixing).

    Weight w = k + f (integer + fraction): every row appears k times and
    a deterministic f-fraction of rows once more.  Output carries a
    ``repeat_idx`` column (0-based) so downstream shuffles spread the
    copies.  Weights < 1 act like :func:`stratified_sample`.

    Strata absent from ``weights`` keep ``default_weight`` — 1.0 (pass
    through once) for symmetry with :func:`stratified_sample`'s
    ``default_rate``, so an incomplete mixture spec never silently drops
    data; pass ``default_weight=0.0`` to make the spec exhaustive-or-drop
    explicitly.
    """
    if default_weight < 0:
        raise ValueError(f"default_weight must be >= 0, got {default_weight}")
    k = F.lit(int(default_weight))
    frac_thresh = F.lit(int((default_weight - int(default_weight)) * _BUCKETS))
    for stratum, w in weights.items():
        if w < 0:
            raise ValueError(f"weight must be >= 0, got {w} for {stratum!r}")
        k = F.when(F.col(strata_col) == stratum, F.lit(int(w))).otherwise(k)
        frac_thresh = F.when(
            F.col(strata_col) == stratum, F.lit(int((w - int(w)) * _BUCKETS))
        ).otherwise(frac_thresh)
    extra = (_hash_bucket(F.col(key_col), salt) < frac_thresh).cast("int")
    n_copies = (k + extra).alias("__n")
    out = df.withColumn("__n", n_copies).filter(F.col("__n") > 0)
    return (
        out.withColumn(
            "repeat_idx", F.explode(F.sequence(F.lit(0), F.col("__n") - 1))
        )
        .drop("__n")
    )


def pack_documents(
    docs: DataFrame,
    token_col: str,
    budget: int,
    *,
    id_col: str = "doc_id",
    partition_col: str | None = None,
    bin_col: str = "bin_id",
) -> DataFrame:
    """Greedy sequence packing: assign each doc a ``bin_col`` so that
    consecutive docs (id order, within ``partition_col``) accumulate to
    ≈``budget`` tokens per bin — the pretokenization packing step that
    turns a document corpus into fixed-length training sequences.

    bin = floor((cumsum(tokens) − tokens) / budget): one window cumsum,
    no Python, no driver loop.  Greedy-by-order packing overfills a bin
    by at most one document (the standard streaming-packing trade; exact
    bin packing is NP-hard and irrelevant at corpus scale).  Documents
    longer than ``budget`` get a bin of their own.  With
    ``partition_col`` (e.g. the train/eval split, or a shard key) packing
    parallelizes per partition; without it the window is global — fine
    for bounded corpora, use a shard key at 100 TB.
    """
    if partition_col is None:
        w = Window.orderBy(id_col)
        part_cols: list[str] = []
    else:
        w = Window.partitionBy(partition_col).orderBy(id_col)
        part_cols = [partition_col]
    cum = F.sum(token_col).over(w.rowsBetween(Window.unboundedPreceding, 0))
    bin_expr = F.floor((cum - F.col(token_col)) / F.lit(budget))
    return docs.withColumn(bin_col, bin_expr).withColumn(
        bin_col,
        F.concat_ws("/", *part_cols, F.col(bin_col).cast("string"))
        if part_cols
        else F.col(bin_col).cast("string"),
    )


def temperature_rates(
    df: DataFrame, strata_col: str, *, alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-based mixture rates for imbalanced strata (the
    multilingual rebalancing rule of Conneau & Lample 2019 / XLM-R,
    Conneau et al. 2020): sample stratum i with probability ∝ p_i^alpha,
    which flattens the distribution as alpha → 0.  Expressed as pure
    DOWNSAMPLING rates (max rate = 1.0, for the rarest stratum):

        r_i = (c_min / c_i) ** (1 - alpha)

    alpha=1 keeps the natural mix (all rates 1), alpha=0 equalizes every
    stratum to the rarest's count.  The counts aggregate collapses to one
    row per stratum (bounded driver collect, same posture as the LM
    totals).  alpha=0.5 computes via sqrt — IEEE-correctly-rounded in
    every engine, so rates (and the md5 thresholds derived from them) are
    bit-reproducible cross-engine; other alphas go through pow(), whose
    last ulp is libm-dependent (fine for training mixes, not for oracle
    comparison).
    """
    import math

    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    rows = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("c")).collect()
    if not rows:
        return {}
    cmin = min(r["c"] for r in rows)
    if alpha == 0.5:
        return {r[strata_col]: math.sqrt(cmin / r["c"]) for r in rows}
    return {r[strata_col]: (cmin / r["c"]) ** (1.0 - alpha) for r in rows}


def temperature_sample(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    *,
    alpha: float = 0.5,
    salt: str = "temperature",
) -> DataFrame:
    """One-call temperature mixing: :func:`temperature_rates` composed
    with :func:`stratified_sample` — deterministic md5 membership, one
    scan, no RNG.  Returns the sampled rows plus a ``rate`` column (the
    stratum's sampling rate) for audit/weighting downstream."""
    rates = temperature_rates(df, strata_col, alpha=alpha)
    sampled = stratified_sample(df, strata_col, rates, key_col, salt=salt)
    rate_col = F.lit(1.0)
    for stratum, r in rates.items():
        rate_col = F.when(F.col(strata_col) == stratum, F.lit(r)).otherwise(rate_col)
    return sampled.withColumn("rate", rate_col)


def shuffle_shard(
    df: DataFrame,
    key_col: str,
    n_shards: int,
    *,
    salt: str = "shuffle",
    shard_col: str = "shard_id",
    pos_col: str = "shard_pos",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the final step before a
    training run: every row gets a pseudo-random but REPRODUCIBLE shard
    (md5-hash of the key) and a position within that shard (rank by the
    full md5 hex, key tie-break).  Unlike ``df.orderBy(rand())``, the
    order depends only on (salt, key): stable across runs, engines,
    partitionings and retries, and a different salt is a fresh epoch
    permutation.  ``key_col`` must be UNIQUE (a doc/chunk id): rows
    sharing a key get identical sort keys and their relative positions
    are then partitioning-dependent — shard a non-unique grain by a
    composite key instead.

    Scale shape: one hash projection plus one window PER SHARD — shards
    sort independently in parallel, so per-shard sort size is corpus/N
    and there is never a global sort.  At 100 TB pick n_shards ≈ the
    file count you want (each shard written as one ordered file via
    ``partitionBy(shard_col)``).
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    h48 = F.conv(F.substring(h, 1, 12), 16, 10).cast("long")
    out = df.withColumn("__h", h).withColumn(
        shard_col, F.pmod(h48, F.lit(n_shards))
    )
    w = Window.partitionBy(shard_col).orderBy(F.col("__h"), F.col(key_col))
    return out.withColumn(
        pos_col, F.row_number().over(w).cast("long")
    ).drop("__h")


def write_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    *,
    shard_col: str = "shard_id",
    pos_col: str = "shard_pos",
    mode: str = "overwrite",
) -> None:
    """Persist a :func:`shuffle_shard` result as ordered shard files:
    one directory per shard (``shard_id=N/``), rows inside each file in
    ``pos_col`` order — the layout a training data-loader consumes
    (read shard dirs round-robin, stream each file sequentially; the
    shuffle was already done at write time).

    ``n_shards`` is the count the caller passed to :func:`shuffle_shard`
    — taken as a parameter, NOT derived with a distinct-count, because
    that would execute the whole upstream shuffle plan a second time
    just to learn a number the caller already knows.

    One repartition ON the shard column clusters each shard into a
    single task, ``sortWithinPartitions`` orders it, and the
    partitioned write splits by shard — so every shard directory holds
    ONE file whose row order IS the epoch order.  No global sort
    anywhere: per-shard sorts run in parallel and are corpus/N sized.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # RANGE-partition on the shard key, not hash: with exactly n_shards
    # distinct key values, hashing n_shards keys into n_shards partitions
    # collides (birthday bound — some tasks carry 2-3 shards, others sit
    # idle; measured 3.95 s vs 2.2 s at 10M×64, scale_probe shard_write),
    # while the range exchange lands ≈one shard per task.  pos_col stays
    # OUT of the range keys — each shard still sorts internally in
    # parallel; there is no global sort of positions anywhere.
    (
        df.repartitionByRange(int(n_shards), F.col(shard_col))
        .sortWithinPartitions(shard_col, pos_col)
        .write.mode(mode)
        .partitionBy(shard_col)
        .parquet(out_dir)
    )


def budget_select(
    df: DataFrame,
    *,
    group_col: str,
    token_col: str,
    budget_col: str,
    order_cols: list,
    keep_all: bool = False,
    kept_col: str = "kept",
) -> DataFrame:
    """Token-budget-constrained selection per group: rank each group's
    documents by ``order_cols`` (quality-first), accumulate ``token_col``
    down the ranking, and keep rows while the running total stays within
    that row's ``budget_col`` — the "fill each source's token quota with
    its best documents" step of a pre-training data recipe (the
    budget-constrained complement of rate-based ``temperature_sample``:
    rates hit proportions in expectation, this hits an absolute token
    count).

    ``budget_col`` is a per-row column — join a (group, budget) relation
    (broadcast; it is mixture-table sized) or compute it by expression
    before calling.  ``order_cols`` must end in a unique tiebreaker so
    the cumulative sum — and therefore the exact kept set — is
    deterministic across engines and partitionings.  A document whose
    tokens straddle the boundary is EXCLUDED (``cum <= budget``): the
    budget is a hard cap, and a first document larger than the whole
    budget selects nothing.

    One hash exchange on ``group_col`` (the ranking window); the running
    sum is a per-partition scan — no joins, no second shuffle.  Skewed
    mega-groups are the window-skew case AQE handles; at 100 TB with few
    groups (languages/sources), pre-aggregate per (group, coarse quality
    bucket) first if a single group outgrows an executor's sort spill
    comfort.

    Output: input columns + ``cum_tokens`` (+ ``kept`` when
    ``keep_all=True``, instead of filtering).
    """
    w = (
        Window.partitionBy(group_col)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn(
        "cum_tokens", F.sum(F.col(token_col)).over(w).cast("long")
    )
    kept = F.col("cum_tokens") <= F.col(budget_col)
    if keep_all:
        return out.withColumn(kept_col, kept)
    return out.where(kept)
