"""Deterministic sampling and dataset splitting for training-data
pipelines.

At 100 TB the split/sample step CANNOT be `df.sample()` / `randomSplit`
— those are seeded per-partition-index, so any repartition, AQE replan,
or input reordering reassigns rows between train and test (silent
contamination). The industry-standard fix is CONTENT-KEYED hashing:
each row's assignment is a pure function of a stable key, so the split
is reproducible across runs, engines, and cluster sizes, and survives
incremental re-ingestion (a re-crawled document lands in the same
bucket it was in last month).

Both operators hash with the repo's cross-engine md5-u32 family
(`u32(md5(salt || ':' || key))`, the same construction the ANF / walks
oracles replay), and compare against PRE-COMPUTED integer thresholds —
no floats anywhere, so DuckDB replays the assignment bit-for-bit and
the driver gate checks every row, not a sample statistic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32_SPACE = 1 << 32


def _u32_of(key: Column, salt: str) -> Column:
    """uint32 from the first 8 hex chars of md5(salt || ':' || key) —
    identical to DuckDB's ('0x' || substring(md5(...), 1, 8))::UINTEGER."""
    s = F.concat(F.lit(salt + ":"), key.cast("string"))
    return F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bound in u32 space) per split, in the
    given order; the last split absorbs rounding remainder so every row
    is assigned. Weights must be positive and sum to ~1."""
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if any(w <= 0 for w in weights.values()) or abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must be positive and sum to 1, got {weights}")
    out: list[tuple[str, int]] = []
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        out.append((name, int(cum * _U32_SPACE)))
    out.append((names[-1], _U32_SPACE))
    return out


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    *,
    salt: str = "split",
) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split by
    the content-keyed hash of ``key_col`` — default 98/1/1
    train/validation/test. Pure projection: no shuffle, no action,
    columnar whole-stage-codegen, and the assignment is independent of
    partitioning/row order by construction.

    Rows with a NULL key are assigned to the FIRST split (train by
    default), explicitly: md5(NULL) is NULL, so without the guard every
    ``u < ub`` comparison is NULL and the CASE would fall through to the
    LAST bucket — quietly leaking every keyless row into the eval set.
    Landing them in train is the contamination-safe default; filter
    NULLs upstream if they should not be trained on either."""
    weights = weights or {"train": 0.98, "validation": 0.01, "test": 0.01}
    u = _u32_of(F.col(key_col), salt)
    expr = None
    bounds = split_thresholds(weights)
    for name, ub in reversed(bounds):
        if expr is None:
            expr = F.lit(name)  # last bucket: unconditional
        else:
            expr = F.when(u < F.lit(ub), F.lit(name)).otherwise(expr)
    expr = F.when(F.col(key_col).isNull(), F.lit(bounds[0][0])).otherwise(expr)
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    *,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff
    ``u32(md5(salt:key)) < floor(fraction[stratum] · 2^32)``.

    This is the training-mix knob (e.g. keep 100% of high-quality docs,
    10% of mid, 1% of boilerplate): per-stratum keep rates with
    row-level reproducibility. Strata not in ``fractions`` fall back to
    ``default_fraction``. Pure filter — predicate-pushdown-friendly, no
    shuffle; expected output size Σ_s |s|·f_s with binomial variance
    (exact-quota sampling would need a per-stratum sort; at 10^12 rows
    the hash threshold is the scalable standard).

    Rows with a NULL key are EXCLUDED, explicitly (``key IS NOT NULL``
    in the filter): md5(NULL) is NULL so they could never deterministically
    pass the threshold anyway — the explicit predicate makes the drop a
    documented contract (mirrored in the DuckDB oracle) rather than a
    three-valued-logic accident.
    """
    for s, f_ in fractions.items():
        if not 0.0 <= f_ <= 1.0:
            raise ValueError(f"fraction for stratum {s!r} must be in [0,1], got {f_}")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError(f"default_fraction must be in [0,1], got {default_fraction}")
    u = _u32_of(F.col(key_col), salt)
    thresh = F.lit(int(default_fraction * _U32_SPACE))
    for s in sorted(fractions):
        thresh = F.when(
            F.col(strata_col) == F.lit(s),
            F.lit(int(fractions[s] * _U32_SPACE)),
        ).otherwise(thresh)
    return df.where(F.col(key_col).isNotNull() & (u < thresh))


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    n_shards: int = 256,
    eos_tokens: int = 1,
    salt: str = "pack",
) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing layout: where each
    document lands when the corpus is concatenated (with ``eos_tokens``
    separators) and cut into fixed ``seq_len``-token training sequences.

    Returns (id, shard, n_tokens, start_off, seq_first, seq_last):
    whitespace token count + EOS, the doc's starting offset in its
    shard's token stream, and the first/last sequence index it touches
    (sequence ids are PER-SHARD; a shard is an independent token stream,
    i.e. one training-data file).

    Determinism/scale shape: the shard is the content-keyed hash of the
    id (same md5-u32 family as hash_split — stable under repartitioning,
    AQE, and incremental re-ingestion), and the only stateful step is a
    running sum windowed BY SHARD in deterministic id order. No global
    sort, no driver state: at 100 TB you set n_shards to a few × the
    writer-task count and each window partition is one bounded file's
    worth. Empty/whitespace-only docs still occupy their EOS tokens (the
    trainer's separator is emitted per document).

    ``id_col`` MUST be unique: ties in the within-shard ORDER BY would
    make the tied rows' start_off depend on physical row order (the same
    contract as every doc-keyed operator here; exact-dedup upstream).
    """
    if seq_len < 1 or n_shards < 1 or eos_tokens < 0:
        raise ValueError(
            f"need seq_len>=1, n_shards>=1, eos_tokens>=0; got "
            f"{seq_len}, {n_shards}, {eos_tokens}"
        )
    from duwamish_spark.functions.text import tokens_col
    from pyspark.sql.window import Window

    did = F.col(id_col)
    base = docs.select(
        did.alias("id"),
        (_u32_of(did, salt) % n_shards).cast("int").alias("shard"),
        (F.size(tokens_col(text_col)) + eos_tokens).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        F.col("id").alias(id_col),
        "shard",
        "n_tokens",
        start.alias("start_off"),
        F.floor(start / seq_len).cast("long").alias("seq_first"),
        F.floor((start + F.col("n_tokens") - 1) / seq_len).cast("long").alias("seq_last"),
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    cap: int,
    *,
    id_col: str = "doc_id",
    salt: str = "cap",
    rank_col: str = "cap_rank",
) -> DataFrame:
    """Keep at most ``cap`` rows per ``key_col`` value — the anti-domination
    pass of a web-scale pipeline (cap documents per domain/source so one
    boilerplate-heavy host cannot dominate the training mix).

    WHICH rows survive is content-keyed, not positional: rows are ranked
    within their key by ``(u32(md5(salt:id)), id)`` — a deterministic
    pseudo-random order, so the kept subset is a uniform sample of the
    key's rows, reproducible across runs/partitionings/engines, and stable
    under incremental re-ingestion (a re-crawled doc keeps its rank
    relative to unchanged siblings). The surviving rows carry ``rank_col``
    (1-based) for observability.

    Scale shape: one window per key with a rank-filter on top — Spark
    plans it as WindowGroupLimit, pruning to the per-key top-``cap``
    map-side BEFORE the shuffle, so a 10^8-row hot domain moves only
    ``cap`` rows per map task, not its whole partition bucket. NULL keys
    group together (one capped group — both engines treat window NULL
    keys as equal); ``id_col`` must be unique and non-null (ties would
    make survival depend on physical row order).
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    from pyspark.sql.window import Window

    u = _u32_of(F.col(id_col), salt)
    w = Window.partitionBy(key_col).orderBy(u.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= cap)
    )


def temperature_rates(
    counts: dict[str, int], alpha: float, budget: int
) -> dict[str, int]:
    """Per-source acceptance rates (integer ppm) for a temperature-
    scaled data mixture: sampling weight p_s ∝ n_s^alpha (alpha < 1
    up-weights small sources — the multilingual/data-mixing standard),
    target take budget·p_s docs from source s, so the acceptance rate
    is min(1, budget·p_s/n_s), floored to ppm.

    Pure driver-side arithmetic on the model-sized per-source count
    table (#sources rows — the recommend.py model-size discipline);
    the returned dict feeds :func:`mix_sources`, which is where the
    data-sized, engine-replayable work happens. ppm quantization makes
    the downstream selection integer-exact regardless of float
    rounding here.
    """
    if not counts:
        raise ValueError("counts must be non-empty")
    if any(n <= 0 for n in counts.values()):
        raise ValueError(f"source counts must be positive, got {counts}")
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    tot = sum(n**alpha for n in counts.values())
    out = {}
    for s, n in counts.items():
        p = n**alpha / tot
        out[s] = min(1_000_000, int(1_000_000 * budget * p / n))
    return out


def mix_sources(
    df: DataFrame,
    id_col: str,
    source_col: str,
    rates_ppm: dict[str, int],
    *,
    default_ppm: int = 1_000_000,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic per-source downsampling to a target data mixture:
    keep a row iff ``u32(md5(salt:id)) < rate·2^32/10^6`` for its
    source's acceptance rate (integer ppm, from :func:`temperature_rates`
    or chosen directly). Sources absent from ``rates_ppm`` use
    ``default_ppm``; NULL sources use ``default_ppm`` too (explicitly —
    a CASE over literals, so the policy is visible in the plan).

    Content-keyed like hash_split: the kept subset is a pure function
    of (id, salt, rates), reproducible across runs/engines/cluster
    sizes and stable under re-ingestion — repartitioning can never
    move a document in or out of the mixture. Thresholds are exact
    integers (ppm·2^32 DIV 10^6), so DuckDB replays the selection
    row-for-row. One linear scan, no shuffle.

    NULL ids are EXPLICITLY excluded (same policy and rationale as
    stratified_sample: an unhashable row must not drift in and out of
    the mixture, and the filter is visible in both engines' plans).
    """
    if not rates_ppm:
        raise ValueError("rates_ppm must be non-empty")
    for s, ppm in {**rates_ppm, "<default>": default_ppm}.items():
        if not (0 <= ppm <= 1_000_000):
            raise ValueError(f"rate for {s!r} must be in [0, 1e6] ppm, got {ppm}")

    def thr(ppm: int) -> int:
        return ppm * _U32_SPACE // 1_000_000

    cond = None
    for s in sorted(rates_ppm):
        branch = (F.col(source_col) == s, F.lit(thr(rates_ppm[s])))
        cond = F.when(*branch) if cond is None else cond.when(*branch)
    threshold = cond.otherwise(F.lit(thr(default_ppm)))
    return df.where(
        F.col(id_col).isNotNull() & (_u32_of(F.col(id_col), salt) < threshold)
    )
