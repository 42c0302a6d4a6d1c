"""Deduplication operators: exact, MinHash+LSH, SimHash.

All JVM-side column expressions (xxhash64 / md5 / bit ops) — no Python in
the hot path. The MinHash pipeline is the standard shingle → minhash →
band → bucket-join shape: at 100 TB the candidate join is the only
super-linear stage and it is keyed on (band_idx, band_hash), which
shuffles only bucket collisions, never all pairs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Mersenne prime 2^31-1: keeps a*x + b within int64 under ANSI arithmetic
# (a, x < 2^31 → product < 2^62). Constants are fixed so results are
# deterministic across runs and cluster sizes.
_P = (1 << 31) - 1


def _perm_params(n_hashes: int, seed: int) -> list[tuple[int, int]]:
    import numpy as np

    rng = np.random.default_rng(seed)
    a = rng.integers(1, _P, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, _P, size=n_hashes, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(text_hash, keep_id, n_dups) — hash-groupBy exact dedup; keep = min id."""
    return docs.groupBy(F.md5(F.col(text_col)).alias("text_hash")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_dups")
    )


def shingles(
    docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, sh) — distinct xxhash64 of k-token shingles (word k-grams)."""
    from duwamish_spark.functions.text import tokens_col

    toks = docs.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("t"))
    sh = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - k, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, k)),
            )
        ).alias("shingle"),
    ).where(F.length("shingle") > 0)
    return sh.select("id", F.xxhash64("shingle").alias("sh")).distinct()


def _shingle_hashes(
    docs: DataFrame, k: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, sh) — k-token shingle hashes, NON-distinct, hashed straight
    off the token-slice array (no intermediate string build).

    The minhash pipeline's private fast path: min-aggregation is
    idempotent over duplicate shingle rows and ``collect_set`` dedups in
    the verify stage, so the O(shingles) distinct shuffle that the
    public :func:`shingles` contract requires is pure cost here
    (measured at SF=1: distinct + string building were ~2/3 of the
    shingle stage). ``xxhash64(array<string>)`` folds elements
    sequentially (order-sensitive) and tokens cannot contain
    whitespace, so hash identity matches the string form's
    distinctness: same shingle set sizes, same Jaccard values.
    """
    from duwamish_spark.functions.text import tokens_col

    toks = docs.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("t"))
    return toks.where(F.size("t") > 0).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - k, F.lit(0))),
                lambda i: F.xxhash64(F.slice("t", i + 1, k)),
            )
        ).alias("sh"),
    )


def minhash_signatures(
    sh: DataFrame, n_hashes: int = 32, seed: int = 7
) -> DataFrame:
    """(id, sig: array<bigint>) — per-doc minhash signature over shingle hashes.

    h_i(x) = (a_i * x + b_i) mod (2^61-1); min per doc per i. Computed as
    ``n_hashes`` aggregate columns in ONE groupBy — a single shuffle.
    """
    params = _perm_params(n_hashes, seed)
    x = F.pmod(F.col("sh"), F.lit(_P))
    mins = [
        F.min(F.pmod(F.lit(a) * x + F.lit(b), F.lit(_P))).alias(f"h{i}")
        for i, (a, b) in enumerate(params)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[f"h{i}" for i in range(n_hashes)]).alias("sig")
    )


def _est_gate_min_matches(
    n_hashes: int, rows_per_band: int, threshold: float, eps: float = 0.01
) -> int:
    """Smallest signature-match gate m such that a candidate pair whose
    TRUE Jaccard equals the threshold fails `matches >= m` with
    conditional probability ≤ eps, given that it collided in one band
    (i.e. already agrees on rows_per_band hashes; the other
    n_hashes − rows_per_band positions match i.i.d. with probability J).
    Exact binomial CDF — no normal approximation, these n are small."""
    n = n_hashes - rows_per_band
    cdf, k = 0.0, 0
    for i in range(n + 1):
        p = math.comb(n, i) * threshold**i * (1.0 - threshold) ** (n - i)
        if cdf + p > eps:
            break
        cdf += p
        k = i + 1
    return rows_per_band + k


def minhash_near_dups(
    docs: DataFrame,
    *,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
    pre_dedup: bool = True,
    max_shingle_df: int | None = None,
    bucket_split: int = 8,
    est_eps: float | None = 0.01,
) -> DataFrame:
    """(id_a, id_b, jaccard) — near-duplicate pairs with verified Jaccard ≥ threshold.

    LSH banding proposes candidates (same band hash in any band); exact
    Jaccard over shingle sets verifies. id_a < id_b.

    The verify stage is two-staged: candidate pairs are first pruned
    against tiny per-doc metadata (an EXACT size-ratio bound plus, in
    probabilistic-banding configs only, a minhash-estimate gate on the
    already-computed signatures — see the inline comment for the loss
    analysis), and only survivors fetch the COMPACT per-doc shingle-set
    arrays for the exact JVM-side intersection (``array_intersect``,
    hash-set O(|A|+|B|) per pair) — never the pair x shingle-row
    expansion (which measured 10x slower at 100k docs, shuffling ~550M
    rows for 4.8M candidates). The emitted Jaccard is always exact.

    ``est_eps`` sets the signature-estimate gate's conditional
    false-negative budget at the threshold (default 1%; ``None``
    disables the gate entirely, leaving only the exact filters — used
    by the bench to measure the gate's realized recall).

    ``pre_dedup=True`` (default) collapses byte-identical texts to one
    representative BEFORE shingling and expands group members back into
    the result afterwards — output is IDENTICAL (Jaccard is a pure
    function of text, and within-group pairs are Jaccard 1.0 whenever
    the text has ≥1 shingle), but the LSH + verify stages run on
    distinct texts only. This is the decisive scale lever on real
    corpora: exact duplicates are the single hottest band-bucket source
    (every member of a duplicate group collides in EVERY band, an
    inherently quadratic candidate set the banding cannot prune).

    ``max_shingle_df`` (opt-in): exclude shingles appearing in more than
    this many documents from the SIGNATURES (and hence the banding) —
    boilerplate shingles ("import os"-class) otherwise dominate the
    minhashes of short documents and weld them into enormous band
    buckets whose C(n,2) candidate sets are the pipeline's only
    quadratic term. Verification still runs on the FULL shingle sets,
    so every emitted pair carries its exact Jaccard; the cost is
    recall on pairs whose overlap is carried ONLY by pruned
    boilerplate — measured at 0.46 on the SF=1 bench corpus's 100k
    sample at df>1000 (docs/PLANS.md), which is exactly why this is
    opt-in and NOT the scale path (the in-join prefilters are).
    A document all of whose shingles are pruned leaves the candidate
    stage entirely (same as an empty-token document). With
    ``pre_dedup=True`` the df is counted over distinct texts, which is
    the meaningful denominator (a million byte-identical copies are one
    text, not a million df).
    """
    if pre_dedup:
        return _minhash_near_dups_pre_dedup(
            docs, k=k, n_hashes=n_hashes, bands=bands, threshold=threshold,
            id_col=id_col, text_col=text_col, seed=seed,
            max_shingle_df=max_shingle_df, bucket_split=bucket_split,
            est_eps=est_eps,
        )
    assert n_hashes % bands == 0
    rows_per_band = n_hashes // bands
    sh = _shingle_hashes(docs, k, id_col, text_col).persist()
    if max_shingle_df is not None:
        hot = (
            sh.distinct()
            .groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
            .where(F.col("df") > max_shingle_df)
            .select("sh")
        )
        sig_input = sh.join(hot, "sh", "left_anti")
    else:
        sig_input = sh
    sig = minhash_signatures(sig_input, n_hashes, seed)

    # Candidate generation with the prefilter pushed INSIDE the bucket
    # self-join. Each banded row carries its doc's shingle-set SIZE and
    # full minhash signature (~17 extra longs on a V·bands-row relation —
    # negligible), so the join's non-equi predicates prune pairs in the
    # merge loop BEFORE any pair row is materialized or shuffled:
    #   (a) size-ratio — EXACT, never drops a true pair: J(A,B) =
    #       |A∩B|/|A∪B| ≤ min(|A|,|B|)/max(|A|,|B|), so min < t·max
    #       cannot reach threshold t;
    #   (b) signature-estimate gate (only when rows_per_band ≥ 2, i.e.
    #       the banding itself is already probabilistic): a banded pair
    #       already agrees on one band's rows_per_band hashes, so its
    #       remaining n_hashes−rpb positions are Binomial(n−rpb, J)
    #       matches; the gate requires the smallest total m for which a
    #       true pair AT the threshold fails with conditional
    #       probability ≤ 1% (exact binomial CDF, see
    #       _est_gate_min_matches) — 9/16 at the (16, 4, t=0.7) bench
    #       config, ~30x below the banding's own miss rate
    #       (1−t^rpb)^bands ≈ 0.33 there, and measured in the bench as
    #       `minhash_prefilter_recall`. Recall-1 configurations
    #       (rows_per_band == 1, the oracle path) never apply (b), so
    #       their exact-equality contract with the n-gram Jaccard
    #       relation is untouched.
    # Why inline instead of join-then-filter: measured at SF=1 unpruned,
    # banding yields 260.6M candidate pairs (hottest boilerplate bucket:
    # 18,619 docs ⇒ 173M pairs from ONE key). A materialize-then-filter
    # plan shuffles that relation 4x (distinct + two metadata joins) and
    # GC-killed a 48g JVM; inline predicates leave only the tiny
    # survivor set to exit the join. The hot bucket still costs its
    # C(n,2) predicate evaluations inside the join loop — O(n_hashes)
    # longs each, no allocation — which is the irreducible cost of an
    # LSH collision, not of this plan.
    sets = sh.groupBy("id").agg(F.collect_set("sh").alias("ss"))
    if est_eps is not None:
        min_matches = _est_gate_min_matches(
            n_hashes, rows_per_band, threshold, est_eps
        )
        est_gate = rows_per_band >= 2 and min_matches > rows_per_band
    else:
        est_gate = False
    banded = (
        sig.join(sets.select("id", F.size("ss").alias("sz")), "id")
        .select(
            "id",
            "sz",
            "sig",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.xxhash64(
                                F.concat_ws(
                                    ":",
                                    *[
                                        F.col("sig")[b * rows_per_band + r]
                                        for r in range(rows_per_band)
                                    ],
                                )
                            ).alias("bh"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        )
        .select("id", "sz", "sig", "bk.band", "bk.bh")
    )
    # Grid-blocked self-join: every row is replicated into `bucket_split`
    # grid cells per side — x-side to (own_group, j) for all j, y-side to
    # (i, own_group) for all i — and the join keys on (band, bh, c1, c2).
    # An unordered pair {a,b} in one bucket meets in exactly two cells,
    # (g_a,g_b) with x=a and (g_b,g_a) with x=b, and the id_a < id_b
    # predicate keeps exactly one, so the output relation is IDENTICAL to
    # the plain self-join (exact for the recall-1 oracle path too). The
    # point is hot-bucket parallelism: AQE's skew split works on partition
    # BYTES and cannot split a single join key, so the SF=1 corpus's
    # hottest bucket (18,619 docs ⇒ 173M pair evaluations, 3MB of input)
    # ran as ONE task; the grid spreads each bucket over
    # bucket_split² cells at the cost of replicating the small banded
    # relation bucket_split times per side.
    g = int(bucket_split)
    grp = F.pmod(F.xxhash64(F.col("id")), F.lit(g)).cast("int")
    cells = F.sequence(F.lit(0), F.lit(g - 1))
    bx = banded.select(
        "band", "bh", grp.alias("c1"), F.explode(cells).alias("c2"),
        F.col("id").alias("id_a"),
        F.col("sz").alias("sz_a"), F.col("sig").alias("sig_a"),
    )
    by = banded.select(
        "band", "bh", F.explode(cells).alias("c1"), grp.alias("c2"),
        F.col("id").alias("id_b"),
        F.col("sz").alias("sz_b"), F.col("sig").alias("sig_b"),
    )
    surv = (
        bx.join(by, ["band", "bh", "c1", "c2"])
        .where(F.col("id_a") < F.col("id_b"))
        .where(F.least("sz_a", "sz_b") >= threshold * F.greatest("sz_a", "sz_b"))
    )
    if est_gate:
        # UNROLLED scalar comparisons, not zip_with: higher-order array
        # functions are CodegenFallback (interpreted, one allocation per
        # evaluation) — inside a hot bucket's C(n,2)-pair join loop that
        # interpreted path GC-froze the driver JVM until its executors
        # heartbeat-timed out. n_hashes is a plan-time constant, so the
        # match count compiles to n_hashes branch-free array reads.
        est = sum(
            F.when(F.col("sig_a")[i] == F.col("sig_b")[i], 1).otherwise(0)
            for i in range(n_hashes)
        )
        surv = surv.where(est >= min_matches)
    cands = surv.select("id_a", "id_b", "sz_a", "sz_b").distinct()

    # Exact verify: fetch the full shingle-set arrays ONLY for surviving
    # pairs and intersect JVM-side (array_intersect, one row per pair —
    # never the pair x shingle-row expansion). The emitted Jaccard is
    # exact; stage-1 pruning only ever removes pairs that cannot (a) or
    # almost surely do not (b) reach the threshold.
    out = (
        cands
        .join(sets.select(F.col("id").alias("id_a"), F.col("ss").alias("ss_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("ss").alias("ss_b")), "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("ss_a", "ss_b")).alias("inter"),
            "sz_a",
            "sz_b",
        )
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return out


def _minhash_near_dups_pre_dedup(
    docs: DataFrame,
    *,
    k: int,
    n_hashes: int,
    bands: int,
    threshold: float,
    id_col: str,
    text_col: str,
    seed: int,
    max_shingle_df: int | None = None,
    bucket_split: int = 8,
    est_eps: float | None = 0.01,
) -> DataFrame:
    """minhash_near_dups over text-distinct representatives, expanded back
    to the full id space. Output-equivalent to the direct pipeline:

    - Jaccard is a pure function of the text, so any member pair across
      two groups has exactly the representatives' Jaccard;
    - within a group every pair is Jaccard 1.0, and the direct pipeline
      emits those pairs iff the text has ≥1 shingle (empty-token docs
      produce no signature and are never banded) and 1.0 ≥ threshold —
      both conditions are replicated below.

    All expansion joins are keyed on the group id; nothing quadratic
    beyond the output itself.
    """
    from duwamish_spark.functions.text import tokens_col

    keyed = docs.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        F.md5(F.col(text_col)).alias("gid"),
    )
    members = keyed.select("gid", "id")
    reps = keyed.groupBy("gid").agg(
        F.min("id").alias("id"), F.min("text").alias("text")
    )

    rep_pairs = minhash_near_dups(
        reps, k=k, n_hashes=n_hashes, bands=bands, threshold=threshold,
        id_col="id", text_col="text", seed=seed, pre_dedup=False,
        max_shingle_df=max_shingle_df, bucket_split=bucket_split,
        est_eps=est_eps,
    )

    rep_gid = reps.select(F.col("id").alias("rid"), F.col("gid").alias("rgid"))
    cross = (
        rep_pairs
        .join(rep_gid.withColumnRenamed("rid", "id_a").withColumnRenamed("rgid", "gid_a"), "id_a")
        .join(rep_gid.withColumnRenamed("rid", "id_b").withColumnRenamed("rgid", "gid_b"), "id_b")
        .join(members.select(F.col("gid").alias("gid_a"), F.col("id").alias("ma")), "gid_a")
        .join(members.select(F.col("gid").alias("gid_b"), F.col("id").alias("mb")), "gid_b")
        .select(
            F.least("ma", "mb").alias("id_a"),
            F.greatest("ma", "mb").alias("id_b"),
            "jaccard",
        )
    )

    if threshold <= 1.0:
        shingled = reps.where(F.size(tokens_col("text")) > 0).select("gid")
        wm = members.join(shingled, "gid")
        within = (
            wm.alias("x")
            .join(wm.alias("y"), "gid")
            .where(F.col("x.id") < F.col("y.id"))
            .select(
                F.col("x.id").alias("id_a"),
                F.col("y.id").alias("id_b"),
                F.lit(1.0).alias("jaccard"),
            )
        )
        return cross.unionAll(within)
    return cross


def simhash64(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 64-bit SimHash over token xxhash64s.

    Per bit: majority vote of token-hash bits, computed as 64 aggregate
    columns in one groupBy (single shuffle, partial-agg friendly).
    """
    from duwamish_spark.functions.text import tokens_col

    toks = docs.select(F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    votes = [
        F.sum(F.shiftright(h, i).bitwiseAND(F.lit(1)) * 2 - 1).alias(f"b{i}")
        for i in range(64)
    ]
    agg = toks.groupBy("id").agg(*votes)
    bit_terms = " + ".join(
        f"(CASE WHEN b{i} > 0 THEN shiftleft(1L, {i}) ELSE 0L END)" for i in range(64)
    )
    return agg.select("id", F.expr(bit_terms).alias("simhash"))


# above this row count the standalone inverted-index self-join is refused
# (quadratic on a hot shingle) unless the caller opts in or passes a
# pre-pruned candidate relation
NGRAM_STANDALONE_MAX_DOCS = 100_000


def rolling_fingerprints(
    docs: DataFrame,
    *,
    k: int = 8,
    window: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, fp) — winnowed rolling-hash document fingerprints
    (MOSS-style): hash every character k-gram of the whitespace-normalized
    text, keep the minimum of each sliding window of ``window`` hashes,
    distinct. Any two documents sharing a run of ≥ k+window-1 characters
    share at least one fingerprint — the local-similarity dedup primitive
    (plagiarism / near-dup detection by keyed join on fp).

    All per-row array expressions (JVM, whole-stage codegen); the k-gram
    hash is the first 8 hex chars of md5 so an ANSI-SQL oracle computes
    the identical fingerprints.
    """
    kg, w = int(k), int(window)
    return (
        docs.selectExpr(
            f"{id_col} AS id",
            f"regexp_replace(trim({text_col}), '\\\\s+', ' ') AS _norm",
        )
        .selectExpr(
            "id",
            f"""transform(
                    sequence(0, greatest(length(_norm) - {kg}, 0)),
                    i -> cast(conv(substring(md5(substring(_norm, i + 1, {kg})), 1, 8), 16, 10) AS bigint)
                ) AS _h""",
        )
        .selectExpr(
            "id",
            f"""explode(array_distinct(transform(
                    sequence(0, greatest(size(_h) - {w}, 0)),
                    i -> array_min(slice(_h, i + 1, {w}))
                ))) AS fp""",
        )
    )


def simhash_parts(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    family: str = "xxhash64",
) -> DataFrame:
    """(id, sim_hi, sim_lo) — 64-bit SimHash as two 32-bit halves.

    Two halves instead of one long avoid 64-bit sign-overflow pitfalls in
    both engines (``1 << 63`` wraps in Java and overflows DuckDB BIGINT),
    and chunk extraction for banding never straddles word boundaries.

    ``family``: per-token hash source for the 64 vote bits —
    ``"xxhash64"`` (JVM-side, fastest, default) or ``"md5"`` (first 16
    hex chars of md5(token); slower but expressible in ANSI SQL, which is
    what makes the driver's DuckDB oracle possible).
    """
    from duwamish_spark.functions.text import tokens_col

    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(text_col)).alias("tok")
    )
    if family == "md5":
        md5 = F.md5("tok")
        hi = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
        lo = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
    elif family == "xxhash64":
        h = F.xxhash64("tok")
        hi = F.shiftrightunsigned(h, 32).bitwiseAND(F.lit(0xFFFFFFFF))
        lo = h.bitwiseAND(F.lit(0xFFFFFFFF))
    else:
        raise ValueError(f"unknown simhash family {family!r}")
    halves = toks.select("id", hi.alias("hi"), lo.alias("lo"))
    votes = [
        F.sum(F.shiftright(F.col(half), i).bitwiseAND(F.lit(1)) * 2 - 1).alias(
            f"{tag}{i}"
        )
        for half, tag in (("lo", "v"), ("hi", "w"))
        for i in range(32)
    ]
    agg = halves.groupBy("id").agg(*votes)
    mk = lambda tag: " + ".join(  # noqa: E731
        f"(CASE WHEN {tag}{i} > 0 THEN shiftleft(1L, {i}) ELSE 0L END)"
        for i in range(32)
    )
    return agg.select(
        "id", F.expr(mk("w")).alias("sim_hi"), F.expr(mk("v")).alias("sim_lo")
    )


_CHUNK_COUNTS = (2, 4, 8, 16, 32, 64)


def simhash_near_dups(
    docs: DataFrame,
    *,
    max_hamming: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    family: str = "xxhash64",
) -> DataFrame:
    """(id_a, id_b, hamming) — pairs with SimHash Hamming distance ≤
    ``max_hamming``, via pigeonhole banding (the scale path).

    The 64 bits split into the smallest power-of-two chunk count
    exceeding ``max_hamming``: a pair within distance d differs in at
    most d chunks, so with > d chunks at least one chunk matches exactly
    — candidates come from a keyed equality join on (chunk_idx,
    chunk_value), never an all-pairs product; exact ``bit_count(xor)``
    verifies. Low thresholds (tight near-dups) give wide chunks and sharp
    pruning; at ``max_hamming`` ≥ 32 the chunks are ≤ 2 bits and banding
    degenerates toward all-pairs — that regime is not a near-dup query.
    """
    if not 0 <= max_hamming < 64:
        raise ValueError(
            f"max_hamming must be in [0, 64); got {max_hamming} — at >= 64 "
            f"every pair matches and banding has no pruning power"
        )
    n_chunks = next(c for c in _CHUNK_COUNTS if c > max_hamming)
    width = 64 // n_chunks
    mask = (1 << width) - 1
    parts = simhash_parts(docs, id_col, text_col, family)

    def chunk_val(i: int):
        start = i * width
        src, off = ("sim_lo", start) if start < 32 else ("sim_hi", start - 32)
        return F.shiftright(F.col(src), off).bitwiseAND(F.lit(mask))

    banded = parts.select(
        "id",
        "sim_hi",
        "sim_lo",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("ci"), chunk_val(i).alias("cv"))
                    for i in range(n_chunks)
                ]
            )
        ).alias("ch"),
    ).select("id", "sim_hi", "sim_lo", "ch.ci", "ch.cv")
    a = banded.select(
        F.col("id").alias("id_a"),
        F.col("sim_hi").alias("ha"),
        F.col("sim_lo").alias("la"),
        "ci",
        "cv",
    )
    b = banded.select(
        F.col("id").alias("id_b"),
        F.col("sim_hi").alias("hb"),
        F.col("sim_lo").alias("lb"),
        "ci",
        "cv",
    )
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return (
        a.join(b, ["ci", "cv"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ham.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    k: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    candidates: DataFrame | None = None,
    allow_quadratic: bool = False,
    standalone_max_docs: int = NGRAM_STANDALONE_MAX_DOCS,
) -> DataFrame:
    """EXACT n-gram Jaccard near-duplicate pairs: (id_a, id_b, jaccard).

    Shingle-inverted-index self-join: pairs are generated only for docs
    sharing at least one shingle (never the all-pairs cross product), then
    |A ∩ B| is a count per pair and |A ∪ B| = |A| + |B| − |A ∩ B|. This is
    the exact verifier for the MinHash approximation; standalone it is
    quadratic in the worst case (every doc sharing one hot shingle), so it
    ENFORCES its own scale contract instead of trusting a docstring:

    - ``candidates`` (id_a, id_b): verify only these pairs (the MinHash
      band output — :func:`minhash_near_dups` does this wiring for you);
      always safe, any scale.
    - standalone above ``standalone_max_docs`` rows raises unless
      ``allow_quadratic=True`` (one cheap count when no candidates given).

    ``id_a < id_b``; jaccard rounded to 6 places for stable comparison.
    """
    from duwamish_spark.functions.text import tokens_col

    if candidates is None and not allow_quadratic:
        n_docs = docs.count()
        if n_docs > standalone_max_docs:
            raise ValueError(
                f"ngram_jaccard_pairs standalone on {n_docs} docs exceeds "
                f"standalone_max_docs={standalone_max_docs} (quadratic on a "
                f"hot shingle). Pass candidates= (e.g. the MinHash band "
                f"output) or allow_quadratic=True."
            )

    toks = docs.select(F.col(id_col).alias("id"), tokens_col(text_col).alias("t"))
    sh = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - k, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice("t", i + 1, k)),
            )
        ).alias("shingle"),
    ).where(F.length("shingle") > 0).distinct()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    if candidates is not None:
        # verify-only mode: |A ∩ B| per given pair via two keyed joins —
        # work is O(candidate pairs x shingles), never the inverted index
        # normalize pair order (callers may not guarantee id_a < id_b);
        # self-pairs are meaningless and dropped
        cand = (
            candidates.select(
                F.least("id_a", "id_b").alias("id_a"),
                F.greatest("id_a", "id_b").alias("id_b"),
            )
            .where(F.col("id_a") != F.col("id_b"))
            .distinct()
        )
        common = (
            cand.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
            .join(
                sh.select(F.col("id").alias("id_b"), F.col("shingle").alias("sh_b")),
                "id_b",
            )
            .where(F.col("shingle") == F.col("sh_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    else:
        a = sh.select(F.col("id").alias("id_a"), "shingle")
        b = sh.select(F.col("id").alias("id_b"), "shingle")
        common = (
            a.join(b, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("c"))
        )
    na = sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    j = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(na, "id_a")
        .join(nb, "id_b")
        .where(j >= threshold)
        .select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
    )


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    k: int = 3,
    min_common: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Train/eval contamination audit: for every training document
    sharing at least ``min_common`` k-token shingles with ANY benchmark
    document, report

        (doc_id, n_shingles, n_shared_shingles, n_benchmark_hits,
         share_ratio)

    — the standard pre-training decontamination pass (the GPT-3 /
    C4-style n-gram overlap filter): a training doc that reproduces
    eval-set n-grams leaks the benchmark into the training mix.

    Scale shape: the benchmark side is eval-sized (thousands of docs,
    not billions), so its shingle relation is broadcast by default and
    the training corpus streams through ONE map-side hash join keyed on
    the 8-byte xxhash64 shingle — no all-pairs stage, no shuffle of the
    corpus. The two count-distincts aggregate the (doc, shingle) /
    (doc, benchmark-doc) hit relations, each bounded by the join output
    (tiny: only contaminated rows survive). Set
    ``broadcast_benchmark=False`` when the benchmark itself is
    table-sized; the join then shuffles both sides on `sh`.
    """
    tr = shingles(docs, k, id_col, text_col)
    bm = shingles(benchmark, k, id_col, text_col).select(
        "sh", F.col("id").alias("bid")
    )
    if broadcast_benchmark:
        bm = F.broadcast(bm)
    sizes = tr.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = tr.join(bm, "sh")
    agg = hits.groupBy("id").agg(
        F.countDistinct("sh").alias("n_shared_shingles"),
        F.countDistinct("bid").alias("n_benchmark_hits"),
    )
    return (
        agg.where(F.col("n_shared_shingles") >= min_common)
        .join(sizes, "id")
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            "n_shared_shingles",
            "n_benchmark_hits",
            F.round(
                F.col("n_shared_shingles").cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("share_ratio"),
        )
    )


def paragraph_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Cross-document paragraph-level exact dedup (the CCNet / CommonCrawl
    cleaning pass, Wenzek et al. 2020 §3: drop every later copy of a
    paragraph that appears anywhere else in the corpus).

    A paragraph is a ``sep``-delimited segment; empty / whitespace-only
    segments are dropped (whitespace normalization). The kept copy of each
    distinct paragraph is the globally FIRST occurrence under the total
    order (id, position) — deterministic across runs and partitionings.

    Returns (id, text_clean, n_paras, n_kept): the reassembled document
    (kept paragraphs in original order, ``sep``-joined; "" when every
    paragraph was a later copy), the original non-empty paragraph count,
    and the kept count.

    Plan shape at 100 TB: the keeper per distinct paragraph is a
    groupBy-min over struct(id, pos) — partial-aggregated map-side, so a
    boilerplate paragraph welded into 10^8 documents combines down to one
    row per map task instead of sorting 10^8 rows in one window partition
    (why this is NOT row_number over para). The min struct IS the kept
    instance, so no join back is needed; reassembly is one more doc-keyed
    groupBy. Three linear shuffles total, no window, no skew cliff.
    """
    p = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "para"),
    ).where(F.length(F.trim("para")) > 0)
    kept = p.groupBy("para").agg(F.min(F.struct("id", "pos")).alias("k"))
    reassembled = kept.select(F.col("k.id").alias("id"), F.col("k.pos").alias("pos"), "para") \
        .groupBy("id").agg(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "para"))),
                    lambda s: s["para"],
                ),
            ).alias("text_clean"),
            F.count(F.lit(1)).alias("n_kept"),
        )
    totals = p.groupBy("id").agg(F.count(F.lit(1)).alias("n_paras"))
    return totals.join(reassembled, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_paras",
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
    )


def boilerplate_strip(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "source",
    *,
    min_docs: int = 2,
    min_frac: float = 0.5,
    sep: str = "\n",
) -> DataFrame:
    """Per-host boilerplate removal (the CCNet / RefinedWeb cleaning pass
    that precedes dedup): a ``sep``-delimited segment is boilerplate for a
    host when it appears in at least ``min_docs`` distinct documents of
    that host AND in at least ``min_frac`` of the host's documents —
    navigation chrome, cookie banners, footers. Boilerplate segments are
    stripped from every document of that host; the same segment on
    another host where it is rare survives (host-local frequency is the
    CCNet insight — global dedup would under- or over-fire).

    Returns (id, text_clean, n_lines, n_removed): the reassembled
    document (kept segments in original order), original non-empty
    segment count, and removed count.

    Determinism: the frequency test is integer-exact — ``df * 10^6 >=
    round(min_frac * 10^6) * host_docs`` — so the boilerplate set is a
    pure function of the corpus (no float threshold drift between
    engines; DuckDB replays it verbatim).

    Plan shape at 100 TB: one distinct over (host, segment, id) rows
    (linear, partial-aggregated), one (host, segment) count, one host
    doc count, one keyed anti-join, one doc-keyed reassembly groupBy.
    No window over the corpus, no all-pairs step; a banner welded into
    10^8 pages of one host is ONE row in the boilerplate relation and
    the anti-join prunes it bucket-locally.
    """
    if min_docs < 1:
        raise ValueError("min_docs must be >= 1")
    if not (0.0 <= min_frac <= 1.0):
        raise ValueError("min_frac must be in [0, 1]")
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("pos", "line"),
    ).where(F.length(F.trim("line")) > 0)

    per_doc = lines.select("host", "line", "id").distinct()
    df_counts = per_doc.groupBy("host", "line").agg(F.count(F.lit(1)).alias("df"))
    host_docs = per_doc.select("host", "id").distinct().groupBy("host").agg(
        F.count(F.lit(1)).alias("hd")
    )
    frac_micros = int(round(min_frac * 1_000_000))
    boiler = (
        df_counts.join(host_docs, "host")
        .where(
            (F.col("df") >= min_docs)
            & (F.col("df") * F.lit(1_000_000) >= F.lit(frac_micros) * F.col("hd"))
        )
        .select("host", "line")
    )

    kept = lines.join(boiler, ["host", "line"], "left_anti")
    reassembled = kept.groupBy("id").agg(
        F.concat_ws(
            sep,
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("n_kept"),
    )
    totals = lines.groupBy("id").agg(F.count(F.lit(1)).alias("n_lines"))
    return totals.join(reassembled, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("text_clean", F.lit("")).alias("text_clean"),
        "n_lines",
        (F.col("n_lines") - F.coalesce("n_kept", F.lit(0).cast("long"))).alias(
            "n_removed"
        ),
    )


def dedup_groups(
    spark,
    docs: DataFrame,
    pairs: DataFrame,
    *,
    id_col: str = "doc_id",
    max_rounds: int = 50,
    num_partitions: int | None = None,
) -> DataFrame:
    """Collapse near-duplicate PAIRS into duplicate GROUPS and elect one
    canonical keeper per group — the final stage of every fuzzy-dedup
    pipeline (pairs from :func:`minhash_near_dups`, :func:`simhash_near_dups`,
    :func:`ngram_jaccard_pairs`, or similarity.embedding_near_dups are
    only pairwise; dropping "the b of every (a,b)" over-deletes chains
    like a~b, b~c where a~c was never emitted).

    Near-duplication is made transitive by running the engine's own
    hash-min connected components over the PAIR graph (the same operator
    the north rule gates, applied to the dedup pipeline): group = min doc
    id in the near-dup component.

    Returns one row per doc: (id_col, group, keep) with
    ``keep = (id == group)`` — exactly one keeper per group, and docs in
    no pair keep themselves.

    Scale shape: CC runs ONLY on ids that appear in a pair (at 100 TB the
    near-dup subset is a small fraction of the corpus), and dup components
    are shallow stars/chains so hash-min converges in a handful of rounds;
    the full corpus is touched once by the final V-row left join.
    ``pairs`` endpoints must come from ``docs`` (they do when the pair
    relation was computed from it) — foreign ids would elect keepers that
    don't exist.
    """
    from duwamish_spark.algorithms.components import connected_components
    from duwamish_spark.graph import vertices_from

    e = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    cc = connected_components(
        spark,
        vertices_from(None, e),
        e,
        max_supersteps=max_rounds,
        num_partitions=num_partitions,
    )
    labels = cc.state.select(F.col("id"), F.col("label").alias("_grp"))
    did = F.col(id_col)
    return docs.select(did.alias("id")).join(labels, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce("_grp", F.col("id")).alias("group"),
        (F.col("id") == F.coalesce("_grp", F.col("id"))).alias("keep"),
    )


def duplicate_spans(
    docs: DataFrame,
    *,
    k: int = 8,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document shared-span pairs from winnowed fingerprints —
    the exact-substring dedup primitive (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", via the MOSS winnowing
    guarantee instead of a suffix array).

    Every shared fingerprint certifies a shared run of ≥ k+window−1
    characters, so ``(id_a, id_b, shared_fps)`` with ``shared_fps ≥
    min_shared`` ranks document pairs by how much literal text they
    share — the boilerplate/mirror/quotation detector that Jaccard-style
    whole-doc similarity misses on long documents sharing one licence
    block.

    Scale shape: the pair relation is keyed on fp — bucket collisions
    only, never all-pairs. The quadratic risk is a BOILERPLATE
    fingerprint present in F docs (F² pairs); ``max_df`` drops
    fingerprints with document frequency above the cap before the join
    (df-pruning, the same economics as minhash shingle pruning: a span
    shared by thousands of docs identifies a template, not a duplicate
    pair). At web scale always set it (e.g. 50); the default None keeps
    the relation exact for oracle replay at test scale.
    """
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fps = rolling_fingerprints(
        docs, k=k, window=window, id_col=id_col, text_col=text_col
    )
    if max_df is not None:
        keep = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_df")).where(
            F.col("_df") <= max_df
        )
        fps = fps.join(keep.select("fp"), "fp")
    a = fps.select(F.col("id").alias("id_a"), "fp")
    b = fps.select(F.col("id").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .where(F.col("shared_fps") >= min_shared)
    )


def incremental_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    *,
    threshold: float = 0.5,
    k: int = 3,
    n_hashes: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 7,
) -> DataFrame:
    """Incremental-ingestion dedup: classify every NEW document against
    the existing ``corpus`` AND the rest of its own batch. One row per
    new doc: ``(doc_id, status)`` with the first matching status in
    priority order

        exact_corpus  — byte-identical (md5) to an existing corpus doc
        exact_batch   — byte-identical to a SMALLER-id new doc
        near_corpus   — verified n-gram Jaccard ≥ threshold with any
                        corpus doc (LSH-banded candidates, exact verify
                        — minhash_near_dups semantics)
        near_batch    — near-dup of a SMALLER-id new doc (keep-first;
                        conservative — the earlier doc's own status is
                        NOT consulted, so a chain a~b~c keeps only a:
                        deterministic and O(pairs), the documented
                        trade against transitive re-admission)
        kept          — none of the above: genuinely new content

    This is the steady-state shape of a 100 TB pipeline: the corpus was
    deduplicated LAST month; today's crawl increment must be checked
    against it without re-pairing the corpus with itself. Scale shape:
    the exact stage is one hash semi-join (corpus side reduced to
    distinct md5s — one row per distinct text, broadcastable for
    increment-sized batches); the near stage runs the engine's banded
    minhash pipeline over the tagged union — corpus×corpus pairs are
    produced by the banding but the classification only consumes pairs
    touching a new doc. (A corpus-side band-table cache would avoid
    recomputing corpus signatures; that artifact reuse is a deploy-time
    concern — semantics here are the contract.)

    Ids must be unique ACROSS both frames (the driver gate's disjoint
    id spaces; duplicated ids would alias batch and corpus docs).
    """
    nd = new_docs.select(
        F.col(id_col).alias("id"), F.col(text_col).alias("text")
    )
    cp = corpus.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))

    nh = nd.withColumn("h", F.md5("text"))
    chashes = cp.select(F.md5("text").alias("h")).distinct()
    ec = nh.join(chashes, "h", "left_semi").select("id")

    w_first = Window.partitionBy("h")
    eb = (
        nh.withColumn("first_id", F.min("id").over(w_first))
        .where(F.col("id") > F.col("first_id"))
        .select("id")
    )

    pairs = minhash_near_dups(
        nd.unionAll(cp),
        k=k,
        n_hashes=n_hashes,
        bands=bands,
        threshold=threshold,
        id_col="id",
        text_col="text",
        seed=seed,
    )
    new_ids = nd.select("id")
    ptag = (
        pairs.join(
            new_ids.select(F.col("id").alias("id_a"), F.lit(1).alias("a_new")),
            "id_a",
            "left",
        )
        .join(
            new_ids.select(F.col("id").alias("id_b"), F.lit(1).alias("b_new")),
            "id_b",
            "left",
        )
        .select(
            "id_a", "id_b",
            F.coalesce("a_new", F.lit(0)).alias("a_new"),
            F.coalesce("b_new", F.lit(0)).alias("b_new"),
        )
    )
    nc = (
        ptag.where((F.col("a_new") == 1) & (F.col("b_new") == 0))
        .select(F.col("id_a").alias("id"))
        .unionAll(
            ptag.where((F.col("b_new") == 1) & (F.col("a_new") == 0)).select(
                F.col("id_b").alias("id")
            )
        )
        .distinct()
    )
    # id_a < id_b by the pair contract: the larger-id member is dropped
    nb = (
        ptag.where((F.col("a_new") == 1) & (F.col("b_new") == 1))
        .select(F.col("id_b").alias("id"))
        .distinct()
    )

    def flag(ids: DataFrame, name: str) -> DataFrame:
        return ids.select("id", F.lit(1).alias(name))

    out = (
        nd.select("id")
        .join(flag(ec, "f_ec"), "id", "left")
        .join(flag(eb, "f_eb"), "id", "left")
        .join(flag(nc, "f_nc"), "id", "left")
        .join(flag(nb, "f_nb"), "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.when(F.col("f_ec") == 1, F.lit("exact_corpus"))
            .when(F.col("f_eb") == 1, F.lit("exact_batch"))
            .when(F.col("f_nc") == 1, F.lit("near_corpus"))
            .when(F.col("f_nb") == 1, F.lit("near_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )
    return out
