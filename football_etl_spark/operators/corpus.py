"""Corpus-preparation operators for large-scale training-data pipelines.

The steps between "deduplicated documents" and "training shards":

- ``chunk_documents`` — overlapping token-window chunking (the
  context-length fit pass). Pure array expressions: one tokenize, a
  stride ``sequence`` of window starts, ``posexplode`` + ``slice``.
  No shuffle at all — chunking 100 TB is a map-only scan.
- ``pack_shards`` — assign docs to fixed-token-budget shards by
  running cumulative token count WITHIN a deterministic bucket. The
  bucket bound keeps the ordering window parallel (a single global
  cumulative sum would serialize the corpus through one partition);
  shards are (bucket, offset/budget) pairs.
- ``stratified_sample`` — exactly-k-per-stratum deterministic sample:
  rank by content hash inside each stratum, keep the first k. Same
  reproducibility properties as operators/sampling.py (layout- and
  cluster-size-independent).
- ``vocabulary`` — corpus-wide term statistics (term frequency +
  document frequency) with a ranked top-k: one explode + two
  aggregations, map-side combined.

All four have exact DuckDB oracle twins in plans/queries.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from .scale import ensure_min_partitions
from .similarity import _literal_rows_df


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split each document into overlapping token windows of
    ``chunk_tokens`` with ``overlap`` tokens shared between adjacent
    chunks (stride = chunk_tokens - overlap). Output one row per
    chunk: (id, chunk_idx, chunk_text, chunk_n_tokens). Documents
    with zero tokens yield no rows; a document shorter than one
    chunk yields exactly one chunk.

    Map-only: tokenize once, generate window starts with ``sequence``
    and explode — no shuffle, no Python, linear in corpus size."""
    assert 0 <= overlap < chunk_tokens, "need 0 <= overlap < chunk_tokens"
    stride = chunk_tokens - overlap
    # The zero-token drop is a trim-length test on the RAW text, not
    # size(tokens) > 0 (r12): the two are equivalent (tokens() yields
    # [] exactly when the trimmed text is empty, split of anything
    # non-empty has ≥1 element, NULL propagates to NULL in both), but
    # the size() form pushed a full split() below the fan-out Exchange
    # just to test emptiness — every document tokenized twice.
    src = ensure_min_partitions(df.select(id_col, text_col)).filter(
        F.length(F.trim(F.col(text_col))) > 0
    )
    toked = src.select(id_col, tokens(text_col).alias("__toks"))
    n = F.size("__toks")
    starts = F.sequence(F.lit(1), F.greatest(n - overlap, F.lit(1)), F.lit(stride))
    return (
        toked
        .select(id_col, "__toks", n.alias("__n"), F.explode(starts).alias("__start"))
        .select(
            id_col,
            ((F.col("__start") - 1) / stride).cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice("__toks", F.col("__start"), chunk_tokens)).alias(
                "chunk_text"
            ),
            F.least(F.lit(chunk_tokens), F.col("__n") - F.col("__start") + 1).alias(
                "chunk_n_tokens"
            ),
        )
    )


def pack_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    budget_tokens: int = 2048,
    n_buckets: int = 8,
) -> DataFrame:
    """Assign every document to a training shard with a
    ``budget_tokens`` running-total budget. Documents are bucketed
    deterministically (id mod ``n_buckets``) and packed in id order
    within the bucket: a doc's shard is
    floor(cumulative_tokens_before_it / budget).

    The bucket bound is the scale design: the cumulative-sum window
    partitions by bucket, so packing parallelizes across buckets
    instead of serializing the whole corpus through one global
    ordering (at 1000 executors, use n_buckets ≈ cluster
    parallelism). Output: (id, n_tokens, bucket, shard_id)."""
    src = ensure_min_partitions(df.select(id_col, text_col)).select(
        id_col,
        F.size(tokens(text_col)).alias("n_tokens"),
        (F.col(id_col) % n_buckets).cast("int").alias("bucket"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return src.select(
        id_col,
        "n_tokens",
        "bucket",
        F.concat_ws(
            "_",
            F.col("bucket"),
            F.floor((cum - F.col("n_tokens")) / budget_tokens).cast("long"),
        ).alias("shard_id"),
    )


def _hash_order(id_col: str) -> Column:
    # md5 over the stringified id — portable deterministic shuffle
    # order (mirrorable as MD5(CAST(id AS VARCHAR)) in any engine)
    return F.md5(F.col(id_col).cast("string").cast("binary"))


def stratified_sample(
    df: DataFrame,
    strata: list[str],
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum, chosen by content
    hash of the id — reproducible across reruns, partition layouts,
    and cluster sizes (unlike ``sampleBy``, which is seeded but
    layout-dependent). One rank window per stratum key."""
    w = Window.partitionBy(*strata).orderBy(_hash_order(id_col), F.col(id_col))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def k_sample(df: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Exactly-k GLOBAL deterministic sample: order by content hash of
    the id, keep the first k — the reproducible replacement for
    reservoir sampling (same sample whatever the partitioning, today
    or next year). Sort+limit compiles to TakeOrderedAndProject: each
    partition keeps its local top-k and the driver merges k·P rows —
    no global sort, no single-partition funnel."""
    return df.orderBy(_hash_order(id_col), F.col(id_col)).limit(k)


def global_shuffle_index(
    df: DataFrame, id_col: str = "doc_id", prefix_len: int = 2
) -> DataFrame:
    """Deterministic global training-epoch shuffle: assign every row
    its POSITION in the hash-of-id total order (epoch shuffles feed
    trainers a reproducible permutation, so the position must be a
    layout-independent function of the data).

    The naive ``row_number() OVER (ORDER BY hash)`` funnels the whole
    corpus through ONE partition — unsurvivable at scale. This is the
    two-pass distributed global rank on a RADIX bucket instead:

    1. bucket = the first ``prefix_len`` hex chars of the md5 sort key
       (16^prefix_len buckets; 256 by default, raise to 3-4 chars for
       a 1000-executor corpus). The bucket is a monotone PREFIX of the
       total order and a pure function of the data — unlike a sampled
       ``repartitionByRange`` + ``spark_partition_id`` it needs no
       checkpoint/persist pin to stay consistent between passes, and
       md5 uniformity guarantees balance;
    2. per-bucket row counts (16^prefix_len rows — control-plane-
       sized) are collected, cumulative offsets broadcast back;
    3. ``position = offset[bucket] + (row_number within bucket - 1)``
       — the rank window is PARTITIONED by bucket, so no partition
       ever sees more than ~N/16^prefix_len rows.

    The (hash, id) key is a unique total order, so positions are
    independent of input layout and cluster size."""
    key = _hash_order(id_col)
    bucket = F.substring(key, 1, prefix_len)
    withb = df.withColumn("__b", bucket)
    counts = sorted(
        (r["__b"], r["__n"])
        for r in withb.groupBy("__b").agg(F.count("*").alias("__n")).collect()
    )
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append({"__b": b, "__off": acc})
        acc += n
    # JVM-literal relation, NOT createDataFrame: a Python-RDD-backed
    # local relation re-launches a Python worker on EVERY execution of
    # the plan (~0.2s/run for 256 rows); the literal plan evaluates
    # JVM-side for free and the control plane is bucket-count-sized.
    off = F.broadcast(
        _literal_rows_df(df.sparkSession, offsets, "__b: string, __off: long")
    )
    w = Window.partitionBy("__b").orderBy(key, F.col(id_col))
    return (
        withb.join(off, "__b")
        .withColumn(
            "position",
            (F.col("__off") + F.row_number().over(w) - 1).cast("long"),
        )
        .drop("__b", "__off")
    )


def vocabulary(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary statistics: lowercased whitespace terms with
    total term frequency and document frequency, ranked by tf (ties →
    lexicographic), top ``top_k``. Explode + one groupBy with
    map-side partial aggregation; df comes from a per-doc distinct
    inside the same pass (collect_set-free: count distinct doc ids)."""
    terms = (
        ensure_min_partitions(df.select("doc_id", text_col))
        .select("doc_id", F.explode(tokens(text_col)).alias("term"))
        .select("doc_id", F.lower("term").alias("term"))
    )
    stats = terms.groupBy("term").agg(
        F.count("*").alias("tf"),
        F.countDistinct("doc_id").alias("df"),
    )
    # sort+limit compiles to TakeOrderedAndProject (parallel per-
    # partition top-k + merge) — a global rank window here would pull
    # the whole vocabulary through ONE partition; the rank is attached
    # afterwards over just the k survivors. The pmod(tf, 1) partition
    # key is constant 0 at runtime (single partition — correct: the
    # window input is top_k rows by construction) but non-foldable, so
    # WindowExec sees a defined partitionSpec and skips its "no
    # partition defined ... single partition" warning — a false scale
    # alarm in bench logs (a bare F.lit(0) gets constant-folded away
    # and the warning fires anyway)
    top = stats.orderBy(F.desc("tf"), F.asc("term")).limit(top_k)
    w = Window.partitionBy(F.pmod(F.col("tf"), F.lit(1))).orderBy(
        F.desc("tf"), F.asc("term")
    )
    return top.withColumn("rank", F.row_number().over(w).cast("long")).select(
        "rank", "term", "tf", "df"
    )


def unigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    round_to: int = 6,
) -> DataFrame:
    """Perplexity-proxy document scoring with a SELF-TRAINED unigram
    LM — the classic cheap quality signal (a doc whose words are rare
    under the corpus distribution is an outlier: boilerplate, noise,
    wrong language): logp(doc) = Σ_t ln(tf_t / T) over its tokens,
    where tf comes from the corpus itself and T is the total token
    count, plus the doc's mean per-token logprob as the length-
    normalized variant.

    Plan: one explode, one term groupBy for the LM (map-side
    combined), an equi-join of the exploded tokens back against the
    term table (Catalyst picks broadcast when the vocabulary fits, SMJ
    otherwise — both co-keyed on term), one doc groupBy. Per-token
    logprobs are rounded to ``round_to`` and summed as
    DECIMAL(28, ``round_to``) so the total is exact and order-
    independent — cross-engine hash-stable regardless of partition
    accumulation order. Empty docs score 0 tokens / NULL logprob.
    At 100 TB: two shuffles (term, doc_id), no state, and the LM side
    is vocabulary-sized, not corpus-sized.

    Measured alternative, REJECTED (r8, x1000 = 1M docs): pre-
    aggregating to (doc_id, term, cnt) before the vocabulary join —
    the textbook shrink-the-join-input move — regressed 39.5s →
    65.4s against DuckDB's 21.1s. On this corpus the within-doc
    repetition factor is ~1 (docs are short and lexically diverse),
    so the doc-term relation is token-stream-sized and the extra
    (doc_id, term) exchange + second hash agg are pure added cost.
    The pre-agg form only wins when cnt > ~2 on average; keep the
    token-grain join unless the corpus is long-doc/repetitive."""
    toks = df.select("doc_id", F.explode(tokens(text_col)).alias("term"))
    # total token count rides the term relation via a windowed sum so
    # the LM stays one distributed relation (no driver-side scalar) —
    # pmod partition key per the WindowExec-warning note above; the
    # window input is vocabulary-sized
    tot = Window.partitionBy(F.pmod(F.col("tf"), F.lit(1))).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    lm = (
        toks.groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .select(
            "term",
            F.round(F.log(F.col("tf") / F.sum("tf").over(tot)), round_to).alias(
                "__lp"
            ),
        )
    )
    scored = toks.join(lm, "term").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        F.sum(F.col("__lp").cast(f"decimal(28,{round_to})"))
        .cast("double")
        .alias("logprob"),
    )
    # left join restores token-less docs (empty text) with NULL score
    return (
        df.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            "logprob",
            F.round(F.col("logprob") / F.col("n_tokens"), round_to).alias(
                "mean_logprob"
            ),
        )
    )


def distributed_ntile(
    df: DataFrame,
    n_tiles: int,
    bin_col: Column,
    order_cols: list,
    out_col: str = "tile",
) -> DataFrame:
    """Exact global ``NTILE(n)`` over ``order_cols`` WITHOUT the
    single-partition global window — ``global_shuffle_index``'s
    two-pass radix-rank pattern generalized from the value-uniform
    md5 prefix to any caller-supplied ``bin_col`` that is a MONOTONE
    (non-strict) integer function of the leading order column.

    Pass 1 collects per-bin row counts (control-plane-sized: one row
    per occupied bin) and broadcasts cumulative offsets back; pass 2
    ranks WITHIN each bin (the window partitions by bin, so no
    partition sees more than the largest bin) and reconstructs the
    global rank rn = offset + within-bin row_number. The tile is then
    pure integer arithmetic on rn: ((rn-1)*n) DIV N + 1 — exactly the
    engine NTILE contract (the first N mod n tiles take the extra
    row; integer DIV, never double division, which loses rank
    exactness past 2^53). Pinned against Spark's own F.ntile in
    tests/test_round12_wave.py across uneven N.

    Worst-case skew is the largest bin funneling one window
    partition; callers pick the bin accordingly (quarter-unit score
    bins for LM scores, hash prefixes for uniform keys)."""
    withb = df.withColumn("__b", bin_col.cast("long"))
    counts = sorted(
        (r["__b"], r["__n"])
        for r in withb.groupBy("__b").agg(F.count("*").alias("__n")).collect()
    )
    total = sum(n for _, n in counts)
    offsets, acc = [], 0
    for b, n in counts:
        offsets.append({"__b": b, "__off": acc})
        acc += n
    off = F.broadcast(
        _literal_rows_df(df.sparkSession, offsets, "__b: long, __off: long")
    )
    w = Window.partitionBy("__b").orderBy(*order_cols)
    rn = (F.col("__off") + F.row_number().over(w)).cast("long")
    return (
        withb.join(off, "__b")
        .withColumn("__rn", rn)
        .withColumn(
            out_col,
            F.expr(f"CAST(((__rn - 1) * {int(n_tiles)}) DIV {int(total)} AS INT) + 1")
            if total
            else F.lit(1),
        )
        .drop("__b", "__off", "__rn")
    )
