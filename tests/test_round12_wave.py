"""Round-12 additions: the vertical-tab (CHR 11) tokenization class
fix (r11 ADVICE) — DuckDB's RE2 '\\s' is [\\t\\n\\f\\r ] and does NOT
match \\x0B while the Spark side's Java '\\s' does, so every
RE2-'\\s'-based oracle now TRANSLATEs CHR(11) to a space first — plus
a whitespace fuzz dimension over the full six-char ASCII whitespace
alphabet so the next engine-disagreeing whitespace char can't land
silently."""

from __future__ import annotations

import os
import shutil
import tempfile

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from football_etl_spark.plans.queries import REGISTRY

from .conftest import SF_SMOKE
from .oracle_harness import compare

pytestmark = pytest.mark.usefixtures("spark")

_SETTINGS = dict(
    max_examples=int(os.environ.get("FUZZ_EXAMPLES", "8")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Every registry entry whose oracle tokenizes (or collapses) text via
# an RE2 '\s' construct — the class the CHR(11) TRANSLATE fix covers.
_VTAB_ENTRIES = (
    "text_quality_stats",       # _SQL_TOKS + the [^\s...] bpe-token count
    "doc_repetition_stats",     # r12 port: collapse + split_part shingles
    "doc_fingerprints",         # _SQL_TOKS + the content_fp \s+ collapse
    "bpe_train_merges",         # d0 CTE \s+ collapse
    "bpe_encode_corpus",        # shared d0 CTE
    "bigram_lm_surprisal_topk",  # _SQL_TOKS
    # r12 split_part fan-out ports — the collapse owns their
    # whitespace handling now; keep them pinned on the adversarial
    # corpus so a fan-out regression can't hide behind clean text.
    "vocab_top_terms",
    "unigram_logprob_scores",
    "tfidf_top_terms",
    "bm25_topk_docs",
    "simhash_near_dups",
)


def _fixture_dir(dirpath, texts):
    """Full smoke table layout with an adversarial documents table —
    duckdb_run binds a view per table eagerly, so every table file
    must exist even when the oracle touches only documents."""
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", os.path.join(dirpath, f"{t}.parquet"))
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(os.path.join(dirpath, "documents.parquet"))
    return str(dirpath)


def test_vertical_tab_tokenization_agrees(tmp_path, spark):
    """Fixed adversarial \\x0B corpus: mid-token, leading, trailing,
    run-adjacent-to-spaces, and whitespace-only placements. Before the
    r12 TRANSLATE(CHR(11)) fix, DuckDB kept 'a\\x0Bb' as ONE token
    (RE2 \\s misses vertical tab) while Spark split it into two —
    every entry below hash-diverged on this corpus."""
    texts = [
        "a\x0bb c the the a of it is",        # mid-token vtab
        "\x0bleading the a of it is for on",   # leading vtab (TRIM keeps it)
        "trailing the a of it is\x0b",         # trailing vtab
        "mixed \x0b\x0b runs\x0bhere the a.",  # runs + space-adjacent
        "the cat sat on the mat it is fine",   # control doc, no vtab
        "\x0b",                                # vtab-only doc
    ]
    sf = _fixture_dir(tmp_path, texts)
    for name in _VTAB_ENTRIES:
        probs = compare(REGISTRY[name].fn.__wrapped__(spark, sf), REGISTRY[name].oracle, sf)
        assert not probs, (name, probs)


# The whitespace fuzz dimension (r11 ADVICE ask): random texts over an
# alphabet that includes ALL six ASCII whitespace chars Java's \s
# matches ([ \t\n\x0B\f\r]) plus word/punct chars — if any whitespace
# char's cross-engine handling regresses (or a new oracle forgets the
# CHR(11) rule on these entries), this draws it. RS/US (\x1e/\x1f) are
# deliberately outside the alphabet: they are the sandwich sentinels
# with their own documented exclusion preconditions.
_WS_ALPHABET = st.sampled_from(list(" \t\n\x0b\x0c\rabcthe.,!?0"))
_ws_text = st.text(alphabet=_WS_ALPHABET, min_size=0, max_size=24)


@given(texts=st.lists(_ws_text, min_size=1, max_size=6))
@settings(**_SETTINGS)
def test_whitespace_fuzz_tokenizer_oracles(spark, texts):
    tmp = tempfile.mkdtemp(prefix="fes_wsfuzz_")
    try:
        sf = _fixture_dir(tmp, texts)
        for name in ("text_quality_stats", "doc_fingerprints"):
            probs = compare(
                REGISTRY[name].fn.__wrapped__(spark, sf), REGISTRY[name].oracle, sf
            )
            assert not probs, (name, texts, probs)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# ---- trigram stupid-backoff LM (r11 VERDICT ask #4) ------------------------


def _stupid_backoff_reference(texts):
    """12-line reference model: train on even doc_ids, score odd ones;
    S = c3/c2 | 0.4*c23/c1(w2) | 0.16*(c1(w3)+1)/(N+V)."""
    import math

    docs = {i: t.split() for i, t in enumerate(texts)}
    train = [d for i, d in docs.items() if i % 2 == 0]
    c3, c2, c1 = {}, {}, {}
    for d in train:
        for i in range(len(d)):
            c1[d[i]] = c1.get(d[i], 0) + 1
            if i + 1 < len(d):
                c2[(d[i], d[i + 1])] = c2.get((d[i], d[i + 1]), 0) + 1
            if i + 2 < len(d):
                k = (d[i], d[i + 1], d[i + 2])
                c3[k] = c3.get(k, 0) + 1
    n_tok, v = sum(c1.values()), len(c1)
    want = []
    for i, d in docs.items():
        if i % 2 == 0 or len(d) < 3:
            continue
        terms = []
        for a, b, c in zip(d, d[1:], d[2:]):
            if (a, b, c) in c3:
                s = c3[(a, b, c)] / c2[(a, b)]
            elif (b, c) in c2:
                s = 0.4 * (c2[(b, c)] / c1[b])
            else:
                s = 0.4 * (0.4 * ((c1.get(c, 0) + 1) / (n_tok + v)))
            terms.append(round(math.log2(s), 6))
        want.append((i, len(terms), round(-sum(terms) / len(terms), 6)))
    want.sort(key=lambda r: (-r[2], r[0]))
    return want


def test_trigram_backoff_matches_bruteforce(tmp_path, spark):
    """All three backoff branches exercised: doc1 has seen trigrams
    (from doc0), a seen-bigram-only continuation, and an OOV token."""
    texts = [
        "a b c a b c d",      # train
        "a b c x b c d q z",  # score: trigram hit, bigram hit, OOV x/q/z
        "b c d b c",          # train
        "c a b c d",          # score: all-seen path
        "q q q",              # train-side? no: doc_id 4 (even) -> train
        "z z a b c",          # score: OOV-heavy
    ]
    want = _stupid_backoff_reference(texts)
    sf = _fixture_dir(tmp_path, texts)
    got = [
        (r["doc_id"], r["n_trigrams"], r["avg_surprisal_bits"])
        for r in REGISTRY["trigram_backoff_surprisal_topk"]
        .fn.__wrapped__(spark, sf)
        .collect()
    ]
    assert got == want[:10], (got, want)


def test_trigram_backoff_order_independent(tmp_path, spark):
    """The decimal-quantized summation makes the per-doc aggregate
    independent of row order and partitioning: the same corpus written
    in reversed row order across a different file layout must produce
    IDENTICAL rows (the shuffle-order pin the verdict asked for)."""
    texts = [f"w{i % 7} w{(i * 3) % 5} common w{i % 4} tail{i % 3}" for i in range(24)]
    rows = list(enumerate(texts))
    a = tmp_path / "a"
    b = tmp_path / "b"
    a.mkdir(), b.mkdir()

    def write(dirpath, rows, parts):
        import pandas as pd

        sf = _fixture_dir(dirpath, [t for _, t in rows])
        # overwrite documents with explicit ids + multi-file layout
        pdf = pd.DataFrame(
            {
                "doc_id": [i for i, _ in rows],
                "text": [t for _, t in rows],
                "lang": ["en"] * len(rows),
                "source": ["s"] * len(rows),
                "n_chars": [len(t) for _, t in rows],
            }
        )
        spark.createDataFrame(pdf).repartition(parts).write.mode(
            "overwrite"
        ).parquet(str(dirpath / "documents.parquet"))
        return sf

    sfa = write(a, rows, 1)
    sfb = write(b, rows[::-1], 7)
    ent = REGISTRY["trigram_backoff_surprisal_topk"]
    ra = [tuple(r) for r in ent.fn.__wrapped__(spark, sfa).collect()]
    rb = [tuple(r) for r in ent.fn.__wrapped__(spark, sfb).collect()]
    assert ra == rb, (ra, rb)


def test_bigram_lm_two_corpus_scans(spark):
    """The r12 rework pins the scan count: the scoring plan reads the
    corpus ONCE (the materialization job is the only other scan) and
    derives c2/c1/V from the checkpointed augmented pair table."""
    from .conftest import SF_SMOKE

    df = REGISTRY["bigram_lm_surprisal_topk"].fn.__wrapped__(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("documents.parquet") == 1, plan[:500]


# ---- r12 dual-SQL port spellings (VERDICT r11 ask #5) ----------------------

# Each probe runs VERBATIM on Spark SQL and DuckDB and must return
# identical rows — these are exactly the constructs the r12 token
# fan-out ports (queries._sql_tok_expand, _simhash_oracle) rely on:
# 1-based SPLIT_PART with '' out of range, the range(lo,hi) t(i) TVF,
# VALUES-derived tables, bit ops (XOR spelled (a|b)-(a&b): DuckDB's ^
# is exponent, Spark lacks xor()), and the INSTR hex decode.
_SHARED_SPELLING_PROBES = (
    "SELECT SPLIT_PART('alpha beta', ' ', 2) AS a, "
    "SPLIT_PART('alpha beta', ' ', 5) AS b, SPLIT_PART('', ' ', 1) AS c",
    "SELECT CAST(t.i AS INT) AS i FROM range(2, 5) t(i) ORDER BY i",
    "SELECT v.q, v.t FROM (VALUES (1, 'a'), (2, 'b')) v(q, t) ORDER BY q",
    "SELECT (12 | 10) - (12 & 10) AS x, 5 >> 1 AS s, "
    "CAST(BIT_COUNT(CAST(7 AS BIGINT)) AS INT) AS bc",
    "SELECT CAST(SUM((INSTR('0123456789abcdef', SUBSTR(MD5('tok'), t.i, 1)) - 1)"
    " * CAST(POWER(16, 5 - t.i) AS BIGINT)) AS BIGINT) AS h "
    "FROM range(1, 6) t(i)",
    "SELECT CONTAINS('ab', CHR(30)) AS has_rs, CONTAINS(CHR(31), CHR(31)) AS has_us",
)


def test_r12_port_spellings_agree_cross_engine(spark):
    import duckdb

    con = duckdb.connect()
    for sql in _SHARED_SPELLING_PROBES:
        duck = [tuple(r) for r in con.execute(sql).fetchall()]
        spk = [tuple(r) for r in spark.sql(sql).collect()]
        assert duck == spk, (sql, duck, spk)


def test_perf_oracle_matches_portable_oracle():
    """Every perf_oracle (the DuckDB-native timing twin of a ported
    portable oracle) must return IDENTICAL rows to the correctness
    oracle on DuckDB at two SFs — so the paired bench can time the
    native formulation without the two texts ever drifting apart.
    Pure DuckDB, no Spark session."""
    import duckdb

    tables = (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split()
    with_perf = sorted(
        n for n, q in REGISTRY.items() if q.perf_oracle is not None
    )
    assert with_perf, "r12 added perf twins; the set cannot be empty"
    for sf in ("/root/testdata/sf0.001", SF_SMOKE):
        con = duckdb.connect()
        for t in tables:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
            )
        for name in with_perf:
            q = REGISTRY[name]
            a = con.execute(q.oracle).fetchall()
            cols_a = [d[0] for d in con.description]
            b = con.execute(q.perf_oracle).fetchall()
            cols_b = [d[0] for d in con.description]
            assert cols_a == cols_b, (name, cols_a, cols_b)
            assert sorted(map(repr, a)) == sorted(map(repr, b)), (
                name,
                sf,
                len(a),
                len(b),
            )
        con.close()


def test_distributed_ntile_matches_engine_ntile(spark):
    """corpus.distributed_ntile's integer-DIV rank arithmetic must
    reproduce Spark's own NTILE exactly — including the uneven-N
    rule (first N mod n tiles take the extra row) and ties broken by
    the tiebreak column — across sizes that hit every remainder,
    with a deliberately skewed bin (monotone, non-uniform)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from football_etl_spark.operators.corpus import distributed_ntile

    for n_rows in (1, 2, 3, 7, 10, 11, 12, 100):
        df = spark.range(n_rows).select(
            F.col("id").alias("doc_id"),
            # non-unique score with ties; descending in doc_id blocks
            ((F.col("id") * 7) % 5).cast("double").alias("score"),
        )
        want = df.select(
            "doc_id",
            F.ntile(3)
            .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
            .alias("tile"),
        )
        got = distributed_ntile(
            df,
            3,
            F.floor(-F.col("score")),  # monotone in DESC score, skewed
            [F.desc("score"), F.asc("doc_id")],
        ).select("doc_id", "tile")
        w = {r["doc_id"]: r["tile"] for r in want.collect()}
        g = {r["doc_id"]: r["tile"] for r in got.collect()}
        assert g == w, (n_rows, g, w)


def test_split_leakage_detects_cross_split_dups(tmp_path, spark):
    """The leak path is never exercised by the generated corpora (zero
    exact dups), so pin it on a synthetic corpus: doc 1 (train), 0
    (val), 3 (test) share exact content up to whitespace/case — the
    report must label the straddling fingerprints and stay
    oracle-exact. md5-split facts: 0->val, 1,2->train, 3,5->test."""
    texts = [
        "The SAME   leaked document",   # doc 0 -> val
        "the same leaked document",     # doc 1 -> train (dup of 0)
        "unique train doc here",        # doc 2 -> train
        "  the SAME leaked document ",  # doc 3 -> test (dup of 0)
        "another unique doc",           # doc 4 -> train
        "unique test doc",              # doc 5 -> test
    ]
    sf = _fixture_dir(tmp_path, texts)
    ent = REGISTRY["split_leakage_report"]
    assert not compare(ent.fn.__wrapped__(spark, sf), ent.oracle, sf)
    rows = {
        (r["n_splits"], r["leak_span"]): (r["n_fingerprints"], r["n_docs"])
        for r in ent.fn.__wrapped__(spark, sf).collect()
    }
    assert rows[(3, "test->val")] == (1, 3)   # the straddling fp
    assert rows[(1, "none")] == (3, 3)        # the three unique docs
