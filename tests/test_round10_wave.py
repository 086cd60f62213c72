"""Round-10 additions: iterative BPE trainer semantics pins."""

from __future__ import annotations

import pandas as pd

from football_etl_spark.plans.queries import REGISTRY


def _docs(tmp_path, texts):
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    return str(tmp_path)


def test_bpe_train_greedy_overlap_semantics(tmp_path, spark):
    """The merge application must fold left-to-right greedily, the way
    a real BPE trainer consumes a token list: [A,A,A] merges to
    [AA, A] (the second occurrence overlaps the first and is NOT
    taken), and [A,B,A,B] merges BOTH disjoint occurrences. Hand-built
    corpus where round 1 must pick ('a','a') and the round-2 counts
    prove exactly which occurrences round 1 consumed."""
    # 'a a a' x3 docs -> pair (a,a) appears 6 times, dominating.
    # After merging: each doc becomes [a<US>a, a] -> round-2 pairs are
    # ('a<US>a', 'a') x3.
    sf = _docs(tmp_path, ["a a a", "a a a", "a a a", "b c"])
    rows = REGISTRY["bpe_train_merges"].fn.__wrapped__(spark, sf).collect()
    us = "\x1f"
    assert (rows[0]["merge_round"], rows[0]["pair"], rows[0]["n_occurrences"]) == (
        1, "a a", 6,
    )
    assert (rows[1]["pair"], rows[1]["n_occurrences"]) == (f"a{us}a a", 3)


def test_bpe_train_disjoint_pairs_both_merge(tmp_path, spark):
    """[x,y,x,y]: both disjoint (x,y) occurrences merge in one round —
    the string-REPLACE application must not eat the delimiter the next
    match needs (the double-space join exists for exactly this)."""
    sf = _docs(tmp_path, ["x y x y"] * 2, )
    rows = REGISTRY["bpe_train_merges"].fn.__wrapped__(spark, sf).collect()
    us = "\x1f"
    # round 1: (x,y) appears 2x/doc -> 4; (y,x) appears 1x/doc -> 2
    assert (rows[0]["pair"], rows[0]["n_occurrences"]) == ("x y", 4)
    # after merge each doc is [x<US>y, x<US>y] -> the only round-2 pair
    assert (rows[1]["pair"], rows[1]["n_occurrences"]) == (f"x{us}y x{us}y", 2)


def test_bpe_train_ties_break_pair_asc(tmp_path, spark):
    """Equal-count candidates must resolve by pair ASC on the joined
    string — the determinism contract shared with bpe_pair_stats."""
    sf = _docs(tmp_path, ["m n", "m n", "k z", "k z"])
    rows = REGISTRY["bpe_train_merges"].fn.__wrapped__(spark, sf).collect()
    assert (rows[0]["pair"], rows[0]["n_occurrences"]) == ("k z", 2)
