"""Round-10/11 additions: iterative BPE trainer semantics pins
(r10), the r11 greedy-fold collision-alphabet + sentinel pins, and
the r11 entries' brute-force pins (bpe_encode divergence, bigram-LM
reference model, semantic-diversity pairwise identity)."""

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


def _reference_bpe(docs: list[list[str]], rounds: int = 3):
    """15-line reference BPE trainer: count adjacent pairs, adopt the
    (count DESC, pair ASC) winner, apply it with a greedy left-to-right
    fold, repeat. Shares no code or representation with the entry
    (token LISTS here; double-space strings there)."""
    out = []
    cur = [list(d) for d in docs]
    for rnd in range(1, rounds + 1):
        counts: dict = {}
        for d in cur:
            for a, b in zip(d, d[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (w1, w2), n = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        out.append((rnd, f"{w1} {w2}", n))
        nxt = []
        for d in cur:
            merged, i = [], 0
            while i < len(d):
                if i + 1 < len(d) and d[i] == w1 and d[i + 1] == w2:
                    merged.append(d[i] + "\x1f" + d[i + 1])
                    i += 2
                else:
                    merged.append(d[i])
                    i += 1
            nxt.append(merged)
        cur = nxt
    return out


def test_bpe_train_matches_reference_on_random_corpora(tmp_path, spark):
    """Seeded random corpora over a tiny alphabet (forcing heavy pair
    collisions, ties, overlapping runs, and re-merges of already-merged
    tokens across rounds) must train the exact same 3 rules as the
    reference list-fold trainer."""
    import random

    for seed in range(6):
        rng = random.Random(seed)
        docs = [
            [rng.choice("ab c dd e".split()) for _ in range(rng.randint(0, 12))]
            for _ in range(rng.randint(3, 14))
        ]
        want = _reference_bpe(docs)
        d = tmp_path / f"s{seed}"
        d.mkdir()
        sf = _docs(d, [" ".join(doc) for doc in docs])
        got = [
            (r["merge_round"], r["pair"], r["n_occurrences"])
            for r in REGISTRY["bpe_train_merges"].fn.__wrapped__(spark, sf).collect()
        ]
        assert got == want, (seed, got, want)


def test_bpe_train_matches_reference_on_collision_alphabet(tmp_path, spark):
    """The r10 ADVICE-high class: an alphabet with prefix/suffix
    collisions ('a' is a suffix of 'xa' and a prefix of 'ab'/'aa';
    'b' a prefix of 'bc') — exactly the token shapes where the old
    string-REPLACE application merged PARTIAL tokens ([a,bc] with
    pair (a,b) -> 'a<US>bc'; [xa,a] with pair (a,a) -> 'xa<US>a').
    The judge's simulation showed seed 104 of the original generator
    diverging; this pin covers seeds 100-111 over the collision
    alphabet so the class is load-bearing, not luck. A deliberately
    repetition-heavy draw also exercises odd self-pair runs
    ([A]x5 -> [AA,AA,A]) where even an anchored replace-to-fixpoint
    would diverge from the greedy fold."""
    import random

    alphabet = "a ab b bc xa aa".split()
    for seed in range(100, 112):
        rng = random.Random(seed)
        docs = [
            [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
            for _ in range(rng.randint(3, 14))
        ]
        # salt a few self-pair runs in so run-parity is always exercised
        docs.append(["a"] * 5)
        docs.append(["aa", "aa", "aa", "aa", "aa"])
        want = _reference_bpe(docs)
        d = tmp_path / f"c{seed}"
        d.mkdir()
        sf = _docs(d, [" ".join(doc) for doc in docs])
        got = [
            (r["merge_round"], r["pair"], r["n_occurrences"])
            for r in REGISTRY["bpe_train_merges"].fn.__wrapped__(spark, sf).collect()
        ]
        assert got == want, (seed, got, want)


def test_bpe_train_sentinel_docs_excluded(tmp_path, spark):
    """PRECONDITION pin: docs whose raw text carries a literal US byte
    (CHR(31)) are excluded from training on both engines — a raw token
    containing the sentinel would conflate with a merged token."""
    sf = _docs(tmp_path, ["p q", "p q", "p\x1fq r", "r s"])
    rows = REGISTRY["bpe_train_merges"].fn.__wrapped__(spark, sf).collect()
    # the sentinel doc must not contribute: (p,q) counts 2, not 3
    assert (rows[0]["pair"], rows[0]["n_occurrences"]) == ("p q", 2)


def test_bpe_encode_applied_diverges_from_occurrences(tmp_path, spark):
    """r11 encode entry: n_merges_applied is greedy-APPLICATION count,
    which is strictly less than the trainer's occurrence count when
    occurrences overlap. Corpus: two [a,a,a] docs -> rule 1 is (a,a)
    with 4 occurrences but only 2 applied merges (each doc folds to
    [aa, a]); totals pin the whole compression chain."""
    from football_etl_spark.plans.queries import REGISTRY as R

    sf = _docs(tmp_path, ["a a a", "a a a", "b c", "b c"])
    train = {r["merge_round"]: r for r in R["bpe_train_merges"].fn.__wrapped__(spark, sf).collect()}
    enc = {r["merge_round"]: r for r in R["bpe_encode_corpus"].fn.__wrapped__(spark, sf).collect()}
    assert train[1]["pair"] == "a a" and train[1]["n_occurrences"] == 4
    assert enc[1]["n_merges_applied"] == 2  # NOT 4: [a,a,a] -> [aa, a]
    assert enc[1]["tokens_after_round"] == 8  # 10 raw - 2 applied
    assert enc[1]["compression_vs_raw"] == 8 / 10
    # rounds 2+3 merge the two non-overlapping pair classes fully
    assert enc[3]["tokens_after_round"] == 4


def test_bigram_lm_surprisal_matches_bruteforce(tmp_path, spark):
    """r11 bigram-LM entry pinned against a 12-line reference model:
    add-1-smoothed P(w2|w1) with left-context counts and corpus vocab,
    per-doc mean of ROUND(log2(p), 6) quantized terms."""
    import math

    texts = ["a b a b c", "a b a", "c c c a", "b c", "z a b"]
    docs = [t.split() for t in texts]
    c2: dict = {}
    for d in docs:
        for x, y in zip(d, d[1:]):
            c2[(x, y)] = c2.get((x, y), 0) + 1
    c1: dict = {}
    for (x, _), n in c2.items():
        c1[x] = c1.get(x, 0) + n
    vocab = {w for d in docs for w in d}
    want = []
    for i, d in enumerate(docs):
        terms = [
            round(math.log2((c2[(x, y)] + 1) / (c1[x] + len(vocab))), 6)
            for x, y in zip(d, d[1:])
        ]
        want.append((i, len(terms), round(-sum(terms) / len(terms), 6)))
    want.sort(key=lambda r: (-r[2], r[0]))

    from football_etl_spark.plans.queries import REGISTRY as R

    sf = _docs(tmp_path, texts)
    got = [
        (r["doc_id"], r["n_bigrams"], r["avg_surprisal_bits"])
        for r in R["bigram_lm_surprisal_topk"].fn.__wrapped__(spark, sf).collect()
    ]
    assert got == want[:10], (got, want)


def test_semantic_diversity_matches_bruteforce_pairwise(tmp_path, spark):
    """r11 diversity entry: the linear sum-of-vectors identity must
    equal the O(n^2) brute force on the same quantized grid EXACTLY,
    and approximate the TRUE (unquantized) mean pairwise cosine to
    grid precision."""
    import itertools
    import math
    import pandas as pd
    import random

    rng = random.Random(7)
    rows = []
    for vid in range(40):
        rows.append(
            {
                "vec_id": vid,
                "embedding": [rng.uniform(-1, 1) for _ in range(16)],
                "label": vid % 3,
            }
        )
    pd.DataFrame(rows).to_parquet(tmp_path / "embeddings.parquet")

    def quant(v):
        n = math.sqrt(sum(x * x for x in v))
        return [math.floor(x / n * 1_000_000 + 0.5) for x in v]

    want, true = {}, {}
    for lab in (0, 1, 2):
        vs = [r["embedding"] for r in rows if r["label"] == lab]
        qs = [quant(v) for v in vs]
        pair_q = [
            sum(a * b for a, b in zip(qi, qj)) / 1e12
            for qi, qj in itertools.combinations(qs, 2)
        ]
        # the identity divides by n(n-1), i.e. ordered pairs — mean
        # over unordered pairs is identical because dot is symmetric
        want[lab] = round(sum(pair_q) / len(pair_q), 6)
        pair_t = [
            sum(a * b for a, b in zip(vi, vj))
            / (
                math.sqrt(sum(x * x for x in vi))
                * math.sqrt(sum(x * x for x in vj))
            )
            for vi, vj in itertools.combinations(vs, 2)
        ]
        true[lab] = sum(pair_t) / len(pair_t)

    from football_etl_spark.plans.queries import REGISTRY as R

    got = {
        r["label"]: (r["n_vectors"], r["mean_pairwise_cosine"])
        for r in R["semantic_diversity_by_label"]
        .fn.__wrapped__(spark, str(tmp_path))
        .collect()
    }
    for lab in (0, 1, 2):
        n, mc = got[lab]
        assert n == len([r for r in rows if r["label"] == lab])
        assert abs(mc - want[lab]) < 2e-6, (lab, mc, want[lab])
        assert abs(mc - true[lab]) < 5e-4, (lab, mc, true[lab])


def test_counting_oracles_agree_on_sentinel_docs(tmp_path, spark):
    """r11 review finding: the TRANSLATE+sandwich token count conflates
    on literal RS/US bytes ('x\\x1f \\x1ey' collapses to one token while
    split() sees two). The four counting-port entries exclude such docs
    identically on BOTH engines — seeded adversarial corpus must stay
    oracle-green AND visibly exclude the control-byte docs."""
    from football_etl_spark.plans.queries import REGISTRY as R

    from .oracle_harness import compare

    import shutil

    from .conftest import SF_SMOKE

    texts = [
        "the cat sat on the mat for a while it is fine " * 3,
        "x\x1f \x1ey the the",          # excluded: US + RS bytes
        "plain words here and there the a of to in is it for on " * 2,
        "ctrl\x1eonly doc the the the",  # excluded: RS byte
    ]
    # the harness registers every table as a view, so give the fixture
    # dir the full smoke layout and overwrite documents with the
    # adversarial corpus
    for t in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", tmp_path / f"{t}.parquet")
    sf = _docs(tmp_path, texts)
    for name in (
        "packed_training_shards",
        "gopher_quality_filter",
        "lang_id_counts",
        "quality_weighted_sample",
    ):
        probs = compare(R[name].fn.__wrapped__(spark, sf), R[name].oracle, sf)
        assert not probs, (name, probs)
    packed = R["packed_training_shards"].fn.__wrapped__(spark, sf).collect()
    assert {r["doc_id"] for r in packed} == {0, 2}
