"""Seeded-random differential tests: the new analytics operators vs
independent pure-Python reference implementations on generated corpora.
Complements the DuckDB oracle (which shares the SQL formulation) with a
second, SQL-free derivation of the same math — a formulation error that
slipped into BOTH the Spark expression and its oracle twin would still
be caught here."""

from __future__ import annotations

import math
import random

import pytest

VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "the", "a"]


def _random_corpus(seed: int, n_docs: int = 30):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 25))))
        for i in range(n_docs)
    ]


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_bm25_matches_python_reference(spark, seed):
    from dbt_nlp_sqlizer_team04_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        bm25_topk,
    )

    corpus = _random_corpus(seed)
    terms = ("alpha", "the")
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(docs, terms, k=1000).collect()
    }

    toks = {i: t.split() for i, t in corpus}
    n = len(corpus)
    avgdl = sum(len(t) for t in toks.values()) / n
    want = {}
    for i, t in toks.items():
        score = 0.0
        for term in terms:
            tf = t.count(term)
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * (
                tf * (BM25_K1 + 1.0)
                / (tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(t) / avgdl))
            )
        if any(term in t for term in terms):
            want[i] = round(score, 4)
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_funnel_matches_python_reference(spark, seed):
    import datetime as dt

    from dbt_nlp_sqlizer_team04_spark.operators.funnel import conversion_funnel

    rng = random.Random(seed)
    stages = ("view", "click", "purchase")
    rows = [
        (
            rng.randint(0, 9),
            dt.datetime(2024, 1, 1) + dt.timedelta(minutes=rng.randint(0, 500)),
            rng.choice(stages + ("error",)),
        )
        for _ in range(200)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["stage"]: r["n_users"] for r in conversion_funnel(ev, stages).collect()}

    by_user: dict = {}
    for u, ts, et in rows:
        by_user.setdefault(u, []).append((ts, et))
    want = dict.fromkeys(stages, 0)
    for evs in by_user.values():
        frontier = None
        for i, stage in enumerate(stages):
            cand = [
                ts
                for ts, et in evs
                if et == stage and (frontier is None or ts > frontier)
            ]
            if not cand:
                break
            frontier = min(cand)
            want[stage] += 1
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_histogram_matches_python_reference(spark, seed):
    from dbt_nlp_sqlizer_team04_spark.operators.profiler import numeric_histogram

    rng = random.Random(seed)
    vals = [round(rng.uniform(-100, 100), 3) for _ in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {r["bucket"]: r["n"] for r in numeric_histogram(df, "x", n_bins=13).collect()}

    mn, mx = min(vals), max(vals)
    width = (mx - mn) / 13.0
    want: dict = {}
    for v in vals:
        b = min(int(math.floor((v - mn) / width)), 12)
        want[b] = want.get(b, 0) + 1
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_bigram_lm_matches_python_reference(spark, seed):
    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        BIGRAM_LM_K,
        bigram_logprob_scores,
    )

    corpus = _random_corpus(seed, n_docs=15)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_neg_logprob"])
        for r in bigram_logprob_scores(docs).collect()
    }

    toks = {i: t.split() for i, t in corpus}
    uni: dict = {}
    big: dict = {}
    for t in toks.values():
        for w in t:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(t, t[1:]):
            big[(a, b)] = big.get((a, b), 0) + 1
    v = float(len(uni))
    k = BIGRAM_LM_K
    want = {}
    for i, t in toks.items():
        pairs = list(zip(t, t[1:]))
        if not pairs:
            continue
        nll = [
            -math.log((big[(a, b)] + k) / (uni[a] + k * v)) for a, b in pairs
        ]
        want[i] = (len(pairs), round(sum(nll) / len(nll), 4))
    # float summation order differs (Spark partial aggregation): compare
    # the mean at oracle precision minus one guard digit
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0]
        assert abs(got[i][1] - want[i][1]) < 1e-3


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bpe_merges_match_python_reference(spark, seed):
    """The distributed BPE merge loop reproduces the reference Sennrich
    algorithm (pure-Python get_stats/merge_vocab over a (term, tf)
    dict) merge-for-merge, including lexical tie-breaks."""
    from dbt_nlp_sqlizer_team04_spark.operators.text import bpe_train_merges

    corpus = _random_corpus(seed)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [
        (r["step"], r["left"], r["right"], r["weight"])
        for r in bpe_train_merges(docs, n_merges=8).collect()
    ]

    # reference: Sennrich's algorithm on the same vocab
    vocab: dict[tuple, int] = {}
    for _i, text in corpus:
        for term in text.strip().lower().split():
            if term:
                key = tuple(term)
                vocab[key] = vocab.get(key, 0) + 1
    want = []
    for step in range(8):
        stats: dict[tuple, int] = {}
        for syms, tf in vocab.items():
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + tf
        if not stats:
            break
        (l, r), w = min(
            stats.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        want.append((step, l, r, w))
        new_vocab = {}
        for syms, tf in vocab.items():
            s, i, out = list(syms), 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + tf
        vocab = new_vocab
    assert got == want

@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bpe_encode_matches_python_reference(spark, seed):
    """Train->apply closure: merges learned by bpe_train_merges, applied
    by bpe_encode_stats, reproduce a pure-Python sequential encoder's
    per-doc unit counts (greedy left-to-right, merges in rank order)."""
    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        bpe_encode_stats,
        bpe_train_merges,
    )

    corpus = _random_corpus(seed)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    merges = tuple(
        (r["left"], r["right"])
        for r in bpe_train_merges(docs, n_merges=8).collect()
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_units"])
        for r in bpe_encode_stats(docs, merges=merges).collect()
    }

    def encode_units(term: str) -> int:
        s = list(term)
        for l, r in merges:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        return len(s)

    want = {}
    for doc_id, text in corpus:
        terms = [t for t in text.strip().lower().split() if t]
        if terms:
            want[doc_id] = (len(terms), sum(encode_units(t) for t in terms))
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_token_budget_matches_python_reference(spark, seed):
    """q142's admission set re-derived in pure Python: same md5 order,
    same cumulative boundary — catches a formulation error shared by
    the Spark expression and its SQL oracle twin."""
    import hashlib

    from dbt_nlp_sqlizer_team04_spark.operators.sampling import (
        source_token_budget,
    )

    rng = random.Random(seed)
    rows = [
        (
            i,
            " ".join(rng.choice(VOCAB) for _ in range(rng.randint(1, 30))),
            "en",
            f"src{rng.randint(0, 3)}",
            0,
        )
        for i in range(120)
    ]
    budget = 60
    # independent reference: per source, admit in (md5 hex8, id) order
    # while the running token count stays <= budget
    want: dict = {}
    by_src: dict = {}
    for doc_id, text, _l, src, _n in rows:
        by_src.setdefault(src, []).append((doc_id, text))
    for src, docs in by_src.items():
        order = sorted(
            docs,
            key=lambda d: (hashlib.md5(str(d[0]).encode()).hexdigest()[:8], d[0]),
        )
        cum = kept = kept_toks = 0
        total = 0
        for doc_id, text in order:
            toks = len(text.split())
            total += toks
            cum += toks
            if cum <= budget:
                kept += 1
                kept_toks += toks
        want[src] = (len(docs), total, kept, kept_toks)

    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {
        r["source"]: (r["n_docs"], r["total_tokens"], r["n_kept"], r["kept_tokens"])
        for r in source_token_budget(df, budget=budget).collect()
    }
    assert got == want


@pytest.mark.parametrize("seed", [0, 1])
def test_hotkey_audit_matches_python_reference(spark, seed):
    from collections import Counter

    from dbt_nlp_sqlizer_team04_spark.operators.skew import hotkey_audit

    rng = random.Random(seed)
    keys = [rng.choice([1, 1, 1, 2, 2, 3, 4, 5, 6, 7]) for _ in range(500)]
    c = Counter(keys)
    mean = len(keys) / len(c)
    want = sorted(
        ((k, n, round(n / len(keys), 6), round(n / mean, 4)) for k, n in c.items()),
        key=lambda t: (-t[1], t[0]),
    )[:5]

    df = spark.createDataFrame([(k,) for k in keys], "k long")
    got = [
        (r["key"], r["n"], r["share"], r["skew_factor"])
        for r in hotkey_audit(df, "k", top=5).collect()
    ]
    assert got == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_unigram_lm_matches_python_reference(spark, seed):
    """Unigram-LM trainer (seed + 3 EM rounds) vs an independent
    pure-Python replay on a generated corpus — piece counts AND
    log-probs must match exactly (integer counts; identical float ops
    in identical order on the driver side)."""
    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        UNIGRAM_UNK_LOGP,
        unigram_lm_train,
    )

    corpus = _random_corpus(seed)
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    logp, counts = unigram_lm_train(
        docs, seed_size=40, max_len=4, n_iter=3
    )

    # ---- reference: same published algorithm, no engine code
    tf: dict[str, int] = {}
    for _i, t in corpus:
        for w in t.split():
            tf[w] = tf.get(w, 0) + 1
    wts: dict[str, int] = {}
    for term, f in tf.items():
        for i in range(len(term)):
            for j in range(i + 1, min(i + 4, len(term)) + 1):
                wts[term[i:j]] = wts.get(term[i:j], 0) + f
    seed_set = dict(sorted(wts.items(), key=lambda kv: (-kv[1], kv[0]))[:40])
    for p, w in wts.items():
        if len(p) == 1:
            seed_set[p] = w

    def viterbi(term, lp):
        n = len(term)
        dp, back = [0.0] * (n + 1), [0] * (n + 1)
        for i in range(1, n + 1):
            best, bj = None, 0
            for plen in range(1, min(4, i) + 1):
                j = i - plen
                v = lp.get(term[j:i])
                if v is None:
                    if plen > 1:
                        continue
                    v = UNIGRAM_UNK_LOGP
                s = dp[j] + v
                if best is None or s > best:
                    best, bj = s, j
            dp[i], back[i] = best, bj
        out, i = [], n
        while i > 0:
            out.append(term[back[i]:i])
            i = back[i]
        return out

    def mstep(c):
        total, v = sum(c.values()), len(seed_set)
        return {p: math.log((c.get(p, 0) + 1) / (total + v))
                for p in seed_set}

    want_lp = mstep(seed_set)
    want_counts = dict(seed_set)
    for _ in range(3):
        c: dict[str, int] = {}
        for term, f in tf.items():
            for piece in viterbi(term, want_lp):
                if piece in want_lp:
                    c[piece] = c.get(piece, 0) + f
        want_counts = c
        want_lp = mstep(c)

    assert counts == want_counts
    assert logp == want_lp  # exact float equality: same ops, same order


def test_unigram_viterbi_contract(spark):
    """Tie-break (shortest piece wins on equal score), unk single-char
    fallback (every term segmentable), greedy preference for the
    higher-probability longer piece."""
    from dbt_nlp_sqlizer_team04_spark.operators.text import _viterbi_segment

    lp = {"a": -1.0, "b": -1.0, "ab": -2.0}
    # score([a,b]) == score([ab]) == -2.0 -> shortest-first tie-break
    assert _viterbi_segment("ab", lp, 4, -20.0) == ["a", "b"]
    # a clearly better long piece wins
    lp2 = {"a": -3.0, "b": -3.0, "ab": -1.0}
    assert _viterbi_segment("ab", lp2, 4, -20.0) == ["ab"]
    # unknown chars fall back to unk and never fail
    assert _viterbi_segment("xay", {"a": -1.0}, 4, -20.0) == ["x", "a", "y"]
    # max_len bounds the candidate pieces
    lp3 = {"abcde": -0.1, "a": -1.0, "b": -1.0, "c": -1.0, "d": -1.0,
           "e": -1.0}
    assert _viterbi_segment("abcde", lp3, 4, -20.0) == [
        "a", "b", "c", "d", "e"]


def test_unigram_encode_stats_consistency(spark):
    """The per-source audit's n_tokens must equal the plain token count
    per source, n_units >= n_tokens (a piece never spans tokens), and
    the trained-corpus unk path is never needed (full coverage: every
    char of the corpus is in the seed)."""
    from pyspark.sql import functions as F

    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        tokens_expr,
        unigram_encode_stats,
        unigram_lm_train,
    )

    corpus = [(i, t, "s" + str(i % 2)) for i, t in _random_corpus(7)]
    docs = spark.createDataFrame(corpus, "doc_id long, text string, source string")
    logp, _ = unigram_lm_train(docs, seed_size=30, max_len=4, n_iter=2)
    out = {r["source"]: r for r in unigram_encode_stats(docs, logp).collect()}
    want = {
        r["source"]: r["n"]
        for r in docs.select(
            "source", F.explode(tokens_expr(F.col("text"))).alias("t")
        )
        .filter(F.col("t") != "")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(out) == set(want)
    for s, r in out.items():
        assert r["n_tokens"] == want[s]
        assert r["n_units"] >= r["n_tokens"]
        assert 0.0 <= r["frag_rate"] <= 1.0
        assert abs(r["avg_units"] - round(r["n_units"] / r["n_tokens"], 4)) < 1e-9
