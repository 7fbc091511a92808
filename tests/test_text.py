

def test_wordpiece_train_and_encode(spark):
    """WordPiece trainer on a seeded corpus: likelihood scoring picks
    the exclusive pair over the merely-frequent one; '##' continuation
    convention; greedy longest-match apply with [UNK] fallback."""
    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        _wp_greedy_encode,
        wordpiece_encode_stats,
        wordpiece_train_merges,
    )

    # 'qu' appears 3x and q/u appear ONLY together (score 3/(3*3));
    # 'aa' appears 6x inside frequent a-runs (score 6/(9*9) — lower)
    df = spark.createDataFrame(
        [("s1", "qu qu qu aaa"), ("s2", "aaa")],
        "source string, text string",
    )
    merges, vocab = wordpiece_train_merges(df, n_merges=2)
    step0 = merges[0]
    assert (step0[1], step0[2]) == ("q", "##u") and step0[3] == 3
    assert "qu" in vocab and "q" in vocab and "##u" in vocab
    # greedy longest-match: 'qu' -> 1 unit; 'quz' -> unk (no z)
    assert _wp_greedy_encode("qu", vocab) == (1, False)
    assert _wp_greedy_encode("quz", vocab) == (1, True)
    stats = {r["source"]: r for r in
             wordpiece_encode_stats(df, vocab).collect()}
    assert stats["s1"]["n_tokens"] == 4
    assert stats["s1"]["unk_rate"] == 0.0
    assert stats["s2"]["n_tokens"] == 1


def test_rep_ngram_char_fractions_planted(spark):
    """q197's char-fraction metrics on hand-computable docs: a
    perfectly looping doc caps at 1.0 on the dup-5-gram axis, a
    dup-free doc reads 0.0, and the top-trigram coverage is the exact
    count*length / chars ratio; empty text stays 0.0 with chars 0."""
    from dbt_nlp_sqlizer_team04_spark.operators.text import (
        rep_ngram_char_fractions,
    )

    df = spark.createDataFrame(
        [(1, "a b c a b c a b"),      # every trigram repeats
         (2, "one two three four"),   # no repeats, no 5-grams dup
         (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            rep_ngram_char_fractions(df).collect()}
    r1 = rows[1]
    # chars = 15; top trigram "a b c" (len 5) occurs 2x -> 10/15
    assert r1["chars"] == 15
    assert r1["top3_char_frac"] == round(10 / 15, 6)
    # 5-grams: "a b c a b" x2 (18 chars covered) but also every other
    # 5-gram... only "a b c a b" repeats -> 18/15 capped at 1.0
    assert r1["dup5_char_frac"] == 1.0
    r2 = rows[2]
    assert r2["dup5_char_frac"] == 0.0
    # max of count*length picks the LONGEST covering trigram here
    assert r2["top3_char_frac"] == round(
        len("two three four") / len("one two three four"), 6)
    r3 = rows[3]
    assert r3["chars"] == 0
    assert r3["top3_char_frac"] == 0.0 and r3["dup5_char_frac"] == 0.0
