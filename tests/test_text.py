

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
