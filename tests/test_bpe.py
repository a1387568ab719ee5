"""Distributed BPE training (operators/bpe.py) vs a plain-Python
reference implementation of the Sennrich algorithm."""

from __future__ import annotations

import collections

import pytest

from skope_api_spark.operators.bpe import bpe_train, word_frequency_table


def _ref_bpe(texts, merges):
    """Reference BPE on the word-frequency table (dict-of-tuples form)."""
    vocab = collections.Counter(
        w for t in texts for w in t.split(" ") if w
    )
    reprs = {tuple(list(w) + ["</w>"]): c for w, c in vocab.items()}
    rules = []
    for step in range(1, merges + 1):
        pairs = collections.Counter()
        for syms, c in reprs.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # max count, lexicographic "a b" tie-break
        best = min(pairs.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        (a, b), pc = best
        rules.append((step, a, b, a + b, pc))
        new = {}
        for syms, c in reprs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[tuple(out)] = new.get(tuple(out), 0) + c
        reprs = new
    return rules


@pytest.fixture(scope="module")
def corpus(spark):
    texts = [
        "low lower lowest",
        "new newer newest newest",
        "low low new",
        "wider wide widest",
    ]
    return texts, spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_matches_reference(corpus):
    texts, df = corpus
    got = [tuple(r) for r in bpe_train(df, merges=8).collect()]
    assert got == _ref_bpe(texts, 8)


def test_bpe_consecutive_pair_merges_greedily(spark):
    # "aaaaaa" -> pairs ('a','a') x5; greedy left-to-right merge must give
    # exactly [aa, aa, aa] (the classic overlap trap for naive replace),
    # so step 2 sees (aa,aa) with count 2 beating (aa,</w>) at 1
    df = spark.createDataFrame([(0, "aaaaaa")], "doc_id long, text string")
    rules = [tuple(r) for r in bpe_train(df, merges=2).collect()]
    assert rules[0][1:] == ("a", "a", "aa", 5)
    assert rules[1][1:] == ("aa", "aa", "aaaa", 2)


def test_bpe_no_cross_token_corruption(spark):
    # token 'er' ends with 'r'; merging pair (r, s) must not touch it
    df = spark.createDataFrame(
        [(0, "ers ers er er er er")], "doc_id long, text string"
    )
    rules = [tuple(r) for r in bpe_train(df, merges=3).collect()]
    ref = _ref_bpe(["ers ers er er er er"], 3)
    assert rules == ref


def test_bpe_word_frequency_table(corpus):
    _, df = corpus
    wf = {r["w"]: r["cnt"] for r in word_frequency_table(df).collect()}
    assert wf["low"] == 3 and wf["newest"] == 2


def test_bpe_validation_and_exhaustion(spark):
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="merges"):
        bpe_train(df, merges=0)
    # 'a b </w>' exhausts after 2 merges; asking for 10 stops early
    rules = bpe_train(df, merges=10).collect()
    assert len(rules) == 2


def test_bpe_encode_roundtrip(spark, corpus):
    from skope_api_spark.operators.bpe import bpe_encode

    texts, df = corpus
    rules = bpe_train(df, merges=8).collect()
    enc = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(df, rules).collect()}
    # reconstructing the text from symbols must be lossless
    for i, t in enumerate(texts):
        joined = "".join(enc[i]).replace("</w>", " ").strip()
        assert joined == t
    # merged symbols actually appear (compression happened)
    merged = {r["merged"] for r in rules}
    assert any(s in merged for s in enc[0])


def test_bpe_encode_accepts_tuples(spark):
    from skope_api_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame([(0, "lo lo")], "doc_id long, text string")
    out = bpe_encode(df, [("l", "o"), ("lo", "</w>")]).first()
    assert out["bpe_tokens"] == ["lo</w>", "lo</w>"]
