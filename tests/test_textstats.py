"""Text-analysis operators vs pure-Python oracles."""

import re

import numpy as np

from grawler.operators import textstats


def _docs(spark):
    rows = [
        (0, "The quick brown fox. And the lazy dog, of course!"),
        (1, "der die das und ist gut"),
        (2, "xyzzy plugh"),
        (3, "le la les et est bon"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_word_freq(spark):
    got = {(r["doc_id"], r["word"]): r["freq"]
           for r in textstats.word_freq(_docs(spark)).collect()}
    assert got[(0, "the")] == 2
    assert got[(0, "quick")] == 1
    assert (4, "") not in got


def test_token_count(spark):
    got = {r["doc_id"]: r for r in
           textstats.token_count(_docs(spark)).collect()}
    t0 = "The quick brown fox. And the lazy dog, of course!"
    assert got[0]["n_words"] == len(re.findall(r"\w+", t0.lower()))
    assert got[0]["n_chars"] == len(t0)
    assert got[0]["n_bpe_est"] == -(-len(t0) // 4)


def test_langid_markers(spark):
    got = {r["doc_id"]: r["pred_lang"]
           for r in textstats.langid(_docs(spark)).collect()}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "und"
    assert got[3] == "fr"


def test_quality_bounds(spark):
    got = {r["doc_id"]: r["quality"]
           for r in textstats.quality_score(_docs(spark)).collect()}
    for v in got.values():
        assert 0.0 <= v <= 1.0
    assert got[0] > got[2]  # stopword-rich beats gibberish


def test_fingerprint_matches_numpy_oracle(spark):
    texts = ["alpha beta", "alpha  beta", "alpha beta!", "beta alpha"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["fp64"]
           for r in textstats.fingerprint(df).collect()}
    # whitespace/punct-insensitive on token stream, order-sensitive
    assert got[0] == got[1] == got[2]
    assert got[0] != got[3]

    def oracle_fp(t):
        """Independent scalar-python Rabin-Karp: fp = sum b_i * B^(n-1-i)
        mod 2^64 over the 'tok1 tok2 ... ' byte stream."""
        toks = re.findall(r"\w+", t.lower())
        data = (" ".join(toks) + " ").encode() if toks else b""
        acc = 0
        for byt in data:
            acc = (acc * int(textstats._FP_BASE) + byt) % (1 << 64)
        return acc - (1 << 64) if acc >= (1 << 63) else acc

    for i, t in enumerate(texts):
        assert got[i] == oracle_fp(t), i
    assert textstats.fingerprint64_one(b"") == 0
