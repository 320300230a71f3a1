"""Text-analysis operators over a document table (doc_id, text).

  token_count       whitespace/word tokens + a BPE-ish subword estimate
  quality_score     length / punctuation / stopword / repetition ratios
  langid            n-gram/stopword-marker heuristic (deterministic CASE
                    rule — SQL-expressible so DuckDB can oracle it)
  fingerprint       64-bit rolling polynomial hash of normalized tokens

All native pyspark.sql.functions except the fingerprint (one Arrow pass).
The reference's only text op is word-frequency counting
(/root/reference/src/parsers/text.go:16-29) — kept as word_freq below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

WORD_RE = r"\w+"
# marker words per language for the heuristic langid (deterministic rule)
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|la|los|y|es)\b",
}
STOPWORDS_RE = r"\b(the|a|an|and|or|of|to|in|is|it)\b"


def word_freq(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """A1: per-document term frequency — regex tokenize, lowercase, count
    (reference semantics: \\b\\w+\\b + map[string]int)."""
    toks = F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_RE), 0)
    return (
        df.select(F.col(id_col), F.explode(toks).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("freq"))
    )


def token_count(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Word tokens, whitespace tokens, and a BPE-ish subword estimate
    (ceil(chars/4) blended with word count — deterministic arithmetic)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    chars = F.length(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.regexp_count(F.lower(F.col(text_col)), F.lit(WORD_RE))
        .alias("n_words"),
        ws.alias("n_ws_tokens"),
        chars.alias("n_chars"),
        F.ceil(chars / F.lit(4)).cast("long").alias("n_bpe_est"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic document quality in [0,1]: penalize too-short/too-long,
    high punctuation density, low stopword ratio, heavy repetition."""
    # counts use regexp_count (same value as size(regexp_extract_all(...)),
    # NULL-for-NULL alike — parity-tested) so no match ARRAY is materialized
    # just to be counted (guide §1.2 per-task work); the words array is only
    # built where the distinct-set size genuinely needs it
    t = F.col(text_col)
    chars = F.length(t)
    words = F.regexp_extract_all(F.lower(t), F.lit(WORD_RE), 0)
    n_words = F.regexp_count(F.lower(t), F.lit(WORD_RE))
    n_distinct = F.size(F.array_distinct(words))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_stop = F.regexp_count(F.lower(t), F.lit(STOPWORDS_RE))
    len_score = F.least(chars / F.lit(200.0), F.lit(1.0)) * F.when(
        chars > 10000, F.lit(0.5)
    ).otherwise(F.lit(1.0))
    punct_score = F.when(n_punct / F.greatest(chars, F.lit(1)) > 0.1,
                         F.lit(0.5)).otherwise(F.lit(1.0))
    stop_score = F.least(
        n_stop * F.lit(5.0) / F.greatest(n_words, F.lit(1)), F.lit(1.0)
    )
    rep_score = n_distinct / F.greatest(n_words, F.lit(1))
    return df.select(
        F.col(id_col),
        F.round(
            (len_score * 0.3 + punct_score * 0.2 + stop_score * 0.2
             + rep_score * 0.3), 6
        ).alias("quality"),
        F.col(id_col).isNotNull().alias("_keep"),
    ).drop("_keep")


def langid(df: DataFrame, text_col: str = "text",
           id_col: str = "doc_id") -> DataFrame:
    """Deterministic marker-word language ID; argmax with fixed tie-break
    (lexicographic by language code), 'und' when no markers hit."""
    t = F.lower(F.col(text_col))
    # regexp_count: same value as size(regexp_extract_all(...)) without
    # materializing a match array per language just to take its size
    scores = {
        lang: F.regexp_count(t, F.lit(rx))
        for lang, rx in LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    for lang in sorted(LANG_MARKERS, reverse=True):
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] == best), F.lit(lang)
        ).otherwise(pred)
    return df.select(F.col(id_col), pred.alias("pred_lang"))


_FP_BASE = np.uint64(1099511628211)  # odd multiplier (full period mod 2^64)


def fingerprint64_one(data: bytes) -> int:
    """Rabin–Karp polynomial hash mod 2^64, fully numpy-vectorized:
    fp = sum(byte_i * BASE^(n-1-i)). An earlier FNV-style fold (xor then
    multiply per byte) was a sequential per-byte python loop; the
    polynomial form is one vectorized multiply-accumulate per document."""
    if not data:
        return 0
    b = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    with np.errstate(over="ignore"):
        acc = np.multiply.accumulate(
            np.full(len(b), _FP_BASE, dtype=np.uint64))  # B^1..B^n
        pows_desc = np.concatenate(
            [acc[:-1][::-1], np.ones(1, dtype=np.uint64)])  # B^(n-1)..B^0
        fp = np.uint64((b * pows_desc).sum(dtype=np.uint64))
    return int(fp.view(np.int64))


@pandas_udf(LongType())
def fingerprint64_udf(stream: pd.Series) -> pd.Series:
    """Polynomial hash of a PRE-TOKENIZED stream ('tok1 tok2 ... tokN').
    Tokenization happens native-side (regexp_extract_all + concat_ws in
    `fingerprint`), so the only Python work per document is the numpy
    multiply-accumulate — one Arrow pass over ready strings."""
    out = np.empty(len(stream), dtype=np.int64)
    for i, s in enumerate(stream):
        out[i] = fingerprint64_one((s + " ").encode() if s else b"")
    return pd.Series(out)


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    # tokenize JVM-side: Java \w == [A-Za-z0-9_] (matches the re.ASCII
    # semantics of the offline oracle); concat_ws('') on NULL text -> ""
    stream = F.concat_ws(
        " ", F.regexp_extract_all(F.lower(F.col(text_col)),
                                  F.lit(WORD_RE), 0))
    return df.select(F.col(id_col),
                     fingerprint64_udf(stream).alias("fp64"))
