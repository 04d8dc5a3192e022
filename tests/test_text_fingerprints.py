"""Winnowing + regex-tokenizer property tests: the SIGMOD'03 winnowing
guarantee (shared substring ≥ w+k-1 ⇒ shared fingerprint) against a
20-line pure-Python reference, and BPE-ish token class accounting."""

from __future__ import annotations

from pyspark.sql import functions as F

from bambooai_spark.functions.text import (
    BPE_TOKEN_RE,
    ROLL_BASE,
    ROLL_MOD,
    kgram_hashes,
    regex_tokens,
    winnow_fingerprints,
)


def _py_winnow(text: str, k: int = 5, w: int = 4) -> set[int]:
    if len(text) < k:
        return set()
    hs = []
    for i in range(len(text) - k + 1):
        acc = 0
        for ch in text[i : i + k]:
            acc = (acc * ROLL_BASE + ord(ch)) % ROLL_MOD
        hs.append(acc)
    n_win = max(len(hs) - w + 1, 1)
    return {min(hs[i : i + w]) for i in range(n_win)}


TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "a",
    "abcd",  # < k: no k-grams
    "abcde",  # exactly k: one hash, one window
    "key agg row scan slow fast table value part hash",
    "zzzzzzzzzzzzzzzzzzzz",  # degenerate: all k-grams identical
]


def test_winnow_matches_python_reference(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)], "i int, text string")
    got = {
        r.i: set(r.fps)
        for r in winnow_fingerprints(df, "text").select("i", "fps").collect()
    }
    for i, t in enumerate(TEXTS):
        assert got[i] == _py_winnow(t), f"text {i!r}"


def test_winnow_shared_substring_guarantee(spark):
    """Two documents sharing a substring of length ≥ w + k - 1 = 8 must
    share at least one fingerprint, wherever the substring sits."""
    core = "IDENTICAL-PASSAGE-LONG-ENOUGH"
    a = "left padding words before " + core + " then tail"
    b = core + " totally different remainder of the document here"
    df = spark.createDataFrame([(0, a), (1, b)], "i int, text string")
    fps = {
        r.i: set(r.fps)
        for r in winnow_fingerprints(df, "text").select("i", "fps").collect()
    }
    assert fps[0] & fps[1]


def test_kgram_hashes_roll_consistency(spark):
    """Adjacent k-gram hashes come from the same hash family: recompute
    position i+1's hash from raw chars and compare."""
    t = "rolling hash consistency"
    df = spark.createDataFrame([(t,)], "text string")
    hs = df.select(kgram_hashes("text", k=5).alias("h")).first().h
    for i in range(len(t) - 4):
        acc = 0
        for ch in t[i : i + 5]:
            acc = (acc * ROLL_BASE + ord(ch)) % ROLL_MOD
        assert hs[i] == acc


def test_regex_tokens_classes(spark):
    df = spark.createDataFrame(
        [("it's 2026: top-10 models, 99.9% uptime!",)], "text string"
    )
    toks = df.select(regex_tokens("text").alias("t")).first().t
    assert toks == [
        "it", "'", "s", "2026", ":", "top", "-", "10", "models", ",",
        "99", ".", "9", "%", "uptime", "!",
    ]
    import re

    assert toks == re.findall(BPE_TOKEN_RE, "it's 2026: top-10 models, 99.9% uptime!")
