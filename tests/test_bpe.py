"""BPE trainer vs a pure-Python golden (the repo's golden-oracle pattern:
the iterative loop has no single SQL statement, so the exact gate is an
independent reimplementation — same convention as tests/test_golden.py).
Round-0 pair statistics additionally carry an exact DuckDB oracle via the
folded entry ``bpe_pair_counts``."""

from __future__ import annotations

import re
from collections import Counter

from jcpg_spark.operators import bpe


def _py_bpe(texts, n_merges):
    wc = Counter(w for t in texts for w in re.findall(r"[a-z]+", t.lower()))
    vocab = {w: list(w) for w in wc}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        (l, r), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, cnt))
        for w, syms in vocab.items():
            out, prev = [], ""
            for s in syms:
                if prev == l and s == r:
                    out.append(l + r)
                    prev = ""
                elif prev == "":
                    prev = s
                else:
                    out.append(prev)
                    prev = s
            if prev:
                out.append(prev)
            vocab[w] = out
    return merges


def test_train_matches_pure_python_golden_on_real_docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = [r["text"] for r in docs.select("text").collect()]
    got = bpe.train(docs, n_merges=6)
    want = _py_bpe(texts, 6)
    assert got == want
    assert len(got) == 6  # corpus is big enough that training never dries up


def test_merge_is_left_to_right_non_overlapping(spark):
    # 'aaaa' -> ['aa','aa'], 'aaa' -> ['aa','a'] under merge (a, a)
    docs = spark.createDataFrame([(1, "aaaa aaa")], "doc_id int, text string")
    merges = bpe.train(docs, n_merges=1)
    assert merges[0][:2] == ("a", "a")
    # second round merges must be computed on the MERGED symbols:
    # vocab is now aaaa=['aa','aa'] (1), aaa=['aa','a'] (1)
    # pairs: (aa,aa)=1, (aa,a)=1 -> tie breaks to (aa, a)? no: lexical
    # ('aa','a') < ('aa','aa') so (aa, a) wins
    merges2 = bpe.train(docs, n_merges=2)
    assert merges2[1][:2] == ("aa", "a")


def test_pair_counts_weighted_by_word_frequency(spark):
    docs = spark.createDataFrame(
        [(1, "ab ab ab"), (2, "ba")], "doc_id int, text string"
    )
    rows = {(r["l"], r["r"]): r["cnt"] for r in bpe.pair_counts(docs).collect()}
    assert rows == {("a", "b"): 3, ("b", "a"): 1}


def test_segment_applies_merges_in_word_order(spark):
    docs = spark.createDataFrame(
        [(1, "abab cd abab"), (2, "zz zz"), (3, "123 !!")],
        "doc_id int, text string",
    )
    merges = bpe.train(docs, n_merges=2)
    out = {r["doc_id"]: list(r["tokens"]) for r in bpe.segment(docs, merges).collect()}
    # pure-python application of the same rules, word by word, in order
    def apply(word):
        syms = list(word)
        for l, r, *_ in merges:
            o, prev = [], ""
            for s in syms:
                if prev == l and s == r:
                    o.append(l + r); prev = ""
                elif prev == "":
                    prev = s
                else:
                    o.append(prev); prev = s
            if prev:
                o.append(prev)
            syms = o
        return syms
    assert out[1] == apply("abab") + apply("cd") + apply("abab")
    assert out[2] == apply("zz") + apply("zz")
    assert out[3] == []  # no alphabetic words -> empty tokens, doc kept


def test_ppmi_weights_match_hand_computation(spark):
    """Tiny symmetric pair table: ppmi = max(0, ln(cnt*total/(mc*mx)))
    checked against pure-python math; independent pairs clamp to 0."""
    import math

    from jcpg_spark.operators.lm import ppmi_weights

    sg = spark.createDataFrame(
        # symmetric counts: (a,b)=4, (b,a)=4, (a,c)=1, (c,a)=1
        [("a", "b", 4), ("b", "a", 4), ("a", "c", 1), ("c", "a", 1)],
        "w_center string, w_context string, cnt long",
    )
    out = {(r["w_center"], r["w_context"]): r["ppmi"] for r in ppmi_weights(sg).collect()}
    total = 10
    marg = {"a": 5, "b": 4, "c": 1}
    for (c, x), got in out.items():
        want = round(max(0.0, math.log(out_cnt(c, x) * total / (marg[c] * marg[x]))), 6)
        assert got == want, (c, x, got, want)


def out_cnt(c, x):
    return {("a", "b"): 4, ("b", "a"): 4, ("a", "c"): 1, ("c", "a"): 1}[(c, x)]
