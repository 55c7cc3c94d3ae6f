"""Property-based tests: Spark ops vs pure-Python reference models.

Hypothesis generates small corpora; each property asserts the
distributed implementation agrees with an obviously-correct in-memory
model (the SURVEY §5 strategy: the reference's tests are example-based;
property tests cover the input shapes examples miss — empty docs,
repeated tokens, single-word texts, unicode-ish content).

``max_examples`` is kept small: every example is a real Spark job.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mriya_spark.ops import dedup, text

WORDS = st.lists(
    st.sampled_from("alpha beta gamma delta x1 xs2 the and der die".split()),
    min_size=0,
    max_size=12,
)
DOC = WORDS.map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=8)

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


@given(CORPUS)
@_SETTINGS
def test_exact_dedup_matches_model(spark, corpus):
    df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    got = {r.kept_doc_id: r.n_copies for r in dedup.exact_dedup(df).collect()}
    model: dict[str, list[int]] = {}
    for i, t in enumerate(corpus):
        model.setdefault(_norm(t), []).append(i)
    want = {min(ids): len(ids) for ids in model.values()}
    assert got == want


@given(CORPUS)
@_SETTINGS
def test_token_count_matches_model(spark, corpus):
    df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    from pyspark.sql import functions as F

    got = {
        r.doc_id: r.n
        for r in df.select("doc_id", text.token_count(F.col("text")).alias("n")).collect()
    }
    want = {i: len(t.split()) for i, t in enumerate(corpus)}
    assert got == want


@given(st.lists(WORDS.filter(lambda w: len(w) > 0), min_size=1, max_size=4),
       st.integers(2, 6), st.integers(0, 3))
@_SETTINGS
def test_chunk_tokens_cover_and_reassemble(spark, docs, chunk_size, overlap):
    """Every token position is covered by some chunk, consecutive
    chunks overlap by exactly ``overlap`` (full windows), and
    concatenating step-prefixes of chunks reproduces the document."""
    if overlap >= chunk_size:
        overlap = chunk_size - 1
    step = chunk_size - overlap
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["doc_id", "text"]
    )
    rows = text.chunk_tokens(df, chunk_size=chunk_size, overlap=overlap).collect()
    by_doc: dict[int, dict[int, list[str]]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_idx] = r.chunk_text.split()
    for i, ws in enumerate(docs):
        chunks = by_doc[i]
        assert sorted(chunks) == list(range(len(chunks)))
        rebuilt: list[str] = []
        for idx in sorted(chunks):
            start = idx * step
            assert chunks[idx] == ws[start : start + chunk_size]
            rebuilt.extend(chunks[idx][: step] if idx < max(chunks) else chunks[idx])
        assert rebuilt == ws


@given(CORPUS)
@_SETTINGS
def test_jaccard_pairs_match_model(spark, corpus):
    df = spark.createDataFrame(list(enumerate(corpus)), ["doc_id", "text"])
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(df, n=2, threshold=0.0).collect()
    }

    def shingles(t: str) -> frozenset[str]:
        # matches the op's documented degenerate case: < n words (incl.
        # an empty doc) yields ONE whole-text shingle, so identical
        # empty/short docs are jaccard-1.0 duplicates
        w = t.split()
        if len(w) < 2:
            return frozenset([" ".join(w)])
        return frozenset(" ".join(w[i : i + 2]) for i in range(len(w) - 1))

    for i, a in enumerate(corpus):
        for j, b in enumerate(corpus):
            if i >= j:
                continue
            sa, sb = shingles(a), shingles(b)
            if not (sa & sb):
                assert (i, j) not in got
                continue
            want = round(len(sa & sb) / len(sa | sb), 6)
            assert got.get((i, j)) == want, (a, b)
