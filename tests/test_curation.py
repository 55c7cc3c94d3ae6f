import pytest
from pyspark.sql import functions as F

from mriya_spark.curation import CurationSpec


def test_invalid_specs_fail_at_load():
    with pytest.raises(ValueError, match="unknown filter type"):
        CurationSpec.from_obj({"filters": [{"type": "vibes"}], "output": ["doc_id"]})
    with pytest.raises(ValueError, match="unknown dedup type"):
        CurationSpec.from_obj({"dedup": [{"type": "magic"}], "output": ["doc_id"]})
    with pytest.raises(ValueError, match="keep"):
        CurationSpec.from_obj({"filters": [{"type": "lang"}], "output": ["doc_id"]})
    with pytest.raises(ValueError, match="output"):
        CurationSpec.from_obj({"output": []})


def test_recipe_stages_compose(catalog, spark):
    """Each stage narrows the corpus; dedup drops the planted copy and
    keeps the smaller doc_id; outputs are exactly the requested cols."""
    docs = catalog.table("documents").select("doc_id", "text").limit(200)
    copy = docs.filter("doc_id = 3").select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(copy)
    spec = CurationSpec.from_obj(
        {
            "filters": [{"type": "quality", "min_score": 0.0},
                        {"type": "token_range", "min": 1, "max": 10_000}],
            "dedup": [{"type": "exact"}],
            "output": ["doc_id", "n_tokens"],
        }
    )
    out = spec.build(corpus)
    assert out.columns == ["doc_id", "n_tokens"]
    ids = {r.doc_id for r in out.collect()}
    assert 3 in ids and 500003 not in ids  # exact dedup keeps min id


def test_recipe_lsh_subset_of_exact(catalog, spark):
    docs = catalog.table("documents").select("doc_id", "text").limit(150)
    perturbed = docs.filter("doc_id < 30").select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.ltrim(F.regexp_replace("text", r"^\S+\s*", "")).alias("text"),
    )
    corpus = docs.unionByName(perturbed)

    def run(method):
        return {
            r.doc_id
            for r in CurationSpec.from_obj(
                {
                    "dedup": [{"type": method, "threshold": 0.5}],
                    "output": ["doc_id"],
                }
            ).build(corpus).collect()
        }

    exact_kept = run("ngram_jaccard")
    lsh_kept = run("minhash_lsh")
    # LSH may miss candidates (recall < 1) so it can only keep MORE
    assert exact_kept <= lsh_kept
    assert len(exact_kept) > 0


def test_recipe_substring_and_group_quota_stages(spark):
    """r7 DSL additions: span-level dedup drops the larger doc of a
    >= min_span shared run; group_quota caps docs per group
    deterministically."""
    from mriya_spark.curation import CurationSpec

    span = " ".join(f"s{i}" for i in range(12))
    filler = lambda tag: " ".join(f"{tag}{i}" for i in range(12))
    docs = [(1, "en", filler("a") + " " + span),
            (2, "en", span + " " + filler("b")),
            (3, "en", filler("c")),
            (4, "de", filler("d"))]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    spec = CurationSpec.from_obj({
        "filters": [],
        "dedup": [{"type": "substring", "k": 8, "min_span": 12}],
        "output": ["doc_id"],
    })
    kept = {r.doc_id for r in spec.build(df).collect()}
    assert kept == {1, 3, 4}  # doc 2 (larger id of the span pair) dropped
    spec2 = CurationSpec.from_obj({
        "filters": [{"type": "group_quota", "group_col": "lang", "quota": 1}],
        "dedup": [],
        "output": ["doc_id", "lang"],
    })
    rows = spec2.build(df).collect()
    langs = [r.lang for r in rows]
    assert sorted(langs) == ["de", "en"]  # one per group, deterministic
    again = spec2.build(df).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    import pytest

    with pytest.raises(ValueError, match="group_quota"):
        CurationSpec.from_obj({
            "filters": [{"type": "group_quota", "quota": 0}],
            "dedup": [], "output": ["doc_id"],
        })


def test_recipe_weighted_sample_stage(spark):
    """Soft quality filter in the DSL: keep probability = the derived
    quality score; weight-0 docs never survive, weight-1 always do."""
    from mriya_spark.curation import CurationSpec

    good = "the cat and the dog of a house sat on the mat with a friend today"
    docs = [(i, good) for i in range(20)] + [(100 + i, "@@ @@ @@") for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    spec = CurationSpec.from_obj({
        "filters": [{"type": "weighted_sample"}],
        "dedup": [],
        "output": ["doc_id", "quality_score"],
    })
    rows = spec.build(df).collect()
    assert all(r.doc_id < 100 for r in rows)  # zero-score docs all dropped
    assert len(rows) >= 10  # high-score docs mostly kept
    again = spec.build(df).collect()
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in again)


def test_recipe_classifier_stage(spark):
    """Hashed-linear-classifier filter in the DSL: survivors are
    exactly the docs whose scan-local score clears the threshold, and
    the helper column does not leak into the output."""
    from mriya_spark.curation import CurationSpec
    from mriya_spark.ops.text import classifier_score, hashed_clf_weights

    texts = [
        "the cat sat on the mat",
        "qq zz xx vv kk jj",
        "a house with a garden and a dog",
        "lorem ipsum dolor sit amet",
        "numbers 123 and words mixed 456 here",
    ] * 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    thr = 0.0
    # expected = the EXACT-state gate the DSL applies (s_int >= 0 for
    # threshold 0), not the rounded score — rounding maps tiny
    # negative scores to -0.0, which a >= 0.0 gate would keep
    expected = {
        r.doc_id
        for r in classifier_score(
            df, hashed_clf_weights(), keep_components=True
        )
        .filter(F.col("clf_score_s_int") >= 0)
        .collect()
    }
    assert 0 < len(expected) < len(texts)  # threshold actually splits
    spec = CurationSpec.from_obj({
        "filters": [{"type": "classifier", "min_score": thr}],
        "dedup": [],
        "output": ["doc_id"],
    })
    out = spec.build(df)
    assert {r.doc_id for r in out.collect()} == expected
    assert out.columns == ["doc_id"]


def test_recipe_domain_quota_stage(spark):
    """Per-domain cap in the DSL: no domain exceeds the quota, picks
    are deterministic, and the helper columns don't leak. Also pins
    the parse_url host extraction (ports and userinfo must not leak
    into the domain key)."""
    from mriya_spark.curation import CurationSpec
    from mriya_spark.ops.quality import domain_quota, url_host

    docs = [
        (i, f"https://hot.example.com/page/{i}", "text a") for i in range(20)
    ] + [
        (100 + i, f"https://cold-{i}.org/x", "text b") for i in range(5)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "url", "text"])
    spec = CurationSpec.from_obj({
        "filters": [{"type": "domain_quota", "url_col": "url", "quota": 3}],
        "dedup": [],
        "output": ["doc_id"],
    })
    out = spec.build(df)
    ids = {r.doc_id for r in out.collect()}
    assert len([i for i in ids if i < 100]) == 3  # hot domain capped
    assert len([i for i in ids if i >= 100]) == 5  # cold ones untouched
    assert out.columns == ["doc_id"]
    again = {r.doc_id for r in spec.build(df).collect()}
    assert again == ids  # deterministic picks

    # domain_total is the PRE-cap count; parse_url strips port/userinfo
    pr = domain_quota(
        spark.createDataFrame(
            [(1, "https://user@h.com:8443/a"), (2, "http://h.com/b")],
            ["doc_id", "url"],
        ),
        url_col="url",
        quota=10,
    ).collect()
    assert {r.domain for r in pr} == {"h.com"}
    assert all(r.domain_total == 2 for r in pr)
    cap = domain_quota(
        spark.createDataFrame(
            [(i, "https://one.com/x") for i in range(9)], ["doc_id", "url"]
        ),
        url_col="url",
        quota=4,
    ).collect()
    assert len(cap) == 4 and all(r.domain_total == 9 for r in cap)


def test_recipe_domain_quota_preserves_user_domain_column(spark):
    """r9 ADVICE: a corpus that already carries a 'domain' column
    (common in crawl data) must pass through the DSL domain_quota
    stage untouched — neither overwritten by url_host nor dropped."""
    from mriya_spark.curation import CurationSpec

    docs = [
        (i, f"https://hot.example.com/p/{i}", "txt", f"crawl-{i % 2}")
        for i in range(6)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "url", "text", "domain"])
    spec = CurationSpec.from_obj({
        "filters": [{"type": "domain_quota", "url_col": "url", "quota": 2}],
        "dedup": [],
        "output": ["doc_id", "domain"],
    })
    rows = spec.build(df).collect()
    assert len(rows) == 2  # single host, capped
    # the surviving rows keep their ORIGINAL domain values
    assert all(r.domain == f"crawl-{r.doc_id % 2}" for r in rows)


def test_oversample_epochs_copy_counts(spark):
    """Each row's copy count is floor(w) or floor(w)+1, the empirical
    mean tracks w (E[copies] = w), w <= 0 rows vanish, and the cap
    bounds runaway weights."""
    from mriya_spark.ops.quality import oversample_epochs

    df = spark.range(0, 2000).selectExpr(
        "id AS doc_id",
        "CASE WHEN id % 3 = 0 THEN 2.5 WHEN id % 3 = 1 THEN 0.5 "
        "ELSE 0.0 END AS w",
    )
    out = oversample_epochs(df, weight_col="w", key_col="doc_id").collect()
    from collections import Counter

    copies = Counter(r.doc_id for r in out)
    heavy = [copies[i] for i in range(0, 2000, 3)]
    light = [copies.get(i, 0) for i in range(1, 2000, 3)]
    assert set(heavy) <= {2, 3} and set(light) <= {0, 1}
    assert not any(copies.get(i, 0) for i in range(2, 2000, 3))  # w=0 gone
    assert abs(sum(heavy) / len(heavy) - 2.5) < 0.1
    assert abs(sum(light) / len(light) - 0.5) < 0.1
    # copy indexes are 1..n, and the cap bounds a runaway weight
    assert {r.copy for r in out if r.doc_id == 0} == set(
        range(1, copies[0] + 1)
    )
    capped = oversample_epochs(
        spark.range(0, 5).selectExpr("id AS doc_id", "1e9 AS w"),
        weight_col="w", key_col="doc_id", max_copies=4,
    ).collect()
    assert max(r.copy for r in capped) == 4


def test_emit_spec_validation():
    import pytest

    from mriya_spark.curation import CurationSpec

    with pytest.raises(ValueError, match="unknown emit type"):
        CurationSpec.from_obj({"emit": [{"type": "nope"}], "output": ["doc_id"]})
    with pytest.raises(ValueError, match="oversample needs"):
        CurationSpec.from_obj(
            {"emit": [{"type": "oversample"}], "output": ["doc_id"]}
        )
    # valid forms load
    CurationSpec.from_obj(
        {"emit": [{"type": "oversample", "weight_col": "w"}],
         "output": ["doc_id", "copy"]}
    )
    CurationSpec.from_obj(
        {"emit": [{"type": "oversample", "group_col": "lang_pred",
                   "weights": {"en": 2.0}}],
         "output": ["doc_id", "copy"]}
    )


def test_oversample_spec_rejects_both_weight_forms():
    import pytest

    from mriya_spark.curation import CurationSpec

    with pytest.raises(ValueError, match="not both"):
        CurationSpec.from_obj(
            {"emit": [{"type": "oversample", "weight_col": "w",
                       "group_col": "lang_pred", "weights": {"en": 2.0}}],
             "output": ["doc_id"]}
        )
