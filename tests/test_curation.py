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
