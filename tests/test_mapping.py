import json

import pytest

from mriya_spark.mapping import MappingRule, MappingSpec
from mriya_spark.queries import FLAGSHIP_MAPPING, run_migration


def test_mapping_requires_rules():
    with pytest.raises(ValueError):
        MappingSpec("a", "b", "", [])


def test_invalid_column_type_rejected():
    with pytest.raises(ValueError):
        MappingRule("a", "x", "b", "y", column_type="bogus")


def test_load_json_array():
    spec = MappingSpec.load(json.dumps([FLAGSHIP_MAPPING]))
    assert spec.source_object == "customer"
    assert spec.src_id_rule.column_src == "c_custkey"
    assert [r.column_dst for r in spec.backfill_rules] == ["old_record_id"]


def test_where_condition_soql_rejected_at_load():
    # a real Salesforce mapping pasted in verbatim must fail at load
    # time with a rewrite hint, not deep in the analyzer
    for cond in (
        "Account_Birthday__c > TODAY",
        "CreatedDate >= LAST_N_DAYS:7",
        "Interests__c INCLUDES ('golf')",
    ):
        spec = dict(FLAGSHIP_MAPPING, where_condition=cond)
        with pytest.raises(ValueError, match="SOQL-only"):
            MappingSpec.from_obj(spec)


def test_where_condition_syntax_error_rejected_at_load(spark):
    spec = dict(FLAGSHIP_MAPPING, where_condition="c_acctbal >== 3")
    with pytest.raises(ValueError, match="not a valid Spark SQL"):
        MappingSpec.from_obj(spec)


def test_where_condition_ansi_accepted():
    spec = dict(FLAGSHIP_MAPPING, where_condition="c_date >= date_sub(current_date(), 7)")
    assert MappingSpec.from_obj(spec).where_condition.startswith("c_date")


def test_extract_resolves_lookup(spark, catalog):
    spec = MappingSpec.from_obj(FLAGSHIP_MAPPING)
    df = spec.extract(catalog)
    assert set(df.columns) == {"c_custkey", "c_name", "c_acctbal", "c_mktsegment", "n_name"}
    # WHERE applied
    assert df.filter("c_acctbal <= 0").count() == 0


def test_transform_renames_and_injects(spark, catalog):
    spec = MappingSpec.from_obj(FLAGSHIP_MAPPING)
    df = spec.transform(spec.extract(catalog), constants={"company_name": "ACME"})
    assert set(df.columns) == {
        "old_record_id", "name", "acctbal", "segment", "nation_name", "company_name",
    }
    assert df.select("company_name").distinct().collect()[0][0] == "ACME"


def test_full_migration_pipeline(spark):
    out = run_migration(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows[:20]:
        assert r.dst_id == f"DST-{r.old_record_id}"
        assert r.src_backfilled_id == r.dst_id  # backfill agrees with load


def test_missing_lookup_spec_raises(spark, catalog):
    bad = dict(FLAGSHIP_MAPPING, lookups={})
    spec = MappingSpec.from_obj(bad)
    with pytest.raises(ValueError, match="lookup"):
        spec.extract(catalog)
