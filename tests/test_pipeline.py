import uuid

from pyspark.sql import functions as F

from mriya_spark.connector.salesforce import MockTransport
from mriya_spark.pipeline import ACCOUNT_DDL, run_mriya_pipeline
from mriya_spark.connector.salesforce import read_object


def test_full_pipeline_invariants(spark, tmp_path):
    org = str(tmp_path / "org")
    out = run_mriya_pipeline(spark, org, n_rows=300, seed=7)
    rows = out.collect()
    # every src row got exactly one backfill update with the dst id
    assert len(rows) == 300
    assert all(r.row_id_dst_id == f"DST-{r.row_id}" for r in rows)

    # dst object holds the transformed rows with the constant FK
    dst = read_object(
        spark, org, "Accounts__c",
        "Old_Record_Id__c long, Name string, Billing_City__c string, "
        "Billing_Zip_Code__c long, Website string, Company_Name__c string",
    )
    assert dst.count() == 300
    fks = dst.select("Company_Name__c").distinct().collect()
    assert [r.Company_Name__c for r in fks] == ["0013B000006M6zSQAS"]
    # defaults flowed through the rename (reference fixture values)
    cities = {r.Billing_City__c for r in dst.select("Billing_City__c").distinct().collect()}
    assert cities == {"San Antonio"}

    # chunked DML respected the 200-row envelope on BOTH writes
    inserts = [c for c in MockTransport(org).calls() if c["op"] == "insert"]
    assert inserts and all(c["n_rows"] <= 200 for c in inserts)
    # and the src insert really was chunked (300 rows > 200/chunk)
    src_inserts = [c for c in inserts if c["object"] == "Account"]
    assert sum(c["n_rows"] for c in src_inserts) == 300
    assert len(src_inserts) >= 2


def test_pipeline_rerun_resets_env(spark, tmp_path):
    org = str(tmp_path / "org")
    run_mriya_pipeline(spark, org, n_rows=50, seed=1)
    out2 = run_mriya_pipeline(spark, org, n_rows=50, seed=1)
    # second run reset the org: still exactly 50 src rows, not 100
    src = read_object(spark, org, "Account", ACCOUNT_DDL)
    assert src.count() == 50
    assert out2.count() == 50
