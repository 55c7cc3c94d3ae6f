"""The reference's full migration pipeline, end-to-end on Spark.

Replays `/root/reference/mriya.py` top-to-bottom (SURVEY.md §3, entry
point 1) against the mock Salesforce org, with every stage restated as
a DataFrame plan:

| reference stage (mriya.py) | here |
|---|---|
| env reset: fetch ids + chunked delete (`:50-77`) | anti-join rewrite of the org file (S10/J2/J4) |
| generate 4 random Accounts (`:79-81`, G1) | ``generator.gen_data`` (seeded, distributed) |
| bulk insert via Bulk API (`:82`, S7) | connector writer (chunked ≤200-row DML) |
| extract via bulk_load (`migration_engine.py:77-81`) | connector reader (pushdown, paginated) |
| per-row rename + constants (`migration_engine.py:25-41`) | ``MappingSpec.transform`` (one projection) |
| load to dst (`migration_engine.py:43`) | connector writer into dst object |
| backfill dst ids into src (`migration_engine.py:50-68`) | ``MappingSpec.backfill`` join |

The mapping document is the reference's canonical Account mapping
(FIXTURES.md A2 shape, `mapping_parser.py:8-25` schema).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mriya_spark import generator
from mriya_spark.connector.salesforce import (
    SalesforceMockDataSource,
    read_object,
)
from mriya_spark.mapping import MappingSpec

#: The reference's Account -> Accounts__c mapping (FIXTURES.md A2,
#: reconstructed from `mapping_parser.py:8-25` + `mriya.py:20,65-68`).
ACCOUNT_MAPPING = {
    "source_object": "Account",
    "destination_object": "Accounts__c",
    "where_condition": "",
    "mapping": [
        {
            "table_src": "Account",
            "column_src": "row_id",
            "table_dst": "Accounts__c",
            "column_dst": "Old_Record_Id__c",
            "operation": "upd_src",
            "column_type": "src_id",
        },
        {
            "table_src": "Account",
            "column_src": "Name",
            "table_dst": "Accounts__c",
            "column_dst": "Name",
            "operation": "insert",
            "column_type": "regular",
        },
        {
            "table_src": "Account",
            "column_src": "Billing_City__c",
            "table_dst": "Accounts__c",
            "column_dst": "Billing_City__c",
            "operation": "insert",
            "column_type": "regular",
        },
        {
            "table_src": "Account",
            "column_src": "Billing_Zip_Code__c",
            "table_dst": "Accounts__c",
            "column_dst": "Billing_Zip_Code__c",
            "operation": "insert",
            "column_type": "regular",
        },
        {
            "table_src": "Account",
            "column_src": "Website",
            "table_dst": "Accounts__c",
            "column_dst": "Website",
            "operation": "insert",
            "column_type": "regular",
        },
    ],
}

ACCOUNT_DDL = (
    "row_id long, Name string, type string, Billing_Address__c string, "
    "Billing_City__c string, Billing_County__c string, "
    "Billing_Zip_Code__c long, Shipping_Address__c string, "
    "Shipping_City__c string, Shipping_County__c string, "
    "Account_Birthday__c timestamp, Website string"
)

DST_DDL = (
    "Old_Record_Id__c long, Name string, Billing_City__c string, "
    "Billing_Zip_Code__c long, Website string, Company_Name__c string"
)


def run_mriya_pipeline(
    spark: SparkSession,
    org_dir: str,
    *,
    n_rows: int = 1000,
    seed: int = 42,
    company_fk: str = "0013B000006M6zSQAS",
    source_df: DataFrame | None = None,
) -> DataFrame:
    """Full mriya flow against a mock org; returns the backfill update
    rows (src key -> new dst id), the pipeline's final data product
    (`migration_engine.py:50-68`).

    ``company_fk`` mirrors the reference's hard-coded env-specific FK
    (`migration_engine.py:41`).
    """
    spark.dataSource.register(SalesforceMockDataSource)

    # stage 1 — environment reset (`mriya.py:50-77`): drop both objects.
    # The reference needed chunked DELETE calls; the mock org is files.
    for name in ("Account.jsonl", "Accounts__c.jsonl", "_calls.jsonl"):
        p = os.path.join(org_dir, name)
        if os.path.exists(p):
            os.remove(p)

    # stage 2 — generate + bulk insert src rows (`mriya.py:79-86`, G1+S7).
    # ``source_df`` swaps the pseudorandom generator for caller-supplied
    # rows (ACCOUNT_DDL shape): the pipeline SUFFIX — insert -> extract
    # -> transform -> load -> backfill — is deterministic, so with a
    # deterministic source the whole run is oracle-checkable.
    data = (
        source_df
        if source_df is not None
        else generator.gen_data(spark, n_rows, "Account", seed=seed)
    )
    (
        data.write.format("salesforce_mock")
        .mode("append")
        .option("org_dir", org_dir)
        .option("object", "Account")
        .save()
    )

    # stage 3 — extract (`migration_engine.py:77-81`): connector read
    spec = MappingSpec.from_obj(ACCOUNT_MAPPING)
    src = read_object(spark, org_dir, "Account", ACCOUNT_DDL)
    extracted = src.select(*[r.column_src for r in spec.rules])

    # stage 4 — transform (`migration_engine.py:25-41`): rename + consts
    dst_rows = spec.transform(
        extracted, constants={"Company_Name__c": company_fk}
    )

    # stage 5 — load (`migration_engine.py:43`): bulk insert into dst
    (
        dst_rows.write.format("salesforce_mock")
        .mode("append")
        .option("org_dir", org_dir)
        .option("object", "Accounts__c")
        .save()
    )

    # stage 6 — backfill (`migration_engine.py:50-68`): read created dst
    # rows, join back onto src, emit (src key, dst id) update rows.
    created = read_object(spark, org_dir, "Accounts__c", DST_DDL).withColumn(
        "dst_id",
        F.concat(F.lit("DST-"), F.col("Old_Record_Id__c").cast("string")),
    )
    return spec.backfill(src, created)
