"""Fixture source (SURVEY §2.1 S8): {url, domain, raw_html} JSON documents
(the reference's golden-input shape,
/root/reference/scripts/fetch_and_create_fixture.py:81-109).
"""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import DOCUMENTS_RAW_SCHEMA

REFERENCE_FIXTURES = "/root/reference/fixtures"


def load_fixtures(spark: SparkSession, fixtures_dir: str = REFERENCE_FIXTURES) -> DataFrame:
    """Read every fixture JSON under the dir into documents_raw(url, domain,
    raw_html). Files are single JSON objects (possibly large); read
    driver-side (they are few and local) and parallelize — in production
    spark.read.option('multiLine', True).json covers object storage."""
    rows = []
    for path in sorted(glob.glob(os.path.join(fixtures_dir, "**", "*.json"),
                                 recursive=True)):
        try:
            with open(path) as f:
                obj = json.load(f)
        except Exception:
            continue
        if isinstance(obj, dict) and {"url", "domain", "raw_html"} <= set(obj):
            rows.append((obj["url"], obj["domain"], obj["raw_html"]))
    return spark.createDataFrame(rows, DOCUMENTS_RAW_SCHEMA)
