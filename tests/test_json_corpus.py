"""Nested-JSON corpus source/sink (SURVEY §2.1 S4-S5): year-path
predicate, PERMISSIVE malformed-record handling, flatten."""

import os
import tempfile

import pyspark.sql.functions as F

from pyarrowspace_spark.sources import json_corpus as JC
from pyarrowspace_spark.sources import loaders

SF_DIR = "/root/testdata/sf0.001"


def test_roundtrip_year_filter_and_flatten(spark):
    docs = loaders.load_table(spark, SF_DIR, "documents").filter("doc_id < 120")
    path = tempfile.mkdtemp(prefix="pas_json_rt_")
    JC.write_json_corpus(JC.to_cve_like_json(docs), path)

    got = JC.read_json_corpus(spark, path, 2010, 2020)
    want_ids = {r["doc_id"] for r in docs.collect()
                if 2010 <= 2000 + r["doc_id"] % 26 <= 2020}
    assert got.count() == len(want_ids)

    flat = JC.extract_text(got)
    row = flat.orderBy("cve_id").first()
    assert row["flat_text"].count(" | ") == 3  # title, 2 descs, score
    assert row["title"] in row["flat_text"]


def test_malformed_records_dropped(spark):
    docs = loaders.load_table(spark, SF_DIR, "documents").filter("doc_id < 26")
    path = tempfile.mkdtemp(prefix="pas_json_bad_")
    JC.write_json_corpus(JC.to_cve_like_json(docs), path)
    # inject a malformed file into an in-range partition
    bad_dir = os.path.join(path, "year=2015")
    os.makedirs(bad_dir, exist_ok=True)
    with open(os.path.join(bad_dir, "corrupt.json"), "w") as f:
        f.write('{"cve_id": "CVE-2015-junk", "info": {{{ not json\n')
        f.write("total garbage line\n")

    clean = JC.read_json_corpus(spark, path, 2000, 2025)
    ids = [r["cve_id"] for r in clean.select("cve_id").collect()]
    assert len(ids) == 26            # corrupt rows dropped, not errors
    assert all(i and i.startswith("CVE-") for i in ids)
    assert "CVE-2015-junk" not in ids
