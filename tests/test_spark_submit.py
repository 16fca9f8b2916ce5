"""North-rule packaging evidence: the pipeline ships via
`spark-submit --py-files search_ingest_spark.zip` — the driver script
imports the package FROM THE ZIP (the repo is scrubbed from PYTHONPATH)
and runs build + query end to end."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

DRIVER = """
import json, sys
catalog_dir, docs_path = sys.argv[1], sys.argv[2]
from search_ingest_spark.session import get_spark          # from the zip
from search_ingest_spark.catalog import Catalog
from search_ingest_spark.index.build import build_index
from search_ingest_spark.query.wand import Searcher

spark = get_spark("pyfiles_e2e", master="local[4]", shuffle_partitions=4)
cat = Catalog(spark, catalog_dir)
info = build_index(spark, spark.read.parquet(docs_path), cat,
                   mode="simple", docs_per_shard=64)
rows = Searcher(spark, cat).topk("data table", 5, round_to=4).collect()
print("RESULT " + json.dumps({
    "n_docs": info.n_docs,
    "top": [[r["doc_id"], r["score"], r["rank"]] for r in rows],
}))
"""


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="no spark-submit")
def test_spark_submit_with_pyfiles_zip(tmp_path):
    zip_base = str(tmp_path / "search_ingest_spark_pkg")
    zip_path = shutil.make_archive(zip_base, "zip", root_dir=REPO,
                                   base_dir="search_ingest_spark")
    driver = tmp_path / "driver.py"
    driver.write_text(DRIVER)
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    res = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]", "--py-files", zip_path,
         str(driver), str(tmp_path / "cat"),
         "/root/testdata/sf0.001/documents.parquet"],
        capture_output=True, text=True, timeout=420, env=env, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stderr[-3000:]
    line = next(ln for ln in res.stdout.splitlines() if ln.startswith("RESULT "))
    out = json.loads(line[len("RESULT "):])
    assert out["n_docs"] > 0
    assert len(out["top"]) == 5
    assert out["top"][0][2] == 1  # rank 1 first
