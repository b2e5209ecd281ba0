"""End-to-end drive of the north-rule deployment shape: ``spark-submit
--py-files ooe_spark.zip jobs.py extract ...`` (BASELINE.json north_rule;
jobs.py module docstring).

This is deliberately a REAL subprocess test, not an import test: the package
is made importable ONLY through the ``--py-files`` zip (PYTHONPATH scrubbed,
cwd outside the repo, ``jobs.py`` copied next to the zip so the script
directory Python auto-prepends contains no package). It would have caught the
relative-import failure jobs.py originally had when run as a spark-submit
top-level script (``__main__`` has no parent package), which an in-process
``python -m`` drive cannot see.

One submit invocation only — a cold spark-submit JVM is ~30 s in this
container and dominates the test; everything checkable rides on it
(manifest JSON contract, output byte-identity vs the single-process golden
extractor, resume-manifest side effect).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available"
)

N_PAGES = 300


def _build_zip(path: str) -> int:
    pkg = os.path.join(REPO, "ocr_output_evaluation_spark")
    n = 0
    with zipfile.ZipFile(path, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
                    n += 1
    return n


def test_spark_submit_py_files_extract_byte_identical(spark, tmp_path):
    from ocr_output_evaluation_spark.extract import extract_document
    from ocr_output_evaluation_spark.fixtures.generate import web_pages_df, web_pages_pdf

    work = str(tmp_path)
    assert _build_zip(os.path.join(work, "ooe_spark.zip")) > 40
    shutil.copy(
        os.path.join(REPO, "ocr_output_evaluation_spark", "jobs.py"),
        os.path.join(work, "jobs.py"),
    )
    src = os.path.join(work, "src.parquet")
    web_pages_df(spark, N_PAGES, 4).write.mode("overwrite").parquet(src)

    # Scrubbed environment: no PYTHONPATH, cwd away from the repo — the zip
    # is the only route to the package, exactly like a cluster submit.
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "PYSPARK_GATEWAY_PORT", "PYSPARK_GATEWAY_SECRET")
    }
    env["PYSPARK_PYTHON"] = env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    out_dir = os.path.join(work, "out")
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--py-files", os.path.join(work, "ooe_spark.zip"),
            "--conf", "spark.sql.shuffle.partitions=8",
            os.path.join(work, "jobs.py"),
            "extract", "--source", src, "--out", out_dir, "--n-buckets", "4",
        ],
        cwd=work,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]

    # The job prints its manifest result as the last JSON stdout line.
    res = json.loads(
        [ln for ln in proc.stdout.splitlines() if ln.startswith("{")][-1]
    )
    assert res["row_count"] == N_PAGES
    assert sorted(res["processed_buckets"]) == [0, 1, 2, 3]
    assert res["skipped_buckets"] == []
    assert res["extraction_version"]

    # Byte-identity per url vs the single-process golden extractor — the
    # same invariant the in-process drives pin, now across the submit
    # boundary (zip-imported UDF code on the workers).
    got = {
        r.url: (r.text_sha256, r.error)
        for r in spark.read.parquet(out_dir)
        .select("url", "text_sha256", "error")
        .collect()
    }
    assert len(got) == N_PAGES
    for _, row in web_pages_pdf(N_PAGES).iterrows():
        doc = extract_document(row.html)
        assert got[row.url] == (doc.text_sha256, doc.error), row.url

    # Resume manifest landed beside the output (default path contract).
    assert spark.read.parquet(f"{out_dir}_manifest").count() == 4
