"""S1 JDBC catalog source (sources/io.py read_jdbc_table /
catalog_volumes_for_job) exercised against an embedded Derby database —
the Derby jars ship inside Spark's jar dir, so this is a REAL
`spark.read.format("jdbc")` round-trip in-process, not a mock. The query
shape mirrors /root/reference/db_queries.py:9-48 (3-table join, job-name +
status filters, hex etag projection, volume-id order)."""

import pytest
from pyspark.sql import functions as F

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    """Create the catalog schema by WRITING DataFrames through the same
    JDBC source (Spark creates the tables), then hand back the url."""
    db = tmp_path_factory.mktemp("derby") / "catalog_db"
    url = f"jdbc:derby:{db};create=true"

    def write(name, df, coltypes=None):
        w = (
            df.write.format("jdbc")
            .option("url", url)
            .option("dbtable", name)
            .option("driver", DRIVER)
            .mode("overwrite")
        )
        if coltypes:
            # Derby maps Spark StringType to CLOB by default, and CLOB is
            # not comparable (no pushdown-able equality) — give the string
            # columns real VARCHAR types like any sane catalog schema
            w = w.option("createTableColumnTypes", coltypes)
        w.save()

    write(
        "jobs",
        spark.createDataFrame(
            [(1, "google_books"), (2, "google_vision")], "id int, name string"
        ),
        coltypes="name VARCHAR(64)",
    )
    write(
        "volumes",
        spark.createDataFrame(
            [(10, "W1", "I1"), (11, "W2", "I2"), (12, "W3", "I3")],
            "id int, bdrc_w_id string, bdrc_i_id string",
        ),
        coltypes="bdrc_w_id VARCHAR(64), bdrc_i_id VARCHAR(64)",
    )
    write(
        "task_executions",
        spark.createDataFrame(
            [
                (100, 10, 1, "done", bytearray(b"\xab\xcd\xef\x01\x02\x03")),
                (101, 11, 1, "running", bytearray(b"\x11\x11\x11\x11\x11\x11")),
                (102, 12, 1, "done", bytearray(b"\xde\xad\xbe\xef\x00\x42")),
                (103, 10, 2, "done", bytearray(b"\x99\x88\x77\x66\x55\x44")),
            ],
            "id int, volume_id int, job_id int, status string, s3_etag binary",
        ),
        coltypes="status VARCHAR(16)",
    )
    return url


def test_catalog_volumes_for_job(spark, derby_url):
    from ocr_output_evaluation_spark.sources.io import catalog_volumes_for_job

    rows = catalog_volumes_for_job(
        spark, derby_url, "google_books", driver=DRIVER
    ).collect()
    # job google_books (id 1): done rows are volumes 10 and 12, ordered
    assert [(r.volume_id, r.w_id, r.i_id) for r in rows] == [
        (10, "W1", "I1"),
        (12, "W3", "I3"),
    ]
    assert rows[0].etag_hex == "abcdef010203"
    assert rows[0].i_version == "abcdef"
    assert rows[1].etag_hex == "deadbeef0042"


def test_jdbc_filter_and_projection_pushdown(spark, derby_url):
    """The status filter must reach the database (PushedFilters on the JDBC
    scan), and a 2-column projection must prune the fetched columns
    (ReadSchema lists only those columns)."""
    from ocr_output_evaluation_spark.sources.io import read_jdbc_table

    te = read_jdbc_table(spark, derby_url, "task_executions", driver=DRIVER)
    q = te.filter(F.col("status") == "done").select("id", "volume_id")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(status,done)" in plan.replace("'", ""), plan
    assert q.count() == 3


def test_jdbc_partitioned_read(spark, derby_url):
    """Bounded parallel range read: num_partitions JDBC partitions, same
    rows as the single-connection read."""
    from ocr_output_evaluation_spark.sources.io import read_jdbc_table

    te = read_jdbc_table(
        spark,
        derby_url,
        "task_executions",
        driver=DRIVER,
        partition_column="id",
        lower_bound=100,
        upper_bound=104,
        num_partitions=3,
    )
    assert te.rdd.getNumPartitions() == 3
    assert sorted(r.id for r in te.collect()) == [100, 101, 102, 103]
