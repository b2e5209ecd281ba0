"""S7 + the interactive SQL surface (sources/io.py register_tables_dir /
sql_repl — the explore_stats.py:433-514 analog served by Spark SQL)."""

import io as _io

from ocr_output_evaluation_spark.sources.io import register_tables_dir, sql_repl


def test_register_tables_dir_and_query(spark, sf_dir):
    names = register_tables_dir(spark, sf_dir)
    assert "documents" in names and "orders" in names and len(names) == 10
    n = spark.sql("SELECT count(*) AS n FROM documents").collect()[0].n
    assert n > 0


def test_sql_repl_runs_queries_and_survives_errors(spark, sf_dir, monkeypatch, capsys):
    names = register_tables_dir(spark, sf_dir)
    feed = iter(
        [
            "SELECT lang, count(*) AS n FROM documents GROUP BY lang ORDER BY lang",
            "SELECT broken syntax here",
            "",
            "exit",
        ]
    )
    monkeypatch.setattr("builtins.input", lambda prompt="": next(feed))
    sql_repl(spark, names, limit=10)
    out = capsys.readouterr().out
    assert "lang" in out and "en" in out  # query result rendered
    assert "Error:" in out  # bad SQL reported, loop survived to 'exit'
