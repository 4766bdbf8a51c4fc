"""The python -m CLI (reference `python main.py` parity)."""

import os
import shutil

from etl_process_for_detecting_fraudulent_transactions_spark.__main__ import main
from tests.conftest import REFDATA, SEED_DUMP


def test_cli_empty_landing_dir_fails(spark, tmp_path):
    (tmp_path / "data").mkdir()
    rc = main(
        ["--data-dir", str(tmp_path / "data"), "--store-dir", str(tmp_path / "store"),
         "--seed-dump", SEED_DUMP, "--show", "0"]
    )
    assert rc == 1


def test_cli_processes_one_day(spark, tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    for f in ("transactions_01032021.txt", "terminals_01032021.xlsx",
              "passport_blacklist_01032021.xlsx"):
        shutil.copy(os.path.join(REFDATA, f), data / f)
    rc = main(
        ["--data-dir", str(data), "--store-dir", str(tmp_path / "store"),
         "--seed-dump", SEED_DUMP, "--show", "0"]
    )
    assert rc == 0
    # consumed files are archived; day-1 report has the 2 golden events
    assert not (data / "transactions_01032021.txt").exists()
    out = spark.read.parquet(str(tmp_path / "store" / "rep_fraud"))
    assert out.count() == 2


def test_bench_emits_contract_json(tmp_path):
    """bench.py is the driver's headline artifact: it must print exactly one
    JSON line with metric/value/unit/queries/errors/sf even when run on a
    key subset, and a failing query must land in errors, not kill the run."""
    import json
    import subprocess
    import sys

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=os.path.join(
            os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
        ),
        SPARK_GRAFT_CPUS="4",
        SPARK_GRAFT_BENCH_KEYS="between_filter,concat_null,groupby_max",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env, capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.splitlines() if l.strip().startswith("{")]
    assert len(lines) == 1
    d = json.loads(lines[0])
    assert d["unit"] == "sec" and d["errors"] == {}
    assert set(d["queries"]) == {"between_filter", "concat_null", "groupby_max"}
    assert all(v > 0 for v in d["queries"].values())


def test_cli_query_mode_lists_and_runs():
    """`python -m pkg query` exposes the whole registry from the command
    line: --list prints every key; a key runs it on --sf-dir."""
    import contextlib
    import io

    from etl_process_for_detecting_fraudulent_transactions_spark.__main__ import main
    from etl_process_for_detecting_fraudulent_transactions_spark.queries import (
        all_queries,
    )

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert main(["query", "--list"]) == 0
    keys = buf.getvalue().split()
    assert set(keys) == set(all_queries())

    assert main(["query", "not_a_key"]) == 1
