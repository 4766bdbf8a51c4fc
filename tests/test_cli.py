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
