"""CLI parity with the reference's ``python main.py`` (main.py:1-26).

    python -m etl_process_for_detecting_fraudulent_transactions_spark \
        --data-dir ./data --store-dir ./store --seed-dump ./ddl_dml.sql [--loop]

One invocation processes the next pending day (run date auto-discovered from
the transactions file, exactly like tools.get_date_from_file); ``--loop``
keeps consuming days until the landing directory is empty. Ends by printing
the accumulated REP_FRAUD (the reference's show_data step).

Second mode — run any operator from the query registry directly:

    python -m etl_process_for_detecting_fraudulent_transactions_spark query --list
    python -m ... query asof_join_nearest --sf-dir /root/testdata/sf0.01 \
        [--show 20] [--explain]
"""

from __future__ import annotations

import argparse
import sys


def _query_main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(
        prog="python -m etl_process_for_detecting_fraudulent_transactions_spark query"
    )
    p.add_argument("key", nargs="?", help="registry key (see --list)")
    p.add_argument("--list", action="store_true", help="print every registry key")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="parquet table dir")
    p.add_argument("--show", type=int, default=20, help="rows to print (0 = count only)")
    p.add_argument("--explain", action="store_true", help="print the formatted plan")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from .queries import all_queries

    qs = all_queries()
    if args.list or not args.key:
        for k in qs:
            print(k)
        return 0
    if args.key not in qs:
        print(f"unknown query {args.key!r} (see --list)", file=sys.stderr)
        return 1

    from .session import get_spark

    spark = get_spark(app_name=f"fraudmart-query-{args.key}", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    df = qs[args.key](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    if args.show:
        df.show(args.show, truncate=False)
    print(f"{args.key}: {df.count()} rows", file=sys.stderr)
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "query":
        return _query_main(argv[1:])
    p = argparse.ArgumentParser(prog="python -m etl_process_for_detecting_fraudulent_transactions_spark")
    p.add_argument("--data-dir", required=True, help="landing dir with the daily file triplet")
    p.add_argument("--store-dir", required=True, help="persistent store (hist + report mart)")
    p.add_argument("--seed-dump", required=True, help="path to the ddl_dml.sql seed dump")
    p.add_argument("--loop", action="store_true", help="consume every pending day, not just one")
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    p.add_argument("--show", type=int, default=20, help="report rows to print (0 = skip)")
    args = p.parse_args(argv)

    from .plans.pipeline import REPORT, PipelineState, run_day
    from .session import get_spark
    from .sources.files import discover_run_date
    from .storage import ParquetStore

    spark = get_spark(app_name="fraudmart-daily", master=args.master)
    spark.sparkContext.setLogLevel("WARN")
    state = PipelineState(store=ParquetStore(spark, args.store_dir), seed_dump_path=args.seed_dump)

    processed = 0
    while True:
        try:
            date = discover_run_date(args.data_dir)
        except FileNotFoundError:
            if processed == 0:
                print("no incoming transactions file found", file=sys.stderr)
                return 1
            break
        run_day(spark, state, args.data_dir, run_date=date)
        processed += 1
        print(f"processed day {date}", file=sys.stderr)
        if not args.loop:
            break

    if args.show:
        state.store.read(REPORT).orderBy("report_dt", "passport", "event_dt").show(
            args.show, truncate=False
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
