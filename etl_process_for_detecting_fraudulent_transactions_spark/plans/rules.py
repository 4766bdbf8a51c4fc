"""The four fraud-rule queries as pure DataFrame transforms (SURVEY §2.9).

Each rule takes the day's typed DataFrames and returns report-shaped rows
(event_dt, passport, fio, phone, event_type) — lazy plans; the caller appends
them to REP_FRAUD with a stamped report_dt.

Scale notes: all dims (cards/accounts/clients/blacklist/terminals-hist) are
small relative to the fact, so every identity lookup is an explicit
``broadcast`` — on a 1000-executor cluster the fact never shuffles for these
joins. The only unavoidable fact shuffles are the per-card window/groupBy in
Q3/Q4; both partition by ``card_num``, so Catalyst reuses one exchange per
rule chain. AQE handles hot-card skew.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.casts import fio_concat, int_amount, minutes_between
from ..operators.scd2 import current_view


def _identity_by_card(events: DataFrame, cards: DataFrame, accounts: DataFrame,
                      clients: DataFrame, event_type: str) -> DataFrame:
    """Left-join identity lookup chain card→account→client shared by Q3/Q4
    (rep_fraud.py:151-165, 229-242)."""
    return (
        events.join(cards.select("card_num", "account_num"), "card_num", "left")
        .join(accounts.select("account_num", "client"), "account_num", "left")
        .join(
            clients.select(
                "client_id", "passport_num", "last_name", "first_name",
                "patrinymic", "phone",
            ),
            F.col("client") == F.col("client_id"),
            "left",
        )
        .select(
            "event_dt",
            F.col("passport_num").alias("passport"),
            fio_concat("last_name", "first_name", "patrinymic").alias("fio"),
            "phone",
            F.lit(event_type).alias("event_type"),
        )
    )


def passport_fraud(
    transactions: DataFrame,
    cards: DataFrame,
    accounts: DataFrame,
    clients: DataFrame,
    blacklist: DataFrame,
    run_date: _dt.date,
) -> DataFrame:
    """Q1: transactions by clients with an expired (strictly before run_date)
    or blacklisted passport; one row per transaction (rep_fraud.py:6-55).

    Blacklist membership deliberately ignores entry_dt (cumulative file ⇒
    membership test, SURVEY §2.2 P3). Strict ``>``: a passport expiring ON
    run_date is still valid. NULL passport_valid_to never matches.
    """
    bl = blacklist.select("passport_num").distinct().withColumn("_bl", F.lit(1))
    invalid_clients = (
        clients.join(F.broadcast(bl), "passport_num", "left")
        .filter((F.lit(run_date) > F.col("passport_valid_to")) | F.col("_bl").isNotNull())
        .select(
            "client_id",
            fio_concat("last_name", "first_name", "patrinymic").alias("fio"),
            "passport_num",
            "phone",
        )
    )
    return (
        transactions.join(cards.select("card_num", "account_num"), "card_num", "inner")
        .join(accounts.select("account_num", "client"), "account_num", "inner")
        .join(
            invalid_clients,
            F.col("client") == F.col("client_id"),
            "inner",
        )
        .select(
            F.col("trans_date").alias("event_dt"),
            F.col("passport_num").alias("passport"),
            "fio",
            "phone",
            F.lit("passport_fraud").alias("event_type"),
        )
    )


def account_fraud(
    transactions: DataFrame,
    cards: DataFrame,
    accounts: DataFrame,
    clients: DataFrame,
    run_date: _dt.date,
) -> DataFrame:
    """Q2: transactions on accounts expired strictly before run_date; client
    identity via LEFT join (account kept even without a client)
    (rep_fraud.py:59-106)."""
    invalid_accounts = (
        accounts.filter(F.lit(run_date) > F.col("valid_to"))
        .join(clients, F.col("client") == F.col("client_id"), "left")
        .select(
            "account_num",
            fio_concat("last_name", "first_name", "patrinymic").alias("fio"),
            "passport_num",
            "phone",
        )
    )
    return (
        transactions.join(cards.select("card_num", "account_num"), "card_num", "inner")
        .join(invalid_accounts, "account_num", "inner")
        .select(
            F.col("trans_date").alias("event_dt"),
            F.col("passport_num").alias("passport"),
            "fio",
            "phone",
            F.lit("account_fraud").alias("event_type"),
        )
    )


def city_fraud(
    transactions: DataFrame,
    terminals_hist: DataFrame,
    cards: DataFrame,
    accounts: DataFrame,
    clients: DataFrame,
    compat_time_filter: bool = True,
    compat_hist_join: bool = True,
) -> DataFrame:
    """Q3: cards transacting in >1 distinct city; one row per card at the max
    flagged boundary timestamp (rep_fraud.py:110-184).

    Reference quirks, both reproducible and both fixable by flag:
    - ``compat_hist_join=True`` joins the FULL history (no version filter),
      duplicating each transaction once per history version of its terminal
      (SURVEY §2.3 J6). ``False`` joins only current versions.
    - ``compat_time_filter=True`` reproduces the vacuous filter
      ``minutes(cur − next) ≤ 60`` (always true since cur ≤ next);
      ``False`` implements the intended "different cities within one hour":
      ``minutes(next − cur) ≤ 60``.
    """
    hist = terminals_hist if compat_hist_join else current_view(terminals_hist)
    city_dim = F.broadcast(
        hist.select(F.col("terminal_id").alias("terminal"), "terminal_city")
    )
    tx_city = transactions.select("card_num", "trans_date", "terminal").join(
        city_dim, "terminal", "left"
    )

    multi_city_cards = (
        tx_city.groupBy("card_num")
        .agg(F.count_distinct("terminal_city").alias("cnt_city"))
        .filter(F.col("cnt_city") > 1)
        .select("card_num")
    )

    w = Window.partitionBy("card_num").orderBy("trans_date")
    seq = (
        tx_city.join(F.broadcast(multi_city_cards), "card_num", "inner")
        .withColumn("lead_trans_date", F.lead("trans_date").over(w))
        .withColumn("lead_terminal_city", F.lead("terminal_city").over(w))
    )
    if compat_time_filter:
        time_ok = minutes_between("trans_date", "lead_trans_date") <= 60
    else:
        time_ok = minutes_between("lead_trans_date", "trans_date") <= 60
    flagged = seq.filter(
        (F.col("terminal_city") != F.col("lead_terminal_city")) & time_ok
    )

    events = flagged.groupBy("card_num").agg(F.max("trans_date").alias("event_dt"))
    return _identity_by_card(events, cards, accounts, clients, "city_fraud")


def guessing_amount_fraud(
    transactions: DataFrame,
    cards: DataFrame,
    accounts: DataFrame,
    clients: DataFrame,
) -> DataFrame:
    """Q4: a SUCCESS whose 3 predecessors (PAYMENT/WITHDRAW only, per card,
    time-ordered) are REJECTs with strictly decreasing integer amounts, the
    whole chain within 20 minutes (rep_fraud.py:187-261).

    Integer amounts use SQLite prefix-cast semantics (whole currency units,
    kopecks dropped — functions.int_amount).
    """
    w = Window.partitionBy("card_num").orderBy("trans_date")
    amt_i = int_amount("amt")
    seq = (
        transactions.filter(F.col("oper_type").isin("PAYMENT", "WITHDRAW"))
        .select("card_num", "trans_date", "amt", "oper_result")
        .withColumn("amt_int", amt_i)
        # lag the materialized column so all lags share ONE Window node
        .withColumn("lag_amt_1", F.lag("amt_int", 1).over(w))
        .withColumn("lag_amt_2", F.lag("amt_int", 2).over(w))
        .withColumn("lag_amt_3", F.lag("amt_int", 3).over(w))
        .withColumn("lag_result_1", F.lag("oper_result", 1).over(w))
        .withColumn("lag_result_2", F.lag("oper_result", 2).over(w))
        .withColumn("lag_result_3", F.lag("oper_result", 3).over(w))
        .withColumn("lag_trans_date", F.lag("trans_date", 3).over(w))
    )
    hits = seq.filter(
        (F.col("oper_result") == "SUCCESS")
        & (F.col("lag_result_1") == "REJECT")
        & (F.col("lag_result_2") == "REJECT")
        & (F.col("lag_result_3") == "REJECT")
        & (minutes_between("trans_date", "lag_trans_date") <= 20)
        & (F.col("lag_amt_3") > F.col("lag_amt_2"))
        & (F.col("lag_amt_2") > F.col("lag_amt_1"))
        & (F.col("lag_amt_1") > F.col("amt_int"))
    ).select("card_num", F.col("trans_date").alias("event_dt"))
    return _identity_by_card(hits, cards, accounts, clients, "guessing_amount_fraud")
