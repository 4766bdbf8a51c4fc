from .ingest import typed_blacklist, typed_transactions
from .pipeline import PipelineState, run_day
from .rules import (
    account_fraud,
    city_fraud,
    guessing_amount_fraud,
    passport_fraud,
)

__all__ = [
    "PipelineState",
    "account_fraud",
    "city_fraud",
    "guessing_amount_fraud",
    "passport_fraud",
    "run_day",
    "typed_blacklist",
    "typed_transactions",
]
