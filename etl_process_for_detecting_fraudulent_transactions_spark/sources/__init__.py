from .csv_source import read_transactions_csv
from .files import archive_file, discover_run_date
from .seed_source import read_seed_dims
from .xlsx_source import read_xlsx, read_xlsx_df

__all__ = [
    "archive_file",
    "discover_run_date",
    "read_seed_dims",
    "read_transactions_csv",
    "read_xlsx",
    "read_xlsx_df",
]
