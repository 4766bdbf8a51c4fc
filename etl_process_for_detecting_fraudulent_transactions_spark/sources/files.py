"""File discovery and archive-on-success (SURVEY §2.1 S7/S8).

Driver-side filesystem orchestration, mirroring the reference's contract:
process the lexicographically-first transactions file's DDMMYYYY token, and
move each consumed file to ``archive/<name>.backup`` after a successful load
(at-most-once consumption; py_scripts/tools.py:16-29, data_to_db.py:118-119).
"""

from __future__ import annotations

import os
import re

_DATE_RE = re.compile(r"_(\d{8})\.")


def discover_run_date(data_dir: str) -> str:
    """Return the DDMMYYYY token of the first ``*.txt`` file in data_dir.

    Raises FileNotFoundError when no transactions file is present
    (reference raises and main() quits, main.py:11-13).
    """
    for name in sorted(os.listdir(data_dir)):
        if name.endswith(".txt"):
            m = _DATE_RE.search(name)
            if m:
                return m.group(1)
    raise FileNotFoundError(f"no transactions *.txt with _DDMMYYYY. token in {data_dir}")


def ddmmyyyy_to_iso(date: str) -> str:
    """'01032021' → '2021-03-01' (py_scripts/rep_fraud.py:8)."""
    return re.sub(r"(\d\d)(\d\d)(\d{4})", r"\3-\2-\1", date)


def archive_file(path: str, archive_dir: str) -> str:
    """Move a consumed input file to ``archive_dir/<name>.backup``."""
    os.makedirs(archive_dir, exist_ok=True)
    dest = os.path.join(archive_dir, os.path.basename(path) + ".backup")
    os.rename(path, dest)
    return dest
