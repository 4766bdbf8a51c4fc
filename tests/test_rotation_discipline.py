"""Structural guard for the edited-since-driver-check staleness class
(VERDICT r11 systemic finding): a gate whose defining code changed after
its last green driver check MUST sit inside the first-50 correctness
window — rehearsal-green does not imply driver-green after an edit
(json_props_stats: edited r9, first post-edit driver check r11, red).

This test makes the discipline self-enforcing: editing a gate's function,
its oracle, a module-local helper it calls, or an operators/* module it
uses — without moving the key into `_PRIORITY_KEYS`' window — fails the
suite until the window is updated. It reads git; when history is
unavailable (shallow export), it skips rather than guesses.
"""

from __future__ import annotations

import importlib.util as ilu
import os
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _rotation_check():
    spec = ilu.spec_from_file_location(
        "rotation_check", os.path.join(ROOT, "tools", "rotation_check.py")
    )
    mod = ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_every_edited_key_is_in_the_window():
    git_ok = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True
    ).returncode == 0
    if not git_ok:
        pytest.skip("no git history available")

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import (
        all_queries,
    )

    rc = _rotation_check()
    edited = {k for k, e in rc.edited_since_check(ROOT).items() if e}
    latest, _rounds = rc.latest_green_rounds(ROOT)
    keys = list(all_queries())
    never = {k for k in keys if k not in latest}  # no driver evidence at all
    at_risk = edited | never
    window = set(keys[:50])
    if len(at_risk) <= 50:
        stranded = sorted(at_risk - window)
        assert not stranded, (
            "gates edited since their last green driver check (or never "
            "driver-checked) but OUTSIDE the first-50 window (move them "
            f"into _PRIORITY_KEYS): {stranded}"
        )
    else:
        # More at-risk keys than window slots (the r12 optimization round
        # edited 70 gates' plans): the discipline degrades to "no window
        # slot may be wasted" — every slot must hold an at-risk key, with
        # never-checked keys always in. Which at-risk keys fit is ranked
        # by rotation_check (stalest green evidence first).
        wasted = sorted(window - at_risk)
        assert not wasted, (
            f"more at-risk keys ({len(at_risk)}) than window slots, yet "
            f"these window slots hold keys that are NOT at risk: {wasted}"
        )
        stranded_never = sorted(never - window)
        assert not stranded_never, (
            f"never-driver-checked gates outside the window: {stranded_never}"
        )
