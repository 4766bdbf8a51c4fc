"""Calibration-normalized cross-round bench table (VERDICT r7 #7).

Mines every committed version of ``bench_full.json`` from git history, keeps
the canonical full sf0.1 runs — the driver's per-round bench (commit subject
``round N: verdict/advice/correctness/bench``) and the builder's closing
bench immediately preceding each driver run — appends the current
working-tree ``bench_full.json``, and rewrites the table between the
``<!-- bench-history:begin/end -->`` markers in ROUNDLOG.md.

Totals are shown raw AND in calibration units (total / calibration_sec,
the fixed-work CPU probe bench.py has recorded since round 7) so
cross-round comparisons are host-drift-normalized instead of re-litigated;
pre-probe rounds show a dash. Run after each closing bench:

    python tools/bench_history.py
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- bench-history:begin -->"
END = "<!-- bench-history:end -->"
TAIL_BEGIN = "<!-- bench-tail:begin -->"
TAIL_END = "<!-- bench-tail:end -->"
TAIL_N = 15
# creep = normalized cost grew >30% AND >0.5 s absolute vs the oldest
# compared run — both thresholds from the r8 verdict's drift discussion
# (the calibration probe itself wobbles ~6-10%; sub-half-second moves are
# plan-compile noise at sf0.1)
CREEP_RATIO = 1.30
CREEP_ABS_SEC = 0.5


def _bench_at(commit: str | None) -> dict | None:
    try:
        if commit is None:
            with open(os.path.join(ROOT, "bench_full.json")) as fh:
                return json.load(fh)
        out = subprocess.check_output(
            ["git", "show", f"{commit}:bench_full.json"],
            cwd=ROOT,
            stderr=subprocess.DEVNULL,
        )
        return json.loads(out)
    except Exception:
        return None


def _history_rows() -> list[tuple[str, str, dict]]:
    """(label, commit, bench) rows, oldest first — driver rounds plus the
    builder closing run directly before each, full sf0.1 runs only."""
    log = subprocess.check_output(
        ["git", "log", "--format=%h\t%s", "--", "bench_full.json"],
        cwd=ROOT,
        text=True,
    ).strip().splitlines()
    entries = [line.split("\t", 1) for line in log if "\t" in line]
    entries.reverse()  # oldest first
    picked: list[tuple[str, str, dict]] = []
    pending_builder: tuple[str, str, dict] | None = None
    for sha, subject in entries:
        b = _bench_at(sha)
        full_run = bool(b) and b.get("sf") == 0.1 and len(b.get("queries", {})) >= 90
        m = re.match(r"round (\d+):", subject)
        if m:
            # a driver commit ALWAYS closes the round: flush the pending
            # builder row even when the driver's own bench fails the
            # full-run filter (e.g. an sf0.01 or subset bench got
            # committed) — otherwise that builder row would silently
            # attach to the NEXT driver round
            n = m.group(1)
            if pending_builder:
                picked.append((f"r{n} builder closing", *pending_builder[1:]))
                pending_builder = None
            if full_run:
                picked.append((f"r{n} driver", sha, b))
        elif full_run:
            pending_builder = ("", sha, b)
    if pending_builder:
        picked.append(("builder closing (pre-driver)", *pending_builder[1:]))
    return picked


def _fmt(rows: list[tuple[str, str, dict]]) -> str:
    out = [
        BEGIN,
        "",
        "| run | commit | queries | total s | calibration s | cal units |",
        "|---|---|---|---|---|---|",
    ]
    for label, sha, b in rows:
        cal = b.get("calibration_sec")
        units = f"{b['value'] / cal:.0f}" if cal else "—"
        cal_s = f"{cal:.3f}" if cal else "—"
        out.append(
            f"| {label} | {sha} | {len(b.get('queries', {}))} |"
            f" {b['value']:.1f} | {cal_s} | {units} |"
        )
    out += [
        "",
        "Cal units = total / the fixed-work CPU calibration probe bench.py"
        " records (shipped round 7) — host drift divides out, so only"
        " ratios between cal-unit rows are meaningful. Pre-probe rounds"
        " cannot be normalized retroactively. Regenerate with"
        " `python tools/bench_history.py` after each closing bench.",
        END,
    ]
    return "\n".join(out)


def _tail_panel(rows: list[tuple[str, str, dict]]) -> str:
    """Per-key panel over the slowest TAIL_N keys of the latest full run,
    calibration-normalized across the last three full runs, with a
    machine verdict per key (VERDICT r8 #5): 'CREEP' when normalized cost
    grew >CREEP_RATIO and >CREEP_ABS_SEC absolute vs the oldest compared
    run, else 'ok' — so creep vs host drift stops being re-litigated by
    hand each round."""
    runs = [r for r in rows if r[2].get("calibration_sec")][-3:]
    if not runs:
        return "\n".join([TAIL_BEGIN, "", "(no calibrated runs)", TAIL_END])
    latest = runs[-1][2]
    cal_latest = latest["calibration_sec"]
    # round-9 ADVICE: if the newest history rows lack calibration_sec (e.g.
    # an uncalibrated working-tree run), the panel silently reported an
    # older run as "latest" — say so explicitly instead, naming EVERY
    # trailing uncalibrated row so the reader knows how far back "latest"
    # reaches (round-10 review: naming only the newest understated it).
    skipped = []
    for label, sha, b in reversed(rows):
        if b.get("calibration_sec"):
            break
        skipped.append(label or sha)
    skipped_note = ""
    if skipped:
        skipped_note = (
            f" NOTE: the {len(skipped)} newest history row(s)"
            f" ({', '.join(reversed(skipped))}) lack calibration_sec and"
            " were skipped; 'latest' here is the newest CALIBRATED run."
        )
    tail = sorted(
        latest.get("queries", {}).items(), key=lambda kv: -kv[1]
    )[:TAIL_N]
    hdr = " | ".join(label or sha for label, sha, _ in runs)
    out = [
        TAIL_BEGIN,
        "",
        f"Top-{TAIL_N} tail of the latest run, in calibration units"
        f" (sec / that run's probe); verdict = CREEP when latest >"
        f" {CREEP_RATIO}x the oldest compared run AND > {CREEP_ABS_SEC} s"
        " absolute, else ok." + skipped_note,
        "",
        f"| key | {hdr} | verdict |",
        "|---|" + "---|" * (len(runs) + 1),
    ]
    for key, sec in tail:
        cells = []
        oldest_units = oldest_sec = None
        n_present = 0
        for _, _, b in runs:
            s = b.get("queries", {}).get(key)
            cal = b.get("calibration_sec")
            if s is None or not cal:
                cells.append("—")
                continue
            n_present += 1
            u = s / cal
            if oldest_units is None:
                oldest_units, oldest_sec = u, s
            cells.append(f"{u:.2f}u ({s:.2f}s)")
        latest_units = sec / cal_latest
        # presence, not float equality: a key with identical normalized
        # cost in every run is 'ok', only a single-run key is 'new'
        if n_present <= 1:
            verdict = "new"
        elif (
            latest_units > CREEP_RATIO * oldest_units
            and sec - oldest_sec > CREEP_ABS_SEC
        ):
            verdict = "**CREEP**"
        else:
            verdict = "ok"
        out.append(f"| {key} | " + " | ".join(cells) + f" | {verdict} |")
    out += ["", TAIL_END]
    return "\n".join(out)


def _splice(text: str, begin: str, end: str, block: str) -> str | None:
    if begin in text and end in text:
        pre, rest = text.split(begin, 1)
        _, post = rest.split(end, 1)
        return pre + block + post
    return None


def main() -> int:
    rows = _history_rows()
    wt = _bench_at(None)
    if wt and wt.get("sf") == 0.1 and len(wt.get("queries", {})) >= 90:
        head = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT, text=True
        ).strip()
        committed = _bench_at(head)
        if committed != wt:
            rows.append(("working tree", "—", wt))
    table = _fmt(rows)
    tail = _tail_panel(rows)
    path = os.path.join(ROOT, "ROUNDLOG.md")
    with open(path) as fh:
        text = fh.read()
    spliced = _splice(text, BEGIN, END, table)
    if spliced is None:
        print("markers not found in ROUNDLOG.md — printing table", file=sys.stderr)
        print(table)
        return 1
    text = spliced
    spliced = _splice(text, TAIL_BEGIN, TAIL_END, tail)
    if spliced is None:
        # first run with the tail panel: seat it right after the history
        text = text.replace(END, END + "\n\n" + tail, 1)
    else:
        text = spliced
    with open(path, "w") as fh:
        fh.write(text)
    print(f"wrote bench-history table ({len(rows)} rows) + top-{TAIL_N} tail panel")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
