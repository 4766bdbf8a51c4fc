"""Rotation staleness audit: which registry queries have the oldest driver
evidence, and does the current first-50 window point at them?

Reads every CORRECTNESS_r*.json in the repo root, labels each registry key
with the LATEST round that produced a fully-green row for it (hash for
oracle-backed keys), and reports:
  - the current first-50 window's evidence mix,
  - keys whose latest evidence is ≥2 rounds old but sit OUTSIDE the window
    (rotation debt — candidates for the next round's _PRIORITY_KEYS),
  - keys never driver-checked at all.

Round 12 adds the *edited-since-check* class (VERDICT r11 #3): a key whose
defining module was git-edited AFTER the round of its last green driver
check is riskier than a merely-old key — json_props_stats proved
rehearsal-green != driver-green after an oracle/dtype edit (its r9 edit sat
driver-unchecked until the r11 red). Debt is therefore ranked
(edited-since-check first, then stalest round); edited keys are flagged
`*edited` in the listing. "Edited" is derived from `git log` over the
gate's defining module since the commit that recorded its last green
round's CORRECTNESS file, at FUNCTION+ORACLE granularity: a key is edited
iff its current query-function source — including the transitive closure of
module-local helper functions it calls and the module constants it reads
(r11's PQ edit lived in the `_pq_parts` helper, invisible at gate-body
granularity) — or its current oracle SQL text does not appear verbatim in
the module file as of that commit (module-level marking flooded — every
module is touched every round by unrelated gates).
Operator-layer dependencies are tracked too: if the gate's function source
uses a name imported from a ``pkg.operators.*`` module and that module file
changed since the check round, the key is marked (r11's PQ-codebook change
lived in operators/pq_index.py, invisible at query-function granularity).
Deleted-only edits inside shared query-module helpers are not caught; that
residual risk is what the stalest-round tiebreak still covers.

Usage: python tools/rotation_check.py [window_size]
Pure bookkeeping — no Spark session needed (imports the registry only).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _round_commits(root: str) -> dict[int, str]:
    """Round number -> commit hash that ADDED its CORRECTNESS file (the
    first commit after that round's driver check landed in-repo)."""
    out: dict[int, str] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            sha = subprocess.run(
                ["git", "log", "--diff-filter=A", "--format=%H", "--",
                 os.path.basename(path)],
                cwd=root, capture_output=True, text=True, check=True,
            ).stdout.split()
        except subprocess.CalledProcessError:
            sha = []
        if sha:
            out[int(m.group(1))] = sha[-1]  # first add, if ever re-added
    return out


_SHOW_CACHE: dict[tuple[str, str], str | None] = {}


def _file_at(root: str, sha: str, relpath: str) -> str | None:
    key = (sha, relpath)
    if key not in _SHOW_CACHE:
        p = subprocess.run(
            ["git", "show", f"{sha}:{relpath.replace(os.sep, '/')}"],
            cwd=root, capture_output=True, text=True,
        )
        _SHOW_CACHE[key] = p.stdout if p.returncode == 0 else None
    return _SHOW_CACHE[key]


def _operator_imports(mod) -> dict[str, str]:
    """Names a query module imports from pkg.operators.* -> operator relpath."""
    import ast
    import inspect

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, str] = {}
    try:
        tree = ast.parse(inspect.getsource(mod))
    except (OSError, SyntaxError):
        return out
    pkg = "etl_process_for_detecting_fraudulent_transactions_spark"
    for node in ast.walk(tree):
        if not isinstance(node, ast.ImportFrom) or node.module is None:
            continue
        # resolve relative "..operators.x" / absolute "pkg.operators.x"
        m = node.module
        if node.level:
            m = f"{pkg}.{m.lstrip('.')}" if not m.startswith(pkg) else m
        if ".operators" not in m:
            continue
        if m.endswith(".operators"):
            for alias in node.names:  # from ..operators import pq_index
                out[alias.asname or alias.name] = os.path.join(
                    pkg, "operators", alias.name + ".py")
        else:
            op_mod = m.split(".operators.", 1)[1].split(".")[0]
            rel = os.path.join(pkg, "operators", op_mod + ".py")
            for alias in node.names:  # from ..operators.pq_index import f
                out[alias.asname or alias.name] = rel
    return {n: p for n, p in out.items()
            if os.path.exists(os.path.join(root, p))}


def _key_sources() -> dict[str, tuple[str, str, str, tuple[str, ...]]]:
    """Key -> (module relpath, function source, oracle SQL or '',
    operator relpaths the function's source references)."""
    import inspect
    import re as _re

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import (
        all_oracles,
        all_queries,
    )

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    oracles = all_oracles()
    op_imports_cache: dict[int, dict[str, str]] = {}
    helper_cache: dict[int, tuple[dict[str, str], dict[str, str]]] = {}

    def _module_defs(mod):
        """(name -> source) for module-local functions, and (NAME -> first
        assignment line) for module-level constants."""
        funcs: dict[str, str] = {}
        for n, f in vars(mod).items():
            if inspect.isfunction(f) and f.__module__ == mod.__name__:
                try:
                    funcs[n] = inspect.getsource(f)
                except (OSError, TypeError):
                    pass
        consts: dict[str, str] = {}
        try:
            for line in inspect.getsource(mod).splitlines():
                m = _re.match(r"^([A-Z_][A-Z0-9_]*)\s*=", line)
                if m and m.group(1) not in consts:
                    consts[m.group(1)] = line
        except OSError:
            pass
        return funcs, consts

    out = {}
    for k, fn in all_queries().items():
        f = inspect.unwrap(fn)
        if hasattr(f, "func"):  # functools.partial
            f = f.func
        mod = inspect.getmodule(f)
        if mod is None or not hasattr(mod, "__file__"):
            continue
        try:
            src = inspect.getsource(f)
        except (OSError, TypeError):
            src = ""
        funcs, consts = helper_cache.setdefault(id(mod), _module_defs(mod))
        # transitive closure over local helpers + constants the gate reads
        chunks, queue, seen = [src] if src else [], [src], set()
        while queue:
            s = queue.pop()
            for n in set(_re.findall(r"[A-Za-z_][A-Za-z0-9_]*", s)):
                if n in seen:
                    continue
                seen.add(n)
                if n in funcs and funcs[n] is not s:
                    chunks.append(funcs[n])
                    queue.append(funcs[n])
                elif n in consts:
                    chunks.append(consts[n])
        opmap = op_imports_cache.setdefault(id(mod), _operator_imports(mod))
        deps = tuple(sorted({p for n, p in opmap.items() if n in seen}))
        out[k] = (os.path.relpath(mod.__file__, root), "\x00".join(chunks),
                  oracles.get(k, ""), deps)
    return out


def latest_green_rounds(root: str) -> tuple[dict[str, int], list[int]]:
    """Key -> latest round with a fully-green driver row, + rounds seen."""
    latest: dict[str, int] = {}
    rounds: list[int] = []
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        rounds.append(n)
        data = json.load(open(path))
        for k, row in data.items():
            ok = (
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match", True)
                and row.get("hash_match", True)
            )
            if ok:
                latest[k] = max(latest.get(k, 0), n)
    return latest, rounds


def edited_since_check(root: str) -> dict[str, bool]:
    """Key -> True iff its defining code changed after its last green
    driver check (the json_props_stats failure class). Importable — the
    rotation-discipline test asserts every True key sits in the window."""
    latest, _ = latest_green_rounds(root)
    round_sha = _round_commits(root)
    sources = _key_sources()

    def edited(k: str) -> bool:
        n = latest.get(k)
        if n is None or n not in round_sha or k not in sources:
            return False
        relpath, fsrc, osql, deps = sources[k]
        old = _file_at(root, round_sha[n], relpath)
        new = _file_at(root, "HEAD", relpath)
        if old is None or new is None:
            return True  # module didn't exist / was moved since the check
        if fsrc and any(chunk not in old for chunk in fsrc.split("\x00")):
            return True
        for dep in deps:  # operator module the function uses changed?
            if _file_at(root, round_sha[n], dep) != _file_at(root, "HEAD", dep):
                return True
        if not osql:
            return False
        if osql in new:  # plain-literal oracle: verbatim compare
            return osql not in old
        # f-string / built oracle: runtime text never matches file text —
        # require only the lines that DO appear literally at HEAD (the
        # non-interpolated ones) to appear at the old commit too
        probe = [ln for ln in osql.splitlines() if len(ln.strip()) > 10 and ln in new]
        return any(ln not in old for ln in probe)

    return {k: edited(k) for k in sources}


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    from etl_process_for_detecting_fraudulent_transactions_spark.queries import all_queries

    keys = list(all_queries())
    latest, rounds = latest_green_rounds(root)
    if not rounds:
        print("no CORRECTNESS_r*.json found")
        return
    cur = max(rounds)

    def label(k: str) -> str:
        return f"r{latest[k]}" if k in latest else "never"

    edited_map = edited_since_check(root)

    def edited(k: str) -> bool:
        return edited_map.get(k, False)

    first = keys[:window]
    rest = keys[window:]
    from collections import Counter

    print(f"registry: {len(keys)} keys; latest driver round: r{cur}")
    print(f"first-{window} evidence mix: {dict(Counter(label(k) for k in first))}")
    edited_in = [k for k in first if edited(k)]
    if edited_in:
        print(f"edited-since-check INSIDE the window ({len(edited_in)}): "
              + " ".join(edited_in))
    debt = [
        (k, label(k), edited(k))
        for k in rest
        if k not in latest or cur - latest[k] >= 2 or edited(k)
    ]
    # rank: edited-since-check first, then never-checked, then stalest round
    debt.sort(key=lambda kv: (not kv[2], kv[1] != "never", kv[1]))
    print(f"\nrotation debt OUTSIDE the window ({len(debt)} keys, "
          "edited-since-check first, then stalest):")
    for k, lab, ed in debt:
        print(f"  {lab:>6}{' *edited' if ed else '        '}  {k}")
    never_any = [k for k in keys if k not in latest]
    if never_any:
        print(f"\nnever fully-green in any driver round: {never_any}")


if __name__ == "__main__":
    main()
