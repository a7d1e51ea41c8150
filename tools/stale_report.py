"""Verification-staleness report: which registry queries most need a slot
in the driver's 50-entry CORRECTNESS window this round.

The driver verifies only the first 50 registry entries per round, so with
a 126-query registry each entry is re-verified roughly every 2.5 rounds.
Rotation (the PRIORITY tuple in ``nonconsumptive_spark/queries``) should
put at the head: (1) queries whose implementation files changed since the
last driver gate, (2) queries never driver-verified, (3) everything else
by oldest-last-verified round.  This report makes that mechanical.

Per query it derives the implementation files from the registering
function's defining module plus any ``alias.`` attribute roots in its
source that resolve to project module imports (e.g. ``ts.dsir_weights``
-> operators/textstats.py), then marks queries whose files appear in
``git diff --name-only <since>``.

Usage:  python tools/stale_report.py [--since REV] [--window N]
        (default REV: the commit that added the newest CORRECTNESS_r*.json
         — i.e. everything committed since the last driver gate)
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def correctness_history() -> tuple[dict[str, tuple[int, bool]], int]:
    """query -> (latest round with a driver row, green?), plus max round."""
    latest: dict[str, tuple[int, bool]] = {}
    max_round = 0
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        max_round = max(max_round, rnd)
        for name, row in json.loads(f.read_text()).items():
            green = bool(row.get("rows_match") and row.get("schema_match")
                         and row.get("hash_match", True) and not row.get("err"))
            latest[name] = (rnd, green)
    return latest, max_round


def newest_correctness_commit() -> str:
    files = sorted(REPO.glob("CORRECTNESS_r*.json"))
    if not files:
        # before the first driver gate: everything counts as touched
        # since the repo root, and every query reports NEVER-verified
        out = subprocess.run(
            ["git", "rev-list", "--max-parents=0", "HEAD"],
            cwd=REPO, capture_output=True, text=True).stdout.strip()
        return out.splitlines()[0] if out else "HEAD"
    out = subprocess.run(
        ["git", "log", "--diff-filter=A", "--format=%H", "--", files[-1].name],
        cwd=REPO, capture_output=True, text=True).stdout.strip()
    return out.splitlines()[0] if out else "HEAD~1"


def touched_files(since: str) -> set[str]:
    out = subprocess.run(["git", "diff", "--name-only", f"{since}..HEAD"],
                         cwd=REPO, capture_output=True, text=True).stdout
    return {line.strip() for line in out.splitlines() if line.strip()}


def query_files() -> dict[str, set[str]]:
    """query -> repo-relative implementation files (registering module +
    operator modules its function source references via import aliases)."""
    import importlib
    import inspect

    from nonconsumptive_spark.queries import all_queries

    deps: dict[str, set[str]] = {}
    for name, q in all_queries().items():
        files: set[str] = set()
        fn = q.spark_fn
        mod = sys.modules.get(fn.__module__)
        if mod and getattr(mod, "__file__", None):
            files.add(str(Path(mod.__file__).resolve().relative_to(REPO)))
        try:
            src = inspect.getsource(fn)
        except OSError:
            src = ""
        # alias roots used as attribute bases in the function body
        for alias in set(re.findall(r"\b([A-Za-z_][A-Za-z0-9_]*)\.", src)):
            target = getattr(mod, alias, None)
            tfile = getattr(target, "__file__", None)
            if tfile and str(REPO) in str(Path(tfile).resolve()):
                files.add(str(Path(tfile).resolve().relative_to(REPO)))
            elif target is not None and not inspect.ismodule(target):
                tmod = sys.modules.get(getattr(target, "__module__", ""), None)
                tfile = getattr(tmod, "__file__", None)
                if tfile and str(REPO) in str(Path(tfile).resolve()):
                    files.add(str(Path(tfile).resolve().relative_to(REPO)))
        deps[name] = files
    return deps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--since", default=None,
                    help="rev to diff against (default: last driver gate)")
    ap.add_argument("--window", type=int, default=50,
                    help="driver window size")
    args = ap.parse_args()

    since = args.since or newest_correctness_commit()
    touched = touched_files(since)
    latest, _ = correctness_history()
    deps = query_files()

    rows = []
    for name, files in deps.items():
        rnd, green = latest.get(name, (0, False))
        code_touched = sorted(f for f in files if f in touched)
        rows.append((name, rnd, green, code_touched))

    # staleness order: code-touched first, then never-verified, then by
    # oldest round, then red rows ahead of green
    rows.sort(key=lambda r: (0 if r[3] else 1,
                             r[1],
                             0 if not r[2] else 1,
                             r[0]))

    print(f"# stale-risk report  (since {since[:12]}, "
          f"{len(touched)} files touched)\n")
    print(f"{'query':34s} {'last_round':>10s} {'green':>5s}  touched files")
    for name, rnd, green, code_touched in rows[:args.window]:
        tag = "NEVER" if rnd == 0 else f"r{rnd}"
        print(f"{name:34s} {tag:>10s} {str(green):>5s}  "
              f"{', '.join(code_touched) if code_touched else '-'}")
    print(f"\nsuggested PRIORITY head (top {args.window} above); "
          "paste into nonconsumptive_spark/queries/__init__.py")


if __name__ == "__main__":
    main()
