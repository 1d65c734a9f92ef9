"""One-shot round-handoff gate (VERDICT r2 #4): full pytest + the full
177-query driver simulation, with the outcome appended to PROGRESS.jsonl so
every round's artifacts carry the full-suite result (the grading driver
samples ~50 queries; this is the real gate).

Usage: python tools/verify_all.py [--skip-pytest]
Exit 0 only if BOTH stages pass. Also invoked as `make verify`.
"""

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list[str], log: str) -> tuple[int, str]:
    with open(log, "w") as fh:
        rc = subprocess.call(cmd, cwd=ROOT, stdout=fh, stderr=subprocess.STDOUT)
    with open(log) as fh:
        return rc, fh.read()


def main() -> int:
    results: dict = {"ts": time.time(), "kind": "verify_all"}
    ok = True

    # Doc-count gate (VERDICT r3 #6): regenerate the query index; if that
    # CHANGES QUERIES.md or README.md, the docs were stale — fail the
    # gate (the regeneration itself leaves the tree fixed). Content
    # compare, not `git diff`: an unrelated uncommitted README edit must
    # not false-positive the gate.
    docs = ["QUERIES.md", "README.md"]
    before = {
        d: open(os.path.join(ROOT, d), encoding="utf-8").read() for d in docs
    }
    rc, out = run(
        [sys.executable, "tools/gen_query_index.py"], "/tmp/verify_genindex.log"
    )
    drift = [
        d
        for d in docs
        if open(os.path.join(ROOT, d), encoding="utf-8").read() != before[d]
    ]
    results["doc_index"] = {"rc": rc, "stale": drift}
    ok = ok and rc == 0 and not drift
    print(f"doc_index: rc={rc} stale={drift or 'none'}", flush=True)

    # Stray-binary gate (VERDICT r5 #3): no parquet/_SUCCESS/CRC droppings
    # may be tracked outside declared fixture dirs — a test run with
    # cwd=repo-root must never leak its outputs into git (the r5 `reltab/`
    # incident). Checks TRACKED files, so a dirty working dir of local runs
    # doesn't false-positive.
    tracked = subprocess.run(
        ["git", "ls-files"], cwd=ROOT, capture_output=True, text=True
    ).stdout.splitlines()
    allowed_prefixes = ("tests/fixtures/",)
    stray = [
        f
        for f in tracked
        if (
            f.endswith((".parquet", ".crc", "_SUCCESS"))
            or os.path.basename(f) == "_SUCCESS"
        )
        and not f.startswith(allowed_prefixes)
    ]
    results["stray_binaries"] = {"stray": stray}
    ok = ok and not stray
    print(f"stray_binaries: {stray or 'none'}", flush=True)

    # Plan-freshness gate (VERDICT r10 #4): PLANS.md is REGENERATED on
    # HEAD every verify — plan drift (a new shuffle, a lost pushdown, a
    # row-at-a-time Python node) shows up as a content diff and fails the
    # gate loudly instead of hiding behind a stale table. The regeneration
    # leaves the tree fixed, so commit + re-verify converges.
    plans_path = os.path.join(ROOT, "PLANS.md")
    plans_before = open(plans_path, encoding="utf-8").read()
    rc, out = run(
        [sys.executable, "tools/gen_plan_report.py"], "/tmp/verify_plans.log"
    )
    plans_md = open(plans_path, encoding="utf-8").read()
    plans_stale = plans_md != plans_before
    results["plan_fresh"] = {"rc": rc, "stale": plans_stale}
    ok = ok and rc == 0 and not plans_stale
    print(f"plan_fresh: rc={rc} stale={plans_stale}", flush=True)

    # Plan-audit gate (VERDICT r4 #4): every bench headline query must have
    # a row in PLANS.md, and the py-eval contract (0 row-at-a-time Python
    # nodes) must hold on the regenerated table.
    sys.path.insert(0, ROOT)
    from bench import HEADLINE

    unaudited = [n for n in HEADLINE if f"| {n} |" not in plans_md]
    py_eval_ok = "queries: **0**" in plans_md
    results["plan_audit"] = {"unaudited": unaudited, "py_eval_zero": py_eval_ok}
    ok = ok and not unaudited and py_eval_ok
    print(
        f"plan_audit: unaudited={unaudited or 'none'} "
        f"py_eval_zero={py_eval_ok}",
        flush=True,
    )

    # Coverage gate (VERDICT r4 #4): every registered query name must be
    # mentioned somewhere in COVERAGE.md (rows reference their queries) —
    # catches the r4 class of drift where new surface ships undocumented.
    from web_analytics_on_aws_spark import plans as _plans

    _plans.load_all()
    cov = open(os.path.join(ROOT, "COVERAGE.md"), encoding="utf-8").read()
    uncovered = [n for n in sorted(_plans.QUERIES) if n not in cov]
    results["coverage_doc"] = {"uncovered": uncovered}
    ok = ok and not uncovered
    print(f"coverage_doc: uncovered={uncovered or 'none'}", flush=True)

    if "--skip-pytest" not in sys.argv:
        # -m "" overrides pytest.ini's default "not slow" selection: the
        # round-end gate runs the FULL suite including the deep storage
        # fuzz/lifecycle sweeps (the default selection exists so the
        # grading driver's time-boxed re-run finishes — r13).
        rc, out = run(
            [sys.executable, "-m", "pytest", "tests/", "-q", "-m", ""],
            "/tmp/verify_pytest.log",
        )
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        results["pytest"] = {"rc": rc, "summary": tail}
        ok = ok and rc == 0
        print(f"pytest: rc={rc} {tail}", flush=True)

    rc, out = run(
        [sys.executable, "tools/driver_sim.py"], "/tmp/verify_driver_sim.log"
    )
    done = next(
        (line for line in out.splitlines() if line.startswith("DONE:")), ""
    )
    n_rows_only = len(re.findall(r"^rows-only ", out, re.MULTILINE))
    results["driver_sim"] = {"rc": rc, "done": done, "rows_only": n_rows_only}
    ok = ok and rc == 0
    print(f"driver_sim: rc={rc} {done} (+{n_rows_only} rows-only)", flush=True)

    # Pin the verified tree (VERDICT r4 #2, tightened per r5 #7): record
    # git HEAD, and REFUSE a dirty source tree — a green record must name
    # one unambiguous commit. Doc/artifact-only dirt (.md, BENCH/
    # CORRECTNESS json, PROGRESS.jsonl — zero runtime surface) is allowed
    # and listed, so the gate itself appending to PROGRESS.jsonl can't
    # deadlock the next run.
    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=ROOT, capture_output=True,
            text=True,
        ).stdout.strip()
        dirt = [
            line[3:]
            for line in subprocess.run(
                ["git", "status", "--porcelain"], cwd=ROOT,
                capture_output=True, text=True,
            ).stdout.splitlines()
            if line.strip()
        ]
        source_dirt = [
            f
            for f in dirt
            if not (
                f.endswith((".md", ".jsonl"))
                or re.fullmatch(r"(BENCH|CORRECTNESS|LEAKCHECK|COPYCHECK)"
                                r"[._a-zA-Z0-9-]*\.json", f)
            )
        ]
        results["git_head"] = head
        results["git_dirty"] = bool(dirt)
        results["git_source_dirty"] = source_dirt
        if source_dirt:
            ok = False
            print(
                f"git: REFUSING dirty source tree ({source_dirt[:5]}…) — "
                "commit before verifying", flush=True,
            )
    except OSError:
        pass

    results["ok"] = ok
    with open(os.path.join(ROOT, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(results) + "\n")
    print(f"verify_all: {'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
