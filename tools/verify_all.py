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

    if "--skip-pytest" not in sys.argv:
        rc, out = run(
            [sys.executable, "-m", "pytest", "tests/", "-q"],
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

    results["ok"] = ok
    with open(os.path.join(ROOT, "PROGRESS.jsonl"), "a") as fh:
        fh.write(json.dumps(results) + "\n")
    print(f"verify_all: {'PASS' if ok else 'FAIL'}", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
