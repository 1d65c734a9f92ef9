"""Run the FULL headline bench at a 10×-replicated sf1-equivalent dataset
(VERDICT r2 #5): scaling regressions — not just constant-factor ones —
get caught by a recorded artifact, not hand-run probes.

Builds /tmp/bench10x/sf1.0 from $SPARK_GRAFT_SF_DIR (default sf0.1) via
the scale-probe replicator (disjoint id spaces, splittable row groups),
then executes bench.py against it in a fresh process. Writes the bench
JSON line, augmented with per-query ratios vs a reference bench JSON, to
the output path.

Usage: python tools/bench_10x.py [out.json [reference_bench.json]]
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

OUT_DIR = "/tmp/bench10x/sf1.0"


def main() -> int:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        ROOT, "BENCH_10x.json"
    )
    ref_path = sys.argv[2] if len(sys.argv) > 2 else None

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from tools.scale_probe import build_replica

    print(f"replicating {src} -> {OUT_DIR} (10x)", flush=True)
    build_replica(src, out_1x=None, out_10x=OUT_DIR, factor=10)

    env = os.environ | {
        "SPARK_GRAFT_SF_DIR": OUT_DIR,
        # keep the sf0.1 BENCH_LOCAL.json artifact intact — this harness
        # writes its own output file below
        "SPARK_GRAFT_BENCH_OUT": os.path.join(
            ROOT, "BENCH_10x_LOCAL.json"
        ),
        # 10x input bytes → 4x the default initial shuffle width (what a
        # cluster's scan-stats sizing would pick); AQE still coalesces
        "SPARK_GRAFT_SHUFFLE_PARTS": os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTS", "32"
        ),
    }
    proc = subprocess.run(
        [sys.executable, "bench.py"], cwd=ROOT, env=env,
        capture_output=True, text=True,
    )
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("{")), None
    )
    if proc.returncode != 0 or line is None:
        sys.stderr.write(proc.stdout[-2000:] + proc.stderr[-2000:])
        return 1
    result = json.loads(line)
    result["replicated_from"] = src
    result["factor"] = 10

    if ref_path and os.path.exists(ref_path):
        with open(ref_path) as fh:
            ref = json.load(fh)
        ratios = {
            q: round(result["queries"][q] / ref["queries"][q], 2)
            for q in result["queries"]
            if q in ref.get("queries", {}) and ref["queries"][q] > 0
        }
        result["ratio_vs"] = os.path.basename(ref_path)
        result["ratios"] = ratios

    with open(out_path, "w") as fh:
        fh.write(json.dumps(result) + "\n")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
