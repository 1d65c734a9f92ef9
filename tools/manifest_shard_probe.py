"""Sharded-manifest scale probe (VERDICT r7 #1 done-criterion).

Builds a snapshot table with ≥10k data files (hardlinked parquet parts —
the probe exercises the METADATA plane; planning never opens data files
when manifest stats are present) under a 100-day identity partition spec,
then measures:

1. plan-time manifest bytes read for a 1-day predicate vs a full scan —
   should drop ~proportionally to selectivity (manifest-level skipping);
2. what a 1-file commit writes: new segment files / bytes vs the total
   manifest (should be O(1) segments, not a full rewrite);
3. head-only metadata ops (sort order / constraints / txn stamps) parse
   bytes vs the hydrated manifest.

4. (two-level heads, VERDICT r8 #3) group-layer stats: head bytes vs
   total manifest bytes, groups read by a selective plan, and group/
   segment reads of a 1-file commit (must be ZERO on a pure append).

``--fake-data`` skips materializing data files beyond the seed (paths
are recorded in the manifest but never opened — every measured path is
metadata-plane, so the probe is identical; it makes the 10M-file row
tractable without 10M inodes).

Usage: python tools/manifest_shard_probe.py [--files 10000] [--days 100]
       [--fake-data]
Prints one JSON line; recorded in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(table: str, n_files: int, n_days: int, fake: bool = False) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from web_analytics_on_aws_spark.sources import snapshots as S

    os.makedirs(os.path.join(table, "data", "seed"), exist_ok=True)
    seed = os.path.join(table, "data", "seed", "part-0.parquet")
    pq.write_table(
        pa.table({"id": list(range(100)), "day": ["d000"] * 100}), seed
    )
    files, fp, fs = [], {}, {}
    rows_per = 100
    link_src = seed
    for i in range(n_files):
        day = f"d{i % n_days:03d}"
        p = os.path.join(table, "data", "seed", f"part-{i:06d}.parquet")
        if i and not fake:
            if i % 50000 == 0:
                shutil.copy(seed, p)  # fresh inode — hardlink cap is ~65k
                link_src = p
            else:
                os.link(link_src, p)
        files.append(p)
        fp[p] = {"spec_id": 1, "values": {"day": day}}
        lo = i * rows_per
        fs[p] = {
            "rows": rows_per,
            "bytes": os.path.getsize(seed),
            "cols": {"id": [lo, lo + rows_per - 1], "day": [day, day]},
            "types": {"id": "bigint", "day": "string"},
        }
    spec = {
        "current": 1,
        "specs": {
            "1": [
                {
                    "name": "day",
                    "source": "day",
                    "transform": "identity",
                    "source_type": "string",
                }
            ]
        },
    }
    S._publish(
        table, 1, files, "backfill",
        partitioning=spec, file_partitions=fp, file_stats=fs,
    )


def seg_bytes(table: str) -> dict[str, int]:
    segdir = os.path.join(table, "manifests", "segs")
    if not os.path.isdir(segdir):
        return {}
    return {
        fn: os.path.getsize(os.path.join(segdir, fn))
        for fn in os.listdir(segdir)
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=10000)
    ap.add_argument("--days", type=int, default=100)
    ap.add_argument("--fake-data", action="store_true")
    args = ap.parse_args()

    from pyspark.sql.datasource import EqualTo

    from web_analytics_on_aws_spark.sources import snapshots as S
    from web_analytics_on_aws_spark.sources.snapshot_datasource import (
        SnapshotReader,
        planned_files,
    )

    d = tempfile.mkdtemp(prefix="shardprobe-")
    table = os.path.join(d, "t")
    try:
        t0 = time.perf_counter()
        build(table, args.files, args.days, fake=args.fake_data)
        build_s = time.perf_counter() - t0

        head_path = S._manifest_path(table, 1)
        head_bytes = os.path.getsize(head_path)
        total_seg = sum(seg_bytes(table).values())

        # (1) plan-time manifest bytes: selective vs full
        r = SnapshotReader({"path": table}, None)
        r.pushFilters([EqualTo(("day",), "d007")])
        t0 = time.perf_counter()
        kept = len(planned_files(r.partitions()))
        plan_selective_s = time.perf_counter() - t0
        sel = r.plan_stats

        r2 = SnapshotReader({"path": table}, None)
        t0 = time.perf_counter()
        total_files = len(planned_files(r2.partitions()))
        plan_full_s = time.perf_counter() - t0
        full = r2.plan_stats or {
            "manifest_bytes_read": head_bytes + total_seg,
            "segments_read": len(seg_bytes(table)),
            "segments_total": len(seg_bytes(table)),
        }

        # (2) 1-file commit via the DELTA publish (the streaming append
        # path): count prior-segment reads — must be ZERO — and what gets
        # written
        before = seg_bytes(table)
        extra = os.path.join(table, "data", "seed", "part-extra.parquet")
        os.link(os.path.join(table, "data", "seed", "part-0.parquet"), extra)
        reads = []
        greads = []
        real_read = S._read_segment
        real_gread = S._read_group
        S._read_segment = lambda t, r: (reads.append(r), real_read(t, r))[1]
        S._read_group = lambda t, r: (greads.append(r), real_gread(t, r))[1]
        t0 = time.perf_counter()
        S._publish(
            table, 2, None, "append",
            file_partitions={
                extra: {"spec_id": 1, "values": {"day": "d000"}}
            },
            file_stats={
                extra: {
                    "rows": 100,
                    "bytes": os.path.getsize(extra),
                    "cols": {"id": [0, 99], "day": ["d000", "d000"]},
                    "types": {"id": "bigint", "day": "string"},
                }
            },
            new_files=[extra], removed_files=[],
        )
        commit_s = time.perf_counter() - t0
        S._read_segment = real_read
        S._read_group = real_gread
        after = seg_bytes(table)
        new_segs = {k: v for k, v in after.items() if k not in before}

        # (3) head-only ops never hydrate
        t0 = time.perf_counter()
        S.table_constraints(table)
        S.table_sort_order(table)
        head_only_s = time.perf_counter() - t0

        # (5) fork surface (VERDICT r9 #6): clone of the full table must
        # be O(head) — zero segments written, zero prior segment/group
        # reads — and vacuum with 10 retained versions sharing segments
        # must fold the live set reading each distinct group/segment
        # once per protected table walk (root + registered clone).
        from web_analytics_on_aws_spark.sources import refs as R

        for v in range(3, 11):  # grow the chain to 10 versions
            ev = os.path.join(
                table, "data", "seed", f"part-extra{v}.parquet"
            )
            os.link(
                os.path.join(table, "data", "seed", "part-0.parquet"), ev
            )
            S._publish(
                table, v, None, "append",
                file_partitions={
                    ev: {"spec_id": 1, "values": {"day": "d000"}}
                },
                file_stats={
                    ev: {
                        "rows": 100,
                        "bytes": os.path.getsize(ev),
                        "cols": {"id": [0, 99], "day": ["d000", "d000"]},
                        "types": {"id": "bigint", "day": "string"},
                    }
                },
                new_files=[ev], removed_files=[],
            )
        reads.clear()
        greads.clear()
        S._read_segment = lambda t, r: (reads.append(r), real_read(t, r))[1]
        S._read_group = lambda t, r: (greads.append(r), real_gread(t, r))[1]
        clone_dir = os.path.join(d, "clone")
        t0 = time.perf_counter()
        base_v = R.clone_table(table, clone_dir)
        clone_s = time.perf_counter() - t0
        S._read_segment = real_read
        S._read_group = real_gread
        clone_head_bytes = os.path.getsize(
            S._manifest_path(clone_dir, base_v)
        )
        clone_wrote_segs = os.path.isdir(
            os.path.join(clone_dir, "manifests", "segs")
        )
        t0 = time.perf_counter()
        vac_deleted = S.vacuum(table, retain_last=10)
        vacuum_s = time.perf_counter() - t0

        out = {
            "files": args.files,
            "days": args.days,
            "build_sec": round(build_s, 3),
            "head_bytes": head_bytes,
            "segment_files": len(before),
            "segment_bytes_total": total_seg,
            "groups_total": len(
                S._read_manifest_head(table, 1).get("groups", [])
            ),
            "selective": {
                "pred": "day = d007",
                "kept_files": kept,
                "groups_read": sel.get("groups_read", 0),
                "groups_total": sel.get("groups_total", 0),
                "segments_read": sel["segments_read"],
                "segments_total": sel["segments_total"],
                "manifest_bytes_read": sel["manifest_bytes_read"],
                "plan_sec": round(plan_selective_s, 4),
            },
            "full": {
                "kept_files": total_files,
                "manifest_bytes_read": full["manifest_bytes_read"],
                "plan_sec": round(plan_full_s, 4),
            },
            "bytes_ratio": round(
                sel["manifest_bytes_read"] / full["manifest_bytes_read"], 4
            ),
            "selectivity": round(1.0 / args.days, 4),
            "one_file_commit": {
                "new_segment_files": len(new_segs),
                "new_segment_bytes": sum(new_segs.values()),
                "reused_segment_files": len(before),
                "prior_segments_read": len(reads),
                "prior_groups_read": len(greads),
                "commit_sec": round(commit_s, 3),
                "head_v2_bytes": os.path.getsize(
                    S._manifest_path(table, 2)
                ),
            },
            "head_only_ops_sec": round(head_only_s, 5),
            "fork": {
                "versions_retained": 10,
                "clone_sec": round(clone_s, 4),
                "clone_head_bytes": clone_head_bytes,
                "clone_wrote_segments": clone_wrote_segs,
                "clone_prior_segments_read": len(reads),
                "clone_prior_groups_read": len(greads),
                "vacuum_sec": round(vacuum_s, 3),
                "vacuum_deleted": vac_deleted,
            },
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
