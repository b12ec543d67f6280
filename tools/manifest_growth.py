"""Measure manifest/snapshot commit bytes vs table size — the growth
discipline behind delta-encoded snapshots (pipeline._snapshot_payload).

Simulates a table of N committed files receiving single-file appends and
reports bytes persisted per commit for (a) the always-full snapshot
scheme (pre-r4) and (b) the delta scheme actually in use, plus the
replay cost of materializing a version at the end of a delta chain.

Run: python tools/manifest_growth.py [n_files ...]
Prints one JSON line per N.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n_files: int, appends: int = 16) -> dict:
    from aisle_spark.pipeline import _SNAP_DIR, publish_manifest, read_snapshot

    root = tempfile.mkdtemp(prefix="aisle_growth_")
    try:
        files = [f"part-{i:05d}-0123456789abcdef0123456789abcdef.parquet"
                 for i in range(n_files)]
        stats = {f: {"ts": [1704067200000000 + i, 1704067200000000 + i + 60_000_000],
                     "n_tok": [1, 4096]} for i, f in enumerate(files)}
        publish_manifest(None, root, {"files": files, "file_stats": stats})
        full_bytes = os.path.getsize(f"{root}/{_SNAP_DIR}/v{1:08d}.json")
        delta_sizes = []
        for k in range(appends):
            f = f"part-new{k:05d}-0123456789abcdef0123456789abcdef.parquet"
            files = sorted(files + [f])
            stats = {**stats, f: {"ts": [0, 1], "n_tok": [1, 4096]}}
            v = publish_manifest(None, root, {"files": files, "file_stats": stats})
            delta_sizes.append(
                os.path.getsize(f"{root}/{_SNAP_DIR}/v{v:08d}.json")
            )
        t0 = time.time()
        snap = read_snapshot(None, root, v)
        replay_ms = round((time.time() - t0) * 1000, 2)
        assert len(snap["files"]) == n_files + appends
        return {
            "n_files": n_files,
            "full_snapshot_bytes": full_bytes,
            "delta_snapshot_bytes_median": sorted(delta_sizes)[len(delta_sizes) // 2],
            "delta_vs_full": round(
                sorted(delta_sizes)[len(delta_sizes) // 2] / full_bytes, 5
            ),
            "replay_chain_ms": replay_ms,
            "note": "current manifest (_aisle_files.json) stays full: one "
                    "O(files) write per commit remains; snapshots are the "
                    "per-commit growth term this bounds",
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    ns = [int(a) for a in sys.argv[1:]] or [1_000, 10_000, 100_000]
    for n in ns:
        print(json.dumps(measure(n)))
