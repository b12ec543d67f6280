"""Interleaved A/B of the encode hot path against a reference commit.

Verdict r4 Next #1: calm-window encode_tokens measured ~20% slower than
r3's calm window; the suspect is the r4 per-block ``__sum`` stat
(blocks.py encode path) vs plain hypervisor band. This tool settles it
the only way that holds up on a noisy host: ALTERNATING runs of the same
job on the same input, one fresh subprocess+JVM per run, per-run steal%
recorded, medians compared.

Usage:
    python tools/encode_ab.py                 # 4 runs/side vs 20118ff
    python tools/encode_ab.py --runs 3 --ref <commit>
    python tools/encode_ab.py --worker <repo_root> <input> <out> <cpus>
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB_TREE = "/tmp/aisle_ab_ref"  # worktree of the reference commit
WORK = "/tmp/aisle_ab"


def _cpu_sample():
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    return vals[7] if len(vals) > 7 else 0, sum(vals)


def _steal_pct(a, b) -> float:
    dt = b[1] - a[1]
    return round(100.0 * (b[0] - a[0]) / dt, 2) if dt else 0.0


def _worker(repo_root: str, inp: str, out: str, cpus: int) -> None:
    """One timed encode in THIS process, code loaded from repo_root."""
    sys.path.insert(0, repo_root)
    import bench  # the side's own bench module — same measured unit

    spark = bench._session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the session so JVM/task-scheduler startup stays out of the wall
    spark.read.parquet(inp).count()
    c0 = _cpu_sample()
    t0 = time.time()
    bench._encode_job(spark, inp, out, parts=bench._parts_for(400000, cpus))
    wall = time.time() - t0
    steal = _steal_pct(c0, _cpu_sample())
    print(json.dumps({"wall": round(wall, 3), "steal_pct": steal}))
    spark.stop()


def _ensure_ref_tree(ref: str) -> str:
    want = subprocess.run(
        ["git", "-C", REPO, "rev-parse", ref],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    if os.path.exists(os.path.join(AB_TREE, "bench.py")):
        have = subprocess.run(
            ["git", "-C", AB_TREE, "rev-parse", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        if have == want:
            return AB_TREE
        # stale worktree from an earlier --ref: silently benchmarking the
        # wrong commit would produce a mislabeled perf verdict
        subprocess.run(
            ["git", "-C", REPO, "worktree", "remove", "--force", AB_TREE],
            capture_output=True,
        )
    shutil.rmtree(AB_TREE, ignore_errors=True)
    # drop any stale registration (directory-deleted-but-registered
    # worktrees make the following add fail fatally)
    subprocess.run(["git", "-C", REPO, "worktree", "prune"], capture_output=True)
    subprocess.run(
        ["git", "-C", REPO, "worktree", "add", "--detach", AB_TREE, want],
        check=True,
    )
    return AB_TREE


def _ensure_input(cpus: int) -> str:
    """Reuse the bench input if present; otherwise synthesize the same
    deterministic table once (both sides then read the identical file)."""
    for cand in (f"/tmp/aisle_bench/input_400000.parquet",
                 f"{WORK}/input_400000.parquet"):
        if os.path.exists(cand):
            return cand
    os.makedirs(WORK, exist_ok=True)
    sys.path.insert(0, REPO)
    import bench

    from aisle_spark.schema import synth_token_df

    spark = bench._session(f"local[{cpus}]", cpus)
    spark.sparkContext.setLogLevel("ERROR")
    inp = f"{WORK}/input_400000.parquet"
    synth_token_df(spark, 400000, slices=max(32, cpus * 2)).write.mode(
        "overwrite"
    ).parquet(inp)
    spark.stop()
    return inp


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(sys.argv[2], sys.argv[3], sys.argv[4], int(sys.argv[5]))
        return
    runs = 4
    ref = "20118ff"
    args = sys.argv[1:]
    if "--runs" in args:
        runs = int(args[args.index("--runs") + 1])
    if "--ref" in args:
        ref = args[args.index("--ref") + 1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ref_tree = _ensure_ref_tree(ref)
    inp = _ensure_input(cpus)
    os.makedirs(WORK, exist_ok=True)
    sides = [("r5", REPO), (f"ref:{ref}", ref_tree)]
    results: dict[str, list[dict]] = {name: [] for name, _ in sides}
    for i in range(runs):
        for name, root in sides:
            out = f"{WORK}/enc_{name.replace(':', '_')}"
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 root, inp, out, str(cpus)],
                capture_output=True, text=True,
                env={**os.environ, "PYTHONPATH": root},
            )
            line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else ""
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                sys.stderr.write(p.stderr[-2000:] + "\n")
                raise SystemExit(f"worker failed for {name} run {i}")
            results[name].append(r)
            print(f"run {i} {name:>12}: wall={r['wall']:7.3f}s "
                  f"steal={r['steal_pct']:.2f}%", flush=True)

    def med(xs):
        s = sorted(xs)
        return s[len(s) // 2] if len(s) % 2 else (s[len(s)//2 - 1] + s[len(s)//2]) / 2

    summary = {}
    for name, _ in sides:
        walls = [r["wall"] for r in results[name]]
        summary[name] = {
            "walls": walls,
            "median": round(med(walls), 3),
            "min": min(walls),
            "max_steal": max(r["steal_pct"] for r in results[name]),
        }
    a, b = summary["r5"], summary[f"ref:{ref}"]
    summary["delta_pct_median"] = round(100 * (a["median"] / b["median"] - 1), 1)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
