"""Interleaved commit-A/B benchmark driver (VERDICT r02 item 4).

Runs BENCH/ab_probe.py against three engine versions — r01
(9239bf1), r02 (0ff76aa), and the current tree — in the SAME window,
interleaved r01,r02,head per rep, each probe in its own subprocess
(resident-JVM rule, see ../BENCH/BASELINE.md).  Prints a per-metric
min-of-N table.  Worktrees are expected at /tmp/wt_r01 and
/tmp/wt_r02 (`git worktree add /tmp/wt_r01 9239bf1` etc.).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE = os.path.join(REPO, "BENCH", "ab_probe.py")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "3"))
# AB_VERSIONS="r03:/tmp/wt_r03,r04:/tmp/wt_r04,head" — `head` (no
# path) means the live repo; default keeps the r02 study's trio.
_SPEC = os.environ.get("AB_VERSIONS", "r01:/tmp/wt_r01,r02:/tmp/wt_r02,head")
VERSIONS = [
    (part.split(":", 1)[0],
     part.split(":", 1)[1] if ":" in part else REPO)
    for part in _SPEC.split(",")
]


def main() -> None:
    base = "/dev/shm" if os.path.isdir("/dev/shm") else None
    tmp = tempfile.mkdtemp(prefix="sis_ab_", dir=base)
    results: dict[str, list[dict]] = {tag: [] for tag, _ in VERSIONS}
    for rep in range(REPS):
        for tag, path in VERSIONS:
            env = {**os.environ, "PYTHONPATH": path,
                   "SPARK_DRIVER_MEM": "24g"}
            # cwd MUST be the version root: Spark python workers resolve
            # module-level kernel functions (pickled by reference) via
            # their own sys.path, which includes the inherited cwd — a
            # cwd of the live repo silently mixes HEAD worker code into
            # an old-commit driver
            res = subprocess.run(
                [sys.executable, PROBE, SF_DIR, tag, tmp],
                capture_output=True, text=True, timeout=1800, env=env,
                cwd=path,
            )
            if res.returncode != 0:
                sys.stderr.write(f"{tag} rep{rep} FAILED:\n"
                                 f"{res.stderr[-2000:]}\n")
                continue
            row = json.loads(res.stdout.strip().splitlines()[-1])
            results[tag].append(row)
            sys.stderr.write(f"{tag} rep{rep}: {row}\n")
    mins: dict[str, dict[str, float]] = {}
    for tag, rows in results.items():
        if not rows:
            continue
        keys = [k for k in rows[0] if k != "tag"]
        mins[tag] = {k: min(r[k] for r in rows) for k in keys}
    print(json.dumps({"sf_dir": SF_DIR, "reps": REPS, "min_of_n": mins},
                     indent=2))


if __name__ == "__main__":
    main()
