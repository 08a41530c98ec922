"""Run the real-TPU test lane and record TPUTESTS_r{N}.json.

Round-2 VERDICT ask #4: the TPU lane's green-ness was only provable by
re-running it; this records pass/fail counts and wall time as a committed
per-round artifact the driver can diff.

Usage (on the chip): python -m tools.run_tpu_lane [extra pytest args]
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys
import time


def next_round() -> int:
    from tools.artifact import artifact_round

    return artifact_round()


def main() -> None:
    env = dict(os.environ, RTP_BACKEND="tpu")
    cmd = [
        sys.executable, "-m", "pytest", "tests/", "-m", "tpu", "-q", "-rA",
        *sys.argv[1:],
    ]
    t0 = time.perf_counter()
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    dt = time.perf_counter() - t0
    tail = proc.stdout.strip().splitlines()

    counts = {}
    for key in ("passed", "failed", "error", "skipped", "deselected"):
        m = re.search(rf"(\d+) {key}", proc.stdout)
        counts[key] = int(m.group(1)) if m else 0
    tests = re.findall(r"^(PASSED|FAILED|ERROR) (\S+)", proc.stdout, re.M)

    out = {
        "lane": "RTP_BACKEND=tpu pytest -m tpu",
        "returncode": proc.returncode,
        "seconds": round(dt, 1),
        **counts,
        "tests": [f"{status} {name}" for status, name in tests],
        "summary": tail[-1] if tail else "",
    }
    path = f"TPUTESTS_r{next_round():02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"artifact": path, **counts, "seconds": out["seconds"]}))
    if proc.returncode != 0:
        print(proc.stdout[-4000:])
        sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
