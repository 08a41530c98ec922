"""Aggregate the kernel micro-probes into one committed artifact.

Round-3 VERDICT weak #8: the probe numbers that drive design decisions
(unroll curve, sync cost, fwd/record/replay split, per-depth marginals)
lived only in docstrings — a regression in these primitives was invisible
to the driver. This runs every probe IN ONE PROCESS (one device client —
the tunneled chip charges ~10 min acquisition per new client) and writes
KPROBES_r*.json.

Usage: python -m tools.kprobes            (full set)
       KPROBES_SKIP=kexp,kdepth ...       (skip named probes)
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import sys

from raytracingproject_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def _captured(fn, argv):
    """Run a probe main() with stdout captured; returns its lines."""
    old_argv = sys.argv
    buf = io.StringIO()
    try:
        sys.argv = argv
        with contextlib.redirect_stdout(buf):
            fn()
    finally:
        sys.argv = old_argv
    lines = [ln for ln in buf.getvalue().splitlines() if ln.strip()]
    for ln in lines:
        print(ln, flush=True)
    return lines


def main() -> None:
    skip = set(os.environ.get("KPROBES_SKIP", "").split(","))
    artifact: dict = {}

    if "kgrad" not in skip:
        import traceback

        from tools import kgrad

        # round-5 probe sets: two-phase pipeline + record-collapse bisection
        os.environ.setdefault("KGRAD_EXTRA", "twophase,bisect")
        for key, args in (("kgrad_d8", (200, 2, 8)),
                          ("kgrad_d50", (400, 2, 50)),
                          ("kgrad_d50_flagship", (1200, 1, 50))):
            try:
                artifact[key] = kgrad.run(*args)
            except Exception:
                traceback.print_exc()
                artifact[key] = {"error": "run failed; see device log"}

    if "kexp" not in skip:
        from tools import kexp

        artifact["kexp_lines"] = _captured(kexp.main, ["kexp"])

    if "kfront" not in skip:
        from tools import kfront

        artifact["kfront_lines"] = _captured(kfront.main, ["kfront"])

    if "kdepth" not in skip:
        from tools import kdepth

        lines = _captured(kdepth.main, ["kdepth", "1", "4", "16"])
        artifact["kdepth_rows"] = [
            json.loads(ln) for ln in lines if ln.startswith("{")
        ]

    from tools.artifact import artifact_path

    out = artifact_path("KPROBES")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({"artifact": out}), flush=True)


if __name__ == "__main__":
    main()
