"""Regression/benchmark harness — the tetra-rx-tests.sh analogue.

Reference behaviour: src/tetra-rx-tests.sh runs tetra-rx over recorded
.bits captures, counts 'CRC COMP: ... OK' lines as correct frames,
times the run, and stores `<frames> <seconds>` keyed by
(input-sha256, git-rev) so revisions compare as ratios.

Usage:  python benchmarks/harness.py capture1.bits [capture2.cfile ...]
Results accumulate in benchmarks/results/<sha>/<git-rev>.
"""
from __future__ import annotations

import hashlib
import json
import pathlib
import subprocess
import sys
import time

import numpy as np

RESULTS = pathlib.Path(__file__).parent / "results"


def git_rev() -> str:
    try:
        return subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=pathlib.Path(__file__).parent.parent).decode().strip()
    except Exception:
        return "unknown"


def run_capture(path: str) -> dict:
    from tetra_tpu.rx import TetraReceiver
    from tetra_tpu.io.inputs import load_capture, capture_to_bits

    kind, data = load_capture(path)
    sha = hashlib.sha256(pathlib.Path(path).read_bytes()).hexdigest()[:16]

    crc_ok_lines = 0

    def log(*args):
        nonlocal crc_ok_lines
        line = " ".join(str(a) for a in args)
        if "CRC COMP:" in line and line.endswith("OK"):
            crc_ok_lines += 1

    rx = TetraReceiver(log=log)
    bits = capture_to_bits(kind, data)
    t0 = time.perf_counter()
    stats = rx.process_bits(bits)
    dt = time.perf_counter() - t0

    result = {
        "input_sha": sha, "kind": kind, "git_rev": git_rev(),
        "frames_ok": stats.crc_ok, "frames_wrong": stats.crc_wrong,
        "bursts": stats.bursts, "seconds": round(dt, 3),
        "bits": int(len(bits)),
        "realtime_factor": round(len(bits) / 36000.0 / dt, 2) if dt else None,
    }
    outdir = RESULTS / sha
    outdir.mkdir(parents=True, exist_ok=True)
    outfile = outdir / f"{result['git_rev']}.json"
    outfile.write_text(json.dumps(result, indent=1))

    # compare against prior revisions (the script's ratio output)
    for prior in sorted(outdir.glob("*.json")):
        if prior == outfile:
            continue
        p = json.loads(prior.read_text())
        if p.get("seconds"):
            print(f"  vs {p['git_rev']}: frames {result['frames_ok']}/{p['frames_ok']}"
                  f" time ratio {result['seconds'] / p['seconds']:.2f}")
    return result


def main(argv):
    for path in argv:
        print(json.dumps(run_capture(path)))


if __name__ == "__main__":
    main(sys.argv[1:])
