"""Paired interleaved A/B (r12 discipline): alternate fresh sessions
over tree A (baseline worktree) and tree B (working tree), N rounds
each, and report per-entry medians + ratio. Host bands hit both arms
equally; per-arm medians defend against one-off spikes.

Usage: python tools/r13_ab_loop.py <treeA> <treeB> <entries_csv>
       [rounds] [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

treeA, treeB = sys.argv[1], sys.argv[2]
entries = sys.argv[3]
rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 3
sf_dir = sys.argv[5] if len(sys.argv) > 5 else "/root/testdata/sf0.1"

HERE = os.path.dirname(os.path.abspath(__file__))


def run(tree: str) -> dict:
    p = subprocess.run(
        [
            sys.executable,
            os.path.join(HERE, "r13_ab_session.py"),
            tree,
            entries,
            sf_dir,
        ],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [ln for ln in p.stdout.strip().splitlines() if ln.startswith("{")]
    if not line:
        print(p.stdout[-2000:], file=sys.stderr)
        print(p.stderr[-2000:], file=sys.stderr)
        raise RuntimeError(f"session over {tree} produced no JSON")
    return json.loads(line[-1])


def med(xs):
    s = sorted(xs)
    return s[len(s) // 2]


resA, resB = [], []
for r in range(rounds):
    resA.append(run(treeA))
    print(f"round {r} A: {resA[-1]}", flush=True)
    resB.append(run(treeB))
    print(f"round {r} B: {resB[-1]}", flush=True)

names = entries.split(",")
print(f"{'entry':24s} {'A(base)':>9s} {'B(new)':>9s} {'B/A':>6s}")
for n in names:
    a = med([x[n] for x in resA])
    b = med([x[n] for x in resB])
    print(f"{n:24s} {a:9.3f} {b:9.3f} {b / a:6.2f}")
