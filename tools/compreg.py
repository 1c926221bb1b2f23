#!/usr/bin/env python
"""compreg: diff a fresh regression run against the committed golden
transcripts (reference analog: util/compreg.sh, which sdiffs out/reg.out
vs out/reg.new).

Usage:
    python tools/compreg.py            # run core matrix, diff vs golden
    python tools/compreg.py --mm       # MatrixMarket set
    python tools/compreg.py --matfree  # operator-closure set
    python tools/compreg.py --bsr      # SPE01 BSR set

Lines are compared on (problem, config, PASS/ATTENTION) — iteration counts
and residuals may drift a little across numeric library versions; a
PASS <-> ATTENTION flip is the regression signal.
"""
import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
GOLDEN = os.path.join(REPO, "faspsolver_tpu", "regression", "golden")

MODES = {"--mm": "reg_mm.out", "--matfree": "reg_mf.out",
         "--bsr": "reg_bsr.out"}


def status_map(text: str):
    out = {}
    for line in text.splitlines():
        m = re.match(r"(\S+)\s+(.+?)\s+iters=", line)
        if not m:
            continue
        flag = "PASS" if line.rstrip().endswith("PASS") else "ATTENTION"
        out[(m.group(1), m.group(2).strip())] = flag
    return out


def main(argv):
    mode = next((a for a in argv if a in MODES), None)
    golden_file = os.path.join(GOLDEN, MODES.get(mode, "reg.out"))
    if not os.path.exists(golden_file):
        print(f"no golden transcript at {golden_file}")
        return 2
    cmd = [sys.executable, "-m", "faspsolver_tpu.regression"] + \
        ([mode] if mode else [])
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    fresh = subprocess.run(cmd, capture_output=True, text=True,
                           env=env).stdout
    gold = status_map(open(golden_file).read())
    new = status_map(fresh)
    bad = 0
    for key, flag in sorted(gold.items()):
        nflag = new.get(key)
        if nflag is None:
            print(f"MISSING   {key[0]:18s} {key[1]}")
            bad += 1
        elif nflag != flag:
            print(f"CHANGED   {key[0]:18s} {key[1]}: {flag} -> {nflag}")
            bad += 1
    for key in sorted(set(new) - set(gold)):
        print(f"NEW       {key[0]:18s} {key[1]}: {new[key]}")
    print(f"compreg: {len(gold)} golden lines, {bad} regressions")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
