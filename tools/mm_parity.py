#!/usr/bin/env python
"""Generate the MatrixMarket parity table: our regression --mm results
side by side with the reference's own golden transcript
(/root/reference/test/out/reg_mm.out), per problem.

The reference runs ~30 solver configs per matrix and its golden file logs
223 ATTENTION lines — most of these matrices are nonsymmetric and/or
ill-conditioned, so high ATTENTION rates ARE the reference behavior.  The
table records, per matrix: reference configs/attention vs ours, plus the
matrices only our pivoted ILUtp solves.

Usage: python tools/mm_parity.py [our_reg_mm.out] > .../MM_PARITY.md
"""
import os
import re
import sys

REF = "/root/reference/test/out/reg_mm.out"
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DEFAULT_OURS = os.path.join(REPO, "faspsolver_tpu", "regression", "golden",
                            "reg_mm.out")


def parse_reference(path):
    """{matrix: (n_configs, n_attention)} from the reference transcript."""
    out = {}
    cur = None
    for line in open(path, errors="replace"):
        m = re.search(r"reading file \.\./data/(\S+?)\.mtx", line)
        if m:
            cur = m.group(1)
            out[cur] = [0, 0]
            continue
        if cur is None:
            continue
        if line.startswith("Calling"):
            out[cur][0] += 1
        if "ATTENTION" in line:
            out[cur][1] += 1
    return out


def parse_ours(path):
    out = {}
    for line in open(path):
        m = re.match(r"(\S+)\s+(.+?)\s+iters=", line)
        if not m:
            continue
        prob = m.group(1)
        rec = out.setdefault(prob, [0, 0])
        rec[0] += 1
        if "ATTENTION" in line:
            rec[1] += 1
    return out


def main(argv):
    ours_path = argv[0] if argv else DEFAULT_OURS
    ref = parse_reference(REF)
    ours = parse_ours(ours_path)
    print("# MatrixMarket regression parity vs reference reg_mm.out")
    print()
    print("Reference golden transcript: `test/out/reg_mm.out` "
          f"({sum(v[0] for v in ref.values())} config runs, "
          f"{sum(v[1] for v in ref.values())} ATTENTION).")
    print(f"Ours: `{os.path.relpath(ours_path, REPO)}` "
          f"({sum(v[0] for v in ours.values())} config runs, "
          f"{sum(v[1] for v in ours.values())} ATTENTION).")
    print()
    print("| matrix | ref configs | ref ATTENTION | ref fail% "
          "| our configs | our ATTENTION | our fail% |")
    print("|---|---|---|---|---|---|---|")
    for name in sorted(set(ref) | set(ours)):
        rc, ra = ref.get(name, (0, 0))
        oc, oa = ours.get(name, (0, 0))
        rf = f"{100.0 * ra / rc:.0f}%" if rc else "-"
        of = f"{100.0 * oa / oc:.0f}%" if oc else "-"
        print(f"| {name} | {rc} | {ra} | {rf} | {oc} | {oa} | {of} |")
    print()
    print("Notes: the reference set includes s2rmq4m1/bcsstk16 "
          "(.MISSING_LARGE_BLOBS — not shipped, so not runnable here) and "
          "does not run lns__131/nos7 (our additions).  e05r0500 and "
          "gre__115 fail 81%/73% of reference configs but solve to 1e-10 "
          "here via the in-house pivoted ILUtp (and gre__115 via ILUt "
          "with the reference's n/2 fill rule); watt__1 is "
          "conditioning-limited (~1e15) for any f64 solver on the "
          "max-diff 1e-4 rule.")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
