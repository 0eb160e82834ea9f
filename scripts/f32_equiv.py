#!/usr/bin/env python3
"""f32 decision-equivalence sweep at PRODUCTION widths (for PARITY.md).

The CPU test suite runs the same protocol at moderate widths
(tests/test_f32_e2e.py); this script runs it at the reference's production
band widths (realign 300 / scoring 100 / point 20) on the attached device
and reports the per-phase divergence rate: both engines receive the same
candidate proposals (the exact engine's), so any sequence difference is a
pure f32-vs-f64 decision difference.

Usage: python scripts/f32_equiv.py [n_regions] [--ref-len 1000]
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", type=int, nargs="?", default=10)
    ap.add_argument("--ref-len", type=int, default=1000)
    ap.add_argument("--coverage", type=int, default=10)
    args = ap.parse_args()

    from poreseq_tpu.api import swalign
    from poreseq_tpu.engine.exact import ExactEngine
    from poreseq_tpu.engine.types import AlignData
    from poreseq_tpu.sim import simulate_session

    params = dict(realign_width=300, scoring_width=100, point_width=20,
                  verbose=0)
    stats = dict(regions=0, phase1_div=0, viterbi_div=0, refine_div=0,
                 degraded=0)
    details = []
    for i in range(args.n):
        seed = 1000 + 37 * i
        cov = args.coverage - 2 + (i % 3) * 2
        derr = [0.02, 0.03, 0.05][i % 3]

        def mk(backend):
            pa, truth = simulate_session(
                np.random.default_rng(seed), ref_len=args.ref_len,
                coverage=cov, draft_error=derr, backend=backend,
                params=dict(params))
            return pa, truth

        pT, truth = mk("tpu")
        pE, _ = mk("exact")
        stats["regions"] += 1
        div = None

        pT.Mutate(reps=2)
        pE.Mutate(reps=2)
        if pT.sequence != pE.sequence:
            stats["phase1_div"] += 1
            div = "phase1"
        if div is None:
            cands = ExactEngine().viterbi_mutate(
                AlignData.from_session(pE).events, 16, 0.05, 0.01, 0.33, 0.75)
            pT.Mutate(seqs=list(cands), reps=2)
            pE.Mutate(seqs=list(cands), reps=2)
            if pT.sequence != pE.sequence:
                stats["viterbi_div"] += 1
                div = "viterbi"
        if div is None:
            pT.Refine()
            pE.Refine()
            if pT.sequence != pE.sequence:
                stats["refine_div"] += 1
                div = "refine"

        aT = swalign(pT.sequence, truth)[0]
        aE = swalign(pE.sequence, truth)[0]
        if div and (abs(aT - aE) >= 0.5 or aT < 99.0):
            stats["degraded"] += 1
        details.append(dict(seed=seed, cov=cov, derr=derr, diverged=div,
                            acc_tpu=round(float(aT), 2),
                            acc_exact=round(float(aE), 2)))
        sys.stderr.write("region {}: {} (tpu {:.2f}% exact {:.2f}%)\n".format(
            i, div or "MATCH", aT, aE))

    print(json.dumps(dict(stats=stats, details=details)))


if __name__ == "__main__":
    main()
