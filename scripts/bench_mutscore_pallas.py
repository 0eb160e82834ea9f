#!/usr/bin/env python3
"""Validate + time the fused Pallas mutation group scorer on the real chip.

Builds Refine-scale and Mutate-scale ScoreMutations workloads (synthetic
sessions; the same shapes PERF.md profiles: 1 kb regions, point_width 20 /
scoring_width 100) and runs score_mutations_multi twice per workload —
PSQ_PALLAS_MUTSCORE=0 (XLA group kernel) vs =1 (fused Pallas) — comparing
scores and timing steady-state calls.

The XLA kernel is op-overhead bound at ~2.3 s per Refine-scale 8-region call
(~122k vector-op dispatches); the Pallas kernel's useful-FLOP budget is ~10 ms
(PERF.md round-4 target: <=0.3 s).

Usage: python scripts/bench_mutscore_pallas.py [--regions 8] [--repeat 3]
"""

import argparse
import os
import sys
import time

import numpy as np


def build_sessions(R, ref_len, coverage, seed=0):
    from poreseq_tpu.sim import simulate_session

    sessions = []
    for r in range(R):
        rng = np.random.default_rng(seed + r)
        pa, _ = simulate_session(rng, ref_len=ref_len, coverage=coverage,
                                 draft_error=0.02)
        sessions.append(pa)
    return sessions


def point_muts(seq):
    from poreseq_tpu.engine.driver import find_point_mutations

    class P:
        verbose = 0

    class D:
        params = P()

    d = D()
    d.sequence = seq
    return find_point_mutations(d)


def run_once(mode, sessions, muts_list, widths, repeat):
    from poreseq_tpu.engine.types import AlignData

    os.environ["PSQ_PALLAS_MUTSCORE"] = mode
    import jax.numpy as jnp

    from poreseq_tpu.engine.tpu import TpuEngine

    eng = TpuEngine(dtype=jnp.float32)
    times = []
    out = None
    for it in range(repeat + 1):          # +1 warmup (compiles)
        datas = [AlignData.from_session(pa) for pa in sessions]
        for d in datas:
            d.params.scoring_width = widths
        t0 = time.time()
        res = eng.score_mutations_multi(datas, muts_list)
        eng.flush_ref_likes()
        dt = time.time() - t0
        if it > 0:
            times.append(dt)
        out = res
    scores = [np.array([m.score for m in ms]) for ms in out]
    return scores, (min(times), float(np.median(times)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--regions", type=int, default=8)
    ap.add_argument("--ref-len", type=int, default=1000)
    ap.add_argument("--coverage", type=int, default=10)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--scale", choices=["refine", "mutate", "both"],
                    default="both")
    args = ap.parse_args()

    sessions = build_sessions(args.regions, args.ref_len, args.coverage)

    scales = []
    if args.scale in ("refine", "both"):
        scales.append(("refine", 12,
                       [point_muts(pa.sequence) for pa in sessions]))
    if args.scale in ("mutate", "both"):
        # Mutate-scale: fewer, longer mutations at scoring width
        rng = np.random.default_rng(7)
        from poreseq_tpu.core.regions import MutationInfo

        def rand_muts(seq, n):
            ms = []
            for _ in range(n):
                st = int(rng.integers(0, len(seq) - 12))
                ln = int(rng.integers(1, 9))
                m = MutationInfo()
                m.start = st
                m.orig = seq[st : st + ln]
                m.mut = "".join("ACGT"[int(rng.integers(0, 4))]
                                for _ in range(int(rng.integers(0, 9))))
                ms.append(m)
            return ms

        scales.append(("mutate", 100,
                       [rand_muts(pa.sequence, 60) for pa in sessions]))

    # point_width for refine comes through params.scoring_width here; use 20
    for name, width, muts_list in scales:
        w = 20 if name == "refine" else width
        s_x, t_x = run_once("0", sessions, muts_list, w, args.repeat)
        s_p, t_p = run_once("1", sessions, muts_list, w, args.repeat)
        nmut = sum(len(m) for m in muts_list)
        diffs = [np.abs(a - b) for a, b in zip(s_x, s_p)]
        rel = [np.abs(a - b) / np.maximum(np.abs(a), 1.0)
               for a, b in zip(s_x, s_p)]
        sgn = sum(int(np.sum((a > 0) != (b > 0))) for a, b in zip(s_x, s_p))
        print("[{}] {} muts x {} regions (width {})".format(
            name, nmut, args.regions, w))
        print("  XLA  kernel: best {:.3f}s median {:.3f}s".format(*t_x))
        print("  Pallas     : best {:.3f}s median {:.3f}s  ({:.1f}x)".format(
            t_p[0], t_p[1], t_x[0] / max(t_p[0], 1e-9)))
        print("  max |d| {:.4g}  max rel {:.4g}  sign flips {}/{}".format(
            max(float(d.max()) for d in diffs if d.size),
            max(float(r.max()) for r in rel if r.size), sgn, nmut))


if __name__ == "__main__":
    main()
