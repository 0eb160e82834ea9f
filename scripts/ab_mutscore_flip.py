#!/usr/bin/env python3
"""A/B the fused-Pallas-mutation-scorer default flip on the real chip.

Runs the bench.py e2e workload (8x 1 kb regions, 10X, --region-batch 8) in
ONE process, alternating PSQ_PALLAS_MUTSCORE between '' (auto: fused kernel
for G >= PSQ_PALLAS_G_MIN) and '0' (XLA group kernel only) so both paths
share warm compile caches and the tunnel drift decorrelates across the
interleaved runs.

Optionally finishes with a cProfile'd run (--profile) for the round-5 stage
attribution (VERDICT item 2).

Usage: python scripts/ab_mutscore_flip.py [--runs 3] [--profile]
"""

import argparse
import cProfile
import io
import json
import os
import pstats
import sys
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3, help="timed runs per arm")
    ap.add_argument("--regions", type=int, default=8)
    ap.add_argument("--coverage", type=int, default=10)
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--g-min", type=int, default=None)
    args = ap.parse_args()

    from poreseq_tpu import cli
    from poreseq_tpu.io.fasta import read_fasta
    from poreseq_tpu.sim import write_run

    if args.g_min is not None:
        os.environ["PSQ_PALLAS_G_MIN"] = str(args.g_min)

    R, L, cov = args.regions, 1000, args.coverage
    d = tempfile.mkdtemp(prefix="psqab_")
    rng = np.random.default_rng(0)
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=R * L, n_reads=(cov // 2) * R, read_len=L + 200,
        draft_error=0.02)
    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write("realign_width = 300\nscoring_width = 100\npoint_width = 20\n"
                "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 300\n"
                "max_length = 10000\nlik_offset = 4.5\n")
    rf = os.path.join(d, "regions.txt")
    with open(rf, "w") as f:
        f.write("\n".join("synthref:{}:{}".format(r * L, (r + 1) * L)
                          for r in range(R)) + "\n")
    out = os.path.join(d, "out.fasta")

    def run_once():
        if os.path.exists(out):
            os.unlink(out)
        t0 = time.perf_counter()
        cli.main(["consensus", fasta, bam, reads_dir, "-R", rf,
                  "-p", conf, "-o", out, "-i", "4", "--backend", "tpu",
                  "--region-batch", str(R)])
        dt = time.perf_counter() - t0
        n = len(read_fasta(out))
        return dt, n

    # warm both arms' compile caches
    for mode, tag in (("", "auto"), ("0", "xla")):
        os.environ["PSQ_PALLAS_MUTSCORE"] = mode
        t, n = run_once()
        sys.stderr.write("# warmup[{}]: {:.1f}s ({} regions)\n".format(
            tag, t, n))

    times = {"auto": [], "xla": []}
    for i in range(args.runs):
        for mode, tag in (("", "auto"), ("0", "xla")):
            os.environ["PSQ_PALLAS_MUTSCORE"] = mode
            t, n = run_once()
            times[tag].append(t)
            sys.stderr.write("# run {} [{}]: {:.1f}s\n".format(i, tag, t))

    res = {tag: {"median_s": float(np.median(ts)),
                 "best_s": float(min(ts)),
                 "s_per_region_median": float(np.median(ts)) / R,
                 "runs": [round(t, 2) for t in ts]}
           for tag, ts in times.items() if ts}
    print(json.dumps(res, indent=1))

    if args.profile:
        os.environ["PSQ_PALLAS_MUTSCORE"] = ""
        pr = cProfile.Profile()
        pr.enable()
        t, n = run_once()
        pr.disable()
        sys.stderr.write("# profiled run: {:.1f}s\n".format(t))
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(60)
        print(s.getvalue())
        pr.dump_stats("/tmp/psq_ab_profile.pstats")


if __name__ == "__main__":
    main()
