#!/usr/bin/env python3
"""End-to-end consensus throughput benchmark on the real chip.

Builds a synthetic on-disk run (fast5 + BAM + FASTA) with a multi-kb genome,
then times `consensus` over R 1 kb regions:
  --region-batch 1  -> the sequential per-region pipeline
  --region-batch R  -> lockstep cross-region batching (one device program per
                       round for all R regions)

Reports seconds/region and regions/hour.  The reference's headline number is
~2 min per 1 kb region at 10X on a 2015 CPU (/root/reference/README.md:102).

Usage: python scripts/bench_consensus.py [R] [--batch N] [--coverage C]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("regions", type=int, nargs="?", default=8)
    ap.add_argument("--batch", type=int, default=None,
                    help="region batch size (default: all regions)")
    ap.add_argument("--coverage", type=int, default=10)
    ap.add_argument("--region-length", type=int, default=1000)
    ap.add_argument("--backend", default="tpu")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--draft-error", type=float, default=0.02)
    ap.add_argument("--repeat", type=int, default=1)
    args = ap.parse_args()

    from poreseq_tpu import cli
    from poreseq_tpu.api import swalign
    from poreseq_tpu.io.fasta import read_fasta
    from poreseq_tpu.sim import write_run

    R = args.regions
    L = args.region_length
    batch = args.batch or R
    genome = R * L
    # ~coverage/2 reads (each read contributes 2 strands)
    n_reads = max((args.coverage // 2) * R, 4)

    d = tempfile.mkdtemp(prefix="psqbench_")
    rng = np.random.default_rng(0)
    t0 = time.time()
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=genome, n_reads=n_reads, read_len=L + 200,
        draft_error=args.draft_error)
    sys.stderr.write("synth run built in {:.1f}s ({} bp, {} reads)\n".format(
        time.time() - t0, genome, n_reads))

    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write(
            "realign_width = 300\nscoring_width = 100\npoint_width = 20\n"
            "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 300\n"
            "max_length = 10000\nlik_offset = 4.5\n")
    rf = os.path.join(d, "regions.txt")
    regions = []
    for r in range(R):
        regions.append("synthref:{}:{}".format(r * L, (r + 1) * L))
    with open(rf, "w") as f:
        f.write("\n".join(regions) + "\n")

    out = os.path.join(d, "out.fasta")
    times = []
    for rep in range(args.repeat):
        if os.path.exists(out):
            os.unlink(out)
        t0 = time.time()
        cli.main([
            "consensus", fasta, bam, reads_dir, "-R", rf, "-p", conf,
            "-o", out, "-i", "4", "--backend", args.backend,
            "--region-batch", str(batch),
        ])
        times.append(time.time() - t0)
        sys.stderr.write("run {}: {:.1f}s\n".format(rep, times[-1]))
    dt = times[-1]  # steady state (jit caches warm after run 0)

    seqs = read_fasta(out)
    accs = []
    for name, seq in seqs.items():
        a, b = int(name.split(":")[1]), int(name.split(":")[2])
        accs.append(swalign(seq, truth[a:b])[0])
    res = dict(
        regions=R, batch=batch, coverage=args.coverage, backend=args.backend,
        total_s=round(dt, 2), first_s=round(times[0], 2), s_per_region=round(dt / max(len(seqs), 1), 2),
        regions_per_hour=round(3600.0 * len(seqs) / dt, 1),
        vs_ref_2min_per_kb=round((120.0 * len(seqs)) / dt, 1),
        mean_acc=round(float(np.mean(accs)), 3) if accs else None,
        n_out=len(seqs),
    )
    print(json.dumps(res))
    if not args.keep:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
