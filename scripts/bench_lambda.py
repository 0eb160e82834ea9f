#!/usr/bin/env python3
"""Full λ-scale validation run (BASELINE config 4).

Builds a 48.5 kb synthetic genome at 10X (the size of the reference's λ DNA
demo, /root/reference/README.md:66,102), then runs the production pipeline
end to end exactly as the README prescribes for clusters:

    poreseq split (overlapping 10 kb regions, 1 kb overlap)
      -> poreseq consensus --region-batch N (lockstep batching)
      -> poreseq merge (SW-spliced junctions)

and reports wall time, regions/hr, and merged accuracy vs truth.  The
reference's published number for this config is "tens of hours" on one CPU.

Usage: python scripts/bench_lambda.py [--genome 48500] [--coverage 10]
       [--batch 8] [--region-length 10000]
"""

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, __import__('os').path.dirname(__import__('os').path.dirname(__import__('os').path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--genome", type=int, default=48500)
    ap.add_argument("--coverage", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--region-length", type=int, default=10000)
    ap.add_argument("--read-len", type=int, default=None,
                    help="read length (default region_length+400; set "
                    "longer, e.g. 8000 with 2 kb regions, for the honest "
                    "overhanging-read scenario — Event.trim bounds the "
                    "batch time axis)")
    ap.add_argument("--backend", default="tpu")
    ap.add_argument("--draft-error", type=float, default=0.02)
    ap.add_argument("--iterations", type=int, default=4)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    from poreseq_tpu import cli
    from poreseq_tpu.api import swalign
    from poreseq_tpu.io.fasta import read_fasta
    from poreseq_tpu.io.regions_io import split_regions
    from poreseq_tpu.sim import write_run

    d = tempfile.mkdtemp(prefix="psqlambda_")
    rng = np.random.default_rng(0)
    t0 = time.time()
    # default: reads sized to the regions; --read-len overrides (long reads
    # overhanging short regions are trimmed to the band-reachable range at
    # load, Event.trim)
    read_len = args.read_len or (args.region_length + 400)
    n_reads = max(args.coverage * args.genome // (2 * read_len), 4)
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=args.genome, n_reads=n_reads,
        read_len=read_len, draft_error=args.draft_error)
    sys.stderr.write("synthetic lambda built in {:.1f}s ({} bp)\n".format(
        time.time() - t0, args.genome))

    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write("realign_width = 300\nscoring_width = 100\npoint_width = 20\n"
                "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 300\n"
                "max_length = {}\nlik_offset = 4.5\n".format(
                    args.region_length))

    # the reference pipeline's region split (1 kb overlap, split_fasta.py)
    regions = split_regions(fasta, args.region_length)
    rf = os.path.join(d, "regions.txt")
    with open(rf, "w") as f:
        f.write("\n".join(regions) + "\n")
    sys.stderr.write("{} overlapping regions of {} bp\n".format(
        len(regions), args.region_length))

    out = os.path.join(d, "out.fasta")
    t0 = time.time()
    cli.main(["consensus", fasta, bam, reads_dir, "-R", rf, "-p", conf,
              "-o", out, "-i", str(args.iterations),
              "--backend", args.backend, "--region-batch", str(args.batch)])
    dt = time.time() - t0

    merged = os.path.join(d, "merged.fasta")
    cli.main(["merge", merged, out])
    mseqs = list(read_fasta(merged).values())
    acc = swalign(mseqs[0], truth)[0] if mseqs else 0.0

    n_out = len(read_fasta(out))
    res = dict(
        genome_bp=args.genome, coverage=args.coverage, batch=args.batch,
        regions=len(regions), regions_done=n_out,
        # regions the CLI skipped (stderr says why — typically a short tail
        # stub with no aligned reads, which is legitimately uncorrectable)
        regions_skipped=len(regions) - n_out,
        consensus_s=round(dt, 1),
        kb_per_hour=round(3600.0 * args.genome / 1000.0 / dt, 1),
        regions_per_hour=round(3600.0 * n_out / dt, 1),
        merged_contigs=len(mseqs),
        merged_accuracy_pct=round(float(acc), 3),
    )
    print(json.dumps(res))
    if not args.keep:
        import shutil

        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
