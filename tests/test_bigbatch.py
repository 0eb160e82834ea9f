"""Wide lockstep batching: >40 regions through one --region-batch path.

Regression coverage for the batch-path plumbing at scale (chunked candidate
scoring, batched deferred-conflict rescoring, per-event geometry across many
regions) without λ-scale compute: many short regions at narrow band widths.
The full 48.5 kb λ configuration runs on hardware via
scripts/bench_lambda.py (results in PERF.md).
"""

import os

import numpy as np
import pytest

from poreseq_tpu import cli
from poreseq_tpu.api import swalign
from poreseq_tpu.io.fasta import read_fasta
from poreseq_tpu.sim import write_run


@pytest.mark.slow
def test_44_region_lockstep_batch(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(11)
    R, L = 44, 300
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=R * L, n_reads=2 * R, read_len=L + 150,
        draft_error=0.02)
    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write("realign_width = 16\nscoring_width = 8\npoint_width = 6\n"
                "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 100\n"
                "max_length = 10000\nlik_offset = 4.5\n")
    rf = os.path.join(d, "regions.txt")
    regions = ["synthref:{}:{}".format(r * L, (r + 1) * L) for r in range(R)]
    with open(rf, "w") as f:
        f.write("\n".join(regions) + "\n")

    out = os.path.join(d, "out.fasta")
    cli.main(["consensus", fasta, bam, reads_dir, "-R", rf, "-p", conf,
              "-o", out, "-i", "2", "--backend", "tpu",
              "--region-batch", str(R)])

    seqs = read_fasta(out)
    # low-coverage regions may be skipped; the wide batch itself must survive
    assert len(seqs) >= R - 6
    accs = []
    for name, seq in seqs.items():
        a, b = int(name.split(":")[1]), int(name.split(":")[2])
        # regions are DRAFT coordinates; draft indels shift them vs truth,
        # so score against a widened truth window (local SW finds the
        # corrected segment)
        accs.append(swalign(seq, truth[max(a - 400, 0) : b + 400])[0])
    accs = np.asarray(accs, dtype=np.float64)
    assert int(np.sum(np.isnan(accs))) <= 2
    assert float(np.nanmean(accs)) >= 97.5
