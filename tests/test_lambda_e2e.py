"""Mini-genome end-to-end workflow: split -> per-region consensus -> merge.

Scaled-down version of the reference's full-lambda pre-assembly correction
(BASELINE config 4): a multi-kb genome is tiled into overlapping regions,
each corrected independently, and SW-spliced back into one sequence.
"""

import os

import numpy as np
import pytest

from poreseq_tpu import cli
from poreseq_tpu.api import swalign
from poreseq_tpu.io.fasta import read_fasta, write_fasta
from poreseq_tpu.io.regions_io import merge_fasta, split_regions
from poreseq_tpu.sim import write_run


@pytest.mark.slow
def test_split_consensus_merge(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(7)
    # 3.4 kb genome, reads of 1.6 kb so regions see partial coverage
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=3400, n_reads=24, read_len=1600, draft_error=0.02,
    )
    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write(
            "realign_width = 300\nscoring_width = 100\npoint_width = 20\n"
            "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 200\n"
            "max_length = 10000\nlik_offset = 4.5\n"
        )

    regions = split_regions(fasta, 1800)
    assert len(regions) >= 3  # stride 800 with 1 kb overlap

    out = os.path.join(d, "corrected.fasta")
    # region-file driven correction, like the reference's cluster mode
    rf = os.path.join(d, "regions.txt")
    with open(rf, "w") as f:
        f.write("\n".join(regions) + "\n")
    cli.main([
        "consensus", fasta, bam, reads_dir, "-R", rf,
        "-p", conf, "-o", out, "-i", "2",
    ])
    frags = read_fasta(out)
    # trailing mini-regions shorter than min_overlap are skipped, exactly like
    # the reference's per-region skip-and-continue (cmdline.py:182-188)
    assert len(frags) >= 3

    merged = os.path.join(d, "merged.fasta")
    merge_fasta([out], merged)
    seqs = read_fasta(merged)
    assert len(seqs) == 1
    final = next(iter(seqs.values()))
    acc = swalign(final, truth)[0]
    assert len(final) > 0.95 * len(truth)
    assert acc >= 99.0
