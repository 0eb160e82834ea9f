"""End-to-end CLI tests over a synthetic on-disk run (fast5 + BAM + FASTA)."""

import os

import numpy as np
import pytest

from poreseq_tpu import cli
from poreseq_tpu.api import swalign
from poreseq_tpu.io.fasta import read_fasta
from poreseq_tpu.sim import write_run


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synthrun"))
    rng = np.random.default_rng(2024)
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=400, n_reads=6, draft_error=0.03
    )
    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write(
            # NB: end_trim deliberately omitted — the reference (and we,
            # faithfully) slice seq[0:-0] == "" when end_trim is 0
            "realign_width = 300\nscoring_width = 100\npoint_width = 20\n"
            "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 100\n"
            "max_length = 10000\nlik_offset = 4.5\n"
        )
    return dict(dir=d, truth=truth, draft=draft, reads=reads_dir, bam=bam,
                fasta=fasta, conf=conf)


def test_cli_consensus(run, tmp_path):
    out = str(tmp_path / "out.fasta")
    cli.main([
        "consensus", run["fasta"], run["bam"], run["reads"],
        "-r", "synthref:0:400", "-p", run["conf"], "-o", out, "-i", "2",
    ])
    seqs = read_fasta(out)
    assert len(seqs) == 1
    seq = next(iter(seqs.values()))
    acc = swalign(seq, run["truth"])[0]
    assert acc >= 99.0


def test_cli_variant_muts(run, tmp_path, capsys):
    from poreseq_tpu.io.fasta import write_fasta

    mf = str(tmp_path / "muts.txt")
    truth = run["truth"]
    # substitution-only draft: one planted error at pos; reverting it must
    # score positive, corrupting another base must score negative
    pos, bad = 150, 250
    sub_err = "A" if truth[pos] != "A" else "C"
    draft = truth[:pos] + sub_err + truth[pos + 1 :]
    ref2 = str(tmp_path / "ref2.fasta")
    write_fasta(ref2, {"synthref": draft})
    sub_bad = "A" if draft[bad] != "A" else "C"
    with open(mf, "w") as f:
        f.write("# comment line\n")
        f.write("{} {} {}\n".format(pos, draft[pos], truth[pos]))
        f.write("{} {} {}\n".format(bad, draft[bad], sub_bad))
    cli.main([
        "variant", ref2, run["bam"], run["reads"],
        "-m", mf, "-r", "synthref:0:400", "-p", run["conf"],
    ])
    lines = [l for l in capsys.readouterr().out.splitlines() if l.strip()]
    assert len(lines) == 2
    s1 = float(lines[0].split("\t")[3])
    s2 = float(lines[1].split("\t")[3])
    assert s1 > 0
    assert s2 < 0


def test_cli_extract(run, tmp_path):
    out = str(tmp_path / "extracted.fasta")
    cli.main(["extract", run["reads"], out])
    seqs = read_fasta(out)
    assert len(seqs) == 6
    for name in seqs:
        assert name.endswith(".fast5")


def test_cli_split_regions(run, tmp_path):
    from poreseq_tpu.io.regions_io import split_regions

    regs = split_regions(run["fasta"], 10000)
    assert regs == ["synthref:0:{}".format(len(run["draft"]))]
    # long-sequence splitting with 1kb overlap
    import poreseq_tpu.io.fasta as fa

    big = str(tmp_path / "big.fasta")
    fa.write_fasta(big, {"chr": "A" * 25000})
    regs = split_regions(big, 10000)
    assert regs[0] == "chr:0:10000"
    assert regs[1] == "chr:9000:19000"
    assert regs[-1].endswith(":25000")


def test_merge_fasta(tmp_path):
    from poreseq_tpu.io.fasta import write_fasta
    from poreseq_tpu.io.regions_io import merge_fasta
    from poreseq_tpu.sim import random_seq

    rng = np.random.default_rng(5)
    full = random_seq(rng, 5000)
    a = str(tmp_path / "a.fasta")
    b = str(tmp_path / "b.fasta")
    write_fasta(a, {"chr:0:3000": full[0:3000]})
    write_fasta(b, {"chr:2000:5000": full[2000:5000]})
    out = str(tmp_path / "merged.fasta")
    merge_fasta([a, b], out)
    seqs = read_fasta(out)
    assert seqs["chr"] == full


def test_bam_roundtrip(tmp_path):
    from poreseq_tpu.io.bam import AlignmentFile, write_bam

    path = str(tmp_path / "t.bam")
    write_bam(
        path,
        [("ref1", 1000)],
        [dict(query_name="r1", flag=16, ref_id=0, pos=10, mapq=60,
              cigar=[(4, 2), (0, 5), (1, 1), (0, 3), (2, 2), (0, 4)],
              seq="AACGTACGTACGTAC")],
    )
    bam = AlignmentFile(path)
    assert bam.references == ["ref1"]
    recs = list(bam.fetch("ref1", 0, 100))
    assert len(recs) == 1
    r = recs[0]
    assert r.query_name == "r1" and r.is_reverse and r.pos == 10
    pairs = r.get_aligned_pairs()
    # soft clip: (0,None),(1,None); M5 at ref 10..14; I; M3; D2; M4
    assert pairs[0] == (0, None)
    assert pairs[2] == (2, 10)
    assert r.get_overlap(0, 1000) == 12
    assert r.get_overlap(12, 14) == 2
    assert list(bam.fetch("ref1", 500, 600)) == []
