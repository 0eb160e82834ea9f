"""Tests for the remaining API/pipeline surface: ApplyMuts, variant-fasta
mode, train, resume and region sharding."""

import os

import numpy as np
import pytest

from poreseq_tpu import cli
from poreseq_tpu.api import swalign
from poreseq_tpu.core.regions import MutationScore
from poreseq_tpu.io.fasta import read_fasta, write_fasta
from poreseq_tpu.sim import simulate_session, write_run


@pytest.fixture(scope="module")
def run(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("synthrun2"))
    rng = np.random.default_rng(99)
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=300, n_reads=5, draft_error=0.03
    )
    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write(
            "realign_width = 300\nscoring_width = 100\npoint_width = 20\n"
            "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 50\n"
            "max_length = 10000\nlik_offset = 4.5\n"
            "skip_t = 0.141\nskip_c = 0.088\nstay_t = 0.043\nstay_c = 0.057\n"
            "extend_t = 0.072\nextend_c = 0.046\ninsert_t = 0.020\n"
            "insert_c = 0.025\n"
        )
    return dict(dir=d, truth=truth, draft=draft, reads=reads_dir, bam=bam,
                fasta=fasta, conf=conf)


def test_apply_muts():
    rng = np.random.default_rng(21)
    pa, truth = simulate_session(rng, ref_len=120, coverage=4)
    orig = pa.sequence
    muts = [
        MutationScore(10, orig[10], "A" if orig[10] != "A" else "C", 5.0),
        MutationScore(50, orig[50], "", 3.0),           # deletion
        MutationScore(90, "", "G", 2.0),                # insertion
        MutationScore(30, orig[30], "T" if orig[30] != "T" else "G", -1.0),
    ]
    pa.ApplyMuts(muts)
    assert len(pa.sequence) == len(orig)  # -1 +1 net zero
    assert pa.sequence != orig
    # negative-scored mutation not applied
    assert pa.sequence[30] == orig[30]


def test_variant_fasta_mode(run, tmp_path, capsys):
    from poreseq_tpu.pipeline import variant
    from poreseq_tpu.core.params import load_params
    from poreseq_tpu.sim import mutate_seq

    rng = np.random.default_rng(3)
    vf = str(tmp_path / "vars.fasta")
    write_fasta(vf, {
        "good": run["truth"],
        "bad": mutate_seq(rng, run["truth"], 0.05),
    })
    params = load_params(run["conf"])
    scores = variant(run["fasta"], run["bam"], run["reads"], var_fasta=vf,
                     region="synthref:0:{}".format(len(run["draft"])),
                     params=params)
    # the true sequence must outscore a 5%-corrupted variant
    assert scores["good"] > scores["bad"]


def test_cli_resume_and_shards(run, tmp_path):
    out = str(tmp_path / "o.fasta")
    reg = "synthref:0:{}".format(len(run["draft"]))
    args = ["consensus", run["fasta"], run["bam"], run["reads"],
            "-r", reg, "-p", run["conf"], "-o", out, "-i", "1"]
    cli.main(args)
    first = read_fasta(out)
    assert len(first) == 1
    # resume: the already-corrected region is skipped (file unchanged)
    mtime = os.path.getmtime(out)
    cli.main(args + ["--resume"])
    assert read_fasta(out) == first
    # shard 1/2 gets no region (round-robin)
    out2 = str(tmp_path / "o2.fasta")
    cli.main(["consensus", run["fasta"], run["bam"], run["reads"],
              "-r", reg, "-p", run["conf"], "-o", out2, "-i", "1",
              "--shard-index", "1", "--num-shards", "2"])
    assert read_fasta(out2) == {}


@pytest.mark.slow
def test_train_one_iter(run, monkeypatch, tmp_path):
    monkeypatch.chdir(tmp_path)
    cli.main(["train", run["fasta"], run["bam"], run["reads"],
              "-r", "synthref", "-i", "1", "-n", "1", "-d",
              "-p", run["conf"]])
    best = read_fasta  # noqa: F841
    assert os.path.isfile("train_best.conf")
    from poreseq_tpu.core.params import load_params

    p = load_params("train_best.conf")
    assert "skip_t" in p and p["skip_t"] > 0
