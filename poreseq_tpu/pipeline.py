"""Top-level consensus and variant drivers.

Mirror /root/reference/poreseq/Mutate.py and Variant.py, with a pluggable
compute backend.
"""

from __future__ import annotations

import sys

import numpy as np

from .api import PSAlign, swalign
from .core.regions import RegionInfo
from .io.fasta import read_fasta
from .io.load import load_aligned_events


def mutate(
    fastafile: str,
    bamfile: str,
    fast5dir: str,
    region: str | None = None,
    params: dict | None = None,
    verbose: int = 0,
    test: bool = False,
    reps: int = 4,
    backend: str = "exact",
):
    """Consensus error correction of one region (Mutate.py:8-101).

    Returns (sequence, accuracy-vs-loaded-reference)."""
    params = dict(params or {})
    if "verbose" not in params:
        params["verbose"] = 0

    pa = load_aligned_events(fastafile, bamfile, fast5dir, RegionInfo(region),
                             params, backend=backend)
    refseq = pa.sequence

    if test and verbose == 0:
        verbose = 1

    # short-circuit when coverage is too thin to help (Mutate.py:48-53)
    if len(pa.events) < 5:
        if verbose > 0:
            sys.stderr.write("Coverage is 1 or 2, not mutating...\n")
        return (refseq, 100)

    if verbose > 0:
        sys.stderr.write(
            "Mutating {} bases using {} events\n".format(len(refseq), len(pa.events))
        )

    if test:
        # seed from the longest-spanning raw 2D read (Mutate.py:59-65)
        seq = ""
        for ev in pa.events:
            pairs = swalign(ev.sequence, refseq)[1]
            if pairs[-1][1] - pairs[0][1] > len(seq):
                seq = ev.sequence[pairs[0][0] : pairs[-1][0]]
        pa.sequence = seq
        sys.stderr.write(
            "Starting accuracy: "
            + str(round(swalign(pa.sequence, refseq)[0], 1)) + "%\n"
        )

    pa.Mutate(reps=reps)

    if verbose > 0:
        acc = swalign(pa.sequence, refseq)[0]
        sys.stderr.write("Accuracy: " + str(round(acc, 1)) + "%\n")

    for _ in range(reps):
        pa.Mutate(seqs="viterbi")
        nbases = pa.Refine()
        if verbose > 0:
            acc = swalign(pa.sequence, refseq)[0]
            sys.stderr.write("Accuracy: " + str(round(acc, 1)) + "%\n")
        if nbases == 0:
            break

    if "end_trim" in params and len(pa.sequence) > 2 * params["end_trim"]:
        pa.sequence = pa.sequence[int(params["end_trim"]) : -int(params["end_trim"])]

    acc, inds = swalign(pa.sequence, refseq)

    if verbose > 0:
        errs = np.sum(np.array(inds) == 0, 0)
        sys.stderr.write("Final accuracy: " + str(round(acc, 1)) + "%\n")
        sys.stderr.write("Insertions: {}, Deletions: {}\n".format(errs[0], errs[1]))
        sys.stderr.write(
            "Final coverage: " + str(round(np.mean(pa.Coverage()), 1)) + "X\n"
        )

    return (pa.sequence, acc)


def variant(
    ref_fasta: str,
    bamfile: str,
    fast5dir: str,
    var_fasta: str | None = None,
    muts=None,
    region: str | None = None,
    params: dict | None = None,
    verbose: int = 0,
    backend: str = "exact",
):
    """Variant scoring (Variant.py:11-95): either whole candidate sequences
    from var_fasta (RealignTo + ScoreEvents deltas) or a list of mutations
    (ScoreMutations / ScorePoints)."""
    params = dict(params or {})
    reginfo = RegionInfo(region)
    pa = load_aligned_events(ref_fasta, bamfile, fast5dir, reginfo, params,
                             backend=backend)
    pa.params["verbose"] = verbose

    if var_fasta is not None:
        variants = read_fasta(var_fasta)
        if verbose > 0:
            sys.stderr.write(
                "Variant calling {} variant sequences with {} bases using {}"
                " events\n".format(len(variants), len(pa.sequence), len(pa.events))
            )
        basescore = np.sum(pa.ScoreEvents())
        variantscores = {}
        for vid, varseq in variants.items():
            pav = pa.Copy()
            pav.RealignTo(varseq)
            dscore = np.sum(pav.ScoreEvents()) - basescore
            sys.stdout.write("{}, {}\n".format(vid, dscore))
            variantscores[vid] = dscore
        return variantscores

    if muts is not None:
        if verbose > 0:
            sys.stderr.write(
                "Variant calling {} using {} events\n".format(region, len(pa.events))
            )
        for m in muts:
            m.start -= reginfo.start
        if len(muts) > 0:
            mutscores = pa.ScoreMutations(muts)
        else:
            mutscores = pa.ScorePoints()

        npos = 0
        ntot = 0
        for ms in mutscores:
            if (ms.start > params["end_trim"]
                    and ms.start < len(pa.sequence) - params["end_trim"]):
                ntot += 1
                if ms.score > 0:
                    npos += 1
            ms.start += reginfo.start
            sys.stdout.write(str(ms) + "\n")

        if verbose > 0:
            sys.stderr.write(
                "{}% positive variants\n".format(100 * float(npos) / ntot)
            )
            sys.stderr.write(
                "Final coverage: " + str(round(np.mean(pa.Coverage()), 1)) + "X\n"
            )
        return mutscores
