"""Lockstep multi-region drivers: R regions' propose-score-accept rounds run
in step so every device dispatch batches all regions' events.

This is the TPU-native answer to the reference's region-level parallelism
(files split across a cluster, /root/reference/poreseq/split_fasta.py,
README.md:48-62): instead of one process per region, one device program per
*round* serves R regions at once.  The per-region results are EXACTLY those
of running the sequential driver per region (same engine numerics, same host
control flow per region; regions that finish early are masked out of later
rounds, not recomputed) — verified by tests/test_multiregion.py.

Control-flow parity notes (vs api.PSAlign.Mutate / engine/driver.py):
  * find_mutations scores the consensus once, then each candidate sequence
    independently against a snapshot of the realigned events — candidate
    order does not affect results, so candidates are scored in rank WAVES
    (wave k = every region's k-th candidate) to batch across regions;
  * make_mutations (greedy accept) is inherently sequential *per region* and
    cheap — it stays host-side per region, including its recursive re-score
    of >10 deferred conflicts (which issues a single-region engine call);
  * a region leaves its Mutate loop when a round accepts 0 bases, exactly as
    the sequential loop breaks.
"""

from __future__ import annotations

import sys

import numpy as np

from .driver import (candidate_dlikes, extract_mutations,
                     find_point_mutations, make_mutations)
from .types import AlignData


def find_mutations_multi(engine, datas, seqs_list, live=None):
    """FindMutations for R regions, batching device calls across regions.
    Regions with live[r] False (or no candidates) get [] and are untouched."""
    R = len(datas)
    if live is None:
        live = [True] * R
    live = [bool(live[r]) and len(seqs_list[r]) > 0 for r in range(R)]
    if not any(live):
        return [[] for _ in range(R)]

    seqreflikes = [np.zeros(len(d.sequence), dtype=np.float64) for d in datas]
    engine.score_alignments_multi(datas, likes_list=seqreflikes,
                                  participate=live)

    alllikes = [[] for _ in range(R)]
    seqals = [[] for _ in range(R)]
    verbose = datas[0].params.verbose
    if verbose:
        sys.stderr.write("Finding mutations")

    maxk = max(len(seqs_list[r]) for r in range(R) if live[r])
    for k in range(maxk):
        wave = []                     # (r, seq, pairs, cached reflikes|None)
        participate = [False] * R
        call_datas = list(datas)
        likes_list = [None] * R
        for r in range(R):
            if not live[r] or k >= len(seqs_list[r]):
                continue
            seq = seqs_list[r][k]
            newdata = AlignData(
                sequence=datas[r].sequence,
                events=[ev.light_copy() for ev in datas[r].events],
                params=datas[r].params,
            )
            _, pairs = engine.map_alignments(newdata, seq)
            reflikes = datas[r].seqlikes.get(seq)
            if reflikes is None:
                participate[r] = True
                call_datas[r] = newdata
                likes_list[r] = np.zeros(len(seq), dtype=np.float64)
            wave.append((r, seq, pairs, reflikes))

        if any(participate):
            engine.score_alignments_multi(call_datas, likes_list=likes_list,
                                          participate=participate)
        for (r, seq, pairs, reflikes) in wave:
            if reflikes is None:
                reflikes = likes_list[r]
                datas[r].seqlikes[seq] = reflikes
            dl, als = candidate_dlikes(seqreflikes[r], reflikes, pairs)
            alllikes[r].append(dl)
            seqals[r].append(als)
        if verbose:
            sys.stderr.write(".")
            sys.stderr.flush()
    if verbose:
        sys.stderr.write("\n")

    return [extract_mutations(datas[r].sequence, seqs_list[r], alllikes[r],
                              seqals[r]) if live[r] else []
            for r in range(R)]


def mutate_datas(engine, datas, seqs_list, reps, live=None):
    """The PSAlign.Mutate rep loop (pyx:425-431) in lockstep: per rep, one
    batched find + one batched score across all still-live regions, then the
    sequential greedy accept per region.  Returns total accepted bases [R]."""
    R = len(datas)
    live = list(live) if live is not None else [True] * R
    totbases = [0] * R
    for _ in range(reps):
        if not any(live):
            break
        muts_list = find_mutations_multi(engine, datas, seqs_list, live=live)
        scores_list = engine.score_mutations_multi(datas, muts_list)
        for r in range(R):
            if not live[r]:
                continue
            nbases = make_mutations(engine, datas[r], scores_list[r])
            if nbases == 0:
                live[r] = False
            totbases[r] += nbases
    return totbases


def refine_datas(engine, datas, live=None, point_width=None):
    """PSAlign.Refine (pyx:437-472) in lockstep: all regions' point mutations
    scored in one batched call; greedy accept per region.  Returns nbases [R]."""
    R = len(datas)
    if live is None:
        live = [True] * R
    if point_width is not None:
        for d in datas:
            d.params.scoring_width = int(point_width)
    muts_list = [find_point_mutations(datas[r]) if live[r] else []
                 for r in range(R)]
    scores_list = engine.score_mutations_multi(datas, muts_list)
    return [make_mutations(engine, datas[r], scores_list[r]) if live[r] else 0
            for r in range(R)]
