#!/usr/bin/env python3
"""Generate golden parity fixtures by driving the reference C++ core.

Builds binary inputs (oracle.cpp format) from synthetic sessions, runs
/tmp/psq_oracle, and saves {inputs, outputs} as tests/golden/*.npz.

Build the oracle first (see tools/golden/README.md):
  mkdir -p /tmp/refcpp/cpp && cp /root/reference/cpp/*.{cpp,h} /tmp/refcpp/cpp/
  sed -i 's/if (likes > 0)/if (likes != NULL)/' /tmp/refcpp/cpp/MakeMutations.cpp
  g++ -O2 -std=c++11 -fpermissive -w -ffp-contract=off -I/tmp/refcpp \
      tools/golden/oracle.cpp /tmp/refcpp/cpp/{Alignment,FindMutations,\
MakeMutations,Viterbi,swlib,EventUtil}.cpp -o /tmp/psq_oracle
"""

from __future__ import annotations

import io
import os
import struct
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from poreseq_tpu.sim import simulate_session  # noqa: E402
from poreseq_tpu.engine.types import AlignParams  # noqa: E402

ORACLE = "/tmp/psq_oracle"
OUTDIR = os.path.join(os.path.dirname(__file__), "..", "..", "tests", "golden")


def w_i32(b, v):
    b.write(struct.pack("<i", int(v)))


def w_f64(b, v):
    b.write(struct.pack("<d", float(v)))


def w_str(b, s):
    w_i32(b, len(s))
    b.write(s.encode("latin-1"))


def w_arr(b, a):
    b.write(np.ascontiguousarray(a, dtype=np.float64).tobytes())


def write_common(b, pa, params: AlignParams):
    w_f64(b, params.lik_offset)
    w_i32(b, params.scoring_width)
    w_i32(b, params.realign_width)
    w_i32(b, params.verbose)
    w_str(b, pa.sequence)
    w_i32(b, len(pa.events))
    for ev in pa.events:
        w_i32(b, len(ev.mean))
        w_arr(b, ev.mean)
        w_arr(b, ev.stdv)
        w_arr(b, ev.ref_align)
        w_arr(b, ev.ref_like)
        w_arr(b, ev.model.level_mean)
        w_arr(b, ev.model.level_stdv)
        w_arr(b, ev.model.sd_mean)
        w_arr(b, ev.model.sd_stdv)
        w_f64(b, ev.model.prob_skip)
        w_f64(b, ev.model.prob_stay)
        w_f64(b, ev.model.prob_extend)
        w_f64(b, ev.model.prob_insert)
        w_i32(b, int(ev.model.complement))
        w_str(b, ev.sequence)


def run_oracle(payload: bytes) -> bytes:
    with tempfile.TemporaryDirectory() as d:
        fin = os.path.join(d, "in.bin")
        fout = os.path.join(d, "out.bin")
        with open(fin, "wb") as f:
            f.write(payload)
        subprocess.run([ORACLE, fin, fout], check=True)
        with open(fout, "rb") as f:
            return f.read()


class Reader:
    def __init__(self, data):
        self.b = io.BytesIO(data)

    def i32(self):
        return struct.unpack("<i", self.b.read(4))[0]

    def f64(self):
        return struct.unpack("<d", self.b.read(8))[0]

    def arr(self, n):
        return np.frombuffer(self.b.read(8 * n), dtype=np.float64).copy()

    def iarr(self, n):
        return np.frombuffer(self.b.read(4 * n), dtype=np.int32).copy()

    def s(self):
        n = self.i32()
        return self.b.read(n).decode("latin-1")


def session_npz(pa):
    """Flatten a session's inputs into npz-storable arrays."""
    d = {"sequence": pa.sequence, "n_events": len(pa.events)}
    for i, ev in enumerate(pa.events):
        p = f"ev{i}_"
        d[p + "mean"] = ev.mean
        d[p + "stdv"] = ev.stdv
        d[p + "ref_align"] = ev.ref_align
        d[p + "ref_like"] = ev.ref_like
        d[p + "level_mean"] = ev.model.level_mean
        d[p + "level_stdv"] = ev.model.level_stdv
        d[p + "sd_mean"] = ev.model.sd_mean
        d[p + "sd_stdv"] = ev.model.sd_stdv
        d[p + "probs"] = np.array(
            [ev.model.prob_skip, ev.model.prob_stay, ev.model.prob_extend,
             ev.model.prob_insert]
        )
        d[p + "complement"] = int(ev.model.complement)
        d[p + "seq2d"] = ev.sequence
    return d


def fix_score_events(name, seed, ref_len=400, coverage=5, **kw):
    rng = np.random.default_rng(seed)
    pa, truth = simulate_session(rng, ref_len=ref_len, coverage=coverage, **kw)
    params = AlignParams.from_dict(pa.params)
    b = io.BytesIO()
    w_i32(b, 1)
    write_common(b, pa, params)
    r = Reader(run_oracle(b.getvalue()))
    n = r.i32()
    scores = r.arr(n)
    likes = r.arr(len(pa.sequence))
    d = session_npz(pa)
    d["mode"] = 1
    d["out_scores"] = scores
    d["out_likes"] = likes
    for i, ev in enumerate(pa.events):
        d[f"out_ev{i}_ref_align"] = r.arr(len(ev.mean))
        d[f"out_ev{i}_ref_like"] = r.arr(len(ev.mean))
    np.savez_compressed(os.path.join(OUTDIR, name), **d)
    print(name, "scores:", scores)


def fix_score_muts(name, seed, ref_len=300, coverage=5, n_muts=40, point=False, **kw):
    rng = np.random.default_rng(seed)
    pa, truth = simulate_session(rng, ref_len=ref_len, coverage=coverage, **kw)
    params = AlignParams.from_dict(pa.params)
    # random point and indel mutations
    muts = []
    for _ in range(n_muts):
        start = int(rng.integers(0, ref_len - 6))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            orig, mut = pa.sequence[start], "ACGT"[int(rng.integers(0, 4))]
        elif kind == 1:
            orig, mut = "", "ACGT"[int(rng.integers(0, 4))]
        else:
            orig, mut = pa.sequence[start : start + int(rng.integers(1, 4))], ""
        muts.append((start, orig, mut))
    b = io.BytesIO()
    w_i32(b, 2)
    write_common(b, pa, params)
    w_i32(b, len(muts))
    for s, o, m in muts:
        w_i32(b, s)
        w_str(b, o)
        w_str(b, m)
    r = Reader(run_oracle(b.getvalue()))
    n = r.i32()
    scores = r.arr(n)
    d = session_npz(pa)
    d["mode"] = 2
    d["mut_starts"] = np.array([m[0] for m in muts], dtype=np.int32)
    d["mut_origs"] = np.array([m[1] for m in muts], dtype=object)
    d["mut_muts"] = np.array([m[2] for m in muts], dtype=object)
    d["out_scores"] = scores
    for i, ev in enumerate(pa.events):
        d[f"out_ev{i}_ref_align"] = r.arr(len(ev.mean))
        d[f"out_ev{i}_ref_like"] = r.arr(len(ev.mean))
    np.savez_compressed(os.path.join(OUTDIR, name), **d, allow_pickle=True)
    print(name, "mut scores range:", scores.min(), scores.max())


def fix_viterbi(name, seed, ref_len=200, coverage=5, nkeep=4, **kw):
    rng = np.random.default_rng(seed)
    pa, truth = simulate_session(rng, ref_len=ref_len, coverage=coverage, **kw)
    params = AlignParams.from_dict(pa.params)
    b = io.BytesIO()
    w_i32(b, 3)
    write_common(b, pa, params)
    w_i32(b, nkeep)
    for v in (0.05, 0.01, 0.33, 0.75):
        w_f64(b, v)
    r = Reader(run_oracle(b.getvalue()))
    n = r.i32()
    seqs = [r.s() for _ in range(n)]
    d = session_npz(pa)
    d["mode"] = 3
    d["nkeep"] = nkeep
    d["out_seqs"] = np.array(seqs, dtype=object)
    np.savez_compressed(os.path.join(OUTDIR, name), **d, allow_pickle=True)
    print(name, "viterbi seq lens:", [len(s) for s in seqs])


def fix_swfull(name, seed, n1=800, n2=700):
    from poreseq_tpu.sim import random_seq, mutate_seq

    rng = np.random.default_rng(seed)
    s1 = random_seq(rng, n1)
    s2 = mutate_seq(rng, s1, 0.15)[:n2]
    b = io.BytesIO()
    w_i32(b, 4)
    # dummy params + empty events
    w_f64(b, 4.5)
    w_i32(b, 150)
    w_i32(b, 300)
    w_i32(b, 0)
    w_str(b, s1)
    w_i32(b, 0)
    w_str(b, s2)
    r = Reader(run_oracle(b.getvalue()))
    acc = r.f64()
    score = r.i32()
    n = r.i32()
    i1 = r.iarr(n)
    i2 = r.iarr(n)
    np.savez_compressed(
        os.path.join(OUTDIR, name),
        mode=4, seq1=s1, seq2=s2, out_acc=acc, out_score=score, out_i1=i1, out_i2=i2,
    )
    print(name, "sw acc:", acc, "score:", score, "n:", n)


def fix_mutate(name, seed, ref_len=300, coverage=6, reps=2, **kw):
    rng = np.random.default_rng(seed)
    pa, truth = simulate_session(rng, ref_len=ref_len, coverage=coverage, **kw)
    params = AlignParams.from_dict(pa.params)
    seqs = [x.sequence for x in pa.events[::2]]
    b = io.BytesIO()
    w_i32(b, 5)
    write_common(b, pa, params)
    w_i32(b, reps)
    w_i32(b, len(seqs))
    for s in seqs:
        w_str(b, s)
    r = Reader(run_oracle(b.getvalue()))
    final_seq = r.s()
    nbases = r.i32()
    d = session_npz(pa)
    d["mode"] = 5
    d["reps"] = reps
    d["out_seq"] = final_seq
    d["out_nbases"] = nbases
    for i, ev in enumerate(pa.events):
        d[f"out_ev{i}_ref_align"] = r.arr(len(ev.mean))
        d[f"out_ev{i}_ref_like"] = r.arr(len(ev.mean))
    np.savez_compressed(os.path.join(OUTDIR, name), **d)
    print(name, "mutate nbases:", nbases, "len:", len(final_seq))


def fix_refine(name, seed, ref_len=120, coverage=5, point_width=20, **kw):
    rng = np.random.default_rng(seed)
    pa, truth = simulate_session(rng, ref_len=ref_len, coverage=coverage, **kw)
    params = AlignParams.from_dict(pa.params)
    params.scoring_width = point_width
    from poreseq_tpu.engine.driver import find_point_mutations
    from poreseq_tpu.engine.types import AlignData

    data = AlignData.from_session(pa)
    muts = find_point_mutations(data)
    b = io.BytesIO()
    w_i32(b, 6)
    write_common(b, pa, params)
    w_i32(b, len(muts))
    for m in muts:
        w_i32(b, m.start)
        w_str(b, m.orig)
        w_str(b, m.mut)
    r = Reader(run_oracle(b.getvalue()))
    n = r.i32()
    scores = r.arr(n)
    final_seq = r.s()
    nbases = r.i32()
    d = session_npz(pa)
    d["mode"] = 6
    d["point_width"] = point_width
    d["out_scores"] = scores
    d["out_seq"] = final_seq
    d["out_nbases"] = nbases
    np.savez_compressed(os.path.join(OUTDIR, name), **d)
    print(name, "refine nbases:", nbases)


if __name__ == "__main__":
    os.makedirs(OUTDIR, exist_ok=True)
    fix_score_events("score_events_a.npz", 101)
    fix_score_events("score_events_b.npz", 202, ref_len=150, coverage=3,
                     draft_error=0.05)
    fix_score_muts("score_muts_a.npz", 303)
    fix_score_muts("score_muts_b.npz", 404, ref_len=150, coverage=3,
                   draft_error=0.05, n_muts=60)
    fix_viterbi("viterbi_a.npz", 505)
    fix_swfull("swfull_a.npz", 606)
    fix_swfull("swfull_b.npz", 707, n1=300, n2=1200)
    fix_mutate("mutate_a.npz", 808, draft_error=0.04)
    fix_refine("refine_a.npz", 909, draft_error=0.05)
    print("done")
