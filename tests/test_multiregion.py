"""Cross-region batching: events of SEVERAL regions (different sequences,
different lengths) share one device batch / one fill program.

The per-event-states fill ([C, E] states, per-event padding columns) must
reproduce the single-region fills event-for-event, and the multi-region
engine entry points must match per-region engine calls exactly (same dtype,
same program structure => identical floats on CPU f64).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poreseq_tpu.core.sequence import seq_to_states
from poreseq_tpu.engine.types import AlignData
from poreseq_tpu.sim import simulate_session


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _sessions():
    rng = np.random.default_rng(101)
    pa1, t1 = simulate_session(rng, ref_len=150, coverage=3)
    pa2, t2 = simulate_session(rng, ref_len=210, coverage=4)
    return [AlignData.from_session(pa1), AlignData.from_session(pa2)]


def _small_widths(datas):
    for d in datas:
        d.params.realign_width = 24
        d.params.scoring_width = 8


def _rand_muts(rng, seq, n):
    from poreseq_tpu.core.regions import MutationInfo

    muts = []
    for _ in range(n):
        start = int(rng.integers(0, len(seq) - 6))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            o, mu = seq[start], "ACGT"[int(rng.integers(0, 4))]
        elif kind == 1:
            o, mu = "", "ACGT"[int(rng.integers(0, 4))]
        else:
            o, mu = seq[start : start + int(rng.integers(1, 3))], ""
        mi = MutationInfo()
        mi.start, mi.orig, mi.mut = start, o, mu
        muts.append(mi)
    return muts


def _single_fill(data, width, dtype):
    from poreseq_tpu.engine.tpu.align import backtrace_core
    from poreseq_tpu.engine.tpu.dp import make_fill
    from poreseq_tpu.engine.tpu.pack import (
        fill_inputs, pack_events, round_up, to_device_batch,
    )

    states = seq_to_states(data.sequence)
    S = len(states)
    S_pad = round_up(S + 8, 64)
    states_pad = np.full(S_pad, -1, dtype=np.int32)
    states_pad[:S] = states
    arrays, ref_indexes = pack_events(data.events)
    batch = to_device_batch(arrays, dtype)
    fi = fill_inputs(arrays, ref_indexes, S, S_pad, width)
    fill = make_fill(width, dtype)
    T = arrays["mean"].shape[1]
    res = fill(batch, jnp.asarray(states_pad), jnp.asarray(fi["i0"]),
               jnp.asarray(fi["i1"]),
               tuple(jnp.asarray(w, dtype) for w in fi["fwd"]["win0"]),
               tuple(jnp.asarray(x, dtype) for x in fi["fwd"]["refills"]),
               jnp.asarray(fi["is_pad"]), 4.5, False)
    resb = make_fill(width, dtype, need_steps=False)(
        batch, jnp.asarray(states_pad), jnp.asarray(fi["i0"]),
        jnp.asarray(fi["i1"]),
        tuple(jnp.asarray(w, dtype) for w in fi["bwd"]["win0"]),
        tuple(jnp.asarray(x, dtype) for x in fi["bwd"]["refills"]),
        jnp.asarray(fi["is_pad"]), 4.5, True)
    ral, rlk = backtrace_core(res.M, res.S, res.steps_m, res.steps_s,
                              res.i0, res.i1, res.best_i, res.best_j,
                              t_pad=T, max_steps=int(S_pad + 2 * T + 8))
    nreal = len(data.events)
    n0 = arrays["n0"]
    return dict(best=np.asarray(res.best)[:nreal],
                bbest=np.asarray(resb.best)[:nreal],
                ral=[np.asarray(ral)[e, : n0[e]] for e in range(nreal)],
                rlk=[np.asarray(rlk)[e, : n0[e]] for e in range(nreal)])


def test_fill_per_event_states_matches_single(x64):
    from poreseq_tpu.engine.tpu.align import backtrace_core
    from poreseq_tpu.engine.tpu.dp import make_fill
    from poreseq_tpu.engine.tpu.pack import (
        fill_inputs, pack_events, round_up, to_device_batch,
    )

    datas = _sessions()
    width = 16
    dtype = jnp.float64
    singles = [_single_fill(d, width, dtype) for d in datas]

    # ---- combined batch ----
    events = [ev for d in datas for ev in d.events]
    ev_region = np.array([r for r, d in enumerate(datas)
                          for _ in d.events])
    arrays, ref_indexes = pack_events(events)
    E = len(arrays["n0"])
    batch = to_device_batch(arrays, dtype)

    states_list = [seq_to_states(d.sequence) for d in datas]
    S_list = [len(s) for s in states_list]
    C = round_up(max(S_list) + 8, 64)
    S_e = np.zeros(E, dtype=np.int64)
    states2 = np.full((C, E), -1, dtype=np.int32)
    for e in range(len(events)):
        r = ev_region[e]
        S_e[e] = S_list[r]
        states2[: S_list[r], e] = states_list[r]

    fi = fill_inputs(arrays, ref_indexes, S_e, C, width)
    assert fi["is_pad"].shape == (C, E)
    fill = make_fill(width, dtype)
    T = arrays["mean"].shape[1]
    res = fill(batch, jnp.asarray(states2), jnp.asarray(fi["i0"]),
               jnp.asarray(fi["i1"]),
               tuple(jnp.asarray(w, dtype) for w in fi["fwd"]["win0"]),
               tuple(jnp.asarray(x, dtype) for x in fi["fwd"]["refills"]),
               jnp.asarray(fi["is_pad"]), 4.5, False)
    resb = make_fill(width, dtype, need_steps=False)(
        batch, jnp.asarray(states2), jnp.asarray(fi["i0"]),
        jnp.asarray(fi["i1"]),
        tuple(jnp.asarray(w, dtype) for w in fi["bwd"]["win0"]),
        tuple(jnp.asarray(x, dtype) for x in fi["bwd"]["refills"]),
        jnp.asarray(fi["is_pad"]), 4.5, True)
    ral, rlk = backtrace_core(res.M, res.S, res.steps_m, res.steps_s,
                              res.i0, res.i1, res.best_i, res.best_j,
                              t_pad=T, max_steps=int(C + 2 * T + 8))
    best = np.asarray(res.best)
    bbest = np.asarray(resb.best)
    ral = np.asarray(ral)
    rlk = np.asarray(rlk)

    e = 0
    n0 = arrays["n0"]
    for r, d in enumerate(datas):
        s = singles[r]
        for k in range(len(d.events)):
            assert best[e] == s["best"][k], (r, k)
            assert bbest[e] == s["bbest"][k], (r, k)
            np.testing.assert_array_equal(ral[e, : n0[e]], s["ral"][k])
            np.testing.assert_array_equal(rlk[e, : n0[e]], s["rlk"][k])
            e += 1


def test_engine_score_alignments_multi_matches_single(x64):
    from poreseq_tpu.engine.tpu import TpuEngine

    datas_s = _sessions()
    datas_m = _sessions()
    _small_widths(datas_s)
    _small_widths(datas_m)

    eng = TpuEngine(dtype=jnp.float64)
    likes_s = [np.zeros(len(d.sequence)) for d in datas_s]
    scores_s = [eng.score_alignments(d, likes=l)
                for d, l in zip(datas_s, likes_s)]

    eng2 = TpuEngine(dtype=jnp.float64)
    likes_m = [np.zeros(len(d.sequence)) for d in datas_m]
    scores_m = eng2.score_alignments_multi(datas_m, likes_list=likes_m)

    for r in range(len(datas_s)):
        np.testing.assert_array_equal(scores_s[r], scores_m[r])
        np.testing.assert_array_equal(likes_s[r], likes_m[r])
        for es, em in zip(datas_s[r].events, datas_m[r].events):
            np.testing.assert_array_equal(es.ref_align, em.ref_align)
            np.testing.assert_array_equal(es.ref_like, em.ref_like)


def test_engine_score_mutations_multi_matches_single(x64):
    from poreseq_tpu.engine.tpu import TpuEngine

    rng = np.random.default_rng(7)
    datas_s = _sessions()
    datas_m = _sessions()
    _small_widths(datas_s)
    _small_widths(datas_m)
    muts_s = [_rand_muts(rng, d.sequence, 12) for d in datas_s]
    muts_m = [[type(m)() for m in ms] for ms in muts_s]
    for ms, mm in zip(muts_s, muts_m):
        for a, b in zip(ms, mm):
            b.start, b.orig, b.mut = a.start, a.orig, a.mut

    eng = TpuEngine(dtype=jnp.float64)
    res_s = [eng.score_mutations(d, ms) for d, ms in zip(datas_s, muts_s)]
    eng2 = TpuEngine(dtype=jnp.float64)
    res_m = eng2.score_mutations_multi(datas_m, muts_m)

    for r in range(len(datas_s)):
        ss = np.array([m.score for m in res_s[r]])
        sm = np.array([m.score for m in res_m[r]])
        np.testing.assert_array_equal(ss, sm)
        for es, em in zip(datas_s[r].events, datas_m[r].events):
            np.testing.assert_array_equal(es.ref_align, em.ref_align)


def test_engine_multi_skips_empty_regions(x64):
    from poreseq_tpu.engine.tpu import TpuEngine

    rng = np.random.default_rng(8)
    datas = _sessions()
    _small_widths(datas)
    ra_before = [ev.ref_align.copy() for ev in datas[1].events]
    muts = [_rand_muts(rng, datas[0].sequence, 5), []]
    eng = TpuEngine(dtype=jnp.float64)
    res = eng.score_mutations_multi(datas, muts)
    assert len(res[0]) == 5 and res[1] == []
    # region 1 (no muts) must be untouched, like the single-region early return
    for ev, ra in zip(datas[1].events, ra_before):
        np.testing.assert_array_equal(ev.ref_align, ra)


def test_lockstep_mutate_refine_matches_sequential(x64):
    """mutate_datas/refine_datas (lockstep across regions) must produce the
    exact per-region sequences of the sequential driver loop."""
    from poreseq_tpu.engine import driver
    from poreseq_tpu.engine.multi import mutate_datas, refine_datas
    from poreseq_tpu.engine.tpu import TpuEngine

    def make(seed_off=0):
        rng = np.random.default_rng(55)
        pa1, _ = simulate_session(rng, ref_len=120, coverage=5,
                                  draft_error=0.05)
        pa2, _ = simulate_session(rng, ref_len=170, coverage=5,
                                  draft_error=0.05)
        ds = [AlignData.from_session(pa1), AlignData.from_session(pa2)]
        _small_widths(ds)
        return ds

    REPS = 2
    # ---- sequential reference: the single-region driver loop per region ----
    datas_s = make()
    eng = TpuEngine(dtype=jnp.float64)
    for d in datas_s:
        seqs = [x.sequence for x in d.events[::2]]
        for _ in range(REPS):
            muts = driver.find_mutations(eng, d, seqs)
            scores = eng.score_mutations(d, muts)
            if driver.make_mutations(eng, d, scores) == 0:
                break
        d.params.scoring_width = 6
        pmuts = driver.find_point_mutations(d)
        pscores = eng.score_mutations(d, pmuts)
        driver.make_mutations(eng, d, pscores)

    # ---- lockstep ----
    datas_m = make()
    eng2 = TpuEngine(dtype=jnp.float64)
    seqs_list = [[x.sequence for x in d.events[::2]] for d in datas_m]
    mutate_datas(eng2, datas_m, seqs_list, REPS)
    refine_datas(eng2, datas_m, point_width=6)

    for ds, dm in zip(datas_s, datas_m):
        assert ds.sequence == dm.sequence


def test_cli_consensus_region_batch(tmp_path):
    """End-to-end: `poreseq consensus --region-batch 2 --backend tpu` over two
    regions converges on both (narrow widths keep CPU compile time sane)."""
    import os

    from poreseq_tpu import cli
    from poreseq_tpu.api import swalign
    from poreseq_tpu.io.fasta import read_fasta
    from poreseq_tpu.sim import write_run

    d = str(tmp_path)
    rng = np.random.default_rng(77)
    truth, draft, reads_dir, bam, fasta = write_run(
        d, rng, ref_len=400, n_reads=6, draft_error=0.03)
    conf = os.path.join(d, "params.conf")
    with open(conf, "w") as f:
        f.write(
            "realign_width = 48\nscoring_width = 24\npoint_width = 12\n"
            "min_coverage = 0\nmax_coverage = 30\nmin_overlap = 50\n"
            "max_length = 10000\nlik_offset = 4.5\n")
    rf = os.path.join(d, "regions.txt")
    with open(rf, "w") as f:
        f.write("synthref:0:220\nsynthref:180:400\n")
    out = os.path.join(d, "out.fasta")
    cli.main([
        "consensus", fasta, bam, reads_dir, "-R", rf, "-p", conf,
        "-o", out, "-i", "2", "--backend", "tpu", "--region-batch", "2",
    ])
    seqs = read_fasta(out)
    assert len(seqs) == 2
    for name, seq in seqs.items():
        ri = name.split(":")
        a, b = int(ri[1]), int(ri[2])
        acc = swalign(seq, truth[a:b])[0]
        assert acc >= 98.5, (name, acc)


def test_cli_region_batch_oom_halving(tmp_path, monkeypatch, capsys):
    """Batch-width halving fallback: when the lockstep batch fails at widths
    >1 (e.g. device OOM), the CLI retries at half the width down to the
    sequential path and still emits every region (no region skipped by a
    batch-level failure)."""
    import os

    from poreseq_tpu import cli

    d = str(tmp_path)
    ref = os.path.join(d, "ref.fasta")
    with open(ref, "w") as f:
        f.write(">r\nACGT\n")

    calls = []

    def fake_mutate_many(ref_, bam, rdir, chunk, **kw):
        calls.append(("many", len(chunk)))
        raise RuntimeError("RESOURCE_EXHAUSTED: fake")

    def fake_mutate(ref_, bam, rdir, region=None, **kw):
        calls.append(("one", region))
        if region == "r:2:3":
            raise RuntimeError("bad region")
        return "ACGT", 100.0

    import poreseq_tpu.pipeline as pipeline

    monkeypatch.setattr(pipeline, "mutate_many", fake_mutate_many)
    monkeypatch.setattr(cli, "mutate", fake_mutate)

    rf = os.path.join(d, "regions.txt")
    with open(rf, "w") as f:
        f.write("r:0:1\nr:1:2\nr:2:3\nr:3:4\n")
    out = os.path.join(d, "out.fasta")
    cli.main([
        "consensus", ref, "x.bam", d, "-R", rf, "-o", out,
        "--region-batch", "4",
    ])

    from poreseq_tpu.io.fasta import read_fasta

    seqs = read_fasta(out)
    # every region except the genuinely bad one made it to the output
    assert set(seqs) == {"r:0:1", "r:1:2", "r:3:4"}
    # widths walked 4 -> 2 -> 1 (batched attempts fail, singles succeed)
    assert ("many", 4) in calls and ("many", 2) in calls
    assert ("one", "r:0:1") in calls
    err = capsys.readouterr().err
    assert "retrying at 2" in err and "Skipping r:2:3" in err
