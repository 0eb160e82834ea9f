"""End-to-end consensus convergence on synthetic data (exact backend).

This mirrors the reference's built-in empirical self-check (`consensus -T`):
the mutation loop must drive a degraded draft back toward the truth
(SURVEY.md section 4).
"""

import numpy as np

from poreseq_tpu.api import swalign
from poreseq_tpu.sim import simulate_session


def _acc(a, b):
    return swalign(a, b)[0]


def test_mutate_and_refine_converge():
    rng = np.random.default_rng(7)
    pa, truth = simulate_session(rng, ref_len=300, coverage=8, draft_error=0.04)
    a0 = _acc(pa.sequence, truth)
    assert a0 < 99.0
    pa.Mutate(reps=3)
    a1 = _acc(pa.sequence, truth)
    assert a1 > a0
    pa.Refine()
    a2 = _acc(pa.sequence, truth)
    assert a2 >= 99.5


def test_low_coverage_scores():
    rng = np.random.default_rng(42)
    pa, truth = simulate_session(rng, ref_len=300, coverage=6)
    scores = pa.ScoreEvents()
    assert len(scores) == 6
    assert all(s > 0 for s in scores)


def test_score_points_prefers_no_change():
    # on a perfect draft, the overwhelming majority of point mutations must
    # score negative
    rng = np.random.default_rng(3)
    pa, truth = simulate_session(rng, ref_len=150, coverage=6)
    pa.params["point_width"] = 20
    scores = pa.ScorePoints()
    neg = sum(1 for s in scores if s.score < 0)
    assert neg / len(scores) > 0.95


def test_variant_scoring_detects_real_variant():
    # events simulated from a sequence that differs from the draft at one
    # base: that mutation must score positive, and a random other one negative
    rng = np.random.default_rng(11)
    pa, truth = simulate_session(rng, ref_len=200, coverage=8)
    pos = 100
    orig = truth[pos]
    sub = "A" if orig != "A" else "C"
    draft = truth[:pos] + sub + truth[pos + 1 :]
    pa.sequence = draft  # draft has a wrong base at pos

    from poreseq_tpu.core.regions import MutationInfo

    m_fix = MutationInfo()
    m_fix.start, m_fix.orig, m_fix.mut = pos, sub, orig  # corrects the error
    m_bad = MutationInfo()
    m_bad.start, m_bad.orig, m_bad.mut = 50, truth[50], (
        "G" if truth[50] != "G" else "T"
    )
    out = pa.ScoreMutations([m_fix, m_bad])
    assert out[0].score > 0
    assert out[1].score < 0


def test_realign_to():
    rng = np.random.default_rng(5)
    pa, truth = simulate_session(rng, ref_len=200, coverage=4)
    base = float(np.sum(pa.ScoreEvents()))
    from poreseq_tpu.sim import mutate_seq

    var = mutate_seq(rng, truth, 0.02)
    pav = pa.Copy()
    pav.RealignTo(var)
    assert pav.sequence == var
    var_score = float(np.sum(pav.ScoreEvents()))
    # truth should outscore a corrupted variant
    assert var_score < base
