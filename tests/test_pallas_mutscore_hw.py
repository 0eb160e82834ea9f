"""Hardware parity of the fused Pallas mutation scorer at PRODUCTION shape.

Runs only on a real TPU chip (the rest of the suite forces CPU; launch with
``PSQ_TPU_TESTS=1 python -m pytest tests/test_pallas_mutscore_hw.py``).
A production-shape Refine call (1 kb region, 10X coverage, point_width 20,
all 9 point mutations per base — cpp/FindMutations.cpp:191-234) is scored
by the fused Pallas kernel, the XLA group kernel, and the exact f64 oracle:

  * fused vs XLA: ZERO accept-sign flips (greedy acceptance keeps score > 0,
    cpp/MakeMutations.cpp:74-146) and elementwise agreement to f32
    reassociation tolerance — the reproducible form of the PERF.md claim;
  * fused vs exact oracle: signs agree wherever the f64 score is away from
    zero (|score| > 0.5; near-ties are legitimate f32-vs-f64 divergence,
    PARITY.md).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from poreseq_tpu.engine.driver import find_point_mutations
from poreseq_tpu.engine.types import AlignData
from poreseq_tpu.sim import simulate_session

pytestmark = pytest.mark.slow

PROD = dict(realign_width=300, scoring_width=100, point_width=20, verbose=0)


def _need_tpu():
    if jax.default_backend() != "tpu":
        pytest.skip("needs a real TPU chip (PSQ_TPU_TESTS=1)")


def _scores(monkeypatch, mode, datas, muts_list):
    from poreseq_tpu.engine.tpu import TpuEngine

    monkeypatch.setenv("PSQ_PALLAS_MUTSCORE", mode)
    eng = TpuEngine(dtype=jnp.float32)
    out = eng.score_mutations_multi(
        [AlignData(sequence=d.sequence,
                   events=[ev.light_copy() for ev in d.events],
                   params=d.params) for d in datas],
        muts_list)
    return [np.array([m.score for m in ms]) for ms in out]


def test_pallas_mutscore_hw_parity_refine(monkeypatch):
    _need_tpu()
    pa, _ = simulate_session(np.random.default_rng(5), ref_len=1000,
                             coverage=10, draft_error=0.03, backend="tpu",
                             params=dict(PROD))
    data = AlignData.from_session(pa)
    data.params.scoring_width = PROD["point_width"]      # as Refine does
    muts = find_point_mutations(data)
    assert len(muts) > 7000  # production Refine scale (~9 per base - ends)

    xla = _scores(monkeypatch, "0", [data], [muts])[0]
    fused = _scores(monkeypatch, "1", [data], [muts])[0]

    flips = int(np.sum((xla > 0) != (fused > 0)))
    assert flips == 0, f"{flips} accept-sign flips fused vs XLA"
    np.testing.assert_allclose(fused, xla, rtol=2e-4, atol=3e-3)

    # exact f64 oracle on the same state
    from poreseq_tpu.engine.exact import ExactEngine

    exact_eng = ExactEngine()
    exact = np.array([
        m.score for m in exact_eng.score_mutations(
            AlignData(sequence=data.sequence,
                      events=[ev.light_copy() for ev in data.events],
                      params=data.params), muts)])
    away = np.abs(exact) > 0.5
    flips_vs_exact = int(np.sum((exact[away] > 0) != (fused[away] > 0)))
    assert flips_vs_exact == 0, (
        f"{flips_vs_exact} sign flips vs exact oracle away from zero")
