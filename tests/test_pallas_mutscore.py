"""Fused Pallas group scorer vs the XLA group kernel (interpret mode, CPU).

Both paths implement the reference's splice-and-refill mutation rescoring
(Alignment.cpp:447-512); they must agree to f32 reassociation tolerance
(the in-column max-plus scan trees differ, as for pallas_fill).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(autouse=True)
def _no_persistent_cache():
    """Serializing the CPU pallas executable for the persistent compilation
    cache segfaults in jaxlib (put_executable_and_time); keep the cache off
    for these tests only.  The enable flag alone does not gate cache WRITES,
    so clear the cache dir too."""
    old = jax.config.jax_enable_compilation_cache
    old_dir = jax.config.jax_compilation_cache_dir
    jax.config.update("jax_enable_compilation_cache", False)
    jax.config.update("jax_compilation_cache_dir", None)
    yield
    jax.config.update("jax_enable_compilation_cache", old)
    jax.config.update("jax_compilation_cache_dir", old_dir)

from poreseq_tpu.core.regions import MutationInfo
from poreseq_tpu.engine.types import AlignData
from poreseq_tpu.sim import simulate_session


def _session(seed=42, **kw):
    rng = np.random.default_rng(seed)
    kw.setdefault("ref_len", 160)
    kw.setdefault("coverage", 4)
    return simulate_session(rng, **kw)


def _mut(start, orig, mut):
    m = MutationInfo()
    m.start, m.orig, m.mut = start, orig, mut
    return m


def _rand_muts(rng, seq, n):
    muts = []
    for _ in range(n):
        start = int(rng.integers(0, len(seq) - 6))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            o, mu = seq[start], "ACGT"[int(rng.integers(0, 4))]
        elif kind == 1:
            o, mu = "", "ACGT"[int(rng.integers(0, 4))]
        else:
            o, mu = seq[start : start + int(rng.integers(1, 4))], ""
        muts.append(_mut(start, o, mu))
    # tail mutations exercising the k_star<0 wide-join fallback
    muts.append(_mut(len(seq) - 1, seq[-1], ""))
    muts.append(_mut(len(seq) - 1, seq[-1], "A"))
    muts.append(_mut(len(seq), "", "C"))
    return muts


def _scores(monkeypatch, mode, sessions, muts_list):
    from poreseq_tpu.engine.tpu import TpuEngine

    monkeypatch.setenv("PSQ_PALLAS_MUTSCORE", mode)
    eng = TpuEngine(dtype=jnp.float32)
    datas = [AlignData.from_session(pa) for pa in sessions]
    out = eng.score_mutations_multi(datas, muts_list)
    return [np.array([m.score for m in ms]) for ms in out]


def _compare(a_list, b_list):
    for a, b in zip(a_list, b_list):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=3e-3)


@pytest.mark.slow
def test_pallas_mutscore_single_region(monkeypatch):
    rng = np.random.default_rng(7)
    pa, _ = _session(seed=11, ref_len=120, coverage=3, draft_error=0.04)
    muts = _rand_muts(rng, pa.sequence, 16)
    ref = _scores(monkeypatch, "0", [pa], [muts])
    got = _scores(monkeypatch, "interp", [pa], [muts])
    _compare(ref, got)


@pytest.mark.slow
def test_pallas_mutscore_multi_region(monkeypatch):
    rng = np.random.default_rng(3)
    pa1, _ = _session(seed=21, ref_len=160, draft_error=0.04)
    pa2, _ = _session(seed=22, ref_len=120, coverage=3, draft_error=0.04)
    muts1 = _rand_muts(rng, pa1.sequence, 18)
    muts2 = _rand_muts(rng, pa2.sequence, 12)
    ref = _scores(monkeypatch, "0", [pa1, pa2], [muts1, muts2])
    got = _scores(monkeypatch, "interp", [pa1, pa2], [muts1, muts2])
    _compare(ref, got)
