"""Synthetic nanopore squiggle simulator.

Generates 5-mer models, reference sequences, and event traces consistent with
the reference's generative assumptions (Gaussian level mean, inverse-Gaussian
level noise, skip/stay/insert transitions — cpp/Alignment.cpp:167-174 and
Appendix A of SURVEY.md), so the full consensus/variant pipeline can be
exercised and benchmarked without real fast5 data.
"""

from __future__ import annotations

import numpy as np

from .core.events import Event, Model
from .core.sequence import revcomp, seq_to_states

_BASES = np.array(list("ACGT"))


def random_seq(rng: np.random.Generator, n: int) -> str:
    return "".join(_BASES[rng.integers(0, 4, n)])


def make_model(rng: np.random.Generator, complement: bool = False) -> Model:
    """A synthetic but ONT-shaped 1024-entry 5-mer model: distinct current
    levels per kmer, modest spread, positive noise scales."""
    m = Model()
    m.level_mean = rng.permutation(np.linspace(40.0, 90.0, 1024)) + rng.normal(
        0, 0.3, 1024
    )
    m.level_stdv = rng.uniform(0.8, 1.6, 1024)
    m.sd_mean = rng.uniform(0.8, 1.8, 1024)
    m.sd_stdv = rng.uniform(0.3, 0.7, 1024)
    m.complement = complement
    m.name = "synthetic"
    return m


def mutate_seq(rng: np.random.Generator, seq: str, error_rate: float) -> str:
    """Introduce random substitutions/insertions/deletions at error_rate."""
    out = []
    for c in seq:
        r = rng.random()
        if r < error_rate:
            kind = rng.integers(0, 3)
            if kind == 0:  # substitution
                out.append(str(_BASES[rng.integers(0, 4)]))
            elif kind == 1:  # insertion
                out.append(c)
                out.append(str(_BASES[rng.integers(0, 4)]))
            # kind == 2: deletion -> skip
        else:
            out.append(c)
    return "".join(out)


def simulate_levels(
    rng: np.random.Generator,
    seq: str,
    model: Model,
    p_skip: float = 0.1,
    p_stay: float = 0.08,
    p_insert: float = 0.01,
):
    """Walk the sequence's 5-mer states emitting noisy current levels.

    Returns (mean, stdv, truth_align) where truth_align[i] is the 1-based
    sequence state index each level was emitted from (-1 for inserts)."""
    states = seq_to_states(seq)
    lam = model.sd_mean**3 / model.sd_stdv**2
    means, stdvs, align = [], [], []
    for k, st in enumerate(states):
        if rng.random() < p_skip:
            continue
        n_emit = 1
        while rng.random() < p_stay:
            n_emit += 1
        for _ in range(n_emit):
            means.append(rng.normal(model.level_mean[st], model.level_stdv[st]))
            stdvs.append(rng.wald(model.sd_mean[st], lam[st]))
            align.append(k + 1)
        if rng.random() < p_insert:
            means.append(rng.uniform(40.0, 90.0))
            stdvs.append(rng.wald(1.2, 4.0))
            align.append(-1)
    return (
        np.asarray(means, dtype=np.float64),
        np.asarray(stdvs, dtype=np.float64),
        np.asarray(align, dtype=np.float64),
    )


def simulate_event(
    rng: np.random.Generator,
    true_seq: str,
    model: Model,
    seed_subsample: float = 0.25,
    seed_jitter: int = 2,
    basecall_error: float = 0.12,
    **kw,
) -> Event:
    """One synthetic strand: noisy levels from true_seq, a degraded 2D
    'basecalled' sequence, and a deliberately-imperfect seed ref_align
    (mimicking the BAM-derived seed the real loader produces)."""
    mean, stdv, truth = simulate_levels(rng, true_seq, model, **kw)
    n = len(mean)
    # degrade the truth alignment into a seed: subsample + jitter
    ref_align = np.zeros(n, dtype=np.float64)
    keep = (rng.random(n) < seed_subsample) & (truth > 0)
    jit = rng.integers(-seed_jitter, seed_jitter + 1, n)
    vals = np.clip(truth + jit, 1, max(len(true_seq) - 4, 1))
    ref_align[keep] = vals[keep]
    ev = Event(
        mean=mean,
        stdv=stdv,
        length=np.ones(n),
        start=np.arange(n, dtype=np.float64),
        ref_align=ref_align,
        ref_like=np.zeros(n),
        model=model,
        sequence=mutate_seq(rng, true_seq, basecall_error),
    )
    return ev


def simulate_session(
    rng: np.random.Generator,
    ref_len: int = 1000,
    coverage: int = 10,
    draft_error: float = 0.0,
    backend: str = "exact",
    params: dict | None = None,
    **kw,
):
    """Build a PSAlign session over a synthetic region.

    draft_error > 0 degrades the loaded reference so the consensus loop has
    real errors to correct (truth is returned for accuracy checks)."""
    from .api import PSAlign

    truth = random_seq(rng, ref_len)
    draft = mutate_seq(rng, truth, draft_error) if draft_error > 0 else truth
    pa = PSAlign(backend=backend)
    pa.sequence = draft
    pa.params = dict(params or {})
    pa.params.setdefault("verbose", 0)
    events = []
    for _ in range(coverage):
        model = make_model(np.random.default_rng(rng.integers(1 << 31)))
        ev = simulate_event(rng, truth, model, **kw)
        events.append(ev)
    pa.events = events
    return pa, truth
