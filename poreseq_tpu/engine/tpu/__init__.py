"""TPU engine backend: batched JAX/XLA banded DP, device backtrace, batched
mutation delta-scoring.  Control flow (FindMutations / MakeMutations) is
shared with the exact backend via engine/driver.py."""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp

from ...core.sequence import seq_to_states
from ...core.regions import MutationScore
from ..types import AlignData, make_mutscores
from ..exact.align import likes_contribution
from ..exact.sw import map_alignments as _map_alignments
from .align import FILLS, backtrace_device
from .pack import fill_inputs, pack_events, round_up, to_device_batch


class TpuEngine:
    """Drop-in engine with the same primitive surface as ExactEngine.

    dtype: jnp.float32 on TPU (default); tests may use float64 on CPU to
    check against the exact oracle with tight tolerances."""

    name = "tpu"

    def __init__(self, dtype=None):
        self.dtype = dtype or jnp.float32

    # ---------------- core fills ----------------

    def _prepare(self, data: AlignData):
        states = seq_to_states(data.sequence)
        S = len(states)
        # keep at least one dead (all-zero) padding column past S: the
        # mutation kernel indexes it for rab=0 (no-suffix) joins
        S_pad = round_up(max(S, 8) + 8, 64)
        states_pad = np.full(S_pad, -1, dtype=np.int32)
        states_pad[:S] = states
        states_rev_pad = np.full(S_pad, -1, dtype=np.int32)
        states_rev_pad[:S] = states[::-1]
        arrays, ref_indexes = pack_events(data.events)
        batch = to_device_batch(arrays, self.dtype)
        n0 = arrays["n0"]
        return states, S, S_pad, states_pad, states_rev_pad, batch, arrays, ref_indexes, n0

    def _fill_dir(self, batch, states_pad, fi, width, lik_offset, backward):
        """One fill direction over the shared rate-limited geometry.  The
        backward matrix's backpointers are never read (the backtrace is
        forward-only), so they are skipped there."""
        fill = FILLS.get(width, self.dtype, need_steps=not backward)
        dd = fi["bwd"] if backward else fi["fwd"]
        res = fill(batch, jnp.asarray(states_pad), jnp.asarray(fi["i0"]),
                   jnp.asarray(fi["i1"]), dd["win0"], dd["refills"],
                   jnp.asarray(fi["is_pad"]), float(lik_offset), b=backward)
        return res

    # ---------------- engine primitives ----------------

    def score_alignments(self, data: AlignData, likes=None):
        """ScoreAlignments: realign all events (fwd fill + backtrace), update
        events in place, return scores, optionally accumulate likes."""
        (states, S, S_pad, states_pad, _srp, batch, arrays, ref_indexes,
         n0) = self._prepare(data)
        p = data.params
        fi = fill_inputs(arrays, ref_indexes, S, S_pad, p.realign_width)
        res = self._fill_dir(batch, states_pad, fi, p.realign_width,
                             p.lik_offset, backward=False)
        T = arrays["mean"].shape[1]
        max_steps = int(S_pad + 2 * T + 8)
        ral, rlk = backtrace_device(
            res.M, res.S, res.steps_m, res.steps_s, res.i0, res.i1,
            res.best_i, res.best_j, t_pad=T, max_steps=max_steps,
        )
        ral = np.asarray(ral, dtype=np.float64)
        rlk = np.asarray(rlk, dtype=np.float64)
        best = np.asarray(res.best, dtype=np.float64)
        scores = []
        for e, ev in enumerate(data.events):
            n = int(n0[e])
            if arrays["active"][e]:
                ev.ref_align = ral[e, :n].copy()
                ev.ref_like = rlk[e, :n].copy()
            scores.append(float(best[e]))
            if likes is not None:
                likes += likes_contribution(ev.ref_align, ev.ref_like, S,
                                            len(data.sequence))
        return scores

    def map_alignments(self, data: AlignData, newseq: str):
        # host-side SW remap (same numerics as the exact engine)
        return _map_alignments(data, newseq)

    def score_mutations(self, data: AlignData, muts):
        from .mutscore import score_mutations_tpu

        if data.params.verbose:
            sys.stderr.write("Scoring[tpu] ({})".format(data.params.scoring_width))
        out = score_mutations_tpu(self, data, muts)
        if data.params.verbose:
            sys.stderr.write("\n")
        return out

    def viterbi_mutate(self, events, nkeep, skip_prob, stay_prob, mut_min,
                       mut_max, verbose=False):
        from .viterbi import viterbi_mutate_tpu

        return viterbi_mutate_tpu(events, nkeep, skip_prob, stay_prob,
                                  mut_min, mut_max, verbose)

    @staticmethod
    def swalign(seq1: str, seq2: str):
        from ..exact.sw import swalign

        return swalign(seq1, seq2)
