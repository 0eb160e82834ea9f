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
from ...core.events import update_refs
from .align import FILLS, FUSED, backtrace_device
from .pack import fill_inputs, pack_events, round_up, to_device_batch


class TpuEngine:
    """Drop-in engine with the same primitive surface as ExactEngine.

    dtype: jnp.float32 on TPU (default); tests may use float64 on CPU to
    check against the exact oracle with tight tolerances."""

    name = "tpu"

    def __init__(self, dtype=None):
        self.dtype = dtype or jnp.float32
        # one-region device-batch cache: event level/model data is constant
        # across engine calls (only ref_align changes, which lives host-side),
        # so the ~35 MB batch upload happens once per region
        self._bcache = None

    # ---------------- core fills ----------------

    @staticmethod
    def _fingerprint(events):
        return (len(events),) + tuple(
            (len(ev.mean),
             float(ev.mean[0]) if len(ev.mean) else 0.0,
             float(ev.model.level_mean[0]))
            for ev in events)

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

        fp = self._fingerprint(data.events)
        ref_indexes = [update_refs(ev.ref_align)[0] for ev in data.events]
        if self._bcache is not None and self._bcache[0] == fp:
            _, batch, arrays = self._bcache
            E_pad = len(arrays["n0"])
            ref_indexes += [np.zeros(0)] * (E_pad - len(ref_indexes))
            active = np.array([len(r) > 0 for r in ref_indexes])
            if not np.array_equal(active, arrays["active"]):
                arrays = dict(arrays, active=active)
                batch = batch._replace(active=jnp.asarray(active))
                self._bcache = (fp, batch, arrays)
        else:
            arrays, ref_indexes = pack_events(data.events)
            batch = to_device_batch(arrays, self.dtype)
            self._bcache = (fp, batch, arrays)
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
        T = arrays["mean"].shape[1]
        max_steps = int(S_pad + 2 * T + 8)
        fused = FUSED.fwd(p.realign_width, self.dtype)
        dd = fi["fwd"]
        res, ral, rlk = fused(
            batch, jnp.asarray(states_pad), jnp.asarray(fi["i0"]),
            jnp.asarray(fi["i1"]), dd["win0"], dd["refills"],
            jnp.asarray(fi["is_pad"]), float(p.lik_offset),
            t_pad=T, max_steps=max_steps,
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
