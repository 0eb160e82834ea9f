#!/usr/bin/env python3
"""Round-5 targeted probes on the real chip.

Probe B: candidate-chunk fill cost — same-events cache hit vs fresh light
copies (isolates the per-chunk H2D upload + pack cost hidden in read syncs).

Probe A: Mutate-width ScoreMutations (Ws=201) with a realistic mixed
mutation-length set — time the XLA group kernel at K_all=46 (one long mut
forces the bucket) vs the same call with only short muts (K=16), to bound
the win of per-K group partitioning.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def sync(x):
    return float(np.asarray(x).ravel()[0])


def main():
    import jax.numpy as jnp

    from poreseq_tpu.core.regions import MutationInfo
    from poreseq_tpu.engine.tpu import TpuEngine
    from poreseq_tpu.engine.types import AlignData
    from poreseq_tpu.sim import simulate_session

    which = sys.argv[1] if len(sys.argv) > 1 else "AB"

    params = dict(realign_width=300, scoring_width=100, point_width=20,
                  verbose=0)
    R = 8
    datas = []
    for r in range(R):
        pa, _ = simulate_session(np.random.default_rng(100 + r), ref_len=1000,
                                 coverage=10, draft_error=0.02, backend="tpu",
                                 params=dict(params))
        datas.append(AlignData.from_session(pa))
    eng = TpuEngine()

    if "B" in which:
        # ---- Probe B: chunk fill with same events vs fresh copies ----
        def fresh():
            return [AlignData(sequence=d.sequence,
                              events=[ev.light_copy() for ev in d.events],
                              params=d.params) for d in datas]

        same = fresh()           # one fixed snapshot list
        likes = lambda ds: [np.zeros(len(d.sequence)) for d in ds]
        eng.score_alignments_multi(same, likes_list=likes(same),
                                   likes_only=True)   # compile + warm + cache
        t0 = time.perf_counter()
        for _ in range(5):
            eng.score_alignments_multi(same, likes_list=likes(same),
                                       likes_only=True)
        t_hit = (time.perf_counter() - t0) / 5
        t0 = time.perf_counter()
        for _ in range(5):
            f = fresh()
            eng.score_alignments_multi(f, likes_list=likes(f),
                                       likes_only=True)
        t_miss = (time.perf_counter() - t0) / 5
        print("probeB: likes fill same-events {:.3f}s fresh-copies {:.3f}s "
              "(delta = pack+upload {:.3f}s)".format(
                  t_hit, t_miss, t_miss - t_hit))

    if "A" in which:
        # ---- Probe A: Mutate-width kernel, K=46 vs K=16 shapes ----
        rng = np.random.default_rng(0)

        def mk_muts(d, n, with_long):
            seq = d.sequence
            muts = []
            for i in range(n):
                st = int(rng.integers(10, len(seq) - 60))
                ln = int(rng.integers(1, 8))
                m = MutationInfo()
                m.start, m.orig = st, seq[st:st + ln]
                m.mut = "".join("ACGT"[int(rng.integers(0, 4))]
                                for _ in range(ln))
                muts.append(m)
            if with_long:
                st = int(rng.integers(10, len(seq) - 80))
                ln = 38
                m = MutationInfo()
                m.start, m.orig = st, seq[st:st + ln]
                m.mut = "".join("ACGT"[int(rng.integers(0, 4))]
                                for _ in range(ln))
                muts.append(m)
            return muts

        for tag, with_long in (("K16-only", False), ("K46-mixed", True)):
            muts_list = [mk_muts(d, 60, with_long) for d in datas]
            eng.score_mutations_multi(datas, muts_list)  # compile + warm
            t0 = time.perf_counter()
            for _ in range(3):
                eng.score_mutations_multi(datas, muts_list)
            dt = (time.perf_counter() - t0) / 3
            print("probeA: Mutate-width score ({}, {} muts/region): {:.3f}s"
                  .format(tag, 60 + int(with_long), dt))


if __name__ == "__main__":
    main()
