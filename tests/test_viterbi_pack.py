"""Vectorized Viterbi observation packing vs the literal position walk.

The device candidate generator packs per-position observation stats with
vectorized segment sums (engine/tpu/viterbi._position_stats); these tests pin
it to a literal transliteration of the reference's position loop
(/root/reference/cpp/Viterbi.cpp:269-349 via EventData.h:187-204).
"""

import numpy as np
import pytest

from poreseq_tpu.core.events import getrefstates, update_refs
from poreseq_tpu.engine.tpu.viterbi import _position_stats
from poreseq_tpu.sim import simulate_session


def _literal_rows(events):
    infos = [update_refs(ev.ref_align) for ev in events]
    refind = min(i[1] for i in infos)
    rows = []
    while True:
        lvls, sds, ks = [], [], []
        for k, ev in enumerate(events):
            ri, rs, re = infos[k]
            inds = getrefstates(ri, ev.ref_align, refind)
            if len(inds) == 0:
                continue
            lvls.append(ev.mean[inds].mean())
            sds.append(ev.stdv[inds].mean())
            ks.append(k)
        nalhere = sum(1 for (ri, rs, re) in infos if rs <= refind <= re)
        if len(ks) <= nalhere * 0.2:
            if nalhere == 0:
                break
            refind += 1
            continue
        rows.append((refind, ks, lvls, sds))
        refind += 1
    return rows


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_position_stats_matches_literal_walk(seed):
    rng = np.random.default_rng(seed)
    pa, _ = simulate_session(rng, ref_len=140 + 60 * seed,
                             coverage=4 + seed % 3)
    rows = _literal_rows(pa.events)
    lvl, sd, valid = _position_stats(pa.events)
    assert len(rows) == len(lvl)
    for t, (_, ks, lv, sdv) in enumerate(rows):
        assert list(np.nonzero(valid[t])[0]) == ks
        np.testing.assert_allclose(lvl[t][ks], lv, rtol=0, atol=1e-12)
        np.testing.assert_allclose(sd[t][ks], sdv, rtol=0, atol=1e-12)


def test_position_stats_single_anchor_event():
    # an event with exactly one positive ref_align anchor makes update_refs
    # emit NaN ref_index values (0/0 flank slope); the packer must tolerate
    # it like the literal walk does (NaN never matches an integer position)
    rng = np.random.default_rng(7)
    pa, _ = simulate_session(rng, ref_len=160, coverage=5)
    ev = pa.events[1]
    pos = np.nonzero(ev.ref_align > 0)[0]
    keep = pos[len(pos) // 2]
    ra = ev.ref_align
    ra[(ra > 0) & (np.arange(len(ra)) != keep)] = 0
    rows = _literal_rows(pa.events)
    lvl, sd, valid = _position_stats(pa.events)
    assert len(rows) == len(lvl)
    for t, (_, ks, lv, sdv) in enumerate(rows):
        assert list(np.nonzero(valid[t])[0]) == ks
        np.testing.assert_allclose(lvl[t][ks], lv, rtol=0, atol=1e-12)


def test_position_stats_nonmonotone_fallback():
    # scramble one event's seed alignment so its positive entries are
    # non-monotone: the fallback walk must still match the literal loop
    rng = np.random.default_rng(5)
    pa, _ = simulate_session(rng, ref_len=160, coverage=4)
    ev = pa.events[1]
    ra = ev.ref_align
    pos = np.nonzero(ra > 0)[0]
    a, b = pos[len(pos) // 3], pos[2 * len(pos) // 3]
    ra[a], ra[b] = ra[b], ra[a]
    rows = _literal_rows(pa.events)
    lvl, sd, valid = _position_stats(pa.events)
    assert len(rows) == len(lvl)
    for t, (_, ks, lv, sdv) in enumerate(rows):
        assert list(np.nonzero(valid[t])[0]) == ks
        np.testing.assert_allclose(lvl[t][ks], lv, rtol=0, atol=1e-12)
