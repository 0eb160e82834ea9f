"""Pallas fused fill vs the XLA scan fill (f32, interpret mode on CPU).

The Pallas kernel must reproduce dp.make_fill's outputs: lattices to f32
reassociation tolerance, backpointer bytes (discrete; compared exactly on
in-band live cells away from fp near-ties), and the best/argmax bookkeeping.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from poreseq_tpu.core.sequence import seq_to_states  # noqa: E402
from poreseq_tpu.engine.types import AlignData  # noqa: E402
from poreseq_tpu.engine.tpu.dp import make_fill  # noqa: E402
from poreseq_tpu.engine.tpu.pack import (  # noqa: E402
    fill_inputs, pack_events, round_up, to_device_batch,
)
from poreseq_tpu.engine.tpu.pallas_fill import make_pallas_fill  # noqa: E402
from poreseq_tpu.sim import simulate_session  # noqa: E402


def _setup(ref_len=120, coverage=4, width=16, seed=3):
    rng = np.random.default_rng(seed)
    pa, _ = simulate_session(rng, ref_len=ref_len, coverage=coverage)
    data = AlignData.from_session(pa)
    states = seq_to_states(data.sequence)
    S = len(states)
    S_pad = round_up(S + 8, 64)
    states_pad = np.full(S_pad, -1, dtype=np.int32)
    states_pad[:S] = states
    arrays, ref_indexes = pack_events(data.events)
    batch = to_device_batch(arrays, jnp.float32)
    fi = fill_inputs(arrays, ref_indexes, S, S_pad, width)
    return batch, states_pad, fi, S


def _run_pair(width, backward, need_steps=True, nc=None, **kw):
    batch, states_pad, fi, S = _setup(width=width, **kw)
    key = "bwd" if backward else "fwd"
    f32 = lambda t: tuple(jnp.asarray(x, jnp.float32) for x in t)
    args = (batch, jnp.asarray(states_pad), jnp.asarray(fi["i0"]),
            jnp.asarray(fi["i1"]), f32(fi[key]["win0"]),
            f32(fi[key]["refills"]), jnp.asarray(fi["is_pad"]),
            4.5, backward)
    ref = make_fill(width, jnp.float32, need_steps=need_steps)(*args)
    got = make_pallas_fill(width, need_steps=need_steps,
                           interpret=True, nc=nc)(*args)
    return ref, got, fi, S


def test_pallas_fill_single_column():
    # nc=1 (unblocked) must agree with the default-blocked kernel's contract
    ref, got, _, _ = _run_pair(width=12, backward=False, nc=1,
                               ref_len=90, coverage=3, seed=7)
    np.testing.assert_allclose(np.asarray(got.M), np.asarray(ref.M),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.best), np.asarray(ref.best),
                               rtol=2e-5, atol=2e-4)


@pytest.mark.parametrize("backward", [False, True])
def test_pallas_fill_matches_xla(backward):
    ref, got, fi, S = _run_pair(width=16, backward=backward)
    np.testing.assert_allclose(np.asarray(got.M), np.asarray(ref.M),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.S), np.asarray(ref.S),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.best), np.asarray(ref.best),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.best_pfx),
                               np.asarray(ref.best_pfx),
                               rtol=2e-5, atol=2e-4)
    if not backward:
        # discrete outputs: backpointers + best coordinates (ties would need
        # fp-identical lattices, so require near-complete agreement)
        sm_ref = np.asarray(ref.steps_m)
        sm_got = np.asarray(got.steps_m)
        agree = (sm_ref == sm_got).mean()
        assert agree > 0.9995, f"steps_m agreement {agree}"
        ss_agree = (np.asarray(ref.steps_s) == np.asarray(got.steps_s)).mean()
        assert ss_agree > 0.9995, f"steps_s agreement {ss_agree}"
        np.testing.assert_array_equal(np.asarray(got.best_i),
                                      np.asarray(ref.best_i))
        np.testing.assert_array_equal(np.asarray(got.best_j),
                                      np.asarray(ref.best_j))


def test_pallas_fill_no_steps():
    ref, got, _, _ = _run_pair(width=12, backward=True, need_steps=False,
                               ref_len=90, coverage=3, seed=7)
    np.testing.assert_allclose(np.asarray(got.M), np.asarray(ref.M),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got.best_pfx),
                               np.asarray(ref.best_pfx),
                               rtol=2e-5, atol=2e-4)
