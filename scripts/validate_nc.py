#!/usr/bin/env python3
"""Hardware validation: blocked Pallas fill (NC columns/grid step) vs the XLA
scan fill at production shape (width 300, E=60, 1 kb), fwd + bwd."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from poreseq_tpu.engine.tpu.dp import make_fill
    from poreseq_tpu.engine.tpu.pallas_fill import make_pallas_fill
    from poreseq_tpu.engine.tpu.pack import (
        fill_inputs, pack_events, round_up, to_device_batch,
    )
    from poreseq_tpu.engine.types import AlignData
    from poreseq_tpu.core.sequence import seq_to_states
    from poreseq_tpu.sim import simulate_session

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    WIDTH = 300
    pa, _ = simulate_session(rng, ref_len=1000, coverage=60)
    data = AlignData.from_session(pa)
    states = seq_to_states(data.sequence)
    S = len(states)
    S_pad = round_up(S, 64)
    states_pad = np.full(S_pad, -1, dtype=np.int32)
    states_pad[:S] = states
    arrays, ref_indexes = pack_events(data.events)
    batch = to_device_batch(arrays, jnp.float32)
    fi = fill_inputs(arrays, ref_indexes, S, S_pad, WIDTH)
    i0 = jnp.asarray(fi["i0"])
    i1 = jnp.asarray(fi["i1"])
    is_pad = jnp.asarray(fi["is_pad"])
    f32 = lambda t: tuple(jnp.asarray(x, jnp.float32) for x in t)
    sp = jnp.asarray(states_pad)

    for backward, key in ((False, "fwd"), (True, "bwd")):
        args = (batch, sp, i0, i1, f32(fi[key]["win0"]),
                f32(fi[key]["refills"]), is_pad, 4.5, backward)
        ref = jax.jit(
            lambda *a: make_fill(WIDTH, jnp.float32, need_steps=not backward)(*a),
            static_argnums=(8,))(*args)
        refM = np.asarray(ref.M)
        refS = np.asarray(ref.S)
        for nc in (4, 8):
            got = jax.jit(
                lambda *a, _nc=nc: make_pallas_fill(
                    WIDTH, need_steps=not backward, nc=_nc)(*a),
                static_argnums=(8,))(*args)
            gM = np.asarray(got.M)
            dM = np.abs(gM - refM).max()
            dS = np.abs(np.asarray(got.S) - refS).max()
            dbest = np.abs(np.asarray(got.best) - np.asarray(ref.best)).max()
            line = f"{key} nc={nc}: maxdiff M {dM:.2e} S {dS:.2e} best {dbest:.2e}"
            if not backward:
                sm = (np.asarray(got.steps_m) == np.asarray(ref.steps_m)).mean()
                ss = (np.asarray(got.steps_s) == np.asarray(ref.steps_s)).mean()
                bi = (np.asarray(got.best_i) == np.asarray(ref.best_i)).all()
                bj = (np.asarray(got.best_j) == np.asarray(ref.best_j)).all()
                line += f" steps_m {sm:.6f} steps_s {ss:.6f} best_ij {bi}/{bj}"
            print(line, flush=True)


if __name__ == "__main__":
    main()
