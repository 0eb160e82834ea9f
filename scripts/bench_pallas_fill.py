#!/usr/bin/env python3
"""A/B: fused Pallas fill vs XLA scan fill on the real TPU chip.

Same methodology as bench.py: chain K dual (fwd+bwd) fills in one jitted
fori_loop with loop-carried data dependencies, sync via a scalar host read,
report the slope between two K values (cancels tunnel latency).
"""

import sys
import time

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
    REF_LEN = 1000
    COVERAGE = 60
    WIDTH = 300

    pa, _ = simulate_session(rng, ref_len=REF_LEN, coverage=COVERAGE)
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
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    win0f = tuple(f32(w) for w in fi["fwd"]["win0"])
    reff = tuple(f32(x) for x in fi["fwd"]["refills"])
    win0b = tuple(f32(w) for w in fi["bwd"]["win0"])
    refb = tuple(f32(x) for x in fi["bwd"]["refills"])

    h0, h1 = fi["i0"], fi["i1"]
    cells = int(np.sum(np.maximum(h1[:, 1:S+1] - h0[:, 1:S+1] + 1, 0)) * 4)

    E = len(arrays["n0"])
    W = 2 * WIDTH + 1
    C = S_pad

    def make_loop(fill, fill_ns, k_iters):
        @jax.jit
        def run(batch, sf):
            def body(_, carry):
                Mf, Mb, smf = carry
                off = jnp.where(Mf[0, 0, 0] > 1e30, 5.0, 4.5)
                off = off + jnp.where(smf[0, 0, 0] > 250, 1e-6, 0.0)
                rf = fill(batch, sf, i0, i1, win0f, reff, is_pad, off, False)
                rb = fill_ns(batch, sf, i0, i1, win0b, refb, is_pad, off, True)
                return (rf.M, rb.M, rf.steps_m)

            init = (jnp.zeros((C, E, W), jnp.float32),
                    jnp.zeros((C, E, W), jnp.float32),
                    jnp.zeros((C, E, W), jnp.uint8))
            Mf, Mb, smf = jax.lax.fori_loop(0, k_iters, body, init)
            return Mf[C - 1, 0, 0] + Mb[C - 1, 0, 0]

        return run

    args = (batch, jnp.asarray(states_pad))

    def timed(fill, fill_ns, k):
        run = make_loop(fill, fill_ns, k)
        t0 = time.perf_counter()
        v = float(run(*args))
        tc = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(run(*args))
        return time.perf_counter() - t0, tc, v

    for name, mk in (
        ("xla", lambda ns: make_fill(WIDTH, jnp.float32, need_steps=ns)),
        ("pallas", lambda ns: make_pallas_fill(WIDTH, need_steps=ns)),
    ):
        fill = mk(True)
        fill_ns = mk(False)
        k_small, k_big = 2, 18
        ts, tcs, vs = timed(fill, fill_ns, k_small)
        ts = min(ts, timed(fill, fill_ns, k_small)[0])
        tb, tcb, vb = timed(fill, fill_ns, k_big)
        tb = min(tb, timed(fill, fill_ns, k_big)[0])
        dt = max((tb - ts) / (k_big - k_small), 1e-9)
        print(f"{name}: per-dual-fill {dt*1000:.2f} ms  "
              f"{cells/dt/1e9:.2f} B cells/s  (compile {tcs:.0f}s/{tcb:.0f}s, "
              f"check value {vs:.3f} / {vb:.3f})", flush=True)


if __name__ == "__main__":
    main()
