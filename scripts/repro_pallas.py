#!/usr/bin/env python3
"""Minimal repro: compile the fused Pallas fill on the real TPU and report
the Mosaic error (if any).  Run with small shapes to keep compile fast."""

import sys

import numpy as np


def main():
    width = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    E = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    import jax
    import jax.numpy as jnp

    from poreseq_tpu.engine.tpu.dp import make_fill
    from poreseq_tpu.engine.tpu.pack import fill_inputs, pack_events, to_device_batch
    from poreseq_tpu.engine.tpu.pallas_fill import make_pallas_fill
    from poreseq_tpu.engine.types import AlignData
    from poreseq_tpu.core.sequence import seq_to_states
    from poreseq_tpu.sim import simulate_session

    print("devices:", jax.devices(), file=sys.stderr)
    rng = np.random.default_rng(0)
    pa, _ = simulate_session(rng, ref_len=C + 10, coverage=min(E, 12))
    data = AlignData.from_session(pa)
    states = seq_to_states(data.sequence)
    S = min(len(states), C)
    states_pad = np.full(C, -1, dtype=np.int32)
    states_pad[:S] = states[:S]
    arrays, ref_indexes = pack_events(data.events, e_pad=E)
    batch = to_device_batch(arrays, jnp.float32)
    fi = fill_inputs(arrays, ref_indexes, S, C, width)
    i0 = jnp.asarray(fi["i0"])
    i1 = jnp.asarray(fi["i1"])
    is_pad = jnp.asarray(fi["is_pad"])
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    win0f = tuple(f32(w) for w in fi["fwd"]["win0"])
    reff = tuple(f32(x) for x in fi["fwd"]["refills"])

    fill_x = make_fill(width, jnp.float32, need_steps=True)
    fill_p = make_pallas_fill(width, need_steps=True)

    args = (batch, jnp.asarray(states_pad), i0, i1, win0f, reff, is_pad, 4.5,
            False)
    rx = jax.jit(lambda *a: fill_x(*a[:-1], a[-1]),
                 static_argnums=(8,))(*args)
    print("xla best:", np.asarray(rx.best)[:4], file=sys.stderr)
    try:
        rp = jax.jit(lambda *a: fill_p(*a[:-1], a[-1]),
                     static_argnums=(8,))(*args)
        bp = np.asarray(rp.best)
        print("pallas best:", bp[:4], file=sys.stderr)
        print("M allclose:", np.allclose(np.asarray(rp.M), np.asarray(rx.M),
                                         atol=1e-4),
              "best allclose:", np.allclose(bp, np.asarray(rx.best), atol=1e-4),
              file=sys.stderr)
        print("steps equal:", np.array_equal(np.asarray(rp.steps_m),
                                             np.asarray(rx.steps_m)),
              file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        print("PALLAS FAILED:", type(exc).__name__, file=sys.stderr)
        print(str(exc)[:4000], file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
