"""Multi-chip scaling: device mesh over (event, mutation) axes.

The reference's parallelism inventory (SURVEY.md 2.2) maps onto TPU as:
  * 'ev'  axis — data parallelism over event strands (the reference's
    "different events simultaneously", MakeMutations.cpp:20-22);
  * 'mut' axis — parallelism over candidate mutations (independent per
    mutation, MakeMutations.cpp:43-52);
  * regions are embarrassingly parallel across *processes/hosts* exactly like
    the reference's file-split cluster mode (split_fasta.py) — one region per
    jit program, so no cross-chip DP is ever needed (the band keeps each
    region's working set local).

Per-event log-likelihood deltas are reduced with psum over the mesh before
the (replicated, deterministic) greedy accept, so acceptance is identical on
every device — the multi-host reduction the north star prescribes.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        # check_vma off: scan carries are zero-initialized inside the mapped
        # function, which the varying-axis checker would otherwise reject
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                          check_vma=False)
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_rep=False)


def make_mesh(n_ev: int | None = None, n_mut: int = 1, devices=None) -> Mesh:
    """Mesh over available devices with shape (ev, mut)."""
    devices = devices if devices is not None else jax.devices()
    if n_ev is None:
        n_ev = len(devices) // n_mut
    devs = np.array(devices[: n_ev * n_mut]).reshape(n_ev, n_mut)
    return Mesh(devs, ("ev", "mut"))


def pad_axis(x: np.ndarray, n: int, axis: int = 0, fill=0):
    """Pad axis length up to a multiple of n."""
    ln = x.shape[axis]
    rem = (-ln) % n
    if rem == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, rem)
    return np.pad(x, pads, constant_values=fill)


def batch_spec(batch):
    """PartitionSpec pytree for an EventBatch: all per-event arrays sharded on
    'ev', model tables too (they are per-event)."""
    from ..engine.tpu.dp import EventBatch

    return EventBatch(*([P("ev")] * len(batch)))


def sharded_consensus_step(mesh: Mesh, width: int, K: int, dtype,
                           scoring_width: int | None = None):
    """One scoring round, sharded: banded fwd+back fills (events sharded),
    batched mutation deltas (events x mutations sharded), psum over 'ev' into
    replicated mutation totals, and a deterministic accept mask.

    Returns a jitted function
        step(batch, states, states_rev, i0f, i1f, i0b, i1b,
             starts, startinds, mlens, nst, win, i0r, i1r, valid, lik_offset)
        -> (scores [E], totals [M], accept [M])
    """
    from ..engine.tpu.dp import make_fill
    from ..engine.tpu.mutscore import _mut_kernel_factory

    fill = make_fill(width, dtype)
    fill_nosteps = make_fill(width, dtype, need_steps=False)
    scoring_width = scoring_width if scoring_width is not None else width // 2
    mutk = _mut_kernel_factory(2 * width + 1, 2 * scoring_width + 1, K, dtype)

    def local_step(batch, states, states_rev, i0f, i1f, i0b, i1b,
                   starts, startinds, mlens, nst, win, i0r, i1r, valid,
                   lik_offset, S_real):
        resf = fill(batch, states, i0f, i1f, lik_offset, False)
        resb = fill_nosteps(batch, states_rev, i0b, i1b, lik_offset, True)
        zero_col = jnp.zeros((1,) + resf.M.shape[1:], resf.M.dtype)
        Mf = jnp.concatenate([zero_col, resf.M])
        Sf = jnp.concatenate([zero_col, resf.S])
        Mb = jnp.concatenate([zero_col, resb.M])
        Sb = jnp.concatenate([zero_col, resb.S])
        zrow = jnp.zeros((1, resf.M.shape[1]), resf.M.dtype)
        bpf = jnp.concatenate([zrow, resf.best_pfx])
        bpb = jnp.concatenate([zrow, resb.best_pfx])
        # local partial totals over this shard's events and mutations
        part = mutk(batch, Mf, Sf, i0f, i1f, bpf, Mb, Sb, i0b, bpb,
                    starts, startinds, mlens, nst, win, i0r, i1r,
                    valid, lik_offset, S_real)
        # reduce event-parallel partials -> replicated per-mutation totals
        totals = jax.lax.psum(part, "ev")
        scores = jnp.maximum(resf.best, resb.best)
        # deterministic, replicated accept decision (scores > 0)
        accept = totals > 0
        return scores, totals, accept

    bspec = None  # computed at call time (pytree of P('ev'))

    def step(batch, *args):
        from ..engine.tpu.dp import EventBatch

        bs = batch_spec(batch)
        f = shard_map(
            local_step, mesh,
            in_specs=(
                bs,            # batch: events sharded
                P(), P(),      # states fwd/rev replicated
                P("ev"), P("ev"), P("ev"), P("ev"),   # band geometry
                P("mut"), P("mut"), P("mut"), P("mut"),  # per-mut scalars
                P("mut"), P("mut", None, "ev"), P("mut", None, "ev"),  # win, i0r, i1r
                P("mut"), P(), P(),
            ),
            out_specs=(P("ev"), P("mut"), P("mut")),
        )
        return f(batch, *args)

    return jax.jit(step)
