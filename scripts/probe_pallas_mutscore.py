"""Mosaic capability probes for the fused mutation group scorer.

The planned kernel (engine/tpu/pallas_mutscore.py) needs five capabilities
beyond what pallas_fill.py already exercises; each probe is a minimal kernel
that either compiles+runs or fails loudly.  Run on the real TPU:

    PYTHONPATH=/root/repo python scripts/probe_pallas_mutscore.py

1. PrefetchScalarGridSpec with a ~1k-entry scalar array feeding dynamic DMA
   offsets (leading-dim, middle-dim and lane-dim starts) from an ANY input.
2. Dynamic sublane-indexed VMEM reads (model-table row at a runtime state).
3. jax.lax.fori_loop with vector array carries inside the kernel.
4. pltpu.roll on the lane axis of a 3-D [P, E, Ws] block.
5. Scalar int reads from a VMEM ref (per-slot metadata without SMEM).
"""

import functools
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, Eg, W, Ws, P, K = 64, 16, 96, 24, 9, 8
C = 160


def probe1_prefetch_dma():
    """Per-group DMA from ANY-space [C, E, W] at scalar-prefetched offsets,
    including a dynamic lane start."""

    def kernel(row_ref, ev_ref, lane_ref, src_ref, out_ref, scratch, sem):
        g = pl.program_id(0)
        r = row_ref[g]
        e0 = ev_ref[g]
        l0 = lane_ref[g]
        dma = pltpu.make_async_copy(
            src_ref.at[r, pl.ds(e0, Eg), pl.ds(l0, Ws)], scratch, sem)
        dma.start()
        dma.wait()
        out_ref[0] = scratch[:]

    E = 32
    src = np.arange(C * E * W, dtype=np.float32).reshape(C, E, W)
    rows = np.random.default_rng(0).integers(0, C, G).astype(np.int32)
    evs = (np.random.default_rng(1).integers(0, 2, G) * 16).astype(np.int32)
    lanes = np.random.default_rng(2).integers(0, W - Ws, G).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(G,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((1, Eg, Ws), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((Eg, Ws), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
    )
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((G, Eg, Ws),
                                                      jnp.float32))
    out = np.asarray(jax.jit(f)(rows, evs, lanes, src))
    exp = np.stack([src[rows[g], evs[g]:evs[g] + Eg, lanes[g]:lanes[g] + Ws]
                    for g in range(G)])
    assert np.array_equal(out, exp), "probe1 mismatch"
    return "ok"


def probe2_sublane_index():
    """tab [1024, Eg] VMEM; read row at runtime state index per (t, k)."""

    def kernel(st_ref, tab_ref, out_ref):
        for t in range(P):
            acc = jnp.zeros((1, Eg), jnp.float32)
            for k in range(K):
                s = st_ref[0, t, k]
                acc = acc + tab_ref[pl.ds(s, 1), :]
            out_ref[0, t] = acc[0]

    tab = np.random.default_rng(0).normal(size=(1024, Eg)).astype(np.float32)
    st = np.random.default_rng(1).integers(0, 1024, (4, P, K)).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(4,),
        in_specs=[pl.BlockSpec((1024, Eg), lambda g, *_: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, P, Eg), lambda g, *_: (g, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((4, P, Eg),
                                                      jnp.float32))
    out = np.asarray(jax.jit(f)(st, tab))
    exp = tab[st].sum(axis=2)
    assert np.allclose(out, exp, rtol=1e-6), "probe2 mismatch"
    return "ok"


def probe3_fori_carry():
    """fori_loop with [P, Eg, Ws] array carries."""

    def kernel(x_ref, out_ref):
        def body(k, carry):
            a, b = carry
            a = a + x_ref[0] * (k + 1)
            b = jnp.maximum(b, a)
            return a, b

        z = jnp.zeros((P, Eg, Ws), jnp.float32)
        a, b = jax.lax.fori_loop(0, K, body, (z, z))
        out_ref[0] = b

    x = np.random.default_rng(0).normal(size=(1, P, Eg, Ws)).astype(np.float32)
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, P, Eg, Ws), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, P, Eg, Ws), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P, Eg, Ws), jnp.float32),
    )
    out = np.asarray(jax.jit(f)(x))
    a = np.zeros_like(x[0])
    b = np.zeros_like(x[0])
    for k in range(K):
        a = a + x[0] * (k + 1)
        b = np.maximum(b, a)
    assert np.allclose(out[0], b, rtol=1e-6), "probe3 mismatch"
    return "ok"


def probe4_roll3d():
    """pltpu.roll along the last axis of a 3-D block + masked select."""

    def kernel(x_ref, d_ref, out_ref):
        x = x_ref[0]
        rows = jax.lax.broadcasted_iota(jnp.int32, (P, Eg, Ws), 2)
        d = d_ref[0][:, :, None]  # [P, Eg, 1]
        out = jnp.zeros_like(x)
        for s in range(0, 4):
            cand = pltpu.roll(x, Ws - s, 2) if s else x
            cand = jnp.where(rows < s, 0.0, cand) if s else cand
            # left-shift semantics: out[r] = x[r+s] for r < Ws-s
            if s:
                cand = pltpu.roll(jnp.where(rows < s, 0.0, x), Ws - s, 2)
                cand = jnp.where(rows >= Ws - s, 0.0, cand)
            out = jnp.where(d == s, cand, out)
        out_ref[0] = out

    x = np.random.default_rng(0).normal(size=(1, P, Eg, Ws)).astype(np.float32)
    d = np.random.default_rng(1).integers(0, 4, (1, P, Eg)).astype(np.int32)
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, P, Eg, Ws), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, P, Eg), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, P, Eg, Ws), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, P, Eg, Ws), jnp.float32),
    )
    out = np.asarray(jax.jit(f)(x, d))
    exp = np.zeros_like(x[0])
    for t in range(P):
        for e in range(Eg):
            s = d[0, t, e]
            exp[t, e, : Ws - s] = x[0, t, e, s:]
    assert np.allclose(out[0], exp), "probe4 mismatch"
    return "ok"


def probe5_vmem_scalar_read():
    """Scalar int32 reads from a VMEM ref driving a mask."""

    def kernel(meta_ref, x_ref, out_ref):
        acc = jnp.zeros((Eg, Ws), jnp.float32)
        for t in range(P):
            n = meta_ref[0, t, 0]
            acc = acc + jnp.where(n > 4, x_ref[0, t], 0.0)
        out_ref[0, 0] = acc

    meta = np.random.default_rng(0).integers(0, 9, (1, P, 1)).astype(np.int32)
    x = np.random.default_rng(1).normal(size=(1, P, Eg, Ws)).astype(np.float32)
    f = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((1, P, 1), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, P, Eg, Ws), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, Eg, Ws), lambda g: (g, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1, Eg, Ws), jnp.float32),
    )
    out = np.asarray(jax.jit(f)(meta, x))
    exp = (x[0] * (meta[0, :, 0][:, None, None] > 4)).sum(axis=0)
    assert np.allclose(out[0, 0], exp, rtol=1e-6), "probe5 mismatch"
    return "ok"


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for name, fn in [("probe1_prefetch_dma", probe1_prefetch_dma),
                     ("probe2_sublane_index", probe2_sublane_index),
                     ("probe3_fori_carry", probe3_fori_carry),
                     ("probe4_roll3d", probe4_roll3d),
                     ("probe5_vmem_scalar_read", probe5_vmem_scalar_read)]:
        try:
            r = fn()
            print(f"{name}: {r}")
        except Exception as e:  # noqa: BLE001 - probe harness
            print(f"{name}: FAIL [{type(e).__name__}] {str(e)[:500]}")
            if "-v" in sys.argv:
                raise
