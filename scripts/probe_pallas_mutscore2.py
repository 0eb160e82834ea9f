"""Second round of Mosaic probes for the fused mutation group scorer.

Round-1 findings (probe_pallas_mutscore.py):
  * DMA lane slices must be 128-aligned -> avoid manual DMA lane windows;
  * dynamic SUBLANE indexing of a 2-D VMEM ref silently returns wrong rows
    (probe2) -> never index the sublane dim dynamically;
  * fori_loop array carries, 3-D lane rolls, VMEM scalar reads all work.

This round probes the capabilities the revised (DMA-free, halo-blocked)
design rests on:
  A. scalar-prefetch-driven BlockSpec index_map (the gather-by-block trick);
  B. one-hot f32 matmul on the MXU reproducing a model-table gather EXACTLY;
  C. static odd-offset sublane row reads from a [64, E] VMEM array;
  D. pltpu.roll with a dynamic (traced scalar) shift amount;
  E. dynamic LEADING-dim indexing of a 3-D VMEM block (x_ref[j] for traced j).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Eg, W, Ws, P, K = 16, 96, 24, 9, 7


def probe_a_scalar_indexmap():
    """Blocked input whose block index comes from a prefetched array."""

    def kernel(col_ref, ev_ref, x_ref, out_ref):
        out_ref[0] = x_ref[:]

    NB, CB = 8, 16
    C, E = 128, 64
    x = np.arange(C * E, dtype=np.float32).reshape(C, E)
    cols = np.random.default_rng(0).integers(0, C // CB, NB).astype(np.int32)
    evs = np.random.default_rng(1).integers(0, E // Eg, NB).astype(np.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NB,),
        in_specs=[pl.BlockSpec((CB, Eg),
                               lambda b, col, ev: (col[b], ev[b]),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, CB, Eg), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((NB, CB, Eg),
                                                      jnp.float32))
    out = np.asarray(jax.jit(f)(cols, evs, x))
    exp = np.stack([x[cols[b] * CB:(cols[b] + 1) * CB,
                      evs[b] * Eg:(evs[b] + 1) * Eg] for b in range(NB)])
    assert np.array_equal(out, exp), "probeA mismatch"
    return "ok"


def probe_b_onehot_matmul():
    """onehot(st) @ tab == tab[st] exactly (f32, single nonzero per row)."""
    TK = 64

    def kernel(st_ref, tab_ref, out_ref):
        st = st_ref[:]                                     # [TK, 1] int32
        lanes = jax.lax.broadcasted_iota(jnp.int32, (TK, 1024), 1)
        onehot = (lanes == st).astype(jnp.float32)
        out_ref[:] = jnp.dot(onehot, tab_ref[:],
                             preferred_element_type=jnp.float32)

    tab = (np.random.default_rng(0).normal(size=(1024, Eg)) * 37.5
           ).astype(np.float32)
    st = np.random.default_rng(1).integers(0, 1024, (TK, 1)).astype(np.int32)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((TK, Eg), jnp.float32),
    )
    out = np.asarray(jax.jit(f)(st, tab))
    exp = tab[st[:, 0]]
    assert np.array_equal(out, exp), (
        "probeB mismatch (max abs {} )".format(np.abs(out - exp).max()))
    return "ok"


def probe_c_static_sublane_rows():
    """Static odd sublane offsets: read row t*K+k of a [64, Eg] array."""

    def kernel(x_ref, out_ref):
        for t in range(P):
            acc = jnp.zeros((1, Eg), jnp.float32)
            for k in range(K):
                acc = acc + x_ref[t * K + k, :][None]
            out_ref[t, :] = acc[0]

    x = np.random.default_rng(0).normal(size=(64, Eg)).astype(np.float32)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, Eg), jnp.float32),
    )
    out = np.asarray(jax.jit(f)(x))
    exp = x[np.arange(P * K).reshape(P, K)].sum(axis=1)
    assert np.allclose(out, exp, rtol=1e-6), "probeC mismatch"
    return "ok"


def probe_d_dynamic_roll():
    """pltpu.roll with a traced scalar shift."""

    def kernel(s_ref, x_ref, out_ref):
        s = s_ref[0]
        out_ref[:] = pltpu.roll(x_ref[:], s, 1)

    x = np.random.default_rng(0).normal(size=(Eg, W)).astype(np.float32)
    for sv in (0, 5, 17, W - 1):
        s = np.array([sv], dtype=np.int32)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec((Eg, W), lambda b, s: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((Eg, W), lambda b, s: (0, 0),
                                   memory_space=pltpu.VMEM),
        )
        f = pl.pallas_call(kernel, grid_spec=grid_spec,
                           out_shape=jax.ShapeDtypeStruct((Eg, W),
                                                          jnp.float32))
        out = np.asarray(jax.jit(f)(s, x))
        exp = np.roll(x, sv, axis=1)
        assert np.array_equal(out, exp), f"probeD mismatch at shift {sv}"
    return "ok"


def probe_e_dynamic_leading_index():
    """x_ref[j] for traced j on a [C, Eg, W] VMEM block, j at sub-8 offsets."""

    def kernel(j_ref, x_ref, out_ref):
        acc = jnp.zeros((Eg, W), jnp.float32)
        for t in range(P):
            j = j_ref[t]
            acc = acc + x_ref[j]
        out_ref[0] = acc

    C = 37
    x = np.random.default_rng(0).normal(size=(C, Eg, W)).astype(np.float32)
    js = np.random.default_rng(1).integers(0, C, P).astype(np.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[pl.BlockSpec((C, Eg, W), lambda b, j: (0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Eg, W), lambda b, j: (0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(kernel, grid_spec=grid_spec,
                       out_shape=jax.ShapeDtypeStruct((1, Eg, W),
                                                      jnp.float32))
    out = np.asarray(jax.jit(f)(js, x))
    exp = x[js].sum(axis=0)
    assert np.allclose(out, exp, rtol=1e-6), "probeE mismatch"
    return "ok"


if __name__ == "__main__":
    for name, fn in [("A_scalar_indexmap", probe_a_scalar_indexmap),
                     ("B_onehot_matmul", probe_b_onehot_matmul),
                     ("C_static_sublane_rows", probe_c_static_sublane_rows),
                     ("D_dynamic_roll", probe_d_dynamic_roll),
                     ("E_dynamic_leading_index", probe_e_dynamic_leading_index)]:
        try:
            print(f"{name}: {fn()}")
        except Exception as e:  # noqa: BLE001 - probe harness
            print(f"{name}: FAIL [{type(e).__name__}] {str(e)[:400]}")
