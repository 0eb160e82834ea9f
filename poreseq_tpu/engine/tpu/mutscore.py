"""Batched mutation delta-scoring on device.

Implements the reference's splice-and-refill trick (Alignment.cpp:447-512):
per (event, mutation), restart the forward DP from the column before the
mutation against the mutated states at scoring width, then join the refilled
column with the precomputed *backward* matrix (columnMax, Alignment.h:181-214)
and difference against the pre-mutation join.  Batched as
vmap(muts) x vmap(events) over the stored band matrices, chunked to bound
memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...core.events import update_refs
from ...core.sequence import apply_mutation, seq_to_states
from ..types import AlignData, make_mutscores
from .align import FILLS, backtrace_device
from .dp import emission, column_solve, neg_big
from .pack import band_geometry, round_up

CHUNK = 128


def _join(Mcol, Scol, ci0, cbest, Mb_c, Sb_c, bi0, bbest, n0, dtype):
    """columnMax(fwd column, back column) — max over event rows of the
    paired fwd+back sums plus both prefix maxima, floored at 0
    (Alignment.h:181-214).  Column widths are taken from the array shapes
    (the refilled fwd column may be narrower than the stored back column)."""
    Wf = Mcol.shape[0]
    Wb = Mb_c.shape[0]
    # part A: rows of the fwd column
    r = jnp.arange(Wf, dtype=jnp.int32)
    jf = ci0 + r
    rb = (n0 - jf + 1) - bi0
    okb = (rb >= 0) & (rb < Wb)
    rbc = jnp.clip(rb, 0, Wb - 1)
    bvM = jnp.where(okb, Mb_c[rbc], 0.0)
    bvS = jnp.where(okb, Sb_c[rbc], 0.0)
    okf = (jf >= 1) & (jf <= n0)
    sA = jnp.max(jnp.where(okf, jnp.maximum(Mcol + bvM, Scol + bvS), 0.0))
    # part B: rows of the back column (fwd side gathered; covers back-only rows)
    rB = jnp.arange(Wb, dtype=jnp.int32)
    jb2 = bi0 + rB
    rf = (n0 - jb2 + 1) - ci0
    okf2 = (rf >= 0) & (rf < Wf)
    rfc = jnp.clip(rf, 0, Wf - 1)
    fvM = jnp.where(okf2, Mcol[rfc], 0.0)
    fvS = jnp.where(okf2, Scol[rfc], 0.0)
    okb2 = (jb2 >= 1) & (jb2 <= n0)
    sB = jnp.max(jnp.where(okb2, jnp.maximum(Mb_c + fvM, Sb_c + fvS), 0.0))
    sm = jnp.maximum(jnp.maximum(sA, sB), 0.0)
    sm = jnp.maximum(sm, cbest)
    sm = jnp.maximum(sm, bbest)
    return sm


def _mut_kernel_factory(W: int, Ws: int, K: int, dtype):
    """Chunked mutation-delta kernel.

    W  = stored-band rectangle width (2*realign_width+1);
    Ws = refill rectangle width (2*scoring_width+1) — the refilled columns
    live on the narrower scoring band (Alignment.cpp:471), so the refill
    compute is O(Ws) instead of O(W); only the first step (which reads the
    wide copied column) and the joins touch the wide rectangles."""

    @jax.jit
    def kernel(batch, Mf, Sf, i0f, i1f, bpf, Mb, Sb, i0b, bpb,
               starts, startinds, mlens, nst, win, i0r, i1r,
               valid_mut, lik_offset, S_real):
        C1, E, _ = Mf.shape  # [C+1, E, W]
        rows = jnp.arange(Ws, dtype=jnp.int32)
        NB = neg_big(dtype)

        def one(m_idx):
            start = starts[m_idx]
            startind = startinds[m_idx]
            mlen = mlens[m_idx]
            nstm = nst[m_idx]
            winm = win[m_idx]          # [K]
            i0rm = i0r[m_idx]          # [K, E]
            i1rm = i1r[m_idx]

            def lane(e):
                mean_e = batch.mean[e]
                stdv_e = batch.stdv[e]
                lsr_e = batch.lsr[e]
                n0_e = batch.n0[e]
                lik_sk = batch.lik_skip[e]
                lik_st = batch.lik_stay[e]
                lik_ex = batch.lik_extend[e]
                lik_in = batch.lik_insert[e]

                # the shared copied column (wide rectangle)
                Mw = Mf[startind, e]
                Sw = Sf[startind, e]
                wi0 = i0f[e, startind]
                wi1 = i1f[e, startind]
                wbest = bpf[startind, e]

                # how many refill columns actually exist
                nfill = jnp.clip(jnp.minimum(startind + mlen + 6, nstm) - startind, 0, K)
                Lf = startind + nfill
                refind_used = jnp.minimum(start + mlen + 1,
                                          jnp.maximum(Lf, startind))
                k_star = refind_used - startind - 1  # may be -1 (use the copy)

                def step(carry, k):
                    Mc, Sc, ci0, ci1, cbest, selM, selS, si0, sbest = carry
                    first = k == 0
                    refind = startind + 1 + k
                    act = (k < mlen + 6) & (refind <= nstm) & (k < nfill)
                    st = winm[k]
                    i0c = i0rm[k, e]
                    i1c = i1rm[k, e]
                    i = i0c + rows
                    in_band = i <= i1c
                    idx = jnp.clip(i - 1, 0, mean_e.shape[0] - 1)
                    mean_v = mean_e[idx]
                    stdv_v = stdv_e[idx]
                    lsr_v = lsr_e[idx]
                    stc = jnp.clip(st, 0, 1023)
                    e_obs = emission(
                        mean_v, stdv_v, lsr_v,
                        batch.lev_mean[e, stc], batch.lev_stdv[e, stc],
                        batch.log_lev[e, stc], batch.sd_mean[e, stc],
                        batch.sd_lambda[e, stc], batch.log_lambda[e, stc],
                        lik_offset,
                    ).astype(dtype)
                    e_obs = jnp.where(in_band, e_obs, 0.0)

                    # previous column: the wide copied column for step 0,
                    # the narrow carry afterwards
                    p0 = jnp.where(first, wi0, ci0)
                    p1 = jnp.where(first, wi1, ci1)
                    dW = jnp.clip(i - wi0, 0, W - 1)
                    dN = jnp.clip(i - ci0, 0, Ws - 1)
                    pm_i = jnp.where(first, Mw[dW], Mc[dN])
                    dWm1 = jnp.clip(i - 1 - wi0, 0, W - 1)
                    dNm1 = jnp.clip(i - 1 - ci0, 0, Ws - 1)
                    pm_im1 = jnp.where(first, Mw[dWm1], Mc[dNm1])

                    valid_i = (i >= p0) & (i <= p1)
                    valid_ul = (i > p0) & (i <= p1)
                    skip_c = jnp.where(valid_i, pm_i, 0.0) + lik_sk
                    match_c = jnp.where(valid_ul, pm_im1, 0.0) + e_obs
                    ignore_c = jnp.where(valid_ul, pm_im1 + lik_in, 0.0)
                    D = jnp.maximum(jnp.maximum(0.0, skip_c),
                                    jnp.maximum(match_c, ignore_c)).astype(dtype)
                    a_stay = (e_obs + lik_st).astype(dtype)
                    a_ext = (e_obs + lik_ex).astype(dtype)
                    floor0 = jnp.where(rows == 0, NB, 0.0).astype(dtype)
                    Mn, Sn = column_solve(D, a_stay, a_ext, lik_in, floor0, dtype)
                    live = in_band & (st >= 0)
                    Mn = jnp.where(live, Mn, 0.0)
                    Sn = jnp.where(live, Sn, 0.0)
                    cmax = jnp.max(jnp.where(live, Mn, NB))
                    bestn = jnp.where(cmax > cbest, cmax, cbest)

                    Mc2 = jnp.where(act, Mn, Mc)
                    Sc2 = jnp.where(act, Sn, Sc)
                    ci02 = jnp.where(act, i0c, ci0)
                    ci12 = jnp.where(act, i1c, ci1)
                    cbest2 = jnp.where(act, bestn, cbest)
                    hit = act & (k == k_star)
                    selM2 = jnp.where(hit, Mn, selM)
                    selS2 = jnp.where(hit, Sn, selS)
                    si02 = jnp.where(hit, i0c, si0)
                    sbest2 = jnp.where(hit, bestn, sbest)
                    return (Mc2, Sc2, ci02, ci12, cbest2, selM2, selS2, si02,
                            sbest2), None

                zs = jnp.zeros(Ws, dtype)
                init = (zs, zs, wi0, wi1, wbest, zs, zs, wi0, wbest)
                (Mc, Sc, ci0, ci1, cbest, selM, selS, si0, sbest), _ = (
                    jax.lax.scan(step, init, jnp.arange(K, dtype=jnp.int32)))

                # new score: selected refill column (or the copied column when
                # no refill happened) joined with the back column at
                # rab = nst - refind_used + 1 (original back matrix)
                rab_new = jnp.clip(nstm - refind_used + 1, 0, S_real)
                Mbc = Mb[rab_new, e]
                Sbc = Sb[rab_new, e]
                bi0c = i0b[e, rab_new]
                bbc = bpb[rab_new, e]
                new_n = _join(selM, selS, si0, sbest, Mbc, Sbc, bi0c, bbc,
                              n0_e, dtype)
                new_w = _join(Mw, Sw, wi0, wbest, Mbc, Sbc, bi0c, bbc,
                              n0_e, dtype)
                new = jnp.where(k_star >= 0, new_n, new_w)
                # old score: fwd col max(start-3, 1) joined with its mirror
                raf_old = jnp.clip(jnp.maximum(start - 3, 1), 0, S_real)
                rab_old = jnp.clip(S_real - jnp.maximum(start - 3, 1) + 1, 0,
                                   S_real)
                old = _join(Mf[raf_old, e], Sf[raf_old, e], i0f[e, raf_old],
                            bpf[raf_old, e],
                            Mb[rab_old, e], Sb[rab_old, e], i0b[e, rab_old],
                            bpb[rab_old, e], n0_e, dtype)
                delta = new - old
                return jnp.where(batch.active[e] & valid_mut[m_idx], delta, 0.0)

            deltas = jax.vmap(lane)(jnp.arange(E))
            return jnp.sum(deltas)

        return jax.vmap(one)(jnp.arange(starts.shape[0]))

    return kernel


_KERNELS = {}


def get_mut_kernel(W, Ws, K, dtype):
    key = (W, Ws, K, str(dtype))
    if key not in _KERNELS:
        _KERNELS[key] = _mut_kernel_factory(W, Ws, K, dtype)
    return _KERNELS[key]


def _k_bucket(k: int) -> int:
    for b in (7, 10, 16, 26, 46, 86, 160, 300):
        if k <= b:
            return b
    return round_up(k, 256)


def score_mutations_tpu(engine, data: AlignData, muts):
    """Full ScoreMutations on the TPU engine: fwd+back fill + backtrace
    (updating events), then chunked batched delta scoring."""
    mutscores = make_mutscores(muts)
    if not muts or not data.events:
        return mutscores

    (states, S, S_pad, states_pad, states_rev_pad, batch, arrays, ref_indexes,
     n0) = engine._prepare(data)
    p = data.params
    W = 2 * p.realign_width + 1

    resf, i0f, i1f = engine._fill_dir(
        batch, states_pad, ref_indexes, n0, S, S_pad, p.realign_width,
        p.lik_offset, backward=False)
    resb, i0b, i1b = engine._fill_dir(
        batch, states_rev_pad, ref_indexes, n0, S, S_pad, p.realign_width,
        p.lik_offset, backward=True)

    T = arrays["mean"].shape[1]
    ral, rlk = backtrace_device(
        resf.M, resf.S, resf.steps_m, resf.steps_s, resf.i0, resf.i1,
        resf.best_i, resf.best_j, t_pad=T, max_steps=int(S_pad + 2 * T + 8))
    ral = np.asarray(ral, dtype=np.float64)
    rlk = np.asarray(rlk, dtype=np.float64)
    new_ref_indexes = []
    for e, ev in enumerate(data.events):
        n = int(n0[e])
        if arrays["active"][e]:
            ev.ref_align = ral[e, :n].copy()
            ev.ref_like = rlk[e, :n].copy()
        ri, _, _ = update_refs(ev.ref_align)
        new_ref_indexes.append(ri)

    # extended (blank-prepended) stacks for direct column indexing
    zero_col = jnp.zeros((1,) + resf.M.shape[1:], resf.M.dtype)
    Mf = jnp.concatenate([zero_col, resf.M])
    Sf = jnp.concatenate([zero_col, resf.S])
    Mb = jnp.concatenate([zero_col, resb.M])
    Sb = jnp.concatenate([zero_col, resb.S])
    zrow = jnp.zeros((1, resf.M.shape[1]), resf.M.dtype)
    bpf = jnp.concatenate([zrow, resf.best_pfx])
    bpb = jnp.concatenate([zrow, resb.best_pfx])

    # ---- host-side mutation prep ----
    E = len(data.events)
    n_m = len(muts)
    has_bad = any(c not in "ACGT" for c in set(data.sequence))
    starts = np.array([m.start for m in muts], dtype=np.int32)
    mlens = np.array([len(m.mut) for m in muts], dtype=np.int32)
    startinds = np.maximum(starts - 4, 0)
    valid = starts <= len(data.sequence)
    order = np.argsort(mlens, kind="stable")

    totals = np.full(n_m, -1e-6, dtype=np.float64)
    pos = 0
    while pos < len(order):
        # take a chunk of same-bucket K
        k0 = _k_bucket(int(mlens[order[pos]]) + 6)
        sel = [order[pos]]
        pos += 1
        while pos < len(order) and len(sel) < CHUNK and \
                _k_bucket(int(mlens[order[pos]]) + 6) == k0:
            sel.append(order[pos])
            pos += 1
        sel = np.asarray(sel)
        K = k0
        Mc = len(sel)
        win = np.full((Mc, K), -1, dtype=np.int32)
        nst = np.zeros(Mc, dtype=np.int32)
        for t, mi in enumerate(sel):
            m = muts[mi]
            mutseq = apply_mutation(data.sequence, m.start, m.orig, m.mut)
            nst[t] = max(len(mutseq) - 4, 0)
            si = int(startinds[mi])
            wl = len(m.mut) + 6
            if has_bad or any(c not in "ACGT" for c in m.mut):
                w = seq_to_states(mutseq)[si : si + wl]
            else:
                w = seq_to_states(mutseq[si : si + wl + 4])
            win[t, : len(w)] = w
        # refill band geometry against the POST-backtrace ref_index
        i0r = np.ones((Mc, K, E), dtype=np.int32)
        i1r = np.zeros((Mc, K, E), dtype=np.int32)
        refinds = startinds[sel][:, None] + 1 + np.arange(K)[None, :]
        for e in range(E):
            ne = int(n0[e])
            ri = new_ref_indexes[e]
            if len(ri) > 0:
                imid = np.searchsorted(ri, refinds.ravel(), side="left").reshape(
                    Mc, K).astype(np.int64)
            else:
                imid = np.ones((Mc, K), dtype=np.int64)
            imid = np.clip(imid, 1, max(ne, 1))
            i0r[:, :, e] = np.maximum(imid - p.scoring_width, 1)
            i1r[:, :, e] = np.minimum(imid + p.scoring_width, ne)

        kern = get_mut_kernel(W, 2 * p.scoring_width + 1, K, engine.dtype)
        out = kern(
            batch, Mf, Sf, jnp.asarray(i0f), jnp.asarray(i1f), bpf,
            Mb, Sb, jnp.asarray(i0b), bpb,
            jnp.asarray(starts[sel]), jnp.asarray(startinds[sel]),
            jnp.asarray(mlens[sel]), jnp.asarray(nst), jnp.asarray(win),
            jnp.asarray(i0r), jnp.asarray(i1r),
            jnp.asarray(valid[sel]), float(p.lik_offset), S,
        )
        totals[sel] += np.asarray(out, dtype=np.float64)

    for ms, t in zip(mutscores, totals):
        ms.score = float(t)
    return mutscores
