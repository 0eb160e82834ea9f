"""Fused Pallas mutation group scorer (TPU).

One `pallas_call` computes ALL start-groups' mutation delta-scores: the
splice-and-refill trick of the reference (Alignment.cpp:447-512,
MakeMutations.cpp:23-69) — per group, restart the forward DP from the column
before the mutation at scoring width for P=9 slots at once, join the
selected refill column with the precomputed backward lattice, and difference
against the pre-mutation fwd x back join.

This replaces the XLA scan kernel in mutscore.py for the f32 single-device
path: that kernel is op-overhead bound (~122k small vector-op dispatches per
Refine-scale call, ~2.3 s against a ~1 ms useful-FLOP speed of light —
PERF.md).  Here the whole computation is one kernel with grid (G, K):

  * grid dim 0 walks start-groups, grid dim 1 the K refill columns; the
    cross-column carry (previous refill column per slot, band anchor,
    selected columns, running bests) lives in VMEM scratch;
  * per-group data (the copied forward column at st0, the per-slot backward
    columns at q_b, the scoring-width data windows and band geometry rows at
    st0+1+k) is fetched straight from the HBM lattice stacks via
    scalar-prefetch-driven BlockSpec index maps (probe A of
    scripts/probe_pallas_mutscore2.py) — no [G, ...] gathers are ever
    materialized;
  * heavy per-column reductions that do NOT depend on the refill (the
    old-score lag-0 join per column, the backward column's single-sided max)
    are precomputed for every column in the XLA prologue and fetched as
    [E, 1] rows;
  * all lane movement is static rolls + masked selects (the Mosaic rules
    established by pallas_fill.py); variable per-event shifts use a 3-stage
    (64/8/1) composed-roll select, and width conversions (realign width W ->
    scoring width Ws) use an exact one-hot f32 matmul on the MXU (probe B).

Slots whose refill is empty (k_star < 0: mutations truncating the sequence
at/before the window start — only tail-of-sequence mutations) need the
full-width copied-column join; they are masked out of the kernel and scored
by the existing XLA join on the (rare) flagged slots only.

f32 only; the f64 parity path and the mesh (shard_map) path stay on the XLA
kernel in mutscore.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp import DMAX, emission
from .pallas_fill import _NB, _column_solve, _shift_sel, _shl, _shr

SH_STEP = tuple(range(0, DMAX + 1))
SH_STEP_M1 = tuple(range(-1, DMAX))


def _shift3(x, s, smin, smax, rows):
    """out[e, r] = x[e, r + s[e]] for smin <= s[e] <= smax and 0 <= r+s < W,
    else 0.  Three-stage (64 / 8 / 1) composed rolls: ~(range/64 + 16) rolls
    instead of range/8 single-roll candidates.  Stage composition vacates the
    top <= 63+7 lanes, so results are exact only for r < W - 71 — every
    caller immediately narrows to Ws << W - 71 lanes."""
    W = x.shape[-1]
    tot = s - smin
    ok = (s >= smin) & (s <= smax)
    nA = (smax - smin) // 64 + 1
    cA = jax.lax.shift_right_arithmetic(tot, 6)
    y = jnp.zeros_like(x)
    for ci in range(nA):
        b = smin + 64 * ci
        if b == 0:
            cand = x
        elif b > 0:
            cand = _shl(x, b, rows, 0.0) if b < W else jnp.zeros_like(x)
        else:
            cand = _shr(x, -b, rows, 0.0) if -b < W else jnp.zeros_like(x)
        y = jnp.where(cA == ci, cand, y)
    d8 = jnp.bitwise_and(jax.lax.shift_right_arithmetic(tot, 3), 7) * 8
    y = _shift_sel(y, d8, tuple(range(0, 64, 8)), rows)
    d1 = jnp.bitwise_and(tot, 7)
    y = _shift_sel(y, d1, tuple(range(0, 8)), rows)
    return jnp.where(ok, y, 0.0)


def _narrow(x, V):
    """Exact [E, W] -> [E, V] head-lane extraction via one-hot f32 matmul on
    the MXU (strided lane slices CHECK-fail in Mosaic; a single-nonzero-per-
    column f32 matmul reproduces the copy exactly — probe B)."""
    W = x.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (W, V), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (W, V), 1)
    sel = (r == c).astype(jnp.float32)
    # HIGHEST precision: the default matmul precision truncates inputs to
    # bfloat16 (preferred_element_type only fixes the OUTPUT dtype), which
    # corrupts the copied values by ~1e-2 relative
    return jax.lax.dot_general(x, sel, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def _kernel(W, Ws, RS, K, P, C1, JMIN, JMAX, FSMIN, FSMAX, debug,
            # scalar-prefetch refs (ONLY what index maps need, plus two [G]
            # rows — a [G, P, K] prefetch array blows the 1 MB SMEM budget)
            st0_r, qold_r, qb_r, sind_r, greg_r,
            # inputs
            mw_ref, wm_ref, ws_ref, wl_ref, gi0_ref, gi1_ref,
            i0w_ref, i1w_ref, wb_ref, old_ref, mv_ref, emi_ref, emf_ref,
            meta_ref,
            *rest):
    bM = rest[0:P]
    bS = rest[P:2 * P]
    bA = rest[2 * P:3 * P]
    bB = rest[3 * P:4 * P]
    bC = rest[4 * P:5 * P]
    rest = rest[5 * P:]
    tot_ref = rest[0]
    if debug:
        new_ref, oldd_ref, sel_ref, sa_ref = rest[1:5]
        rest = rest[5:]
    else:
        rest = rest[1:]
    (Mc, selM, selS, ci0s, sas, sbs, cbs, pwi, pwm1) = rest

    g = pl.program_id(0)
    k = pl.program_id(1)
    E = Mc.shape[1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (E, Ws), 1)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (E, W), 1)

    n0 = emi_ref[0]                                        # [E, 1] i32
    evr = emi_ref[1]
    act_e = emf_ref[0]                                     # [E, 1] f32 0/1
    lik_sk = emf_ref[1]
    lik_st = emf_ref[2]
    lik_ex = emf_ref[3]
    lik_in = emf_ref[4]
    wi0 = i0w_ref[0]                                       # [E, 1] i32
    wi1 = i1w_ref[0]
    wbest = wb_ref[0]                                      # [E, 1] f32
    i0c = gi0_ref[0]
    i1c = gi1_ref[0]

    o = i0c - wi0

    @pl.when(k == 0)
    def _init():
        z = jnp.zeros((P, E, Ws), jnp.float32)
        Mc[:] = z
        selM[:] = z
        selS[:] = z
        ci0s[:] = wi0 + RS
        for t in range(P):
            sas[t] = wi0 + RS
            sbs[t] = wbest
            cbs[t] = wbest
        # wide first-column reads from the copied column (slot-independent):
        # pmW[r] = Mw[r + o], pmWm1[r] = Mw[r + o - 1] (the two-stage seam
        # slice of the XLA kernel, mutscore.py _group_kernel_body)
        mw = mw_ref[0]                                     # [E, W]
        pwi[:] = _narrow(_shift3(mw, o, FSMIN, FSMAX + 1, rows_w), Ws)
        pwm1[:] = _narrow(_shift3(mw, o - 1, FSMIN - 1, FSMAX, rows_w), Ws)

    first = k == 0
    ci0_prev = ci0s[:]                                     # [E, 1]
    i = i0c + rows                                         # [E, Ws]
    in_band = i <= i1c
    mwv = wm_ref[0]                                        # [E, Ws]
    swv = ws_ref[0]
    lwv = wl_ref[0]
    d = i0c - ci0_prev
    p0 = jnp.where(first, wi0, ci0_prev)
    p1 = jnp.where(first, wi1, ci0_prev + (Ws - 1))
    valid_i = (i >= p0) & (i <= p1)
    valid_ul = (i > p0) & (i <= p1)
    cut = rows == 0
    floor0 = jnp.where(cut, _NB, 0.0)
    sind = sind_r[g]
    refind = sind + 1 + k

    # per-(slot, table) model values: the [E, 6P] block keeps the lane dim
    # wide (a [.., E, 1] HBM operand tile-pads its lane dim 128x); column
    # t*6+j is extracted by a lane-mask reduce
    mvb = mv_ref[0]                                        # [E, 6P]
    mv_lanes = jax.lax.broadcasted_iota(jnp.int32, (E, 6 * P), 1)

    def mv_at(c):
        return jnp.sum(jnp.where(mv_lanes == c, mvb, 0.0), axis=1,
                       keepdims=True)                      # [E, 1]

    any_act = None
    i0c_f = i0c
    for t in range(P):
        # per-slot scalars from the per-(g,k) VMEM meta block (probe5:
        # scalar int reads from VMEM work; SMEM cannot hold [G, P, K]-sized
        # prefetch arrays, and [..., P, 1] operands tile-pad 128x in HBM)
        stk = meta_ref[0, 5, t]
        mlen_t = meta_ref[0, 0, t]
        nst_t = meta_ref[0, 1, t]
        nfill_t = meta_ref[0, 2, t]
        act_t = (k < mlen_t + 6) & (refind <= nst_t) & (k < nfill_t)
        any_act = act_t if any_act is None else jnp.logical_or(any_act, act_t)

        lm = mv_at(t * 6 + 0)                              # [E, 1]
        ls = mv_at(t * 6 + 1)
        ll = mv_at(t * 6 + 2)              # pre-folded with -lik_offset
        smn = mv_at(t * 6 + 3)
        lam = mv_at(t * 6 + 4)
        llam = mv_at(t * 6 + 5)
        e_obs = emission(mwv, swv, lwv, lm, ls, ll, smn, lam, llam, 0.0)
        live = in_band & (stk >= 0)
        e_obs = jnp.where(live, e_obs, 0.0)

        Mc_t = Mc[t]
        pmN = _shift_sel(Mc_t, d, SH_STEP, rows)
        pmNm1 = _shift_sel(Mc_t, d - 1, SH_STEP_M1, rows)
        pm_i = jnp.where(first, pwi[:], pmN)
        pm_im1 = jnp.where(first, pwm1[:], pmNm1)

        skip_c = jnp.where(valid_i, pm_i, 0.0) + lik_sk
        match_c = jnp.where(valid_ul, pm_im1, 0.0) + e_obs
        ignore_c = jnp.where(valid_ul, pm_im1 + lik_in, 0.0)
        D = jnp.maximum(jnp.maximum(0.0, skip_c),
                        jnp.maximum(match_c, ignore_c))
        a_stay = e_obs + lik_st
        a_ext = e_obs + lik_ex
        Mn, Sn = _column_solve(D, a_stay, a_ext, lik_in, floor0, cut, rows,
                               False)
        Mn = jnp.where(live, Mn, 0.0)
        Sn = jnp.where(live, Sn, 0.0)
        cmax = jnp.max(jnp.where(live, Mn, _NB), axis=1, keepdims=True)
        bestn = jnp.maximum(cmax, cbs[t])

        @pl.when(act_t)
        def _upd(t=t, Mn=Mn, bestn=bestn):
            Mc[t] = Mn
            cbs[t] = bestn

        hit_t = act_t & (k == meta_ref[0, 3, t])

        @pl.when(hit_t)
        def _hit(t=t, Mn=Mn, Sn=Sn, bestn=bestn):
            selM[t] = Mn
            selS[t] = Sn
            sas[t] = i0c_f
            sbs[t] = bestn

    @pl.when(any_act)
    def _adv():
        ci0s[:] = i0c_f

    # ---- joins at the last refill column ----
    @pl.when(k == K - 1)
    def _joins():
        old = old_ref[0]                                   # [E, 1]
        greg = greg_r[g]
        okm = (act_e > 0.5) & (evr == greg)                # [E, 1]
        out_lanes = jax.lax.broadcasted_iota(jnp.int32, (E, 128), 1)
        acc = jnp.zeros((E, 128), jnp.float32)
        for t in range(P):
            FM = selM[t]
            FS = selS[t]
            fa = sas[t]
            ba = bA[t][0]                                  # [E, 1] i32
            s = fa - ba
            BMs = _narrow(_shift3(bM[t][0], s, JMIN, JMAX, rows_w), Ws)
            BSs = _narrow(_shift3(bS[t][0], s, JMIN, JMAX, rows_w), Ws)
            crossA = jnp.maximum(FM + BMs, FS + BSs)
            okF = (fa + rows >= 1) & (fa + rows <= n0)
            sA = jnp.max(
                jnp.where(okF, jnp.maximum(crossA, jnp.maximum(FM, FS)), 0.0),
                axis=1, keepdims=True)
            sm = jnp.maximum(jnp.maximum(sA, bC[t][0]), 0.0)
            sm = jnp.maximum(sm, sbs[t])
            sm = jnp.maximum(sm, bB[t][0])
            delta = sm - old
            # per-event masked deltas land in lane t of a [E, 128] block
            # (summed over events in XLA outside: Mosaic cannot store scalars
            # to VMEM, and a [G, P, E, 1] output would tile-pad 128x in HBM)
            ok_t = okm & (meta_ref[0, 4, t] > 0)
            acc = acc + jnp.where((out_lanes == t) & ok_t, delta, 0.0)
            if debug:
                new_ref[0, t] = sm
                oldd_ref[0] = old
                sel_ref[0, t] = selM[t]
                sa_ref[0, t] = sas[t]
        tot_ref[0] = acc


_FNS: dict = {}


def _get_fn(key):
    if key in _FNS:
        return _FNS[key]
    (W, Ws, RS, K, P, C1, E, G, T, span, interpret, debug) = key
    JMIN, JMAX = -span, RS + span
    FSMIN, FSMAX = -64, RS + 64 + DMAX
    i32 = jnp.int32
    f32 = jnp.float32
    Q1 = C1

    kern = functools.partial(_kernel, W, Ws, RS, K, P, C1, JMIN, JMAX,
                             FSMIN, FSMAX, debug)

    def e1(idx_map):
        return pl.BlockSpec((1, E, 1), idx_map, memory_space=pltpu.VMEM)

    def ew(idx_map):
        return pl.BlockSpec((1, E, W), idx_map, memory_space=pltpu.VMEM)

    def at_st0(g, k, st0, *s):
        return (st0[g], 0, 0)

    def at_col(g, k, st0, *s):
        return (jnp.minimum(st0[g] + 1 + k, C1 - 1), 0, 0)

    def at_qold(g, k, st0, qold, *s):
        return (qold[g], 0, 0)

    def at_qb(t):
        # qb rides flattened [G*P]: SMEM pads a 2-D [G, P] minor dim to 128
        # lanes, which blows the 1 MB SMEM budget at Refine-scale G
        def f(g, k, st0, qold, qb, *s):
            return (qb[g * P + t], 0, 0)
        return f

    in_specs = [
        ew(at_st0),                                        # Mw
        pl.BlockSpec((1, E, Ws), at_col, memory_space=pltpu.VMEM),  # win mean
        pl.BlockSpec((1, E, Ws), at_col, memory_space=pltpu.VMEM),  # win stdv
        pl.BlockSpec((1, E, Ws), at_col, memory_space=pltpu.VMEM),  # win lsr
        e1(at_col),                                        # gi0
        e1(at_col),                                        # gi1
        e1(at_st0),                                        # i0f @ st0
        e1(at_st0),                                        # i1f @ st0
        e1(at_st0),                                        # bpf @ st0
        e1(at_qold),                                       # oldjoin @ q_old
        pl.BlockSpec((1, E, 6 * P),
                     lambda g, k, *s: (g * K + k, 0, 0),
                     memory_space=pltpu.VMEM),             # mv
        pl.BlockSpec((2, E, 1), lambda g, k, *s: (0, 0, 0),
                     memory_space=pltpu.VMEM),             # emi
        pl.BlockSpec((5, E, 1), lambda g, k, *s: (0, 0, 0),
                     memory_space=pltpu.VMEM),             # emf
        pl.BlockSpec((1, 6, P), lambda g, k, *s: (g * K + k, 0, 0),
                     memory_space=pltpu.VMEM),             # meta
    ]
    in_specs += [ew(at_qb(t)) for t in range(P)]           # back M
    in_specs += [ew(at_qb(t)) for t in range(P)]           # back S
    in_specs += [e1(at_qb(t)) for t in range(P)]           # ba (i0f @ q_b)
    in_specs += [e1(at_qb(t)) for t in range(P)]           # bpb @ q_b
    in_specs += [e1(at_qb(t)) for t in range(P)]           # bcolmax @ q_b

    out_specs = pl.BlockSpec((1, E, 128), lambda g, k, *s: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    out_shapes = jax.ShapeDtypeStruct((G, E, 128), f32)
    if debug:
        out_specs = [out_specs, out_specs,
                     pl.BlockSpec((1, E, 1), lambda g, k, *s: (g, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, P, E, Ws),
                                  lambda g, k, *s: (g, 0, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, P, E, 1), lambda g, k, *s: (g, 0, 0, 0),
                                  memory_space=pltpu.VMEM)]
        out_shapes = [out_shapes, jax.ShapeDtypeStruct((G, P, E, 1), f32),
                      jax.ShapeDtypeStruct((G, E, 1), f32),
                      jax.ShapeDtypeStruct((G, P, E, Ws), f32),
                      jax.ShapeDtypeStruct((G, P, E, 1), i32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(G, K),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((P, E, Ws), f32),                   # Mc
            pltpu.VMEM((P, E, Ws), f32),                   # selM
            pltpu.VMEM((P, E, Ws), f32),                   # selS
            pltpu.VMEM((E, 1), i32),                       # ci0s
            pltpu.VMEM((P, E, 1), i32),                    # sas
            pltpu.VMEM((P, E, 1), f32),                    # sbs
            pltpu.VMEM((P, E, 1), f32),                    # cbs
            pltpu.VMEM((E, Ws), f32),                      # pwi
            pltpu.VMEM((E, Ws), f32),                      # pwm1
        ],
    )
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    def go(st0, qold, qb, sind, greg, mlen, nst, nfill, kst, sok, swin,
           batch, Mf, Sf, Mb, Sb, i0f, i1f, bpf, bpb, i0r, i1r, ev_region,
           lik_offset):
        Mf = Mf.astype(f32)
        Sf = Sf.astype(f32)
        Mb = Mb.astype(f32)
        Sb = Sb.astype(f32)
        bpf = bpf.astype(f32)
        bpb = bpb.astype(f32)
        n0 = batch.n0.astype(i32)

        # scoring-band data windows (same as the XLA kernel's in-body gather)
        widx = (i0r[:, :, None].astype(i32) - 1
                + jnp.arange(Ws, dtype=i32)[None, None, :])     # [E, Q1, Ws]
        wok = (widx >= 0) & (widx < T)
        widxc = jnp.clip(widx, 0, T - 1).reshape(E, -1)

        def _bw(src, pv):
            v = jnp.take_along_axis(src.astype(f32), widxc, axis=1)
            v = jnp.where(wok, v.reshape(E, Q1, Ws), jnp.asarray(pv, f32))
            return jnp.moveaxis(v, 0, 1)                        # [Q1, E, Ws]

        win_m = _bw(batch.mean, 0.0)
        win_s = _bw(batch.stdv, 1.0)
        win_l = _bw(batch.lsr, 0.0)

        # per-column precomputes: lag-0 old-score join and the backward
        # column's single-sided band max (sB of mutscore._join_shift)
        i0fT = i0f.astype(i32).T                                # [C1, E]
        iabs = i0fT[:, :, None] + jnp.arange(W, dtype=i32)
        okb = (iabs >= 1) & (iabs <= n0[None, :, None])
        cross = jnp.maximum(Mf + Mb, Sf + Sb)
        sm = jnp.max(jnp.where(okb, cross, 0.0), axis=-1)
        oldj = jnp.maximum(jnp.maximum(sm, 0.0), jnp.maximum(bpf, bpb))
        bcol = jnp.max(jnp.where(okb, jnp.maximum(Mb, Sb), 0.0), axis=-1)

        # per-(group, slot, step) model values, event-broadcast
        mt = jnp.stack([
            batch.lev_mean.astype(f32), batch.lev_stdv.astype(f32),
            batch.log_lev.astype(f32) - jnp.asarray(lik_offset, f32),
            batch.sd_mean.astype(f32), batch.sd_lambda.astype(f32),
            batch.log_lambda.astype(f32)])                      # [6, E, 1024]
        stc = jnp.clip(swin, 0, 1023)                           # [G, P, K]
        mv = mt[:, :, stc]                                      # [6,E,G,P,K]
        # [G*K, E, 6P] with column t*6+j: events in SUBLANES and the 54
        # slot-table pairs in LANES — a [..., E, 1] operand would tile-pad
        # its lane dim 128x in HBM (152 GB at Refine-8 scale)
        mv = jnp.transpose(mv, (2, 4, 1, 3, 0)).reshape(G * K, E, P * 6)

        i0f_c = i0fT[:, :, None]
        i1f_c = i1f.astype(i32).T[:, :, None]
        bpf_c = bpf[:, :, None]
        bpb_c = bpb[:, :, None]
        old_c = oldj[:, :, None]
        bcol_c = bcol[:, :, None]
        gi0 = i0r.astype(i32).T[:, :, None]
        gi1 = i1r.astype(i32).T[:, :, None]
        emi = jnp.stack([n0, ev_region.astype(i32)])[:, :, None]
        emf = jnp.stack([
            batch.active.astype(f32), batch.lik_skip.astype(f32),
            batch.lik_stay.astype(f32), batch.lik_extend.astype(f32),
            batch.lik_insert.astype(f32)])[:, :, None]
        # per-(g, k) scalar metadata: rows (mlen, nst, nfill, kst, sok,
        # winst_k) — the per-g rows simply repeat along k
        smeta = jnp.broadcast_to(
            jnp.stack([mlen, nst, nfill, kst, sok], axis=1)[:, None],
            (G, K, 5, P))
        swink = jnp.transpose(swin, (0, 2, 1))[:, :, None, :]   # [G,K,1,P]
        meta = jnp.concatenate([smeta, swink], axis=2).reshape(G * K, 6, P)

        args = ([Mf, win_m, win_s, win_l, gi0, gi1, i0f_c, i1f_c, bpf_c,
                 old_c, mv, emi, emf, meta]
                + [Mb] * P + [Sb] * P + [i0f_c] * P + [bpb_c] * P
                + [bcol_c] * P)
        out = call(st0, qold, qb.reshape(-1), sind, greg, *args)
        if debug:
            tot, new, oldd, sel, sa = out
            return (jnp.sum(tot[:, :, :P], axis=1), new[..., 0],
                    oldd[..., 0], sel, sa[..., 0])
        return jnp.sum(out[:, :, :P], axis=1)

    _FNS[key] = jax.jit(go)
    return _FNS[key]


def host_slot_arrays(gp, K, P, C1):
    """Per-slot scalar arrays (numpy int32) for the kernel + the flagged
    (k_star < 0) slots routed to the XLA wide-join fallback."""
    G = gp["G_pad"]
    startind = gp["g_startind"].astype(np.int64)
    start = gp["g_start"].astype(np.int64)
    sS = gp["g_S"].astype(np.int64)
    mlen = gp["s_mlen"].astype(np.int64)
    nst = gp["s_nst"].astype(np.int64)
    valid = gp["s_valid"]
    greg = gp["g_region"].astype(np.int64)

    st0 = np.clip(startind, 0, C1 - 1)
    nfill = np.clip(np.minimum(startind[:, None] + mlen + 6, nst)
                    - startind[:, None], 0, K)
    Lf = startind[:, None] + nfill
    refind_used = np.minimum(start[:, None] + mlen + 1,
                             np.maximum(Lf, startind[:, None]))
    k_star = refind_used - startind[:, None] - 1
    rab_new = np.clip(nst - refind_used + 1, 0, sS[:, None])
    q_b = np.clip(sS[:, None] - rab_new + 1, 0, C1 - 1)
    q_old = np.clip(np.maximum(start - 3, 1), 0, np.maximum(sS, 0))
    q_old = np.clip(q_old, 0, C1 - 1)

    sok = (valid & (k_star >= 0) & (greg >= 0)[:, None])
    flagged = valid & (k_star < 0) & (greg >= 0)[:, None]
    i32 = np.int32
    return dict(
        st0=st0.astype(i32), qold=q_old.astype(i32), qb=q_b.astype(i32),
        sind=startind.astype(i32), greg=greg.astype(i32),
        mlen=mlen.astype(i32), nst=nst.astype(i32), nfill=nfill.astype(i32),
        kst=k_star.astype(i32), sok=sok.astype(i32),
        flagged=flagged,
    )


def wide_fallback_totals(Mf, Sf, Mb, Sb, i0f, bpf, bpb, n0, active,
                         ev_region, gp, hs, span, dtype):
    """XLA wide-copy joins for the flagged (k_star < 0) slots: the copied
    forward column at st0 joined directly against the back column at q_b
    (the `new_w` branch of the XLA group kernel).  Returns {(g, t): delta}."""
    from .mutscore import _band_mask, _join_lag0, _join_shift

    gs, ts = np.nonzero(hs["flagged"])
    if len(gs) == 0:
        return {}
    CMIN, CMAX = -span, span
    st0 = jnp.asarray(hs["st0"][gs])
    qb = jnp.asarray(hs["qb"][gs, ts])
    qold = jnp.asarray(hs["qold"][gs])
    i0fT = jnp.asarray(i0f).astype(jnp.int32).T                 # [C1, E]
    n0j = jnp.asarray(n0).astype(jnp.int32)

    Mw = jnp.take(Mf, st0, axis=0)
    Sw = jnp.take(Sf, st0, axis=0)
    wi0 = jnp.take(i0fT, st0, axis=0)
    wbest = jnp.take(bpf, st0, axis=0)
    BM = jnp.take(Mb, qb, axis=0)
    BS = jnp.take(Sb, qb, axis=0)
    ba = jnp.take(i0fT, qb, axis=0)
    bbest = jnp.take(bpb, qb, axis=0)
    new_w = _join_shift(Mw, Sw, wi0, wbest, BM, BS, ba, bbest,
                        n0j[None], CMIN, CMAX, dtype)           # [N, E]

    FMo = jnp.take(Mf, qold, axis=0)
    FSo = jnp.take(Sf, qold, axis=0)
    BMo = jnp.take(Mb, qold, axis=0)
    BSo = jnp.take(Sb, qold, axis=0)
    fao = jnp.take(i0fT, qold, axis=0)
    fbo = jnp.take(bpf, qold, axis=0)
    bbo = jnp.take(bpb, qold, axis=0)
    okF = _band_mask(fao, n0j[None], FMo.shape[-1])
    old = _join_lag0(FMo, FSo, fbo, BMo, BSo, bbo, okF)         # [N, E]

    delta = np.asarray(new_w - old, np.float64)
    greg = hs["greg"][gs]
    okm = (np.asarray(active)[None, :]
           & (np.asarray(ev_region)[None, :] == greg[:, None]))
    sums = np.where(okm, delta, 0.0).sum(axis=1)
    return {(int(g), int(t)): float(v) for g, t, v in zip(gs, ts, sums)}


def score_groups_pallas(batch, Mf, Sf, Mb, Sb, i0f, i1f, bpf, bpb,
                        i0r_h, i1r_h, ev_region, gp, arrays, lik_offset,
                        W, Ws, RS, K, P, DM, interpret=False, debug=False):
    """Full group-scoring totals [G, P] (numpy float64) via the fused Pallas
    kernel + the XLA fallback for flagged slots.  Drop-in replacement for the
    XLA group kernel's output in mutscore.score_mutations_multi."""
    C1 = int(Mf.shape[0])
    E = int(Mf.shape[1])
    G = int(gp["G_pad"])
    T = int(batch.mean.shape[1])
    hs = host_slot_arrays(gp, K, P, C1)
    # join-lag slack: mirrors mutscore._group_kernel_body's span (the rate-
    # limit lag/clamp allowance on top of the DMAX*net-indel bound)
    span = DM * DMAX + 64
    key = (W, Ws, RS, K, P, C1, E, G, T, span, bool(interpret), bool(debug))
    fn = _get_fn(key)
    out = fn(
        jnp.asarray(hs["st0"]), jnp.asarray(hs["qold"]), jnp.asarray(hs["qb"]),
        jnp.asarray(hs["sind"]), jnp.asarray(hs["greg"]),
        jnp.asarray(hs["mlen"]), jnp.asarray(hs["nst"]),
        jnp.asarray(hs["nfill"]), jnp.asarray(hs["kst"]),
        jnp.asarray(hs["sok"]), jnp.asarray(gp["s_win"]),
        batch, Mf, Sf, Mb, Sb, i0f, i1f, bpf, bpb,
        jnp.asarray(i0r_h), jnp.asarray(i1r_h),
        jnp.asarray(ev_region), float(lik_offset))
    if debug:
        return out, hs
    totals = np.asarray(out, np.float64)

    wide = wide_fallback_totals(Mf, Sf, Mb, Sb, i0f, bpf, bpb,
                                arrays["n0"], arrays["active"], ev_region,
                                gp, hs, span, jnp.float32)
    for (g, t), v in wide.items():
        totals[g, t] = v
    return totals
