"""Fused Pallas mutation group scorer (TPU), v2.

One `pallas_call` computes ALL start-groups' mutation delta-scores: the
splice-and-refill trick of the reference (Alignment.cpp:447-512,
MakeMutations.cpp:23-69) — per group, restart the forward DP from the column
before the mutation at scoring width for P=9 slots at once, join the
selected refill column with the precomputed backward lattice, and difference
against the pre-mutation fwd x back join.

Serving status (round 5): OPT-IN.  With the scoring-band windows hoisted
out of both kernels (mutscore.build_windows), isolated Refine-scale calls
measure this kernel faster than the XLA group kernel (1.7 s vs 2.2 s) but
two interleaved e2e A/Bs came out neutral-to-tied (PERF.md round 5), so
the XLA kernel stays the default; enable with PSQ_PALLAS_MUTSCORE=1 or
auto-by-group-count with PSQ_PALLAS_G_MIN.  Serves f32 single-device
shapes with net-indel bound D <= 4 and K <= 16 (pallas_ok); hardware
parity is asserted by tests/test_pallas_mutscore_hw.py (zero accept-sign
flips at production Refine shape).

v1 of this kernel (grid (G, K), 58 operands) was hardware-correct but paid
~90 us of per-step operand machinery across 57k grid steps.  v2 structure:

  * grid (G,) — ONE step per group; the K refill columns run in an in-kernel
    fori_loop with the carry (previous column per slot, band anchor,
    selected columns, running bests) in registers (probe3);
  * per-region EVENT BLOCKS: the multi-region batch places regions at a
    uniform row stride EB (pack_events rows=), so every event-dim BlockSpec
    index is just the group's region id — per-group tensors are [EB, *]
    instead of the full batch [E, *] (~7x less compute and DMA);
  * merged operands fetched via halo PAIRS of NW-aligned blocks with
    dynamic leading-dim reads (probe E): one window+geometry array
    [Q1, E, 3Ws+2], one per-column metadata array [C1, E, 8] (band starts,
    prefix bests, the precomputed lag-0 old join, backward-column band max,
    scoring-band starts), the wide copied column, and the RE-ANCHORED
    backward lattice;
  * the backward lattice is re-anchored to the scoring-band geometry in the
    XLA prologue (BMn[q,e,r] = Mb[q,e,r-JS+i0r-i0f]), so the in-kernel join
    shift is the residual |i0r[qf]-i0r[qb]| <= DMAX*D (rate-limited,
    monotone geometry) instead of ~RS: back columns are fetched at width
    Ws+2*JS instead of the full realign width;
  * all lane movement is static rolls + masked selects (the Mosaic rules
    established by pallas_fill.py); variable per-event shifts use staged
    (64/8/1) composed-roll selects, and width conversions use an exact
    one-hot f32 matmul on the MXU at HIGHEST precision (the default matmul
    precision truncates inputs to bfloat16).

Slots whose refill is empty (k_star < 0: mutations truncating the sequence
at/before the window start — only tail-of-sequence mutations) are masked out
of the kernel and scored by the existing XLA join on the flagged slots only.

f32 only; the f64 parity path, the mesh (shard_map) path and D=32 shapes
stay on the XLA kernel in mutscore.py.
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


# ---- last-axis variants of the pallas_fill lane-shift helpers (the refill
# runs on [P, EB, Ws] blocks — slot dim folded into sublanes so each vector
# op covers ~18 vregs instead of 2; probe4 validated 3-D lane rolls) ----

def _shl3(x, s, rows, fill):
    W = x.shape[-1]
    z = jnp.where(rows < s, fill, x)
    return pltpu.roll(z, W - s, x.ndim - 1)


def _shr3(x, s, rows, fill):
    return jnp.where(rows < s, fill, pltpu.roll(x, s, x.ndim - 1))


def _shift_sel3(x, d, shifts, rows, fill=0.0):
    """x [..., W] shifted left by per-row d (within `shifts`); same contract
    as pallas_fill._shift_sel on the LAST axis."""
    out = jnp.zeros_like(x)
    for s in shifts:
        if s < 0:
            cand = _shr3(x, -s, rows, fill)
        elif s == 0:
            cand = x
        else:
            cand = _shl3(x, s, rows, fill)
        out = jnp.where(d == s, cand, out)
    return out


_MP_ID = (0.0, _NB, _NB, 0.0, _NB, _NB)


def _mp_combine3(lhs, rhs):
    l11, l12, l21, l22, lu1, lu2 = lhs
    r11, r12, r21, r22, ru1, ru2 = rhs
    return (jnp.maximum(r11 + l11, r12 + l21),
            jnp.maximum(r11 + l12, r12 + l22),
            jnp.maximum(r21 + l11, r22 + l21),
            jnp.maximum(r21 + l12, r22 + l22),
            jnp.maximum(jnp.maximum(r11 + lu1, r12 + lu2), ru1),
            jnp.maximum(jnp.maximum(r21 + lu1, r22 + lu2), ru2))


def _column_solve3(D, a_stay, a_ext, lik_insert, floor0, cut, rows):
    """pallas_fill._column_solve generalized to [..., W] (forward only)."""
    NB = _NB
    a11 = jnp.where(cut, NB, jnp.maximum(lik_insert, a_stay))
    a12 = jnp.where(cut, NB, a_ext)
    a21 = jnp.where(cut, NB, a_stay)
    a22 = jnp.where(cut, NB, a_ext)
    elems = (a11, a12, a21, a22, D, floor0)
    W = D.shape[-1]
    d = 1
    while d < W:
        shifted = tuple(_shr3(arr, d, rows, fv)
                        for arr, fv in zip(elems, _MP_ID))
        elems = _mp_combine3(shifted, elems)
        d *= 2
    return elems[4], elems[5]
NW = 16          # halo-block height (columns) for paired fetches
NWC = 32         # halo-block height for the per-column metadata pairs


def _shift3(x, s, smin, smax, rows):
    """out[e, r] = x[e, r + s[e]] for smin <= s[e] <= smax and 0 <= r+s < W,
    else 0.  Staged (64 / 8 / 1) composed rolls.  Stage composition vacates
    the top <= 63+7 lanes, so results are exact only for r < W - 71 — every
    caller immediately narrows to Ws <= W - 71 lanes."""
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


def _narrow(x, V, off=0):
    """[E, W] -> [E, V]: lanes [off, off+V).  Static lane slices at fixed
    offsets lower cleanly on this Mosaic (probed on hardware; the historic
    CHECK failures were the slice+concat SHIFT idioms, not plain slices) —
    the earlier one-hot-MXU fallback cost ~3 us per call and dominated the
    kernel at ~40 narrows per group."""
    return x[..., off:off + V]


def _lane(x, c):
    """[E, L] -> [E, 1]: lane c (static slice)."""
    return x[..., c:c + 1]


def _pairsel(lo_ref, hi_ref, rel):
    """Dynamic leading-dim read from a halo pair of NW-blocks: row `rel` of
    the 2*NW-row window (rel a traced scalar in [0, 2*NW))."""
    r0 = jnp.clip(rel, 0, NW - 1)
    r1 = jnp.clip(rel - NW, 0, NW - 1)
    return jnp.where(rel < NW, lo_ref[r0], hi_ref[r1])


def _pairselc(lo_ref, hi_ref, rel):
    """Same for the NWC-sized metadata pair."""
    r0 = jnp.clip(rel, 0, NWC - 1)
    r1 = jnp.clip(rel - NWC, 0, NWC - 1)
    return jnp.where(rel < NWC, lo_ref[r0], hi_ref[r1])


# colmeta lane assignments ([C1, E, 8] f32; ints are exact in f32 here)
CM_I0F, CM_I1F, CM_BPF, CM_OLD, CM_BPB, CM_BCOL, CM_I0R = range(7)


def _kernel(W, Ws, RS, K, P, C1, JS, debug,
            # scalar-prefetch refs (qbf_r feeds the back-column index maps)
            st0_r, qold_r, qbb_r, sind_r, greg_r, qbf_r,
            # inputs
            mw_ref, wg_lo, wg_hi, cm_lo, cm_hi,
            *rest):
    bM = rest[0:P]
    bS = rest[P:2 * P]
    mv_ref, meta_ref, emi_ref, emf_ref = rest[2 * P:2 * P + 4]
    rest = rest[2 * P + 4:]
    tot_ref = rest[0]
    if debug:
        new_ref, oldd_ref, sel_ref, sa_ref = rest[1:5]

    g = pl.program_id(0)
    EB = tot_ref.shape[1]
    WB = Ws + 2 * JS
    rows = jax.lax.broadcasted_iota(jnp.int32, (EB, Ws), 1)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (EB, W), 1)
    rows_wb = jax.lax.broadcasted_iota(jnp.int32, (EB, WB), 1)
    i32 = jnp.int32

    st0 = st0_r[g]
    qold = qold_r[g]
    qbb = qbb_r[g]
    sind = sind_r[g]
    greg = greg_r[g]

    n0 = emi_ref[0]                                        # [EB, 1] i32
    evr = emi_ref[1]
    act_e = emf_ref[0]                                     # [EB, 1] f32 0/1
    lik_sk = emf_ref[1]
    lik_st = emf_ref[2]
    lik_ex = emf_ref[3]
    lik_in = emf_ref[4]

    # group-shared per-column metadata at st0 / qold (halo pair around qold)
    mc = jnp.maximum(qold - 3, 0) >> 5
    cm_st0 = _pairselc(cm_lo, cm_hi, st0 - (mc << 5))      # [EB, 8]
    cm_old = _pairselc(cm_lo, cm_hi, qold - (mc << 5))
    wi0 = _lane(cm_st0, CM_I0F).astype(i32)
    wi1 = _lane(cm_st0, CM_I1F).astype(i32)
    wbest = _lane(cm_st0, CM_BPF)
    old = _lane(cm_old, CM_OLD)

    # wide copied column (one dynamic row of the NW block at st0>>4)
    mw = mw_ref[jnp.bitwise_and(st0, NW - 1)]              # [EB, W]

    mwin = (st0 + 1) >> 4
    cut = rows == 0
    floor0 = jnp.where(cut, _NB, 0.0)

    # wide first-column prev reads, hoisted out of the fori body (they cost
    # two staged W-wide shifts): pmW[r] = Mw[r + o0], pmWm1[r] = Mw[r+o0-1]
    wg0 = _pairsel(wg_lo, wg_hi,
                   jnp.maximum(jnp.minimum(st0 + 1, C1 - 1) - (mwin << 4), 0))
    i0c0 = _lane(wg0, 3 * Ws).astype(i32)
    o0 = i0c0 - wi0
    FSMIN, FSMAX = -64, RS + 64 + DMAX
    pwi0 = _narrow(_shift3(mw, o0, FSMIN, FSMAX + 1, rows_w), Ws)
    pwm10 = _narrow(_shift3(mw, o0 - 1, FSMIN - 1, FSMAX, rows_w), Ws)

    zs = jnp.zeros((EB, Ws), jnp.float32)

    # per-slot static metadata reads ([8, P] block)
    mlen = [meta_ref[0, 0, t] for t in range(P)]
    nst = [meta_ref[0, 1, t] for t in range(P)]
    nfill = [meta_ref[0, 2, t] for t in range(P)]
    kst = [meta_ref[0, 3, t] for t in range(P)]
    sok = [meta_ref[0, 4, t] for t in range(P)]
    qbrel = [meta_ref[0, 5, t] for t in range(P)]

    # per-column data read ONCE per k (dynamic-row pair select), held in
    # registers across the slot loop; the shared band-anchor chain (advance
    # when ANY slot is active) is pure scalar metadata, so it is computed
    # up-front without any DP state
    wg_k, i0c_k, i1c_k, ci0_k = [], [], [], []
    ci0 = wi0 + RS
    for k in range(K):
        col = jnp.minimum(st0 + 1 + k, C1 - 1)
        wg = _pairsel(wg_lo, wg_hi, jnp.maximum(col - (mwin << 4), 0))
        i0c = _lane(wg, 3 * Ws).astype(i32)
        wg_k.append(wg)
        i0c_k.append(i0c)
        i1c_k.append(_lane(wg, 3 * Ws + 1).astype(i32))
        ci0_k.append(ci0)                 # anchor BEFORE step k
        refind = sind + 1 + k
        any_act = None
        for t in range(P):
            a = (k < mlen[t] + 6) & (refind <= nst[t]) & (k < nfill[t])
            any_act = a if any_act is None else jnp.logical_or(any_act, a)
        ci0 = jnp.where(any_act, i0c, ci0)

    # ---- refill, vectorized over slots: [P, EB, Ws] blocks (~18-vreg ops;
    # both a slot-major carry layout and a slot-at-a-time loop were
    # instruction-issue bound on 2-vreg [EB, Ws] tiles at ~230 us/group) ----
    p_iota = jax.lax.broadcasted_iota(jnp.int32, (P, 1, 1), 0)

    def slot_stack(vals_2d):
        """[P, EB, 1] from P [EB, 1] values (mask-select; no sublane
        concat, which Mosaic may not lower)."""
        out = jnp.zeros((P, EB, 1), vals_2d[0].dtype)
        for t in range(P):
            out = jnp.where(p_iota == t, vals_2d[t], out)
        return out

    def slot_mask(bools):
        """[P, 1, 1] f32 0/1 mask from P scalar bools."""
        out = jnp.zeros((P, 1, 1), jnp.float32)
        for t in range(P):
            out = jnp.where(jnp.logical_and(p_iota == t, bools[t]), 1.0, out)
        return out

    Mc = jnp.zeros((P, EB, Ws), jnp.float32)
    selM = Mc
    selS = Mc
    sa = jnp.broadcast_to((wi0 + RS)[None], (P, EB, 1))
    sbest = jnp.broadcast_to(wbest[None], (P, EB, 1))
    cbest = sbest
    for k in range(K):
        refind = sind + 1 + k
        wg = wg_k[k]
        i0c = i0c_k[k]
        i1c = i1c_k[k]
        mwv = _narrow(wg, Ws, 0)                           # [EB, Ws]
        swv = _narrow(wg, Ws, Ws)
        lwv = _narrow(wg, Ws, 2 * Ws)
        i = i0c + rows
        in_band = i <= i1c
        mvk = mv_ref[k]                                    # [EB, 64]

        stk = slot_stack([_lane(mvk, 54 + t) for t in range(P)])
        act3 = slot_mask([(k < mlen[t] + 6) & (refind <= nst[t])
                          & (k < nfill[t]) for t in range(P)]) > 0.5
        hit3 = slot_mask([((k < mlen[t] + 6) & (refind <= nst[t])
                           & (k < nfill[t]) & (k == kst[t]))
                          for t in range(P)]) > 0.5

        lm = slot_stack([_lane(mvk, t * 6 + 0) for t in range(P)])
        ls = slot_stack([_lane(mvk, t * 6 + 1) for t in range(P)])
        ll = slot_stack([_lane(mvk, t * 6 + 2) for t in range(P)])
        smn = slot_stack([_lane(mvk, t * 6 + 3) for t in range(P)])
        lam = slot_stack([_lane(mvk, t * 6 + 4) for t in range(P)])
        llam = slot_stack([_lane(mvk, t * 6 + 5) for t in range(P)])
        e_obs = emission(mwv, swv, lwv, lm, ls, ll, smn, lam, llam, 0.0)
        live = in_band & (stk >= -0.5)                     # [P, EB, Ws]
        e_obs = jnp.where(live, e_obs, 0.0)

        if k == 0:
            pm_i = jnp.broadcast_to(pwi0[None], (P, EB, Ws))
            pm_im1 = jnp.broadcast_to(pwm10[None], (P, EB, Ws))
            p0, p1 = wi0, wi1
        else:
            d = i0c - ci0_k[k]
            pm_i = _shift_sel3(Mc, d, SH_STEP, rows)
            pm_im1 = _shift_sel3(Mc, d - 1, SH_STEP_M1, rows)
            p0 = ci0_k[k]
            p1 = ci0_k[k] + (Ws - 1)
        valid_i = (i >= p0) & (i <= p1)
        valid_ul = (i > p0) & (i <= p1)

        skip_c = jnp.where(valid_i, pm_i, 0.0) + lik_sk
        match_c = jnp.where(valid_ul, pm_im1, 0.0) + e_obs
        ignore_c = jnp.where(valid_ul, pm_im1 + lik_in, 0.0)
        D = jnp.maximum(jnp.maximum(0.0, skip_c),
                        jnp.maximum(match_c, ignore_c))
        a_stay = e_obs + lik_st
        a_ext = e_obs + lik_ex
        Mn, Sn = _column_solve3(D, a_stay, a_ext, lik_in,
                                jnp.broadcast_to(floor0, D.shape), cut, rows)
        Mn = jnp.where(live, Mn, 0.0)
        Sn = jnp.where(live, Sn, 0.0)
        cmax = jnp.max(jnp.where(live, Mn, _NB), axis=2, keepdims=True)
        bestn = jnp.maximum(cmax, cbest)

        selM = jnp.where(hit3, Mn, selM)
        selS = jnp.where(hit3, Sn, selS)
        sa = jnp.where(hit3, i0c[None], sa)
        sbest = jnp.where(hit3, bestn, sbest)
        Mc = jnp.where(act3, Mn, Mc)
        cbest = jnp.where(act3, bestn, cbest)

    # ---- joins, per slot ----
    okm = (act_e > 0.5) & (evr == greg)                    # [EB, 1]
    mb2 = qbb >> 4
    out_lanes = jax.lax.broadcasted_iota(jnp.int32, (EB, 128), 1)
    acc = jnp.zeros((EB, 128), jnp.float32)
    span = JS - 16 + 64
    JMIN, JMAX = -span, RS + span
    for t in range(P):
        selM_t = selM[t]
        selS_t = selS[t]
        sa_t = sa[t]
        sbest_t = sbest[t]
        qb_t = qbb + qbrel[t]
        BMt = bM[t][0]                                     # [EB, W] raw
        BSt = bS[t][0]
        cm_qb = _pairselc(cm_lo, cm_hi, qb_t - (mc << 5))  # [EB, 8]
        ba = _lane(cm_qb, CM_I0F).astype(i32)
        bb = _lane(cm_qb, CM_BPB)
        bc = _lane(cm_qb, CM_BCOL)

        fa = sa_t
        # raw-lag shift of the full-width back column (exactly the XLA
        # kernel's shift_select2 semantics: lags outside [JMIN, JMAX] zero
        # the shifted column, which degrades crossA to max(FM, FS) — already
        # a term of sA, so no separate range mask is needed)
        s_raw = fa - ba
        BMs = _narrow(_shift3(BMt, s_raw, JMIN, JMAX, rows_w), Ws)
        BSs = _narrow(_shift3(BSt, s_raw, JMIN, JMAX, rows_w), Ws)
        crossA = jnp.maximum(selM_t + BMs, selS_t + BSs)
        okF = (fa + rows >= 1) & (fa + rows <= n0)
        sA = jnp.max(
            jnp.where(okF, jnp.maximum(crossA, jnp.maximum(selM_t, selS_t)),
                      0.0),
            axis=1, keepdims=True)
        sm = jnp.maximum(jnp.maximum(sA, bc), 0.0)
        sm = jnp.maximum(sm, sbest_t)
        sm = jnp.maximum(sm, bb)
        delta = sm - old
        ok_t = okm & (sok[t] > 0)
        acc = acc + jnp.where((out_lanes == t) & ok_t, delta, 0.0)
        if debug:
            new_ref[0, t] = sm
            oldd_ref[0] = old
            sel_ref[0, t] = selM_t
            sa_ref[0, t] = sa_t
    tot_ref[0] = acc


_FNS: dict = {}


def _get_fn(key):
    if key in _FNS:
        return _FNS[key]
    (W, Ws, RS, K, P, C1, E, EB, G, T, JS, interpret, debug) = key
    i32 = jnp.int32
    f32 = jnp.float32
    Q1 = C1
    WB = Ws + 2 * JS
    LW = 3 * Ws + 2
    C1p = ((C1 + 2 * NWC - 1) // NWC) * NWC + NWC  # halo-pair headroom

    kern = functools.partial(_kernel, W, Ws, RS, K, P, C1, JS, debug)

    # prefetch order: st0, qold, qbb, sind, greg, qbf (flat [G*P])
    def at_wg(dm):
        def f(g, st0, qold, qbb, sind, greg, qbf):
            return (((st0[g] + 1) >> 4) + dm, jnp.maximum(greg[g], 0), 0)
        return f

    def at_cm(dm):
        def f(g, st0, qold, qbb, sind, greg, qbf):
            return ((jnp.maximum(qold[g] - 3, 0) >> 5) + dm,
                    jnp.maximum(greg[g], 0), 0)
        return f

    def at_qb(t):
        # raw back column at this slot's q_b (leading-1 block)
        def f(g, st0, qold, qbb, sind, greg, qbf):
            return (qbf[g * P + t], jnp.maximum(greg[g], 0), 0)
        return f

    def at_mw2(g, st0, qold, qbb, sind, greg, qbf):
        return (st0[g] >> 4, jnp.maximum(greg[g], 0), 0)

    def at_g(g, *s):
        return (g, 0, 0)

    def at_e(g, st0, qold, qbb, sind, greg, qbf):
        return (0, jnp.maximum(greg[g], 0), 0)

    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((NW, EB, W), at_mw2, memory_space=vm),        # Mw block
        pl.BlockSpec((NW, EB, LW), at_wg(0), memory_space=vm),     # wingeo lo
        pl.BlockSpec((NW, EB, LW), at_wg(1), memory_space=vm),     # wingeo hi
        pl.BlockSpec((NWC, EB, 8), at_cm(0), memory_space=vm),     # colmeta lo
        pl.BlockSpec((NWC, EB, 8), at_cm(1), memory_space=vm),     # colmeta hi
    ]
    in_specs += [pl.BlockSpec((1, EB, W), at_qb(t), memory_space=vm)
                 for t in range(P)]                                # back M
    in_specs += [pl.BlockSpec((1, EB, W), at_qb(t), memory_space=vm)
                 for t in range(P)]                                # back S
    in_specs += [
        pl.BlockSpec((K, EB, 64), at_g, memory_space=vm),          # mv
        pl.BlockSpec((1, 8, P), at_g, memory_space=vm),            # meta
        pl.BlockSpec((2, EB, 1), at_e, memory_space=vm),           # emi
        pl.BlockSpec((5, EB, 1), at_e, memory_space=vm),           # emf
    ]
    out_specs = pl.BlockSpec((1, EB, 128), at_g, memory_space=vm)
    out_shapes = jax.ShapeDtypeStruct((G, EB, 128), f32)
    if debug:
        out_specs = [out_specs,
                     pl.BlockSpec((1, P, EB, 1), lambda g, *s: (g, 0, 0, 0),
                                  memory_space=vm),
                     pl.BlockSpec((1, EB, 1), lambda g, *s: (g, 0, 0),
                                  memory_space=vm),
                     pl.BlockSpec((1, P, EB, Ws),
                                  lambda g, *s: (g, 0, 0, 0),
                                  memory_space=vm),
                     pl.BlockSpec((1, P, EB, 1), lambda g, *s: (g, 0, 0, 0),
                                  memory_space=vm)]
        out_shapes = [out_shapes, jax.ShapeDtypeStruct((G, P, EB, 1), f32),
                      jax.ShapeDtypeStruct((G, EB, 1), f32),
                      jax.ShapeDtypeStruct((G, P, EB, Ws), f32),
                      jax.ShapeDtypeStruct((G, P, EB, 1), i32)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(G,),
        in_specs=in_specs,
        out_specs=out_specs,
    )
    call = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    def go(st0, qold, qbb, sind, greg, qbf, batch, Mf, Sf, Mb, Sb, i0f, i1f,
           win_m, win_s, win_l, bpf, bpb, i0r, i1r, ev_region, meta, swin,
           lik_offset):
        Mf = Mf.astype(f32)
        Sf = Sf.astype(f32)
        Mb = Mb.astype(f32)
        Sb = Sb.astype(f32)
        bpf = bpf.astype(f32)
        bpb = bpb.astype(f32)
        n0 = batch.n0.astype(i32)
        i0fT = i0f.astype(i32).T                                # [C1, E]
        i1fT = i1f.astype(i32).T
        i0rT = i0r.astype(i32).T                                # [Q1, E]
        i1rT = i1r.astype(i32).T

        # scoring-band windows (shared per call, mutscore.build_windows)
        # + geometry, one [Q1, E, 3Ws+2] array
        wingeo = jnp.concatenate([
            win_m.astype(f32), win_s.astype(f32), win_l.astype(f32),
            i0rT[:, :, None].astype(f32), i1rT[:, :, None].astype(f32),
        ], axis=2)                                              # [Q1, E, LW]

        # per-column precomputes: lag-0 old-score join and the backward
        # column's single-sided band max (sB of mutscore._join_shift)
        iabs = i0fT[:, :, None] + jnp.arange(W, dtype=i32)
        okb = (iabs >= 1) & (iabs <= n0[None, :, None])
        cross = jnp.maximum(Mf + Mb, Sf + Sb)
        sm = jnp.max(jnp.where(okb, cross, 0.0), axis=-1)
        oldj = jnp.maximum(jnp.maximum(sm, 0.0), jnp.maximum(bpf, bpb))
        bcol = jnp.max(jnp.where(okb, jnp.maximum(Mb, Sb), 0.0), axis=-1)

        colmeta = jnp.stack([
            i0fT.astype(f32), i1fT.astype(f32), bpf, oldj, bpb, bcol,
            i0rT.astype(f32), jnp.zeros_like(bpf)], axis=2)     # [C1, E, 8]

        # per-(group, step) model values + per-slot states, [G*K, EB, 64]
        mt = jnp.stack([
            batch.lev_mean.astype(f32), batch.lev_stdv.astype(f32),
            batch.log_lev.astype(f32) - jnp.asarray(lik_offset, f32),
            batch.sd_mean.astype(f32), batch.sd_lambda.astype(f32),
            batch.log_lambda.astype(f32)])                      # [6, E, 1024]
        G_, P_, K_ = swin.shape
        stc = jnp.clip(swin, 0, 1023)
        erow = (jnp.maximum(greg, 0)[:, None] * EB
                + jnp.arange(EB, dtype=i32)[None, :])           # [G, EB]
        erow = jnp.clip(erow, 0, mt.shape[1] - 1)
        # one fancy gather: mv6[j, g, e, t, k] = mt[j, erow[g, e], stc[g,t,k]]
        mv6 = mt[:, erow[:, :, None, None], stc[:, None, :, :]]
        # mv6: [6, G, EB, P, K] -> [G, K, EB, 6P (+ P state lanes + pad)]
        mv = jnp.transpose(mv6, (1, 4, 2, 3, 0)).reshape(G_, K_, EB, P_ * 6)
        stlan = jnp.broadcast_to(
            jnp.transpose(swin, (0, 2, 1))[:, :, None, :].astype(f32),
            (G_, K_, EB, P_))                                   # winst lanes
        pad = jnp.zeros((G_, K_, EB, 64 - 6 * P_ - P_), f32)
        mv = jnp.concatenate([mv, stlan, pad], axis=3).reshape(
            G_ * K_, EB, 64)

        # pad the column axis so halo pairs never index past the end
        def cpad(x, n):
            return jnp.concatenate(
                [x, jnp.zeros((n - x.shape[0],) + x.shape[1:], x.dtype)])

        wingeo = cpad(wingeo, C1p)
        colmeta = cpad(colmeta, C1p)
        Mbp = cpad(Mb, C1p)
        Sbp = cpad(Sb, C1p)
        Mfp = cpad(Mf, C1p)

        emi = jnp.stack([n0, ev_region.astype(i32)])[:, :, None]
        emf = jnp.stack([
            batch.active.astype(f32), batch.lik_skip.astype(f32),
            batch.lik_stay.astype(f32), batch.lik_extend.astype(f32),
            batch.lik_insert.astype(f32)])[:, :, None]

        out = call(st0, qold, qbb, sind, greg, qbf,
                   Mfp, wingeo, wingeo, colmeta, colmeta,
                   *([Mbp] * P + [Sbp] * P), mv, meta, emi, emf)
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

    # pad groups inherit the previous real group's columns so their (masked)
    # block fetches stay in range and coherent
    real = greg >= 0
    if real.any():
        last = None
        for g in range(G):
            if real[g]:
                last = g
            elif last is not None:
                st0[g] = st0[last]
                q_old[g] = q_old[last]
                q_b[g] = q_b[last]
    qbb = q_b.min(axis=1)
    qbrel = q_b - qbb[:, None]
    i32 = np.int32
    return dict(
        st0=st0.astype(i32), qold=q_old.astype(i32), qb=q_b.astype(i32),
        qbb=qbb.astype(i32), qbrel=qbrel.astype(i32),
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


def pallas_ok(gp_dm: int, K: int, stride: int | None, Ws: int, W: int,
              force: bool = False) -> bool:
    """The fused kernel serves D<=4 shapes over a uniform-stride batch, and
    by DEFAULT only the narrow Refine-like widths where it measures faster
    than the XLA group kernel (Ws <= 64); force (PSQ_PALLAS_MUTSCORE=1 or
    interp tests) extends it to any supported width.  D=32 big-indel Mutate
    shapes and unstrided layouts always use the XLA kernel.

    K <= 16 is a hard correctness bound: the NW=16 wingeo halo pairs cover
    refill rows rel = ((st0+1)&15) + k, so K-1 <= 16 keeps rel < 2*NW —
    longer substitution windows (K buckets 46/160) would silently clamp to
    the last halo row in _pairsel.  Ws <= W-71 is the _shift3 staged-roll
    exactness limit (its stage composition vacates the top <= 71 lanes)."""
    ok = (gp_dm <= 4 and K <= 16 and stride is not None
          and Ws <= min(W - 71, 500))
    return ok and (force or Ws <= 64)


def score_groups_pallas(batch, Mf, Sf, Mb, Sb, i0f, i1f, wins, bpf, bpb,
                        i0r_h, i1r_h, ev_region, gp, arrays, lik_offset,
                        W, Ws, RS, K, P, DM, EB, interpret=False,
                        debug=False):
    """Full group-scoring totals [G, P] (numpy float64) via the fused Pallas
    kernel + the XLA fallback for flagged slots.  Drop-in replacement for the
    XLA group kernel's output in mutscore.score_mutations_multi.  EB: the
    uniform per-region row stride of the batch."""
    C1 = int(Mf.shape[0])
    E = int(Mf.shape[1])
    G = int(gp["G_pad"])
    T = int(batch.mean.shape[1])
    hs = host_slot_arrays(gp, K, P, C1)
    JS = DMAX * DM + 16
    key = (W, Ws, RS, K, P, C1, E, EB, G, T, JS, bool(interpret),
           bool(debug))
    fn = _get_fn(key)

    meta = np.zeros((G, 8, P), np.int32)
    meta[:, 0] = hs["mlen"]
    meta[:, 1] = hs["nst"]
    meta[:, 2] = hs["nfill"]
    meta[:, 3] = hs["kst"]
    meta[:, 4] = hs["sok"]
    meta[:, 5] = hs["qbrel"]

    out = fn(
        jnp.asarray(hs["st0"]), jnp.asarray(hs["qold"]),
        jnp.asarray(hs["qbb"]), jnp.asarray(hs["sind"]),
        jnp.asarray(hs["greg"]), jnp.asarray(hs["qb"].reshape(-1)),
        batch, Mf, Sf, Mb, Sb, i0f, i1f, wins[0], wins[1], wins[2],
        bpf, bpb, jnp.asarray(i0r_h), jnp.asarray(i1r_h),
        jnp.asarray(ev_region), jnp.asarray(meta),
        jnp.asarray(gp["s_win"]), float(lik_offset))
    if debug:
        return out, hs
    totals = np.asarray(out, np.float64)

    span = DM * DMAX + 64
    wide = wide_fallback_totals(Mf, Sf, Mb, Sb, i0f, bpf, bpb,
                                arrays["n0"], arrays["active"], ev_region,
                                gp, hs, span, jnp.float32)
    for (g, t), v in wide.items():
        totals[g, t] = v
    return totals
