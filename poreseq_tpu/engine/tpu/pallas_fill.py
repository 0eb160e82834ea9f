"""Fused Pallas banded pair-HMM fill (TPU).

One `pallas_call` runs the whole column scan of dp.make_fill as a single
kernel: grid=(C,) with "arbitrary" dimension semantics, the cross-column
carry (previous column's M/S/emission and the three sliding data windows)
living in VMEM scratch.  This removes the per-op dispatch overhead that
bounds the XLA `lax.scan` fill (~150 ops per column; PERF.md) — all column
math happens register/VMEM-resident in one kernel pass.

Semantics are identical to dp.make_fill (reference recurrence
/root/reference/cpp/Alignment.cpp:111-444; quirks documented in dp.py),
relying on two geometry invariants established by pack.limited_geometry:

  * padding columns are suffix-only per event, with frozen band starts
    (window slides degenerate to shift-0) and empty bands (i1=0, so every
    row fails the in-band test) — hence no pad special-casing is needed in
    the kernel: pad columns naturally output zeros and write zero carries
    that no live column ever reads;
  * band starts advance by at most dp.DMAX per column, so every cross-column
    data movement is a select over DMAX+1 static shifts.

The running best/argmax bookkeeping is hoisted OUT of the kernel: the kernel
emits per-column (cmax, carg) and the wrapper derives best / best_i / best_j
/ best_pfx with cummax/argmax on [C, E] arrays (exactly the strict-> running
update of the reference, Alignment.cpp:270).

f32 only: TPU Pallas has no f64.  The f64 parity path stays on dp.make_fill.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dp import (DMAX, EXTEND, IGNORE, IMPLICIT, INSERT, MATCH, SKIP, STAY,
                 EventBatch, FillResult, emission, neg_big)

_NB = -1e30  # f32 -inf sentinel (matches dp.neg_big for f32)


# All lane-axis data movement inside the kernel is expressed as full-width
# rotates (tpu.RotateOp via pltpu.roll) + masked selects against the `rows`
# iota.  Slice/concatenate shift idioms (x[:, s:] ++ fill) make Mosaic's
# ApplyVectorLayout emit vector.extract_strided_slice ops that CHECK-fail
# ("limits[i] <= dim(i)") once the sublane dim spans multiple vregs (E>=16),
# so the kernel contains no strided slices at all.


def _shl(x, s, rows, fill):
    """Lane left-shift by static s>0; vacated tail lanes w>=W-s take
    fill[w-(W-s)] (fill is full-width with payload at head lanes, or a
    scalar).  Single rotate: rot_right(where(rows<s, fill, x), W-s)."""
    W = x.shape[-1]
    z = jnp.where(rows < s, fill, x)
    return pltpu.roll(z, W - s, 1)


def _shr(x, s, rows, fill):
    """Lane right-shift by static s>0; vacated head lanes w<s take fill[w]
    (full-width with payload at head lanes, or a scalar)."""
    return jnp.where(rows < s, fill, pltpu.roll(x, s, 1))


def _shift_sel(x, d, shifts, rows, fill=0.0):
    """out[e] = x[e] shifted left by d[e] (row axis last); vacated positions
    take fill[e, :|s|] (tail for left shifts, head for right).  Same contract
    as dp.shift_select, traced inside the kernel.  `d` is [E, 1] (Mosaic
    cannot relayout 1-D vectors to 2-D, so everything stays 2-D).  `fill` is
    a scalar or a full-width [E, W] array with payload at head lanes."""
    out = jnp.zeros_like(x)
    for s in shifts:
        if s < 0:
            cand = _shr(x, -s, rows, fill)
        elif s == 0:
            cand = x
        else:
            cand = _shl(x, s, rows, fill)
        out = jnp.where(d == s, cand, out)
    return out


def _mp_combine(lhs, rhs):
    """Max-plus combine (rhs applied after lhs) for (a11,a12,a21,a22,u1,u2)."""
    l11, l12, l21, l22, lu1, lu2 = lhs
    r11, r12, r21, r22, ru1, ru2 = rhs
    a11 = jnp.maximum(r11 + l11, r12 + l21)
    a12 = jnp.maximum(r11 + l12, r12 + l22)
    a21 = jnp.maximum(r21 + l11, r22 + l21)
    a22 = jnp.maximum(r21 + l12, r22 + l22)
    u1 = jnp.maximum(jnp.maximum(r11 + lu1, r12 + lu2), ru1)
    u2 = jnp.maximum(jnp.maximum(r21 + lu1, r22 + lu2), ru2)
    return (a11, a12, a21, a22, u1, u2)


_ID_FILL = (0.0, _NB, _NB, 0.0, _NB, _NB)  # max-plus identity element


def _mp_scan(elems, rows, reverse: bool):
    """Hillis-Steele inclusive max-plus scan over the last axis.  With
    reverse=True the chain runs from high rows downward (element r applied
    after the suffix r+1..)."""
    E, W = elems[0].shape
    d = 1
    while d < W:
        shifted = []
        for arr, fv in zip(elems, _ID_FILL):
            if reverse:
                sh = _shl(arr, d, rows, fv)
            else:
                sh = _shr(arr, d, rows, fv)
            shifted.append(sh)
        elems = _mp_combine(tuple(shifted), elems)
        d *= 2
    return elems


def _column_solve(D, a_stay, a_ext, lik_insert, floor0, cut, rows, reverse):
    NB = _NB
    a11 = jnp.maximum(lik_insert, a_stay)
    a12 = a_ext
    a21 = a_stay
    a22 = a_ext
    a11 = jnp.where(cut, NB, a11)
    a12 = jnp.where(cut, NB, a12)
    a21 = jnp.where(cut, NB, a21)
    a22 = jnp.where(cut, NB, a22)
    res = _mp_scan((a11, a12, a21, a22, D, floor0), rows, reverse)
    return res[4], res[5]


SH_FWD = tuple(range(0, DMAX + 1))
SH_FWD_M1 = tuple(range(-1, DMAX))
SH_BWD = tuple(range(-DMAX, 1))
SH_BWD_P1 = tuple(range(-DMAX + 1, 2))


def _kernel(backward: bool, need_steps: bool, W: int, NC: int,
            # inputs (refs); per-column [C, E, 1] arrays are blocked
            # (NC, E, 1) so per-column reads are natively [E, 1] 2-D vectors
            # — Mosaic can neither take (1, E) blocks (trailing-dims tiling
            # rule) nor relayout a 1-D vector to [E, 1]
            st_ref, live_ref, i0p_ref, i1p_ref, i0c_ref, i1c_ref,
            lm_ref, ls_ref, ll_ref, sm_ref, lam_ref, llam_ref,
            rfm_ref, rfs_ref, rfl_ref,
            w0m_ref, w0s_ref, w0l_ref, lik4_ref,
            # outputs
            *out_and_scratch):
    if need_steps:
        (M_out, S_out, stm_out, sts_out, cmax_out, carg_out,
         prevM, prevO, win_m, win_s, win_l, fw) = out_and_scratch
    else:
        (M_out, S_out, cmax_out, carg_out,
         prevM, prevO, win_m, win_s, win_l, fw) = out_and_scratch

    c = pl.program_id(0)
    E = prevM.shape[0]
    # full [E, W] iota: Mosaic's layout pass CHECK-fails on (1, W) vectors at
    # large W (sublane limit 8 vs dim 1), so avoid 1-sublane shapes entirely
    rows = jax.lax.broadcasted_iota(jnp.int32, (E, W), 1)      # [E, W]

    @pl.when(c == 0)
    def _init():
        z = jnp.zeros((E, W), jnp.float32)
        prevM[:] = z
        prevO[:] = z
        win_m[:] = w0m_ref[:]
        win_s[:] = w0s_ref[:]
        win_l[:] = w0l_ref[:]

    lik_skip = lik4_ref[0]                                     # [E, 1]
    lik_stay = lik4_ref[1]
    lik_extend = lik4_ref[2]
    lik_insert = lik4_ref[3]

    # cross-column carry held in registers across the NC unrolled columns;
    # the stay lattice has no cross-column dependency so only M and the
    # emission column are carried
    pM = prevM[:]
    pO = prevO[:]
    wm_v = win_m[:]
    ws_v = win_s[:]
    wl_v = win_l[:]

    ks = range(NC - 1, -1, -1) if backward else range(NC)
    for k in ks:
        i0c = i0c_ref[k]                                       # [E, 1]
        i1c = i1c_ref[k]
        p0 = i0p_ref[k]
        p1 = i1p_ref[k]
        i = i0c + rows                                         # [E, W]
        in_band = i <= i1c

        # ---- slide the data windows (anchor prev i0 -> i0c) ----
        # refill payloads ([E, DMAX]) are staged at the head lanes of the
        # full-width scratch `fw` so shift fills never need a concatenate
        dw = i0c - p0                                          # [E, 1]
        sh_w = SH_BWD if backward else SH_FWD
        dw = jnp.clip(dw, sh_w[0], sh_w[-1])
        if not backward and k == 0:
            # the first processed column's window is pre-anchored at its own
            # band start (win0, pack/dp) — the blank "previous column" anchor
            # 0 must not slide it (overhanging reads start the band mid-read)
            dw = jnp.where(c == 0, 0, dw)
        fw[:, :DMAX] = rfm_ref[k]
        mean_v = _shift_sel(wm_v, dw, sh_w, rows, fw[:])
        fw[:, :DMAX] = rfs_ref[k]
        stdv_v = _shift_sel(ws_v, dw, sh_w, rows, fw[:])
        fw[:, :DMAX] = rfl_ref[k]
        lsx_v = _shift_sel(wl_v, dw, sh_w, rows, fw[:])

        lm = lm_ref[k]                                         # [E, 1]
        ls = ls_ref[k]
        ll = ll_ref[k]                  # pre-folded with -lik_offset
        sm = sm_ref[k]
        lam = lam_ref[k]
        llam = llam_ref[k]
        e = emission(mean_v, stdv_v, lsx_v, lm, ls, ll, sm, lam, llam, 0.0)
        e = jnp.where(in_band, e, 0.0)
        live = in_band & (live_ref[k] > 0.5)

        # ---- previous-column reads via static rolls ----
        dv = i0c - p0
        valid_i = (i >= p0) & (i <= p1)
        if backward:
            pm_i = _shift_sel(pM, jnp.clip(dv, -DMAX, 0), SH_BWD, rows)
            pm_d = _shift_sel(pM, jnp.clip(dv + 1, -DMAX + 1, 1), SH_BWD_P1,
                              rows)
            pobs_d = _shift_sel(pO, jnp.clip(dv + 1, -DMAX + 1, 1), SH_BWD_P1,
                                rows)
            valid_ul = (i >= p0) & (i < p1)
            match_c = jnp.where(valid_ul, pm_d + pobs_d, 0.0)
        else:
            pm_i = _shift_sel(pM, jnp.clip(dv, 0, DMAX), SH_FWD, rows)
            pm_d = _shift_sel(pM, jnp.clip(dv - 1, -1, DMAX - 1), SH_FWD_M1,
                              rows)
            valid_ul = (i > p0) & (i <= p1)
            match_c = jnp.where(valid_ul, pm_d, 0.0) + e

        skip_c = jnp.where(valid_i, pm_i, 0.0) + lik_skip
        ignore_c = jnp.where(valid_ul, pm_d + lik_insert, 0.0)
        D = jnp.maximum(jnp.maximum(0.0, skip_c),
                        jnp.maximum(match_c, ignore_c))

        if backward:
            e_src = _shl(e, 1, rows, 0.0)
            cut = i >= i1c
            floor0 = jnp.where(i == i1c, _NB, 0.0)
        else:
            e_src = e
            cut = rows == 0
            floor0 = jnp.where(cut, _NB, jnp.zeros_like(D))
        a_stay = e_src + lik_stay
        a_ext = e_src + lik_extend

        M, S = _column_solve(D, a_stay, a_ext, lik_insert, floor0, cut, rows,
                             backward)

        M = jnp.where(live, M, 0.0)
        S = jnp.where(live, S, 0.0)
        e_out = jnp.where(live, e, 0.0)

        if need_steps:
            # step codes carried as int32 (Mosaic cannot relayout f32-derived
            # i1 masks to the (32,128) tiling that uint8 selects need; the
            # i32->u8 cast at the store is supported)
            Mm1 = _shr(M, 1, rows, 0.0)
            Sm1 = _shr(S, 1, rows, 0.0)
            nfirst = rows > 0
            ins_c = jnp.where(nfirst, Mm1 + lik_insert, 0.0)
            s4 = jnp.where(nfirst, Mm1 + e_src + lik_stay, _NB)
            s5 = jnp.where(nfirst, Sm1 + e_src + lik_extend, _NB)

            i32 = jnp.int32
            val = jnp.zeros_like(M)
            stp = jnp.zeros(M.shape, i32)
            bp0 = jnp.where(valid_i, i32(SKIP), i32(IMPLICIT))
            upd = skip_c > val
            val = jnp.where(upd, skip_c, val)
            stp = jnp.where(upd, bp0, stp)
            bp1 = jnp.where(valid_ul, i32(MATCH), i32(IMPLICIT))
            upd = match_c > val
            val = jnp.where(upd, match_c, val)
            stp = jnp.where(upd, bp1, stp)
            upd = ins_c > val
            val = jnp.where(upd, ins_c, val)
            stp = jnp.where(upd, i32(INSERT), stp)
            upd = ignore_c > val
            val = jnp.where(upd, ignore_c, val)
            stp = jnp.where(upd, i32(IGNORE), stp)
            upd = S > val
            stp = jnp.where(upd, i32(STAY), stp)

            sval = jnp.where(rows == 0, _NB, jnp.zeros_like(M))
            sstp = jnp.zeros(M.shape, i32)
            upd = s4 > sval
            sval = jnp.where(upd, s4, sval)
            sstp = jnp.where(upd, i32(STAY), sstp)
            upd = s5 > sval
            sstp = jnp.where(upd, i32(EXTEND), sstp)

            stm_out[k] = jnp.where(live, stp, 0).astype(jnp.uint8)
            sts_out[k] = jnp.where(live, sstp, 0).astype(jnp.uint8)

        # per-column max + first argmax (strict-> semantics resolved outside)
        Mmask = jnp.where(live, M, _NB)
        cmax = jnp.max(Mmask, axis=1, keepdims=True)           # [E, 1]
        carg = jnp.min(jnp.where(Mmask >= cmax, rows, W), axis=1,
                       keepdims=True)                          # [E, 1]
        cmax_out[k] = cmax
        carg_out[k] = carg

        M_out[k] = M
        S_out[k] = S
        pM = M
        pO = e_out
        wm_v = mean_v
        ws_v = stdv_v
        wl_v = lsx_v

    prevM[:] = pM
    prevO[:] = pO
    win_m[:] = wm_v
    win_s[:] = ws_v
    win_l[:] = wl_v


def _pick_nc(C: int, nc) -> int:
    """Columns per grid step; must divide C (C is padded to a multiple of 64
    upstream).  Measured on v5e at production shape (width 300, E=60): NC=1
    3.55 B cells/s, NC=4 and NC=8 both 3.39 B — the kernel is compute-bound
    (the in-column max-plus scan dominates), so blocking only adds VMEM
    pressure (NC>=4 also needs vmem_limit_bytes above the 16 MB default).
    Default 1; PSQ_PALLAS_NC overrides for experiments."""
    import os

    if nc is None:
        nc = int(os.environ.get("PSQ_PALLAS_NC", "1"))
    nc = max(1, nc)
    while C % nc:
        nc //= 2
    return max(1, nc)


def make_pallas_fill(width: int, need_steps: bool = True,
                     interpret: bool = False, nc: int | None = None):
    """Drop-in replacement for dp.make_fill(width, jnp.float32, need_steps):
    returns fill(batch, states, i0, i1, win0, refills, is_pad, lik_offset,
    backward) -> FillResult, computed by one fused Pallas kernel processing
    NC columns per grid step."""
    W = 2 * width + 1

    def fill(batch: EventBatch, states, i0, i1, win0, refills, is_pad,
             lik_offset, backward: bool):
        E, T = batch.mean.shape
        C = states.shape[0]
        f32 = jnp.float32

        # --- normalize per-column inputs to [C, E] ---
        if states.ndim == 1:
            states_ce = jnp.broadcast_to(states[:, None], (C, E))
        else:
            states_ce = states
        if is_pad.ndim == 1:
            pad_ce = jnp.broadcast_to(is_pad[:, None], (C, E))
        else:
            pad_ce = is_pad
        live_col = ((states_ce >= 0) & (~pad_ce)
                    & batch.active[None, :]).astype(f32)

        # model lookups hoisted out of the kernel: one [C, E] gather per table
        stc_t = jnp.clip(states_ce, 0, 1023).astype(jnp.int32).T   # [E, C]
        g = lambda tbl: jnp.take_along_axis(
            tbl.astype(f32), stc_t, axis=1).T                       # [C, E]
        lm_g, ls_g, ll_g, sm_g, lam_g, llam_g = (
            g(batch.lev_mean), g(batch.lev_stdv), g(batch.log_lev),
            g(batch.sd_mean), g(batch.sd_lambda), g(batch.log_lambda))
        ll_g = ll_g - jnp.asarray(lik_offset, f32)  # fold +lik_offset into -ll

        # explicit per-column (prev, cur) band geometry in forward storage
        # order: [C, E, 1] arrays sharing ONE block map with every other
        # per-column input.  Per-column arrays carry a trailing singleton
        # axis so their (NC, E, 1) blocks satisfy Mosaic's trailing-dims rule
        # AND kernel reads are natively [E, 1] (no 1-D->2-D vector relayouts,
        # which Mosaic cannot lower).
        i0T = i0.astype(jnp.int32).T                                # [C+1, E]
        i1T = i1.astype(jnp.int32).T
        zrow = jnp.zeros((1, E), jnp.int32)
        nrow = batch.n0.astype(jnp.int32)[None, :]
        i0cur = i0T[1:][:, :, None]                                # [C, E, 1]
        i1cur = i1T[1:][:, :, None]
        if backward:
            # prev of output column j is column j+2's row; the virtual blank
            # column [0, n0] backs the last processed column
            i0prv = jnp.concatenate([i0T[2:], zrow], axis=0)[:, :, None]
            i1prv = jnp.concatenate([i1T[2:], nrow], axis=0)[:, :, None]
        else:
            i0prv = i0T[:-1][:, :, None]
            i1prv = i1T[:-1][:, :, None]

        w0m, w0s, w0l = (jnp.asarray(w, f32) for w in win0)
        rfm, rfs, rfl = (jnp.asarray(r, f32) for r in refills)
        lik4 = jnp.stack([batch.lik_skip, batch.lik_stay,
                          batch.lik_extend,
                          batch.lik_insert]).astype(f32)[:, :, None]

        NC = _pick_nc(C, nc)
        NB_G = C // NC
        if backward:
            col = lambda c: (NB_G - 1 - c, 0, 0)
        else:
            col = lambda c: (c, 0, 0)
        const2 = lambda c: (0, 0)
        const3 = lambda c: (0, 0, 0)

        vm = pltpu.VMEM
        cspec = pl.BlockSpec((NC, E, 1), col, memory_space=vm)
        rspec = pl.BlockSpec((NC, E, DMAX), col, memory_space=vm)
        wspec = pl.BlockSpec((NC, E, W), col, memory_space=vm)
        in_specs = [
            cspec,                                            # states (unused
            #   in kernel math beyond live; kept for clarity/debug)
            cspec,                                            # live
            cspec,                                            # i0 prev
            cspec,                                            # i1 prev
            cspec,                                            # i0 cur
            cspec,                                            # i1 cur
            cspec,                                            # lm
            cspec,                                            # ls
            cspec,                                            # ll
            cspec,                                            # sm
            cspec,                                            # lam
            cspec,                                            # llam
            rspec,                                            # refill mean
            rspec,                                            # refill stdv
            rspec,                                            # refill lsx
            pl.BlockSpec((E, W), const2, memory_space=vm),    # win0 mean
            pl.BlockSpec((E, W), const2, memory_space=vm),    # win0 stdv
            pl.BlockSpec((E, W), const2, memory_space=vm),    # win0 lsx
            pl.BlockSpec((4, E, 1), const3, memory_space=vm),  # lik4
        ]
        out_shapes = [
            jax.ShapeDtypeStruct((C, E, W), f32),             # M
            jax.ShapeDtypeStruct((C, E, W), f32),             # S
        ]
        out_specs = [wspec, wspec]
        if need_steps:
            out_shapes += [
                jax.ShapeDtypeStruct((C, E, W), jnp.uint8),
                jax.ShapeDtypeStruct((C, E, W), jnp.uint8),
            ]
            out_specs += [wspec, wspec]
        out_shapes += [
            jax.ShapeDtypeStruct((C, E, 1), f32),             # cmax
            jax.ShapeDtypeStruct((C, E, 1), jnp.int32),       # carg
        ]
        out_specs += [cspec, cspec]

        def c3(x):
            return x[:, :, None]        # [C, E] -> [C, E, 1]

        kern = functools.partial(_kernel, backward, need_steps, W, NC)
        outs = pl.pallas_call(
            kern,
            grid=(NB_G,),
            in_specs=in_specs,
            out_shape=out_shapes,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((E, W), f32) for _ in range(6)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                # the NC-unrolled body's live intermediates exceed the 16 MB
                # default scoped-vmem limit; v5e has 128 MB VMEM per core
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(c3(states_ce.astype(jnp.int32)), c3(live_col),
          i0prv, i1prv, i0cur, i1cur,
          c3(lm_g), c3(ls_g), c3(ll_g), c3(sm_g), c3(lam_g), c3(llam_g),
          rfm, rfs, rfl, w0m, w0s, w0l, lik4)

        if need_steps:
            M, S, steps_m, steps_s, cmax, carg = outs
        else:
            M, S, cmax, carg = outs
            steps_m = jnp.zeros((C, E, 0), jnp.uint8)
            steps_s = jnp.zeros((C, E, 0), jnp.uint8)
        cmax = cmax[:, :, 0]
        carg = carg[:, :, 0]

        # --- running best bookkeeping (strict >, processing order) ---
        if backward:
            pfx = jax.lax.cummax(cmax, axis=0, reverse=True)
        else:
            pfx = jax.lax.cummax(cmax, axis=0)
        best_pfx = jnp.maximum(pfx, 0.0)
        best = best_pfx[0] if backward else best_pfx[-1]
        hit = (cmax >= best[None, :]) & (best[None, :] > 0.0)
        if backward:
            c_star = (C - 1) - jnp.argmax(hit[::-1], axis=0)
        else:
            c_star = jnp.argmax(hit, axis=0)
        any_hit = jnp.any(hit, axis=0)
        ev = jnp.arange(E)
        carg_star = carg[c_star, ev]
        i0_star = i0.astype(jnp.int32)[ev, c_star + 1]
        best_i = jnp.where(any_hit, i0_star + carg_star, 0)
        best_j = jnp.where(any_hit, c_star + 1, 0).astype(jnp.int32)

        return FillResult(M, S, steps_m, steps_s, i0, i1, best, best_i,
                          best_j, best_pfx)

    return fill
