"""Batched banded pair-HMM dynamic programming in JAX (TPU-first).

Implements the reference recurrence (SURVEY.md Appendix A; spec
/root/reference/cpp/Alignment.cpp:111-444) as a column scan batched over
events.  The in-column dependency chain (stay lattice + U_INSERT main-lattice
move) is solved with an associative max-plus 2x2 matrix scan over the band:

    v[r] = A[r] (x) v[r-1]  (+)  u[r],     v = (M, S)
    A[r] = [[max(lik_insert, e+lik_stay), e+lik_extend],
            [e+lik_stay,                  e+lik_extend]]
    u[r] = (D[r], floor[r])

where D[r] collects the prev-column candidates (skip / match / ignore,
including the implicit-zero local restarts) and floor is 0 in-band except
-BIG at the top band row (the reference's curstay[i0] = -inf).

Quirks preserved from the reference (values, not bitwise in f32):
  * forward emission feeds the reversed log_stdv index into the inverse
    Gaussian (Alignment.cpp:171-172);
  * the backward pass uses the previous column's emission for UL_MATCH with
    an implicit restart of 0, and the previous *cell*'s emission for
    stay/extend (Alignment.cpp:388-406);
  * candidate evaluation order 0..3 with strict >, then stay override, for
    the backpointer bytes;
  * the `i > p0 && i <= p1` membership test for diagonal reads (which
    excludes i-1 == p1).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

LOG2PI = float(np.log(2.0 * np.pi))

# move codes (Alignment.cpp:19-28)
SKIP, MATCH, INSERT, IGNORE, STAY, EXTEND, IMPLICIT = 0, 1, 2, 3, 4, 5, 255


def neg_big(dtype):
    # finite -inf sentinel: the reference uses 1e300 (AlignUtil.h:20); for f32
    # we use -1e30 so sums of sentinels stay finite
    return jnp.asarray(-1e300 if dtype == jnp.float64 else -1e30, dtype)


class EventBatch(NamedTuple):
    """Padded per-event data, levels along axis 1 (length T_pad)."""

    mean: jax.Array        # [E, T]
    stdv: jax.Array        # [E, T]
    mean_rev: jax.Array    # [E, T]  mean[n0-1-t]
    stdv_rev: jax.Array    # [E, T]
    lsr: jax.Array         # [E, T]  log_stdv[n0-1-t]  (fed to BOTH directions)
    n0: jax.Array          # [E] int32 true level counts
    active: jax.Array      # [E] bool: has a seed alignment (stripe > 0)
    lev_mean: jax.Array    # [E, 1024]
    lev_stdv: jax.Array
    log_lev: jax.Array
    sd_mean: jax.Array
    sd_lambda: jax.Array
    log_lambda: jax.Array
    lik_skip: jax.Array    # [E]
    lik_stay: jax.Array
    lik_extend: jax.Array
    lik_insert: jax.Array


class FillResult(NamedTuple):
    M: jax.Array        # [C, E, W] main lattice (column-major stack)
    S: jax.Array        # [C, E, W] stay lattice
    steps_m: jax.Array  # [C, E, W] uint8
    steps_s: jax.Array  # [C, E, W] uint8
    i0: jax.Array       # [E, C+1] int32 band starts (col 0 = blank)
    i1: jax.Array       # [E, C+1]
    best: jax.Array     # [E] running max score
    best_i: jax.Array   # [E]
    best_j: jax.Array   # [E] (refind coordinates)
    best_pfx: jax.Array  # [C, E] per-column prefix max (the column's maxScore)


def emission(mean_v, stdv_v, lsr_v, lm, ls, ll, sm, lam, llam, lik_offset):
    """e = lognormpdf(mean; level) + logigpdf(stdv; sd) + lik_offset
    (Alignment.cpp:167-174 / AlignUtil.h:34-53)."""
    d1 = (mean_v - lm) / ls
    ln = -0.5 * (d1 * d1 + LOG2PI) - ll
    d2 = (stdv_v - sm) / sm
    lig = 0.5 * (llam - 3.0 * lsr_v - LOG2PI - d2 * d2 * lam / stdv_v)
    return ln + lig + lik_offset


def _mp_combine(lhs, rhs):
    """Max-plus combine for elements (a11,a12,a21,a22,u1,u2): rhs after lhs."""
    l11, l12, l21, l22, lu1, lu2 = lhs
    r11, r12, r21, r22, ru1, ru2 = rhs
    a11 = jnp.maximum(r11 + l11, r12 + l21)
    a12 = jnp.maximum(r11 + l12, r12 + l22)
    a21 = jnp.maximum(r21 + l11, r22 + l21)
    a22 = jnp.maximum(r21 + l12, r22 + l22)
    u1 = jnp.maximum(jnp.maximum(r11 + lu1, r12 + lu2), ru1)
    u2 = jnp.maximum(jnp.maximum(r21 + lu1, r22 + lu2), ru2)
    return (a11, a12, a21, a22, u1, u2)


def column_solve(D, a_stay, a_ext, lik_insert, floor0, dtype):
    """Solve one band column's (M, S) given prev-column candidates D and the
    within-column move weights.  All args [..., W] with W the band axis (last).

    a_stay = e + lik_stay, a_ext = e + lik_extend (already per-row), floor0 is
    the S floor (0 in rows >0; -BIG at row 0).
    Returns (M, S)."""
    NB = neg_big(dtype)
    a11 = jnp.maximum(lik_insert, a_stay)
    a12 = a_ext
    a21 = a_stay
    a22 = a_ext
    # row 0 has no intra-column predecessors
    z = jnp.zeros_like(a11)
    first = jnp.arange(a11.shape[-1]) == 0
    a11 = jnp.where(first, NB, a11)
    a12 = jnp.where(first, NB, a12)
    a21 = jnp.where(first, NB, a21)
    a22 = jnp.where(first, NB, a22)
    elems = (a11, a12, a21, a22, D, floor0)
    res = jax.lax.associative_scan(_mp_combine, elems, axis=-1)
    M = res[4]
    S = res[5]
    return M, S


def make_fill(width: int, dtype=jnp.float32, need_steps: bool = True):
    """Build the jittable banded fill for a given half-width (static).

    need_steps=False skips backpointer computation/storage — used for the
    backward fill, whose steps are never read (the backtrace walks the
    forward matrix only, Alignment.cpp:516-624)."""
    W = 2 * width + 1

    def fill(batch: EventBatch, states, i0, i1, lik_offset, backward: bool):
        """states [C] int32 (padded with -1), i0/i1 [E, C+1] (col 0 = blank
        row covering [0, n0]).  Returns FillResult."""
        E, T = batch.mean.shape
        C = states.shape[0]
        NB = neg_big(dtype)

        mean_src = batch.mean_rev if backward else batch.mean
        stdv_src = batch.stdv_rev if backward else batch.stdv

        rows = jnp.arange(W, dtype=jnp.int32)  # [W]

        def body(carry, xs):
            prevM, prevS, prev_obs, p0, p1, best, best_i, best_j = carry
            st, i0c, i1c, refind = xs  # scalars except i0c,i1c [E]

            i = i0c[:, None] + rows[None, :]          # [E, W] absolute i
            in_band = i <= i1c[:, None]

            # ---- emission (zero outside band / invalid state) ----
            idx = jnp.clip(i - 1, 0, T - 1)
            mean_v = jnp.take_along_axis(mean_src, idx, axis=1)
            stdv_v = jnp.take_along_axis(stdv_src, idx, axis=1)
            lsr_v = jnp.take_along_axis(batch.lsr, idx, axis=1)
            stc = jnp.clip(st, 0, 1023)
            lm = batch.lev_mean[:, stc][:, None]
            ls = batch.lev_stdv[:, stc][:, None]
            ll = batch.log_lev[:, stc][:, None]
            sm = batch.sd_mean[:, stc][:, None]
            lam = batch.sd_lambda[:, stc][:, None]
            llam = batch.log_lambda[:, stc][:, None]
            e = emission(mean_v, stdv_v, lsr_v, lm, ls, ll, sm, lam, llam,
                         lik_offset).astype(dtype)
            e = jnp.where(in_band, e, 0.0)
            # a column is dead if its state is invalid (refstate < 0 blanks the
            # whole column, Alignment.cpp:162-163) or the event has no seed
            # alignment (stripe 0 -> nothing is ever filled)
            live = in_band & (st >= 0) & batch.active[:, None]

            # ---- previous-column reads ----
            d = i - p0[:, None]
            pm_i = jnp.take_along_axis(prevM, jnp.clip(d, 0, W - 1), axis=1)
            pm_im1 = jnp.take_along_axis(prevM, jnp.clip(d - 1, 0, W - 1), axis=1)
            pobs_im1 = jnp.take_along_axis(prev_obs, jnp.clip(d - 1, 0, W - 1), axis=1)
            valid_i = (i >= p0[:, None]) & (i <= p1[:, None])
            # C++ `i > p0 && i <= p1` for the diagonal reads
            valid_ul = (i > p0[:, None]) & (i <= p1[:, None])

            lik_skip = batch.lik_skip[:, None]
            lik_stay = batch.lik_stay[:, None]
            lik_extend = batch.lik_extend[:, None]
            lik_insert = batch.lik_insert[:, None]

            skip_c = jnp.where(valid_i, pm_i, 0.0) + lik_skip
            if backward:
                match_c = jnp.where(valid_ul, pm_im1 + pobs_im1, 0.0)
            else:
                match_c = jnp.where(valid_ul, pm_im1, 0.0) + e
            ignore_c = jnp.where(valid_ul, pm_im1 + lik_insert, 0.0)
            D = jnp.maximum(jnp.maximum(0.0, skip_c),
                            jnp.maximum(match_c, ignore_c)).astype(dtype)

            # within-column move weights: the backward pass uses the previous
            # *cell*'s emission (ob[i-1]) for stay/extend
            if backward:
                e_stay = jnp.concatenate([jnp.zeros((E, 1), dtype), e[:, :-1]], axis=1)
            else:
                e_stay = e
            a_stay = (e_stay + lik_stay).astype(dtype)
            a_ext = (e_stay + lik_extend).astype(dtype)
            floor0 = jnp.where(rows[None, :] == 0, NB,
                               jnp.zeros_like(D)).astype(dtype)

            M, S = column_solve(D, a_stay, a_ext, lik_insert, floor0, dtype)

            # blank out-of-band and invalid-state columns
            M = jnp.where(live, M, 0.0)
            S = jnp.where(live, S, 0.0)
            e_out = jnp.where(live, e, 0.0)

            if need_steps:
                # ---- backpointer bytes (candidate walk, strict >) ----
                Mm1 = jnp.concatenate([jnp.zeros((E, 1), dtype), M[:, :-1]], axis=1)
                Sm1 = jnp.concatenate([jnp.zeros((E, 1), dtype), S[:, :-1]], axis=1)
                nfirst = rows[None, :] > 0
                ins_c = jnp.where(nfirst, Mm1 + lik_insert, 0.0)
                s4 = jnp.where(nfirst, Mm1 + e_stay + lik_stay, NB)
                s5 = jnp.where(nfirst, Sm1 + e_stay + lik_extend, NB)

                val = jnp.zeros_like(M)
                stp = jnp.zeros_like(M, dtype=jnp.uint8)
                # k=0 skip
                bp0 = jnp.where(valid_i, jnp.uint8(SKIP), jnp.uint8(IMPLICIT))
                upd = skip_c > val
                val = jnp.where(upd, skip_c, val)
                stp = jnp.where(upd, bp0, stp)
                # k=1 match
                bp1 = jnp.where(valid_ul, jnp.uint8(MATCH), jnp.uint8(IMPLICIT))
                upd = match_c > val
                val = jnp.where(upd, match_c, val)
                stp = jnp.where(upd, bp1, stp)
                # k=2 insert (current column)
                upd = ins_c > val
                val = jnp.where(upd, ins_c, val)
                stp = jnp.where(upd, jnp.uint8(INSERT), stp)
                # k=3 ignore
                upd = ignore_c > val
                val = jnp.where(upd, ignore_c, val)
                stp = jnp.where(upd, jnp.uint8(IGNORE), stp)
                # stay override
                upd = S > val
                stp = jnp.where(upd, jnp.uint8(STAY), stp)

                # stay-lattice steps
                sfloor = jnp.where(rows[None, :] == 0, NB, 0.0).astype(dtype)
                sval = sfloor
                sstp = jnp.zeros_like(stp)
                upd = s4 > sval
                sval = jnp.where(upd, s4, sval)
                sstp = jnp.where(upd, jnp.uint8(STAY), sstp)
                upd = s5 > sval
                sstp = jnp.where(upd, jnp.uint8(EXTEND), sstp)

                stp = jnp.where(live, stp, 0)
                sstp = jnp.where(live, sstp, 0)
            else:
                stp = jnp.zeros((E, 0), jnp.uint8)
                sstp = jnp.zeros((E, 0), jnp.uint8)

            # ---- running best (strict >, first max within column) ----
            Mmask = jnp.where(live, M, NB)
            cmax = jnp.max(Mmask, axis=1)
            carg = jnp.argmax(Mmask, axis=1).astype(jnp.int32)
            better = cmax > best
            best_n = jnp.where(better, cmax, best)
            best_i_n = jnp.where(better, i0c + carg, best_i)
            best_j_n = jnp.where(better, refind, best_j)

            new_carry = (M, S, e_out, i0c, i1c, best_n, best_i_n, best_j_n)
            return new_carry, (M, S, stp, sstp, best_n)

        init = (
            jnp.zeros((E, W), dtype),
            jnp.zeros((E, W), dtype),
            jnp.zeros((E, W), dtype),
            jnp.zeros((E,), jnp.int32),
            batch.n0.astype(jnp.int32),
            jnp.zeros((E,), dtype),
            jnp.zeros((E,), jnp.int32),
            jnp.zeros((E,), jnp.int32),
        )
        refinds = jnp.arange(1, C + 1, dtype=jnp.int32)
        xs = (states, i0[:, 1:].T, i1[:, 1:].T, refinds)
        carry, (M, S, steps_m, steps_s, best_pfx) = jax.lax.scan(body, init, xs)
        _, _, _, _, _, best, best_i, best_j = carry
        return FillResult(M, S, steps_m, steps_s, i0, i1, best, best_i, best_j,
                          best_pfx)

    return fill
