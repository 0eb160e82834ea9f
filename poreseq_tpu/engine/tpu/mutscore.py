"""Batched mutation delta-scoring on device (gather-free, group-major).

Implements the reference's splice-and-refill trick (Alignment.cpp:447-512):
per (event, mutation), restart the forward DP from the column before the
mutation against the mutated states at scoring width, then join the refilled
column with the precomputed *backward* matrix (columnMax, Alignment.h:181-214)
and difference against the pre-mutation join.

TPU-first design (general gathers are ~25x slower than vector ops here):
  * mutations are grouped by start position (Refine has exactly <=9 point
    mutations per base, FindMutations.cpp:191-234): every group shares the
    copied column, the refill band geometry, the per-column data windows and
    the old-score join columns, so all fetches are scalar-indexed dynamic
    slices;
  * refill band anchors are the forward fill's rate-limited geometry shifted
    by RS = realign_width - scoring_width, so per-event shifts are selects
    over <= DMAX static rolls;
  * the backward matrix is stored in forward coordinates with forward anchors
    (see dp.py), so the old-score fwd x back join is exactly lag-0
    (elementwise) and the new-score join needs a +-DMAX*net-indel shift set.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ...core.sequence import apply_mutation, seq_to_states
from ..types import AlignData, make_mutscores
from .align import FUSED
from .dp import (DMAX, emission, column_solve, neg_big, shift_select,
                 shift_select2)
from .pack import (event_ref_indexes, fill_geometry, limited_geometry,
                   place_full, round_up)


def _band_mask(anchor, n0, width):
    """valid absolute-row mask [..., width] for columns at `anchor`."""
    r = jnp.arange(width, dtype=jnp.int32)
    i = anchor[..., None] + r
    return (i >= 1) & (i <= n0[..., None])


def _join_lag0(FM, FS, fbest, BM, BS, bbest, okF):
    """columnMax of two columns sharing an anchor (lag 0)."""
    cross = jnp.maximum(FM + BM, FS + BS)
    sm = jnp.max(jnp.where(okF, cross, 0.0), axis=-1)
    sm = jnp.maximum(sm, 0.0)
    sm = jnp.maximum(sm, fbest)
    sm = jnp.maximum(sm, bbest)
    return sm


def _join_shift(FM, FS, fa, fbest, BM, BS, ba, bbest, n0, smin, smax, dtype):
    """columnMax of fwd column (anchor fa) vs back column (anchor ba) with
    lag s = fa - ba expected within [smin, smax] (else the cross term degrades
    to single-sided maxima).  F is zero-padded up to B's width if narrower."""
    W = BM.shape[-1]
    if FM.shape[-1] < W:
        padn = W - FM.shape[-1]
        pad = jnp.zeros(FM.shape[:-1] + (padn,), FM.dtype)
        FM = jnp.concatenate([FM, pad], axis=-1)
        FS = jnp.concatenate([FS, pad], axis=-1)
    s = fa - ba
    okF = _band_mask(fa, n0, W)
    okB = _band_mask(ba, n0, W)
    BMs = shift_select2(BM, s, smin, smax, W)
    BSs = shift_select2(BS, s, smin, smax, W)
    crossA = jnp.maximum(FM + BMs, FS + BSs)
    sA = jnp.max(jnp.where(okF, jnp.maximum(crossA, jnp.maximum(FM, FS)), 0.0),
                 axis=-1)
    sB = jnp.max(jnp.where(okB, jnp.maximum(BM, BS), 0.0), axis=-1)
    sm = jnp.maximum(jnp.maximum(sA, sB), 0.0)
    sm = jnp.maximum(sm, fbest)
    sm = jnp.maximum(sm, bbest)
    return sm


_KERNELS = {}


def _pallas_mode(dtype, mesh, G):
    """Fused Pallas group scorer gating.  Default ('auto'): serve a call with
    the fused kernel only when its group count G is large enough to amortize
    the kernel's O(C1*E*W) XLA prologue (windows, per-column joins, model
    values) — the big Refine-scale calls, where the fused kernel beats the
    XLA group kernel (1.95 s vs 2.30 s per 8-region 64k-mutation call, 0
    accept-sign flips); small late-Refine / deferred-conflict calls pay ~1 s
    of prologue where the XLA kernel pays ~0.2 s, so they stay on the XLA
    kernel.  PSQ_PALLAS_MUTSCORE: '0' = never, '1' = force for every
    supported shape, 'interp' = interpreter mode (CPU tests);
    PSQ_PALLAS_G_MIN overrides the auto threshold (default 2048 groups,
    measured break-even on the bench chip)."""
    env = os.environ.get("PSQ_PALLAS_MUTSCORE", "")
    if env == "0" or mesh is not None:
        return None
    # the fused kernel computes in f32 only; f64 (the parity/oracle path)
    # must never silently degrade to f32 scores
    if dtype is not jnp.float32:
        return None
    if env == "interp":
        return "interp"
    if env == "1":
        return "force"
    # auto mode (fused for big-G calls) is opt-in via PSQ_PALLAS_G_MIN:
    # round 5's interleaved A/B measured the shared-window XLA kernel FASTER
    # than the fused kernel at Refine scale (59.9 s vs 65.4 s median per
    # batch-8 run — PERF.md round 5), so the XLA group kernel is the
    # default; the remaining fused-prologue overhead (mv6 model-value
    # gather, colmeta joins) is the flip's outstanding cost
    g_min = os.environ.get("PSQ_PALLAS_G_MIN", "")
    if g_min and jax.default_backend() == "tpu" and G >= int(g_min):
        return "auto"
    return None


def _estimate_groups(muts_list, participate):
    """Group count the call will produce (_build_groups semantics: one group
    per <=9 mutations sharing a start, per region) — cheap, computed before
    the batch layout so the fused-kernel decision can gate on it."""
    G = 0
    for r, muts in enumerate(muts_list):
        if not participate[r] or not muts:
            continue
        starts = np.fromiter((m.start for m in muts), np.int64, len(muts))
        _, counts = np.unique(starts, return_counts=True)
        G += int(np.sum((counts + 8) // 9))
    return G


def _resolve_gb(Ws: int, K: int) -> int:
    """Groups per scan step: PSQ_GB override, else shape-based default (wide
    Mutate shapes spill VMEM at GB=32).  Resolved once here so the kernel
    cache key always matches the blocking the body actually compiled with."""
    gb_env = os.environ.get("PSQ_GB", "")
    return int(gb_env) if gb_env else (32 if Ws * K <= 512 else 8)


def _group_kernel(W, Ws, RS, K, P, DM, dtype, E_g=None):
    """Jitted start-group kernel (see _group_kernel_body)."""
    key = (W, Ws, RS, K, P, DM, str(dtype), E_g, _resolve_gb(Ws, K))
    if key not in _KERNELS:
        _KERNELS[key] = jax.jit(
            _group_kernel_body(W, Ws, RS, K, P, DM, dtype, E_g))
    return _KERNELS[key]


def build_windows(mean, stdv, lsr, i0r, Ws, dtype):
    """Scoring-band data windows [Q1, E, Ws] from per-event levels [E, T]
    and band anchors i0r [E, Q1].  O(C1*E*Ws) gathers (~1 s at Ws=201 on
    the bench chip) — built ONCE per scoring call and shared by every
    (K, D) kernel class (they used to be rebuilt inside every launch)."""
    Tlev = mean.shape[1]
    widx = i0r[:, :, None].astype(jnp.int32) - 1 + jnp.arange(
        Ws, dtype=jnp.int32)[None, None, :]                   # [E, Q1, Ws]
    wok = (widx >= 0) & (widx < Tlev)
    widxc = jnp.clip(widx, 0, Tlev - 1).reshape(i0r.shape[0], -1)

    def _bw(src, pv):
        v = jnp.take_along_axis(src, widxc, axis=1).reshape(
            i0r.shape[0], -1, Ws)
        v = jnp.where(wok, v, pv)
        return jnp.moveaxis(v, 0, 1).astype(dtype)            # [Q1, E, Ws]

    return _bw(mean, 0.0), _bw(stdv, 1.0), _bw(lsr, 0.0)


def _geom_body(ral, n0, S_e, width: int, C: int):
    """Post-backtrace scoring-band geometry ON DEVICE: update_refs
    (cpp/EventData.h:110-169) + band placement + rate limit, vectorized over
    events — so the group kernels can be dispatched WITHOUT the host reading
    `ral` first (the mid-call D2H sync was ~0.3 s x 15 calls per batch-8 run).

    Bit-matches pack.limited_geometry(event_ref_indexes(...)) up to f32-vs-f64
    interpolation at exact band-boundary crossings (f32 TPU path only; the
    f64 oracle-parity path keeps the host geometry)."""
    E, T = ral.shape
    idx = jnp.arange(T, dtype=jnp.int32)
    validp = idx[None, :] < n0[:, None]
    anch = (ral > 0) & validp
    has = jnp.any(anch, axis=1)
    ar = jnp.arange(E)
    ra0 = jnp.argmax(anch, axis=1).astype(jnp.int32)
    ra1 = (T - 1 - jnp.argmax(anch[:, ::-1], axis=1)).astype(jnp.int32)
    f0 = ral[ar, ra0]
    f1 = ral[ar, ra1]
    al_m = (f1 - f0) / (ra1 - ra0).astype(ral.dtype)       # nan when ra1==ra0
    al_b = f0 - al_m * ra0

    # interior interpolation between consecutive anchors; the reference's
    # `if (lastal > 0)` quirk keeps the raw value when the left anchor is
    # at level 0 (core/events.py update_refs)
    left = jax.lax.cummax(jnp.where(anch, idx[None], -1), axis=1)
    right = jax.lax.cummin(jnp.where(anch, idx[None], T), axis=1, reverse=True)
    lv = jnp.take_along_axis(ral, jnp.clip(left, 0, T - 1), axis=1)
    rv = jnp.take_along_axis(ral, jnp.clip(right, 0, T - 1), axis=1)
    m = (rv - lv) / (right - left).astype(ral.dtype)
    interp = m * (idx[None] - left).astype(ral.dtype) + lv
    flank = (idx[None, :] < ra0[:, None]) | (idx[None, :] > ra1[:, None])
    ri = jnp.where(flank,
                   al_m[:, None] * idx[None].astype(ral.dtype) + al_b[:, None],
                   ral)
    ri = jnp.where((~flank) & (~anch) & (left > 0), interp, ri)
    # levels past n0 (and whole inactive events) sort above every refind so
    # the lower bound never lands there — matching the host's length-n0 arrays
    ri = jnp.where(validp & has[:, None], ri, jnp.asarray(jnp.inf, ral.dtype))

    refinds = jnp.arange(1, C + 1, dtype=ral.dtype)
    imid = jax.vmap(lambda r: jnp.searchsorted(r, refinds, side="left"))(ri)
    imid = jnp.clip(imid.astype(jnp.int32), 1, jnp.maximum(n0, 1)[:, None])
    lo = jnp.maximum(imid - width, 1)
    hi = jnp.minimum(imid + width, n0[:, None]).astype(jnp.int32)

    # rate limit (starts advance <= DMAX/col): i0'[j] = min_k<=j i0[k]+(j-k)D
    j = jnp.arange(1, C + 1, dtype=jnp.int32)[None, :]
    lo_lim = j * DMAX + jax.lax.cummin(lo.astype(jnp.int32) - j * DMAX,
                                       axis=1)

    i0 = jnp.concatenate([jnp.zeros((E, 1), jnp.int32), lo_lim], axis=1)
    i1 = jnp.concatenate([n0[:, None].astype(jnp.int32), hi], axis=1)
    # the W-rectangle clamp applies to EVERY column incl. the blank col 0
    # (limited_geometry clamps before padding)
    i1 = jnp.minimum(i1, i0 + 2 * width)
    cols = jnp.arange(C + 1, dtype=jnp.int32)[None, :]
    anchor = jnp.take_along_axis(i0, jnp.minimum(S_e, C)[:, None], axis=1)
    beyond = cols > S_e[:, None]
    i0 = jnp.where(beyond, anchor, i0)
    i1 = jnp.where(beyond, 0, i1)
    return i0, i1


def _geom_fn(width: int, C: int):
    key = ("geom", width, C)
    if key not in _KERNELS:
        _KERNELS[key] = jax.jit(
            lambda ral, n0, S_e: _geom_body(ral, n0, S_e, width, C))
    return _KERNELS[key]


def _windows_fn(Ws, dtype):
    """Jitted build_windows, cached per (Ws, dtype)."""
    key = ("win", Ws, str(dtype))
    if key not in _KERNELS:
        _KERNELS[key] = jax.jit(
            lambda mean, stdv, lsr, i0r: build_windows(
                mean, stdv, lsr, i0r, Ws, dtype))
    return _KERNELS[key]


def _group_kernel_sharded(mesh, W, Ws, RS, K, P, DM, dtype):
    """Group kernel under shard_map: events sharded on 'ev', groups on 'mut';
    per-shard partial deltas (sums over local events) are psum'd over 'ev'
    into mut-sharded totals — the multi-chip reduction of the reference's
    event-major score accumulation (cpp/MakeMutations.cpp:23-69)."""
    key = ("sharded", mesh, W, Ws, RS, K, P, DM, str(dtype),
           _resolve_gb(Ws, K))
    if key not in _KERNELS:
        from ...parallel.mesh import shard_map
        from jax.sharding import PartitionSpec as PS
        from .dp import EventBatch

        body = _group_kernel_body(W, Ws, RS, K, P, DM, dtype)

        def local(*args):
            return jax.lax.psum(body(*args), "ev")

        ev = PS("ev")
        col_ev = PS(None, "ev")
        mut = PS("mut")
        bspec = EventBatch(*([ev] * len(EventBatch._fields)))
        f = shard_map(
            local, mesh,
            in_specs=(
                bspec,                     # batch: every array per-event
                col_ev, col_ev, col_ev, col_ev,   # Mf Sf Mb Sb [C+1, E, W]
                ev, ev, ev, ev,            # i0f i1f i0r i1r [E, C+1]
                col_ev, col_ev, col_ev,    # win_mean/stdv/lsr [Q1, E, Ws]
                col_ev, col_ev,            # bpf bpb [C+1, E]
                ev,                        # ev_region
                mut, mut, mut, mut,        # g_start g_startind g_S g_region
                mut,                       # g_evoff (unused when E_g=None)
                mut, mut, mut, mut,        # s_mlen s_nst s_win s_valid
                PS(),                      # lik_offset
            ),
            out_specs=mut,
        )
        _KERNELS[key] = jax.jit(f)
    return _KERNELS[key]


def _group_kernel_body(W, Ws, RS, K, P, DM, dtype, E_g=None):
    """Kernel scanning over start-groups.  Static: rectangle widths W/Ws,
    anchor offset RS = realign-scoring >= 0, refill steps K, slots P, net
    indel bound DM (join shift sets are RS +- DMAX*DM wide).

    E_g: optional static event-slice width.  In multi-region batches a group
    only touches its own region's events — slicing the region's contiguous
    rows (start g_evoff, clamped; the region mask still applies) shrinks
    every per-group array from the full batch E to E_g, an ~R-fold cut in
    the kernel's HBM traffic.  None = no slicing (the shard_map path, where
    rows are mesh-local)."""

    SH_STEP = tuple(range(0, DMAX + 1))
    SH_STEP_M1 = tuple(range(-1, DMAX))
    span = DMAX * DM + 64      # + slack for differing rate-limit lags/clamps
    JMIN, JMAX = -span, RS + span            # refill-vs-back join lag range
    CMIN, CMAX = -span, span                 # copied-col-vs-back join range
    FSMIN, FSMAX = -64, RS + 64 + DMAX       # wide-copy seam offset range

    def kernel(batch, Mf, Sf, Mb, Sb, i0f, i1f, i0r, i1r,
               win_mean, win_stdv, win_lsr, bpf, bpb,
               ev_region, g_start, g_startind, g_S, g_region, g_evoff,
               s_mlen, s_nst, s_win, s_valid, lik_offset):
        """Mf/Sf/Mb/Sb [C+1, E, W] blank-extended, indexed by forward column;
        i0f/i1f [E, C+1] realign geometry; i0r/i1r [E, C+1] scoring-band
        geometry (post-backtrace, also the window anchors);
        win_mean/win_stdv/win_lsr [Q1, E, Ws] scoring-band data windows
        (built once per CALL by _windows_fn and shared across the (K, D)
        kernel classes); bpf/bpb [C+1, E];
        ev_region [E] int32 region id per event; g_* [G] (g_S = the group's
        region sequence length-in-states, g_region its region id — events of
        other regions are masked out of the group's delta sum; g_evoff its
        first event row); s_* [G, P(, K)].  Returns [G, P]."""
        C1, E, _ = Mf.shape
        Q1 = win_mean.shape[0]
        NB = neg_big(dtype)
        rows = jnp.arange(Ws, dtype=jnp.int32)

        # model tables stacked once for the per-group state gather
        mt = jnp.stack([batch.lev_mean, batch.lev_stdv, batch.log_lev,
                        batch.sd_mean, batch.sd_lambda, batch.log_lambda])

        def group(xs):
            (start, startind, sS, greg, evoff, mlen, nst, winst,
             valid) = xs
            st0 = jnp.clip(startind, 0, C1 - 1)

            if E_g is not None and E_g < E:
                def sl(a, axis=0):
                    return jax.lax.dynamic_slice_in_dim(a, evoff, E_g, axis)
            else:
                def sl(a, axis=0):
                    return a

            n0 = sl(batch.n0)
            active_g = sl(batch.active)
            evr_g = sl(ev_region)
            lik_sk = sl(batch.lik_skip)[None, :, None]
            lik_st = sl(batch.lik_stay)[None, :, None]
            lik_ex = sl(batch.lik_extend)[None, :, None]
            lik_in = sl(batch.lik_insert)[None, :, None]
            mt_g = sl(mt, 1)

            Mw = sl(jax.lax.dynamic_index_in_dim(Mf, st0, 0, False))  # [Eg,W]
            Sw = sl(jax.lax.dynamic_index_in_dim(Sf, st0, 0, False))
            wi0 = sl(jax.lax.dynamic_index_in_dim(i0f, st0, 1, False))  # [Eg]
            wi1 = sl(jax.lax.dynamic_index_in_dim(i1f, st0, 1, False))
            wbest = sl(jax.lax.dynamic_index_in_dim(bpf, st0, 0, False))

            nfill = jnp.clip(jnp.minimum(startind + mlen + 6, nst) - startind,
                             0, K)                                   # [P]
            Lf = startind + nfill
            refind_used = jnp.minimum(start + mlen + 1,
                                      jnp.maximum(Lf, startind))     # [P]
            k_star = refind_used - startind - 1  # -1 -> join the copied col

            # hoisted per-slot-state model values: [6, P, K, Eg]
            stc = jnp.clip(winst, 0, 1023)
            mv = jnp.moveaxis(mt_g[:, :, stc], 1, 3)

            def step(scarry, k):
                Mc, Sc, ci0, selM, selS, sa, sbest, cbest = scarry
                first = k == 0
                q = jnp.clip(st0 + 1 + k, 0, C1 - 1)
                qw = jnp.clip(st0 + 1 + k, 0, Q1 - 1)
                refind = startind + 1 + k

                i0c = sl(jax.lax.dynamic_index_in_dim(i0r, q, 1, False))
                i1c = sl(jax.lax.dynamic_index_in_dim(i1r, q, 1, False))
                mwv = sl(jax.lax.dynamic_index_in_dim(win_mean, qw, 0, False))
                swv = sl(jax.lax.dynamic_index_in_dim(win_stdv, qw, 0, False))
                lwv = sl(jax.lax.dynamic_index_in_dim(win_lsr, qw, 0, False))

                i = i0c[:, None] + rows[None, :]                   # [E, Ws]
                in_band = i <= i1c[:, None]

                lm, ls, ll, smn, lam, llam = (
                    mv[t, :, k, :][:, :, None] for t in range(6))  # [P, E, 1]
                e_obs = emission(mwv[None], swv[None], lwv[None], lm, ls, ll,
                                 smn, lam, llam, lik_offset).astype(dtype)
                st_k = winst[:, k]                                 # [P]
                live = in_band[None] & (st_k >= 0)[:, None, None]
                e_obs = jnp.where(live, e_obs, 0.0)

                # prev-column values: wide copy (first step; two-stage
                # variable slice over the seam offset) or narrow carry (rolls)
                o = i0c - wi0                                      # [E]
                pmWx = shift_select2(Mw, o - 1, FSMIN - 1, FSMAX, Ws + 1)
                pmWm1 = pmWx[:, :Ws]
                pmW = pmWx[:, 1:]
                d = jnp.broadcast_to((i0c - ci0)[None, :],
                                     (P, i0c.shape[0]))
                pmN = shift_select(Mc, d, SH_STEP)
                pmNm1 = shift_select(Mc, d - 1, SH_STEP_M1)

                pm_i = jnp.where(first, pmW[None], pmN)            # [P, E, Ws]
                pm_im1 = jnp.where(first, pmWm1[None], pmNm1)
                p0 = jnp.where(first, wi0, ci0)[None, :, None]
                p1 = jnp.where(first, wi1, ci0 + (Ws - 1))[None, :, None]

                ii = i[None]
                valid_i = (ii >= p0) & (ii <= p1)
                valid_ul = (ii > p0) & (ii <= p1)
                skip_c = jnp.where(valid_i, pm_i, 0.0) + lik_sk
                match_c = jnp.where(valid_ul, pm_im1, 0.0) + e_obs
                ignore_c = jnp.where(valid_ul, pm_im1 + lik_in, 0.0)
                D = jnp.maximum(jnp.maximum(0.0, skip_c),
                                jnp.maximum(match_c, ignore_c)).astype(dtype)
                a_stay = (e_obs + lik_st).astype(dtype)
                a_ext = (e_obs + lik_ex).astype(dtype)
                cut = (rows == 0)[None, None, :]
                floor0 = jnp.where(cut, NB, jnp.zeros_like(D)).astype(dtype)
                Mn, Sn = column_solve(D, a_stay, a_ext, lik_in, floor0, cut,
                                      dtype)
                Mn = jnp.where(live, Mn, 0.0)
                Sn = jnp.where(live, Sn, 0.0)
                cmax = jnp.max(jnp.where(live, Mn, NB), axis=-1)   # [P, E]
                bestn = jnp.maximum(cmax, cbest)

                act = ((k < mlen + 6) & (refind <= nst)
                       & (k < nfill))[:, None, None]               # [P,1,1]
                Mc2 = jnp.where(act, Mn, Mc)
                Sc2 = jnp.where(act, Sn, Sc)
                ci02 = jnp.where(jnp.any(act), i0c, ci0)
                cbest2 = jnp.where(act[..., 0], bestn, cbest)
                hit = act & (k == k_star)[:, None, None]
                selM2 = jnp.where(hit, Mn, selM)
                selS2 = jnp.where(hit, Sn, selS)
                sa2 = jnp.where(hit[..., 0], i0c[None], sa)
                sbest2 = jnp.where(hit[..., 0], bestn, sbest)
                return (Mc2, Sc2, ci02, selM2, selS2, sa2, sbest2,
                        cbest2), None

            E_eff = Mw.shape[0]
            zsP = jnp.zeros((P, E_eff, Ws), dtype)
            init = (zsP, zsP, wi0 + RS, zsP, zsP,
                    jnp.broadcast_to(wi0 + RS, (P, E_eff)),
                    jnp.broadcast_to(wbest, (P, E_eff)),
                    jnp.broadcast_to(wbest, (P, E_eff)))
            (Mc, Sc, ci0, selM, selS, sa, sbest, cbest), _ = jax.lax.scan(
                step, init, jnp.arange(K, dtype=jnp.int32))

            # ---- new-score join: selected refill column (or the copied
            # column) vs the back column at rab = nst - refind_used + 1 ----
            rab_new = jnp.clip(nst - refind_used + 1, 0, sS)       # [P]
            q_b = jnp.clip(sS - rab_new + 1, 0, C1 - 1)
            BM = jnp.stack(
                [sl(jax.lax.dynamic_index_in_dim(Mb, q_b[t], 0, False))
                 for t in range(P)])                               # [P, Eg, W]
            BS = jnp.stack(
                [sl(jax.lax.dynamic_index_in_dim(Sb, q_b[t], 0, False))
                 for t in range(P)])
            ba = jnp.stack(
                [sl(jax.lax.dynamic_index_in_dim(i0f, q_b[t], 1, False))
                 for t in range(P)])                               # [P, Eg]
            bbest = jnp.stack(
                [sl(jax.lax.dynamic_index_in_dim(bpb, q_b[t], 0, False))
                 for t in range(P)])                               # [P, Eg]

            new_n = _join_shift(selM, selS, sa, sbest, BM, BS, ba, bbest,
                                n0[None], JMIN, JMAX, dtype)       # [P, Eg]
            new_w = _join_shift(
                jnp.broadcast_to(Mw, (P, E_eff, Mw.shape[-1])),
                jnp.broadcast_to(Sw, (P, E_eff, Sw.shape[-1])),
                jnp.broadcast_to(wi0, (P, E_eff)),
                jnp.broadcast_to(wbest, (P, E_eff)),
                BM, BS, ba, bbest, n0[None], CMIN, CMAX,
                dtype)
            new = jnp.where((k_star >= 0)[:, None], new_n, new_w)

            # ---- old score: fwd and back columns at the SAME forward column
            # max(start-3, 1) -> exact lag-0 elementwise join ----
            q_old = jnp.clip(jnp.maximum(start - 3, 1), 0, sS)
            FMo = sl(jax.lax.dynamic_index_in_dim(Mf, q_old, 0, False))
            FSo = sl(jax.lax.dynamic_index_in_dim(Sf, q_old, 0, False))
            BMo = sl(jax.lax.dynamic_index_in_dim(Mb, q_old, 0, False))
            BSo = sl(jax.lax.dynamic_index_in_dim(Sb, q_old, 0, False))
            fao = sl(jax.lax.dynamic_index_in_dim(i0f, q_old, 1, False))
            fbo = sl(jax.lax.dynamic_index_in_dim(bpf, q_old, 0, False))
            bbo = sl(jax.lax.dynamic_index_in_dim(bpb, q_old, 0, False))
            okF = _band_mask(fao, n0, FMo.shape[-1])
            old = _join_lag0(FMo, FSo, fbo, BMo, BSo, bbo, okF)    # [Eg]

            delta = new - old[None]                                # [P, Eg]
            ok = (valid[:, None] & active_g[None, :]
                  & (evr_g == greg)[None, :])
            delta = jnp.where(ok, delta, 0.0)
            return jnp.sum(delta, axis=1)

        # GB independent groups per scan step (vmapped): amortizes the
        # per-step fixed costs (gather setup, scan machinery) — with the
        # event-sliced groups the per-group tensors are small, so wider
        # blocks pay off for the narrow Refine shapes (Ws~41, K~7) but spill
        # VMEM on the wide Mutate-round shapes (Ws~201, K 16-46).  Clamped
        # to the (static) group count: small G buckets and mut-axis shards
        # can leave G below the configured block (G=16 per shard on a
        # 2-way 'mut' mesh with the 32-group bucket).
        GB = min(_resolve_gb(Ws, K), g_start.shape[0])
        xs = (g_start, g_startind, g_S, g_region, g_evoff, s_mlen, s_nst,
              s_win, s_valid)
        G = g_start.shape[0]
        xs_r = jax.tree_util.tree_map(
            lambda a: a.reshape((G // GB, GB) + a.shape[1:]), xs)

        def seg(_, xseg):
            return None, jax.vmap(group)(xseg)

        _, totals = jax.lax.scan(seg, None, xs_r)
        return totals.reshape(G, -1)

    return kernel


def _k_bucket(k: int) -> int:
    # coarse buckets: every (K, P, D, G) combination is a separate compiled
    # program, and compiles cost minutes on this platform
    for b in (7, 16, 46, 160):
        if k <= b:
            return b
    return round_up(k, 128)


def _d_bucket(d: int) -> int:
    return 4 if d <= 4 else 32


def _g_bucket(g: int) -> int:
    # finer steps than the original (128, 1024): padded groups run the full
    # per-step computation (masked only at the delta sum), so a 480-group
    # Mutate call padded to 1024 wasted half its scan steps; the small 32/64
    # buckets serve the outlier (K, D) classes split off by
    # _partition_classes (often <=16 groups) and deferred-conflict rescores
    for b in (32, 64, 128, 256, 512, 1024, 2048, 4096):
        if g <= b:
            return b
    return round_up(g, 4096)




def _mut_buckets(muts_all):
    """Shared (K, D) compile buckets for a set of mutations."""
    if muts_all:
        mlens = np.array([len(m.mut) for m in muts_all], dtype=np.int64)
        olens = np.array([len(m.orig) for m in muts_all], dtype=np.int64)
        K_all = _k_bucket(int(mlens.max()) + 6)
        D_all = _d_bucket(int(np.abs(mlens - olens).max()))
    else:
        K_all, D_all = _k_bucket(7), _d_bucket(1)
    return K_all, D_all


def _partition_classes(datas, muts_list, participate):
    """Partition each region's mutations into (K, D) compile classes, each
    scored by its own kernel launch.  Kernel cost scales with the K bucket
    for EVERY group, so one long substitution in a Mutate round otherwise
    drags the whole call to K=46 (measured +60% on the bench chip for a
    single 38-base mutation per region); net-indel outliers likewise force
    the wide D=32 join spans.

    Returns {(K, D): [(muts_subset, original_indexes), ...] per region}."""
    classes: dict = {}
    for r, muts in enumerate(muts_list):
        if not participate[r]:
            continue
        for i, m in enumerate(muts):
            kb = _k_bucket(len(m.mut) + 6)
            db = _d_bucket(abs(len(m.mut) - len(m.orig)))
            cls = classes.setdefault(
                (kb, db), [([], []) for _ in range(len(datas))])
            cls[r][0].append(m)
            cls[r][1].append(i)
    return classes


def _mut_windows_fast(sequence, muts, K_all):
    """Vectorized per-mutation state windows for pure-ACGT sequence+muts:
    builds the window codes (prefix from sequence, the replacement, suffix
    past the orig span) by gather instead of materializing each full mutated
    sequence (the sequential path's apply_mutation + seq_to_states per
    mutation dominates Refine host prep at ~9 muts/base).

    Returns (states [N, K_all] int32 with -1 padding, nst [N])."""
    from ...core.sequence import _POW4, seq_to_codes

    N = len(muts)
    S0 = len(sequence)
    codes = seq_to_codes(sequence)
    starts = np.fromiter((m.start for m in muts), np.int64, N)
    lo = np.fromiter((len(m.orig) for m in muts), np.int64, N)
    lm = np.fromiter((len(m.mut) for m in muts), np.int64, N)
    # past-the-end starts are no-ops, and orig spans running past the end are
    # clamped to the in-sequence tail (Sequence.h:38-59 — apply_mutation's
    # `tail = bases[start+len(orig):] or ""` deletes at most S0-start bases)
    noop = starts >= S0
    lo = np.minimum(lo, np.maximum(S0 - starts, 0))
    lm_eff = np.where(noop, 0, lm)

    Mmax = max(int(lm.max()), 1) if N else 1
    mcodes = np.zeros((N, Mmax), dtype=np.int64)
    for i, m in enumerate(muts):
        if m.mut:
            mcodes[i, : len(m.mut)] = seq_to_codes(m.mut)

    si = np.maximum(starts - 4, 0)
    pre = starts - si                                    # [0, 4]
    Lmax = K_all + 4
    j = np.arange(Lmax, dtype=np.int64)[None, :]
    in_pre = j < pre[:, None]
    in_mut = ~in_pre & (j < (pre + lm_eff)[:, None])
    suf_idx = starts[:, None] + lo[:, None] + j - (pre + lm_eff)[:, None]
    src_idx = np.where(in_pre, si[:, None] + j, suf_idx)
    ok = src_idx < S0
    w = codes[np.clip(src_idx, 0, S0 - 1)]
    midx = np.clip(j - pre[:, None], 0, Mmax - 1)
    w = np.where(in_mut, np.take_along_axis(mcodes, midx, axis=1), w)
    w = np.where(in_mut | ok, w, 0)

    st = (np.lib.stride_tricks.sliding_window_view(w, 5, axis=1)
          @ _POW4).astype(np.int32)                      # [N, Lmax-4]
    nst_seq = S0 + lm_eff - lo - 4                       # mutated len-in-states
    wl = lm + 6
    nw = np.clip(np.minimum(wl, nst_seq - si), 0, K_all)
    st = np.where(np.arange(K_all)[None, :] < nw[:, None], st[:, :K_all], -1)
    return st, np.maximum(nst_seq, 0)


def _build_groups(sequence, muts, K_all, P=9):
    """Start-grouped slot arrays for ONE region's mutations (unpadded along
    the group axis).  Mutations sharing a start position share one group (the
    reference's Refine has exactly <=9 point mutations per base)."""
    N = len(muts)
    starts = np.fromiter((m.start for m in muts), np.int64, N)
    order = np.argsort(starts, kind="stable")
    has_bad = (any(c not in "ACGT" for c in set(sequence))
               or any(c not in "ACGT" for m in muts for c in set(m.mut)))

    # vectorized grouping: within each equal-start run (stable order), slots
    # fill P at a time; a new group opens at each run start and each P-block
    sorted_starts = starts[order]
    run_start = np.ones(N, dtype=bool)
    run_start[1:] = sorted_starts[1:] != sorted_starts[:-1]
    run_first = np.maximum.accumulate(
        np.where(run_start, np.arange(N), 0))
    rank = np.arange(N) - run_first
    t_idx = rank % P
    new_g = run_start | (t_idx == 0)
    g_idx = np.cumsum(new_g) - 1
    G = int(g_idx[-1]) + 1 if N else 0

    g_start = np.zeros(G, dtype=np.int32)
    g_startind = np.zeros(G, dtype=np.int32)
    s_mlen = np.zeros((G, P), dtype=np.int32)
    s_nst = np.zeros((G, P), dtype=np.int32)
    s_win = np.full((G, P, K_all), -1, dtype=np.int32)
    s_valid = np.zeros((G, P), dtype=bool)
    s_idx = np.full((G, P), -1, dtype=np.int64)
    if not N:
        return dict(g_start=g_start, g_startind=g_startind, s_mlen=s_mlen,
                    s_nst=s_nst, s_win=s_win, s_valid=s_valid, s_idx=s_idx)

    g_start[g_idx] = sorted_starts
    g_startind[:] = np.maximum(g_start - 4, 0)
    s_idx[g_idx, t_idx] = order
    s_mlen[g_idx, t_idx] = np.fromiter((len(m.mut) for m in muts),
                                       np.int64, N)[order]
    s_valid[g_idx, t_idx] = (sorted_starts <= len(sequence))

    if not has_bad:
        win_fast, nst_fast = _mut_windows_fast(sequence, muts, K_all)
        s_win[g_idx, t_idx] = win_fast[order]
        s_nst[g_idx, t_idx] = nst_fast[order]
    else:
        for n in range(N):
            mi = int(order[n])
            m = muts[mi]
            g, t = int(g_idx[n]), int(t_idx[n])
            mutseq = apply_mutation(sequence, m.start, m.orig, m.mut)
            s_nst[g, t] = max(len(mutseq) - 4, 0)
            si = int(g_startind[g])
            wl = len(m.mut) + 6
            w = seq_to_states(mutseq)[si : si + wl]
            s_win[g, t, : len(w)] = w

    return dict(g_start=g_start, g_startind=g_startind, s_mlen=s_mlen,
                s_nst=s_nst, s_win=s_win, s_valid=s_valid, s_idx=s_idx)


def _pad_groups(parts, g_S_parts, g_region_parts, P=9):
    """Concatenate per-region group arrays and pad the group axis to its
    compile bucket."""
    G = sum(p["g_start"].shape[0] for p in parts)
    G_pad = _g_bucket(max(G, 1))
    K_all = parts[0]["s_win"].shape[2] if parts else _k_bucket(7)

    out = dict(
        g_start=np.zeros(G_pad, dtype=np.int32),
        g_startind=np.zeros(G_pad, dtype=np.int32),
        g_S=np.zeros(G_pad, dtype=np.int32),
        g_region=np.full(G_pad, -1, dtype=np.int32),
        g_evoff=np.zeros(G_pad, dtype=np.int32),
        s_mlen=np.zeros((G_pad, P), dtype=np.int32),
        s_nst=np.zeros((G_pad, P), dtype=np.int32),
        s_win=np.full((G_pad, P, K_all), -1, dtype=np.int32),
        s_valid=np.zeros((G_pad, P), dtype=bool),
        s_idx=np.full((G_pad, P), -1, dtype=np.int64),
        g_part=np.full(G_pad, -1, dtype=np.int32),
    )
    at = 0
    for part_i, (p, gS, greg) in enumerate(zip(parts, g_S_parts,
                                               g_region_parts)):
        n = p["g_start"].shape[0]
        for k in ("g_start", "g_startind", "s_mlen", "s_nst", "s_win",
                  "s_valid", "s_idx"):
            out[k][at : at + n] = p[k]
        out["g_S"][at : at + n] = gS
        out["g_region"][at : at + n] = greg
        out["g_part"][at : at + n] = part_i
        at += n
    out["G"] = G
    out["G_pad"] = G_pad
    return out


def prepare_group_inputs(sequence, muts, S, S_pad, scoring_width, arrays,
                         ref_indexes, dtype):
    """Host-side preparation shared by the engine and the sharded step:
    scoring-band geometry + data windows + start-grouped mutation arrays.

    Single-region form; multi-region batches assemble the same pieces via
    _build_groups/_pad_groups with per-event S (see score_mutations_multi)."""
    n0 = arrays["n0"]
    Ws = 2 * scoring_width + 1
    i0r_h, i1r_h = limited_geometry(ref_indexes, n0, S, S_pad, scoring_width)
    i1r_h = np.minimum(i1r_h, i0r_h + (Ws - 1))

    K_all, D_all = _mut_buckets(muts)
    part = _build_groups(sequence, muts, K_all)
    G = part["g_start"].shape[0]
    out = _pad_groups([part], [np.full(G, S, np.int32)],
                      [np.zeros(G, np.int32)])
    out.update(K=K_all, D=D_all, P=9, i0r=i0r_h, i1r=i1r_h)
    return out


def score_mutations_tpu(engine, data: AlignData, muts):
    """Full ScoreMutations on the TPU engine (single-region form)."""
    return score_mutations_multi(engine, [data], [muts])[0]


def score_mutations_multi(engine, datas, muts_list):
    """ScoreMutations for R regions in ONE pair of fills + ONE group-kernel
    launch: events of all regions share the batch (per-event states and
    geometry), mutation groups carry their region id and mask other regions'
    events out of their delta sums.

    Regions with no mutations (or no events) are skipped entirely — their
    events are neither realigned nor updated, matching the sequential
    single-region behavior (ScoreMutations returns early there)."""
    mutscores_list = [make_mutscores(muts) for muts in muts_list]
    participate = [bool(m) and bool(d.events)
                   for d, m in zip(datas, muts_list)]
    if not any(participate):
        return mutscores_list

    p = datas[0].params
    W = 2 * p.realign_width + 1
    Ws = 2 * min(p.scoring_width, p.realign_width) + 1
    RS = max(p.realign_width - p.scoring_width, 0)
    dtype = engine.dtype

    # decide the serving kernels UP FRONT (shapes + group count are knowable
    # from params and the mutation list alone): the fused Pallas kernel needs
    # the uniform-stride batch layout, which only this call's arrays pay for
    classes = _partition_classes(datas, muts_list, participate)
    G_est = _estimate_groups(muts_list, participate)
    from .pallas_mutscore import pallas_ok

    pmode = _pallas_mode(engine.dtype, getattr(engine, "mesh", None), G_est)
    force = pmode in ("force", "interp")
    use_pallas = pmode is not None and any(
        pallas_ok(D_c, K_c, 1, Ws, W, force=force)
        for (K_c, D_c) in classes)

    ctx = engine._prepare_multi(datas, participate=participate,
                                stride=use_pallas)
    batch, arrays, n0 = ctx["batch"], ctx["arrays"], ctx["n0"]
    S_e, C, ev_region = ctx["S_e"], ctx["C"], ctx["ev_region"]

    fi = fill_geometry(arrays, ctx["ref_indexes"], S_e, C, p.realign_width)
    T = arrays["mean"].shape[1]
    max_steps = int(C + 2 * T + 8)
    fused_args = (batch, jnp.asarray(ctx["states2"]), jnp.asarray(fi["i0"]),
                  jnp.asarray(fi["i1"]), jnp.asarray(fi["is_pad"]),
                  float(p.lik_offset))
    mesh = getattr(engine, "mesh", None)
    if mesh is not None:
        fused = FUSED.both_dev_sharded(p.realign_width, dtype, mesh, T,
                                       max_steps)
        Mf, Sf, Mb, Sb, bpf, bpb, ral, rlk = fused(*fused_args)
    else:
        fused = FUSED.both_dev(p.realign_width, dtype)
        Mf, Sf, Mb, Sb, bpf, bpb, ral, rlk = fused(
            *fused_args, t_pad=T, max_steps=max_steps)
    row_of = ctx["row_of"]

    def update_events(ral_h):
        """Place backtrace outputs into the events (ref_like deferred)."""
        defer = getattr(engine, "_defer_rlk", None)
        rlk_h = None
        at = 0
        for r, data in enumerate(datas):
            for ev in data.events:
                e = row_of[at]
                at += 1
                if participate[r] and arrays["active"][e]:
                    ev.ref_align = place_full(ev, ral_h[e])
                    if defer is not None:
                        defer(ev, rlk, e)   # read at the next sync point
                    else:
                        if rlk_h is None:
                            rlk_h = np.asarray(rlk, np.float64)
                        ev.ref_like = place_full(ev, rlk_h[e])

    # post-backtrace scoring-band geometry (the reference recomputes band
    # centers from the refreshed ref_index, Alignment.cpp:131-132).  On the
    # f32 single-device path it is computed ON DEVICE from the backtrace
    # output (_geom_body) so the group kernels dispatch without a host sync
    # between the dual fill and the scoring launches; `ral` is then read
    # AFTER all launches (the blocking read overlaps kernel execution).
    use_dev_geom = (mesh is None and dtype is jnp.float32 and not use_pallas
                    and os.environ.get("PSQ_DEV_GEOM", "1") != "0")
    if not use_dev_geom:
        ral_h = np.asarray(ral, dtype=np.float64)
        update_events(ral_h)

    i0f = jnp.asarray(fi["i0"])
    i1f = jnp.asarray(fi["i1"])

    post_ris = [np.zeros(0)] * len(n0)
    if not use_dev_geom:
        at = 0
        for r, data in enumerate(datas):
            for ev in data.events:
                if participate[r]:
                    post_ris[row_of[at]] = event_ref_indexes(ev)
                at += 1

    # region event offsets for per-group slicing: uniform stride rows when
    # strided, else cumulative counts
    ev_counts = np.bincount(ev_region[ev_region >= 0], minlength=len(datas))
    sw = ctx.get("stride")
    if sw:
        ev_offs = (np.arange(len(datas)) * sw).astype(np.int32)
    else:
        ev_offs = np.concatenate(
            [[0], np.cumsum(ev_counts)[:-1]]).astype(np.int32)
    max_rev = max([1] + [int(ev_counts[r]) for r in range(len(datas))
                         if participate[r]])
    P = 9

    E = len(n0)
    # 32-granular: measured on the bench chip, E_g=16 (tighter slices at 10X
    # coverage's ~10 rows/region) ran ~1.5 s/run SLOWER than 32 — the group
    # kernel is per-group-overhead-bound, not event-row-bound, at this scale
    E_g = min(round_up(max(max_rev, sw or 1), 32), E)
    if use_dev_geom:
        i0r_h = i1r_h = None
        i0r_d, i1r_d = _geom_fn(p.scoring_width, int(C))(
            ral, batch.n0, jnp.asarray(S_e, jnp.int32))
        i1r_d = jnp.minimum(i1r_d, i0r_d + (Ws - 1))
    else:
        i0r_h, i1r_h = limited_geometry(post_ris, n0, S_e, C, p.scoring_width)
        i1r_h = np.minimum(i1r_h, i0r_h + (Ws - 1))
        i0r_d = jnp.asarray(i0r_h)
        i1r_d = jnp.asarray(i1r_h)
    ev_region_d = jnp.asarray(ev_region)
    win_m, win_s, win_l = _windows_fn(Ws, dtype)(
        batch.mean, batch.stdv, batch.lsr, i0r_d)

    # one kernel launch per (K, D) class, all dispatched before any result is
    # read (the blocking np.asarray would otherwise serialize launches with
    # their D2H); scores scatter back through each class's index maps
    launches = []
    for (K_c, D_c) in sorted(classes):
        per_region = classes[(K_c, D_c)]
        parts, g_S_parts, g_region_parts = [], [], []
        g_evoff_parts, idx_maps = [], []
        for r, (muts_c, idx_c) in enumerate(per_region):
            if not muts_c:
                continue
            part = _build_groups(datas[r].sequence, muts_c, K_c)
            Gr = part["g_start"].shape[0]
            parts.append(part)
            g_S_parts.append(np.full(Gr, ctx["S_list"][r], np.int32))
            g_region_parts.append(np.full(Gr, r, np.int32))
            g_evoff_parts.append(np.full(Gr, ev_offs[r], np.int32))
            idx_maps.append(np.asarray(idx_c, dtype=np.int64))
        gp = _pad_groups(parts, g_S_parts, g_region_parts)
        at = 0
        for pg in g_evoff_parts:
            gp["g_evoff"][at : at + len(pg)] = pg
            at += len(pg)

        fused_c = use_pallas and pallas_ok(D_c, K_c, sw, Ws, W, force=force)
        if fused_c:
            from .pallas_mutscore import score_groups_pallas

            totals_gp = score_groups_pallas(
                batch, Mf, Sf, Mb, Sb, i0f, i1f, (win_m, win_s, win_l),
                bpf, bpb, i0r_h, i1r_h,
                ev_region, gp, arrays, float(p.lik_offset),
                W, Ws, RS, K_c, P, D_c, sw, interpret=(pmode == "interp"))
        else:
            if mesh is not None:
                kern = _group_kernel_sharded(mesh, W, Ws, RS, K_c, P, D_c,
                                             dtype)
            else:
                kern = _group_kernel(W, Ws, RS, K_c, P, D_c, dtype, E_g=E_g)
            totals_gp = kern(
                batch, Mf, Sf, Mb, Sb, i0f, i1f,
                i0r_d, i1r_d, win_m, win_s, win_l, bpf, bpb, ev_region_d,
                jnp.asarray(gp["g_start"]), jnp.asarray(gp["g_startind"]),
                jnp.asarray(gp["g_S"]), jnp.asarray(gp["g_region"]),
                jnp.asarray(gp["g_evoff"]),
                jnp.asarray(gp["s_mlen"]), jnp.asarray(gp["s_nst"]),
                jnp.asarray(gp["s_win"]), jnp.asarray(gp["s_valid"]),
                float(p.lik_offset),
            )
        launches.append((gp, idx_maps, totals_gp))

    if use_dev_geom:
        # every scoring launch is in flight: the blocking `ral` read now
        # overlaps kernel execution instead of gating their dispatch
        update_events(np.asarray(ral, dtype=np.float64))

    for gp, idx_maps, totals_dev in launches:
        totals_gp = np.asarray(totals_dev, dtype=np.float64)
        for g in range(gp["G"]):
            r = int(gp["g_region"][g])
            if r < 0:
                continue
            im = idx_maps[int(gp["g_part"][g])]
            for t in range(P):
                mi = gp["s_idx"][g, t]
                if mi >= 0:
                    mutscores_list[r][int(im[mi])].score += totals_gp[g, t]
    return mutscores_list
