#!/usr/bin/env python3
"""Per-stage device timings of the consensus hot path at bench shape.

Decomposes one score_mutations_multi-style call (8x 1 kb regions, 10X) into:
  fill2       both fills WITHOUT backtrace (need_steps=False twice)
  both_dev    the production fused program (fills + backtrace + likes prep)
  geom        the device post-backtrace geometry (mutscore._geom_body)
  windows     the shared scoring-band data windows (Ws=201 and Ws=41)
  kern:mutate the (K=16, D=4) group kernel at a Mutate-round group count
  kern:refine the (K=7, D=4) group kernel at Refine scale
  align_fwd   the fwd_dev realign program (fill + backtrace + device likes)

Each timing is the min of --reps timed calls after a warmup, synced by
reading a small output.  Usage: python scripts/probe_stages.py [--reps 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def t_min(fn, reps):
    fn()  # warm (compile)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--regions", type=int, default=8)
    ap.add_argument("--coverage", type=int, default=10)
    args = ap.parse_args()

    import jax.numpy as jnp

    from poreseq_tpu.engine.driver import find_point_mutations
    from poreseq_tpu.engine.tpu import TpuEngine
    from poreseq_tpu.engine.tpu.align import FUSED, get_fill
    from poreseq_tpu.engine.tpu.dp import device_window_inputs
    from poreseq_tpu.engine.tpu import mutscore as ms
    from poreseq_tpu.engine.tpu.pack import fill_geometry
    from poreseq_tpu.engine.types import AlignData
    from poreseq_tpu.sim import simulate_session

    params = dict(realign_width=300, scoring_width=100, point_width=20,
                  verbose=0)
    datas = []
    for r in range(args.regions):
        pa, _ = simulate_session(np.random.default_rng(100 + r), ref_len=1000,
                                 coverage=args.coverage, draft_error=0.02,
                                 backend="tpu", params=dict(params))
        datas.append(AlignData.from_session(pa))
    eng = TpuEngine()
    p = datas[0].params
    dtype = eng.dtype

    ctx = eng._prepare_multi(datas)
    batch, arrays, n0 = ctx["batch"], ctx["arrays"], ctx["n0"]
    S_e, C = ctx["S_e"], ctx["C"]
    fi = fill_geometry(arrays, ctx["ref_indexes"], S_e, C, p.realign_width)
    T = arrays["mean"].shape[1]
    max_steps = int(C + 2 * T + 8)
    W = 2 * p.realign_width + 1
    fused_args = (batch, jnp.asarray(ctx["states2"]), jnp.asarray(fi["i0"]),
                  jnp.asarray(fi["i1"]), jnp.asarray(fi["is_pad"]),
                  float(p.lik_offset))
    E = len(n0)
    print(f"# shape: E={E} C={C} T={T} W={W}", file=sys.stderr)

    # ---- both_dev: fills + backtrace ----
    both = FUSED.both_dev(p.realign_width, dtype)
    res = {}

    def run_both():
        out = both(*fused_args, t_pad=T, max_steps=max_steps)
        np.asarray(out[4])  # bpf [C+1, E]
        return out

    res["both_dev"] = t_min(run_both, args.reps)
    Mf, Sf, Mb, Sb, bpf, bpb, ral, rlk = run_both()

    # ---- fills only (no backtrace/steps) ----
    import jax

    fill_ns = get_fill(p.realign_width, dtype, need_steps=False)

    @jax.jit
    def fill2(batch, states, i0, i1, is_pad, off):
        w0f, rff = device_window_inputs(batch, i0, False, W)
        w0b, rfb = device_window_inputs(batch, i0, True, W)
        rf = fill_ns(batch, states, i0, i1, w0f, rff, is_pad, off, False)
        rb = fill_ns(batch, states, i0, i1, w0b, rfb, is_pad, off, True)
        return rf.best, rb.best

    res["fill2_nosteps"] = t_min(
        lambda: np.asarray(fill2(*fused_args)[0]), args.reps)

    # ---- device geometry ----
    geom = ms._geom_fn(p.scoring_width, int(C))
    S_e_d = jnp.asarray(S_e, jnp.int32)
    res["geom"] = t_min(
        lambda: np.asarray(geom(ral, batch.n0, S_e_d)[0]), args.reps)
    i0r_d, i1r_d = geom(ral, batch.n0, S_e_d)
    i1r_d = jnp.minimum(i1r_d, i0r_d + (2 * p.scoring_width))

    # ---- windows ----
    for wname, wid in (("windows_Ws201", p.scoring_width),
                       ("windows_Ws41", p.point_width)):
        Ws_w = 2 * wid + 1
        wfn = ms._windows_fn(Ws_w, dtype)
        res[wname] = t_min(
            lambda wfn=wfn: np.asarray(
                wfn(batch.mean, batch.stdv, batch.lsr, i0r_d)[0][0, 0, 0:1]),
            args.reps)

    # ---- group kernels ----
    ev_region_d = jnp.asarray(ctx["ev_region"])
    ev_counts = np.bincount(ctx["ev_region"][ctx["ev_region"] >= 0],
                            minlength=len(datas))
    ev_offs = np.concatenate([[0], np.cumsum(ev_counts)[:-1]]).astype(np.int32)
    from poreseq_tpu.engine.tpu.pack import round_up
    E_g = min(round_up(int(ev_counts.max()), 32), E)
    i0f = jnp.asarray(fi["i0"])
    i1f = jnp.asarray(fi["i1"])

    def kern_time(muts_of, scoring_width, tag):
        Wsk = 2 * scoring_width + 1
        wfn = ms._windows_fn(Wsk, dtype)
        win = wfn(batch.mean, batch.stdv, batch.lsr, i0r_d)
        muts_list = [muts_of(d) for d in datas]
        classes = ms._partition_classes(datas, muts_list, [True] * len(datas))
        for (K_c, D_c) in sorted(classes):
            per_region = classes[(K_c, D_c)]
            parts, gS, greg, gevo = [], [], [], []
            for r, (muts_c, _) in enumerate(per_region):
                if not muts_c:
                    continue
                part = ms._build_groups(datas[r].sequence, muts_c, K_c)
                Gr = part["g_start"].shape[0]
                parts.append(part)
                gS.append(np.full(Gr, ctx["S_list"][r], np.int32))
                greg.append(np.full(Gr, r, np.int32))
                gevo.append(np.full(Gr, ev_offs[r], np.int32))
            gp = ms._pad_groups(parts, gS, greg)
            at = 0
            for pg in gevo:
                gp["g_evoff"][at: at + len(pg)] = pg
                at += len(pg)
            RS = max(p.realign_width - scoring_width, 0)
            kern = ms._group_kernel(W, Wsk, RS, K_c, gp["s_mlen"].shape[1],
                                    D_c, dtype, E_g=E_g)
            kargs = (batch, Mf, Sf, Mb, Sb, i0f, i1f, i0r_d, i1r_d,
                     win[0], win[1], win[2], bpf, bpb, ev_region_d,
                     jnp.asarray(gp["g_start"]), jnp.asarray(gp["g_startind"]),
                     jnp.asarray(gp["g_S"]), jnp.asarray(gp["g_region"]),
                     jnp.asarray(gp["g_evoff"]), jnp.asarray(gp["s_mlen"]),
                     jnp.asarray(gp["s_nst"]), jnp.asarray(gp["s_win"]),
                     jnp.asarray(gp["s_valid"]), float(p.lik_offset))
            res[f"kern:{tag}:K{K_c}D{D_c}G{gp['G_pad']}"] = t_min(
                lambda: np.asarray(kern(*kargs)[0, 0:1]), args.reps)

    # Refine-scale: all 9/base point mutations at point_width
    def pw(d):
        d2 = AlignData(sequence=d.sequence, events=d.events, params=d.params)
        return find_point_mutations(d2)

    kern_time(pw, p.point_width, "refine")

    # Mutate-scale: ~60 muts/region of mixed lengths at scoring_width
    rng = np.random.default_rng(0)

    def mut_muts(d):
        from poreseq_tpu.core.regions import MutationInfo
        out = []
        for _ in range(60):
            start = int(rng.integers(0, len(d.sequence) - 12))
            L = int(rng.integers(1, 9))
            m = MutationInfo()
            m.start = start
            m.orig = d.sequence[start: start + L]
            m.mut = "".join("ACGT"[int(rng.integers(0, 4))]
                            for _ in range(int(rng.integers(1, 9))))
            out.append(m)
        return out

    kern_time(mut_muts, p.scoring_width, "mutate")

    # ---- realign program (fwd fill + backtrace + device likes) ----
    fwd = FUSED.fwd_dev(p.realign_width, dtype)
    res["align_fwd_dev"] = t_min(
        lambda: np.asarray(fwd(*fused_args, t_pad=T, max_steps=max_steps,
                               n_like=int(C))[0]), args.reps)

    for k, v in res.items():
        print(f"{k:28s} {v*1000:9.1f} ms")


if __name__ == "__main__":
    main()
