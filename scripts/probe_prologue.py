#!/usr/bin/env python3
"""Time the fused mutation scorer's XLA prologue vs its Pallas kernel at
Refine-8 scale, by compiling the prologue computation standalone (a copy of
the operand-building code in pallas_mutscore._get_fn.go).

Decides whether the mv6 model-value gather / window gathers are worth moving
into the kernel (MXU one-hot) or the prologue is already cheap.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from poreseq_tpu.engine.driver import find_point_mutations
    from poreseq_tpu.engine.tpu import TpuEngine
    from poreseq_tpu.engine.types import AlignData
    from poreseq_tpu.sim import simulate_session

    params = dict(realign_width=300, scoring_width=100, point_width=20,
                  verbose=0)
    R = 8
    datas = []
    muts_list = []
    for r in range(R):
        pa, _ = simulate_session(np.random.default_rng(200 + r), ref_len=1000,
                                 coverage=10, draft_error=0.02, backend="tpu",
                                 params=dict(params))
        d = AlignData.from_session(pa)
        d.params.scoring_width = 20          # as Refine does (point_width)
        datas.append(d)
        muts_list.append(find_point_mutations(d))
    eng = TpuEngine()

    os.environ["PSQ_PALLAS_MUTSCORE"] = "1"
    t0 = time.perf_counter()
    eng.score_mutations_multi(datas, muts_list)   # compile + warm
    print("fused full call (cold): {:.2f}s".format(time.perf_counter() - t0))
    for _ in range(3):
        t0 = time.perf_counter()
        eng.score_mutations_multi(datas, muts_list)
        print("fused full call: {:.3f}s".format(time.perf_counter() - t0))

    os.environ["PSQ_PALLAS_MUTSCORE"] = "0"
    eng.score_mutations_multi(datas, muts_list)
    for _ in range(2):
        t0 = time.perf_counter()
        eng.score_mutations_multi(datas, muts_list)
        print("xla full call: {:.3f}s".format(time.perf_counter() - t0))

    # ---- standalone prologue timing (mirrors _get_fn.go operand builds) ----
    os.environ["PSQ_PALLAS_MUTSCORE"] = "1"
    from poreseq_tpu.engine.tpu import mutscore as ms
    from poreseq_tpu.engine.tpu.align import FUSED
    from poreseq_tpu.engine.tpu.pack import (event_ref_indexes, fill_geometry,
                                             limited_geometry, round_up)

    participate = [True] * R
    ctx = eng._prepare_multi(datas, participate=participate, stride=True)
    p = datas[0].params
    batch, arrays, n0 = ctx["batch"], ctx["arrays"], ctx["n0"]
    fi = fill_geometry(arrays, ctx["ref_indexes"], ctx["S_e"], ctx["C"],
                       p.realign_width)
    T = arrays["mean"].shape[1]
    max_steps = int(ctx["C"] + 2 * T + 8)
    fused = FUSED.both_dev(p.realign_width, eng.dtype)
    Mf, Sf, Mb, Sb, bpf, bpb, ral, rlk = fused(
        batch, jnp.asarray(ctx["states2"]), jnp.asarray(fi["i0"]),
        jnp.asarray(fi["i1"]), jnp.asarray(fi["is_pad"]),
        float(p.lik_offset), t_pad=T, max_steps=max_steps)
    i0f = jnp.asarray(fi["i0"])

    post_ris = [event_ref_indexes(ev) for d in datas for ev in d.events]
    pr = [np.zeros(0)] * len(n0)
    for ri_arr, row in zip(post_ris, ctx["row_of"]):
        pr[row] = ri_arr
    Ws = 2 * p.scoring_width + 1
    i0r_h, i1r_h = limited_geometry(pr, n0, ctx["S_e"], ctx["C"],
                                    p.scoring_width)
    i1r_h = np.minimum(i1r_h, i0r_h + (Ws - 1))

    classes = ms._partition_classes(datas, muts_list, participate)
    (K_c, D_c), per_region = sorted(classes.items())[0]
    parts, gS, greg, gevo = [], [], [], []
    sw = ctx["stride"]
    for r, (muts_c, idx_c) in enumerate(per_region):
        part = ms._build_groups(datas[r].sequence, muts_c, K_c)
        Gr = part["g_start"].shape[0]
        parts.append(part)
        gS.append(np.full(Gr, ctx["S_list"][r], np.int32))
        greg.append(np.full(Gr, r, np.int32))
        gevo.append(np.full(Gr, r * sw, np.int32))
    gp = ms._pad_groups(parts, gS, greg)
    at = 0
    for pg in gevo:
        gp["g_evoff"][at:at + len(pg)] = pg
        at += len(pg)

    from poreseq_tpu.engine.tpu import pallas_mutscore as pms

    C1 = int(Mf.shape[0])
    G = int(gp["G_pad"])
    hs = pms.host_slot_arrays(gp, K_c, 9, C1)
    EB = sw
    print("shape: G_pad={} K={} D={} EB={} C1={} E={}".format(
        G, K_c, D_c, EB, C1, int(Mf.shape[1])))

    i32, f32 = jnp.int32, jnp.float32
    P = 9

    def prologue(greg_a, swin, Mf, Sf, Mb, Sb, i0f_a, i0r_a, i1r_a):
        # mirrors pallas_mutscore._get_fn.go operand building
        n0j = batch.n0.astype(i32)
        i0fT = i0f_a.astype(i32).T
        i0rT = i0r_a.astype(i32).T
        i1rT = i1r_a.astype(i32).T
        Q1 = C1
        widx = (i0rT[:, :, None] - 1
                + jnp.arange(Ws, dtype=i32)[None, None, :])
        wok = (widx >= 0) & (widx < T)
        widxc = jnp.clip(widx, 0, T - 1)

        def _bw(src, pv):
            v = jnp.take_along_axis(
                jnp.broadcast_to(src.astype(f32)[None], (Q1,) + src.shape),
                widxc, axis=2)
            return jnp.where(wok, v, jnp.asarray(pv, f32))

        wingeo = jnp.concatenate([
            _bw(batch.mean, 0.0), _bw(batch.stdv, 1.0), _bw(batch.lsr, 0.0),
            i0rT[:, :, None].astype(f32), i1rT[:, :, None].astype(f32),
        ], axis=2)

        iabs = i0fT[:, :, None] + jnp.arange(2 * 300 + 1, dtype=i32)
        okb = (iabs >= 1) & (iabs <= n0j[None, :, None])
        cross = jnp.maximum(Mf + Mb, Sf + Sb)
        sm = jnp.max(jnp.where(okb, cross, 0.0), axis=-1)
        oldj = jnp.maximum(jnp.maximum(sm, 0.0), jnp.maximum(bpf, bpb))
        bcol = jnp.max(jnp.where(okb, jnp.maximum(Mb, Sb), 0.0), axis=-1)
        colmeta = jnp.stack([
            i0fT.astype(f32), jnp.zeros_like(bpf), bpf, oldj, bpb, bcol,
            i0rT.astype(f32), jnp.zeros_like(bpf)], axis=2)

        mt = jnp.stack([
            batch.lev_mean.astype(f32), batch.lev_stdv.astype(f32),
            batch.log_lev.astype(f32), batch.sd_mean.astype(f32),
            batch.sd_lambda.astype(f32), batch.log_lambda.astype(f32)])
        G_, P_, K_ = swin.shape
        stc = jnp.clip(swin, 0, 1023)
        erow = (jnp.maximum(greg_a, 0)[:, None] * EB
                + jnp.arange(EB, dtype=i32)[None, :])
        erow = jnp.clip(erow, 0, mt.shape[1] - 1)
        mv6 = mt[:, erow[:, :, None, None], stc[:, None, :, :]]
        mv = jnp.transpose(mv6, (1, 4, 2, 3, 0)).reshape(G_, K_, EB, P_ * 6)
        return (wingeo.sum(), colmeta.sum(), mv.sum())

    def prologue_mv_only(greg_a, swin):
        mt = jnp.stack([
            batch.lev_mean.astype(f32), batch.lev_stdv.astype(f32),
            batch.log_lev.astype(f32), batch.sd_mean.astype(f32),
            batch.sd_lambda.astype(f32), batch.log_lambda.astype(f32)])
        G_, P_, K_ = swin.shape
        stc = jnp.clip(swin, 0, 1023)
        erow = (jnp.maximum(greg_a, 0)[:, None] * EB
                + jnp.arange(EB, dtype=i32)[None, :])
        erow = jnp.clip(erow, 0, mt.shape[1] - 1)
        mv6 = mt[:, erow[:, :, None, None], stc[:, None, :, :]]
        mv = jnp.transpose(mv6, (1, 4, 2, 3, 0)).reshape(G_, K_, EB, P_ * 6)
        return mv.sum()

    args_full = (jnp.asarray(gp["g_region"]), jnp.asarray(gp["s_win"]),
                 Mf, Sf, Mb, Sb, i0f, jnp.asarray(i0r_h), jnp.asarray(i1r_h))
    for name, fn, fargs in (
            ("prologue-full", jax.jit(prologue), args_full),
            ("prologue-mv-only", jax.jit(prologue_mv_only), args_full[:2])):
        r = fn(*fargs)
        jax.tree_util.tree_map(lambda x: float(np.asarray(x).ravel()[0]), r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = fn(*fargs)
            jax.tree_util.tree_map(
                lambda x: float(np.asarray(x).ravel()[0]), r)
        print("{}: {:.3f}s".format(name, (time.perf_counter() - t0) / 3))


if __name__ == "__main__":
    main()
