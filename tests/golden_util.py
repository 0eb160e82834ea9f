"""Helpers to rebuild sessions from golden .npz fixtures."""

from __future__ import annotations

import os

import numpy as np

from poreseq_tpu.api import PSAlign
from poreseq_tpu.core.events import Event, Model

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def load_fixture(name):
    return np.load(os.path.join(GOLDEN_DIR, name), allow_pickle=True)


def session_from_fixture(d, backend="exact") -> PSAlign:
    pa = PSAlign(backend=backend)
    pa.sequence = str(d["sequence"])
    pa.params = {"verbose": 0}
    n = int(d["n_events"])
    for i in range(n):
        p = f"ev{i}_"
        m = Model(
            level_mean=d[p + "level_mean"],
            level_stdv=d[p + "level_stdv"],
            sd_mean=d[p + "sd_mean"],
            sd_stdv=d[p + "sd_stdv"],
            prob_skip=float(d[p + "probs"][0]),
            prob_stay=float(d[p + "probs"][1]),
            prob_extend=float(d[p + "probs"][2]),
            prob_insert=float(d[p + "probs"][3]),
            complement=bool(d[p + "complement"]),
        )
        ev = Event(
            mean=d[p + "mean"],
            stdv=d[p + "stdv"],
            length=np.ones(len(d[p + "mean"])),
            start=np.zeros(len(d[p + "mean"])),
            ref_align=d[p + "ref_align"],
            ref_like=d[p + "ref_like"],
            model=m,
            sequence=str(d[p + "seq2d"]),
        )
        pa.events.append(ev)
    return pa
