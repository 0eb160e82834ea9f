"""poreseq_tpu — TPU-native nanopore signal-consensus engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PoreSeq pipeline (see SURVEY.md): event-level pair-HMM alignment, iterative
propose-score-accept consensus error correction, likelihood-based variant
scoring, 1024-state Viterbi candidate generation, and region-sharded
multi-chip scaling — plus a bit-faithful CPU "exact" backend used as the
correctness oracle.
"""

from .api import PSAlign, swalign, seqtostates
from .core.params import load_params as LoadParams, save_params as SaveParams
from .core.regions import RegionInfo, MutationInfo, MutationScore

__all__ = [
    "PSAlign",
    "swalign",
    "seqtostates",
    "LoadParams",
    "SaveParams",
    "RegionInfo",
    "MutationInfo",
    "MutationScore",
]

__version__ = "0.1.0"
