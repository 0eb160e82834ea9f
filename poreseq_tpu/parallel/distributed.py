"""Multi-host orchestration helpers.

The unit of cross-host work is the region (1 kb-overlap tiling; SURVEY.md
section 5.7): hosts correct disjoint region subsets and the outputs are
`poreseq merge`d — the same topology as the reference's manual .region-file
cluster mode (README.md:48-62), without the manual file juggling.

Within a host, chips scale via the (ev x mut) shard_map mesh
(parallel/mesh.py) whose per-event likelihood deltas are psum-reduced before
the deterministic, replicated greedy accept — so every process derives the
identical corrected sequence for its regions.
"""

from __future__ import annotations

import os


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed from args or the standard environment
    variables; returns (process_id, num_processes).  Safe to call in
    single-process mode (returns (0, 1) without initializing)."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "PSQ_COORDINATOR")
    if coordinator_address is None and num_processes is None:
        return 0, 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    # read identity from the coordination client, NOT jax.process_index():
    # the latter initializes the device backend, which for the shared-nothing
    # region workload is pure overhead (and the multi-process CPU backend
    # used by tests/proxies has seconds-to-minutes init variance); compute
    # paths that need global devices (train's allgather, real multi-host
    # meshes) still initialize it lazily on first use
    from jax._src import distributed as _dist

    gs = _dist.global_state
    if gs.process_id is not None and gs.num_processes is not None:
        return int(gs.process_id), int(gs.num_processes)
    return jax.process_index(), jax.process_count()


def allgather_round_robin(local_vals, n_total: int, pid: int, nproc: int):
    """Gather per-item values evaluated round-robin (items pid::nproc on each
    process) back into the full replicated [n_total] list — the cross-host
    reduction of the training hill-climb (every process then takes the same
    argmax).  Uses jax.experimental.multihost_utils over the jax.distributed
    client; shards are padded to equal width as allgather requires."""
    import numpy as np

    if nproc <= 1:
        return list(local_vals)
    from jax.experimental import multihost_utils

    width = (n_total + nproc - 1) // nproc
    buf = np.full(width, -np.inf, dtype=np.float64)
    buf[: len(local_vals)] = np.asarray(local_vals, dtype=np.float64)
    gathered = np.asarray(multihost_utils.process_allgather(buf))
    out = np.full(n_total, -np.inf, dtype=np.float64)
    for p in range(nproc):
        mine = out[p::nproc]
        mine[:] = gathered[p][: len(mine)]
        out[p::nproc] = mine
    return list(out)


def shard_regions(regions: list[str], process_id: int | None = None,
                  num_processes: int | None = None) -> list[str]:
    """Round-robin region assignment for this process (matches the CLI's
    --shard-index/--num-shards semantics)."""
    if process_id is None or num_processes is None:
        try:
            import jax

            process_id = jax.process_index()
            num_processes = jax.process_count()
        except Exception:
            return regions
    return regions[process_id::num_processes]
