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


_AG_ROUND = [0]


def allgather_round_robin(local_vals, n_total: int, pid: int, nproc: int):
    """Gather per-item values evaluated round-robin (items pid::nproc on each
    process) back into the full replicated [n_total] list — the cross-host
    reduction of the training hill-climb (every process then takes the same
    argmax).

    Implemented over the jax.distributed coordination service's key-value
    store, NOT device collectives: the values are a handful of floats, and
    device-backend allgather would require a cross-process collectives
    backend (e.g. CPU tests have none — multihost_utils.process_allgather
    silently returns only the local shard there).  Every process must call
    this the same number of times in the same order (the per-call round id
    keys the exchange)."""
    if nproc <= 1:
        return list(local_vals)
    import json

    from jax._src import distributed as _dist

    client = _dist.global_state.client
    rnd = _AG_ROUND[0]
    _AG_ROUND[0] += 1
    client.key_value_set("psq_ag/{}/{}".format(rnd, pid),
                         json.dumps([float(v) for v in local_vals]))
    out = [None] * n_total
    for p in range(nproc):
        vals = json.loads(client.blocking_key_value_get(
            "psq_ag/{}/{}".format(rnd, p), 600_000))
        for i, v in zip(range(p, n_total, nproc), vals):
            out[i] = v
    return out


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
