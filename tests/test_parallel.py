"""Multi-device sharding tests on the virtual CPU mesh."""

import numpy as np
import pytest

import jax


needs_devices = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@needs_devices
def test_dryrun_multichip_8():
    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@needs_devices
def test_sharded_step_matches_single_device():
    """The psum-reduced mutation totals over a 4x2 (ev x mut) mesh must equal
    the single-shard computation."""
    import jax.numpy as jnp

    import sys

    sys.path.insert(0, "/root/repo")
    from __graft_entry__ import _tiny_inputs
    from poreseq_tpu.engine.tpu.pack import to_device_batch
    from poreseq_tpu.parallel.mesh import make_mesh, pad_axis, sharded_consensus_step

    rng = np.random.default_rng(1)
    t = _tiny_inputs(rng, coverage=8, n_muts=16)
    arrays = {k: pad_axis(np.asarray(v), 4, axis=0) for k, v in t["arrays"].items()}
    batch = to_device_batch(arrays, jnp.float32)

    def padE(x, ax=0):
        return np.ascontiguousarray(pad_axis(x, 4, axis=ax))

    common = (
        jnp.asarray(t["states_pad"]), jnp.asarray(t["states_rev_pad"]),
        jnp.asarray(padE(t["i0f"])), jnp.asarray(padE(t["i1f"])),
        jnp.asarray(padE(t["i0b"])), jnp.asarray(padE(t["i1b"])),
        jnp.asarray(t["starts"]), jnp.asarray(t["startinds"]),
        jnp.asarray(t["mlens"]), jnp.asarray(t["nst"]), jnp.asarray(t["win"]),
        jnp.asarray(padE(t["i0r"], 2)), jnp.asarray(padE(t["i1r"], 2)),
        jnp.asarray(t["valid"]), 4.5, t["S"],
    )

    mesh1 = make_mesh(n_ev=1, n_mut=1, devices=jax.devices()[:1])
    step1 = sharded_consensus_step(mesh1, t["width"], t["K"], jnp.float32)
    s1, tot1, acc1 = step1(batch, *common)

    mesh8 = make_mesh(n_ev=4, n_mut=2, devices=jax.devices()[:8])
    step8 = sharded_consensus_step(mesh8, t["width"], t["K"], jnp.float32)
    s8, tot8, acc8 = step8(batch, *common)

    np.testing.assert_allclose(np.asarray(s1), np.asarray(s8), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tot1), np.asarray(tot8), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(acc1), np.asarray(acc8))
