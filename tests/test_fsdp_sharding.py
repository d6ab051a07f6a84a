"""FSDP (ZeRO-style) state sharding: numerically identical to replicated
DP, with params/moments actually partitioned across the mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from dsl_tpu.parallel.mesh import (fsdp_sharding, make_mesh, replicate,
                                   shard_batch, shard_state_fsdp)
from dsl_tpu.train import jit_train_step
from dsl_tpu.train.train_step import jit_train_step_fsdp

from tests.test_train_step import _make_batch, _setup


def test_fsdp_spec_partitions_largest_dim():
    mesh = make_mesh()
    tree = {"big": jnp.zeros((64, 48)), "odd": jnp.zeros((9, 1115)),
            "small": jnp.zeros((4,)), "scalar": jnp.zeros(())}
    specs = fsdp_sharding(mesh, tree, min_size=16)
    assert specs["big"].spec == jax.sharding.PartitionSpec("data", None)
    # no dim divisible by 8 -> replicated
    assert specs["odd"].spec == jax.sharding.PartitionSpec()
    assert specs["small"].spec == jax.sharding.PartitionSpec()
    assert specs["scalar"].spec == jax.sharding.PartitionSpec()


def test_fsdp_step_matches_replicated_dp():
    assert jax.device_count() >= 8
    mesh = make_mesh()
    det, state0, step = _setup()
    # independent second state: _setup is deterministic (PRNGKey(0)), and
    # donation in the jitted steps would otherwise delete shared buffers
    _, state0b, _ = _setup()
    batch = shard_batch(mesh, _make_batch(8))

    jstep = jit_train_step(step, mesh)
    s_rep = replicate(mesh, state0)
    s_rep, m_rep = jstep(s_rep, batch)
    s_rep, m_rep2 = jstep(s_rep, batch)

    jstep_f = jit_train_step_fsdp(step, mesh, state0b)
    s_f = shard_state_fsdp(mesh, state0b)
    # params are genuinely partitioned
    leaves = [x for x in jax.tree_util.tree_leaves(s_f)
              if hasattr(x, "sharding") and x.size >= 1024
              and any(d % 8 == 0 for d in x.shape)]
    assert any(not leaf.sharding.is_fully_replicated for leaf in leaves)
    s_f, m_f = jstep_f(s_f, batch)
    s_f, m_f2 = jstep_f(s_f, batch)

    assert np.isclose(float(m_rep["loss"]), float(m_f["loss"]), rtol=1e-5)
    assert np.isclose(float(m_rep2["loss"]), float(m_f2["loss"]), rtol=1e-4)
    # final params agree (gather fsdp state to host and compare)
    pr = jax.tree_util.tree_map(np.asarray, s_rep.params)
    pf = jax.tree_util.tree_map(np.asarray, s_f.params)
    flat_r = jax.tree_util.tree_leaves(pr)
    flat_f = jax.tree_util.tree_leaves(pf)
    for a, b in zip(flat_r, flat_f):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


def test_shard_batch_replicates_non_batch_leaves():
    mesh = make_mesh()
    batch = {"images": jnp.zeros((8, 4, 4, 3)),
             "dyn_iou_thr": jnp.asarray(0.4),
             "cum_samples": jnp.ones((81,))}
    placed = shard_batch(mesh, batch)
    assert not placed["images"].sharding.is_fully_replicated
    assert placed["dyn_iou_thr"].sharding.is_fully_replicated
    assert placed["cum_samples"].sharding.is_fully_replicated
