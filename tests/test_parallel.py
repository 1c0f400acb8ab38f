"""Data-parallel correctness on the 8-device virtual CPU mesh: a sharded
train step must produce the same updated parameters as the unsharded one
(XLA inserts the gradient/BN reductions; values must not change)."""

import numpy as np
import pytest


def _setup(B=8):
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.core import build_lr_schedule, build_optimizer
    from eas_snn_tpu.core.train_state import create_train_state
    from eas_snn_tpu.models import EASYOLOX

    model = EASYOLOX(
        num_classes=2, depth=0.33, width=0.125, use_spike="backbone",
        T=2, Ts=2, embedding="arsnn", embedding_ksize=3,
    )
    rng = np.random.default_rng(0)
    events = jnp.asarray(rng.normal(size=(B, 1, 2, 32, 32, 2)), jnp.float32)
    targets = np.zeros((B, 6, 5), np.float32)
    targets[:, 0] = [0, 16, 16, 10, 10]
    targets = jnp.asarray(targets)

    key = jax.random.PRNGKey(0)
    variables = model.init(key, events[:1], targets[:1], train=True)
    tx = build_optimizer(
        variables["params"], build_lr_schedule("fixed", 1e-3, 10, 10),
        weight_decay=5e-4,
    )
    state = create_train_state(model, key, events[:1], targets[:1], tx)
    return state, events, targets


def test_sharded_step_matches_single_device():
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from eas_snn_tpu.core.train_state import train_step
    from eas_snn_tpu.parallel import make_mesh

    assert jax.device_count() >= 8
    state, events, targets = _setup()
    # train_step donates its state arg; keep host-side copies to build two
    # independent device trees
    import jax.numpy as jnp

    host_state = jax.tree_util.tree_map(np.asarray, state)

    def fresh(sharding):
        return jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, host_state), sharding
        )

    # single device
    d0 = jax.devices()[0]
    s1, m1 = train_step(
        fresh(d0),
        jax.device_put(events, d0),
        jax.device_put(targets, d0),
    )

    # 8-way DP
    mesh = make_mesh(jax.devices()[:8])
    batch_sh = NamedSharding(mesh, P("data"))
    repl_sh = NamedSharding(mesh, P())
    s8, m8 = train_step(
        fresh(repl_sh),
        jax.device_put(events, batch_sh),
        jax.device_put(targets, batch_sh),
    )

    assert float(m1["total_loss"]) == pytest.approx(
        float(m8["total_loss"]), rel=1e-5
    )
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        # f32 reduction order differs between the 8-way psum and the
        # single-device reduce; only tiny relative drift is acceptable
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )
    # BN batch stats also identical (global-batch statistics under sharding)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats),
        jax.tree_util.tree_leaves(s8.batch_stats),
    ):
        # f32 reduction order differs between the 8-way psum and the
        # single-device reduce; only tiny relative drift is acceptable
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5
        )


def test_shard_helpers():
    import jax
    import numpy as np

    from eas_snn_tpu.parallel import (
        data_parallel_shardings,
        make_mesh,
        replicate,
        shard_batch,
    )

    mesh = make_mesh(jax.devices()[:8])
    batch = {"x": np.zeros((16, 4), np.float32)}
    sharded = shard_batch(mesh, batch)
    assert len(sharded["x"].sharding.device_set) == 8
    repl = replicate(mesh, {"w": np.ones(3, np.float32)})
    assert repl["w"].sharding.is_fully_replicated
    bs, rs = data_parallel_shardings(mesh)
    assert not bs.is_fully_replicated and rs.is_fully_replicated
