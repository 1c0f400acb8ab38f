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
        # single-device reduce, and Adam's 1/(sqrt(v)+eps) normalization
        # amplifies a reduce-order ulp on near-zero moments: allow tiny
        # absolute drift (observed max 4.4e-5 on 1/36864 elements)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
        )
    # BN batch stats also identical (global-batch statistics under sharding)
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats),
        jax.tree_util.tree_leaves(s8.batch_stats),
    ):
        # f32 reduction order differs between the 8-way psum and the
        # single-device reduce, and Adam's 1/(sqrt(v)+eps) normalization
        # amplifies a reduce-order ulp on near-zero moments: allow tiny
        # absolute drift (observed max 4.4e-5 on 1/36864 elements)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-4
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


def test_channel_sharded_step_matches_replicated():
    """DPxTP: channel_shard_params + one train step must equal the
    single-device step elementwise — a wrongly sharded BN vector or conv
    kernel would pass a loose loss check but not this."""
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.core.train_state import train_step
    from eas_snn_tpu.parallel import (
        channel_shard_params,
        dp_tp_shardings,
        make_mesh_2d,
    )

    assert jax.device_count() >= 8
    state, events, targets = _setup()
    host_state = jax.tree_util.tree_map(np.asarray, state)

    def fresh():
        return jax.tree_util.tree_map(jnp.asarray, host_state)

    d0 = jax.devices()[0]
    s1, m1 = train_step(
        jax.device_put(fresh(), d0),
        jax.device_put(events, d0),
        jax.device_put(targets, d0),
    )

    mesh2 = make_mesh_2d(4, 2, jax.devices()[:8])
    batch_sh, repl_sh = dp_tp_shardings(mesh2)
    f = fresh()
    s_tp = f.replace(
        params=channel_shard_params(mesh2, f.params),
        batch_stats=channel_shard_params(mesh2, f.batch_stats),
        opt_state=jax.device_put(f.opt_state, repl_sh),
        ema_params=(
            channel_shard_params(mesh2, f.ema_params)
            if f.ema_params is not None else None
        ),
        step=jax.device_put(f.step, repl_sh),
    )
    s2, m2 = train_step(
        s_tp,
        jax.device_put(events, batch_sh),
        jax.device_put(targets, batch_sh),
    )
    assert float(m1["total_loss"]) == pytest.approx(
        float(m2["total_loss"]), rel=1e-5
    )
    # atol = 2*lr: f32 collective-reduction reorder perturbs near-zero
    # gradients by ~1e-7, and Adam's ~sign(g) first step amplifies that to
    # a full +/-lr flip on isolated elements — bounded by 2*lr = 2e-3,
    # observed 5.6e-4 on ~1e-4 of elements. Anything systematic (a wrongly
    # sharded BN vector, a missing psum) moves whole tensors, not isolated
    # elements, and still fails this check.
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.batch_stats),
        jax.tree_util.tree_leaves(s2.batch_stats),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-4
        )


def test_allgather_rows_multiprocess_composition(monkeypatch):
    """_allgather_rows + rank-strided SequentialSampler with a MOCKED
    process_allgather: K ranks with unequal row counts must produce a
    disjoint exact cover of the dataset (no duplicates, no holes) after the
    pad-gather-strip (reference equivalent: yolox/utils/dist.py:195-274)."""
    import jax
    from jax.experimental import multihost_utils

    from eas_snn_tpu.data.loader import SequentialSampler
    from eas_snn_tpu.evaluators import event_evaluator as ee

    K, N = 4, 23  # N % K != 0 -> unequal per-rank counts/last batches

    # per-rank row tables: [sample_id, rank] built through the sampler
    per_rank_rows = []
    for r in range(K):
        ids = list(SequentialSampler(N, rank=r, world_size=K))
        per_rank_rows.append(
            np.asarray([[i, r, 0, 0, 0, 0, 0] for i in ids], np.float64)
            .reshape(-1, 7)
        )
    lens = [len(r) for r in per_rank_rows]
    assert len(set(lens)) > 1, "fixture must exercise unequal counts"
    n_max = max(lens)

    def fake_allgather(x, *a, **kw):
        x = np.asarray(x)
        if x.ndim == 0:  # counts phase
            return np.asarray(lens, np.int64)
        padded = np.zeros((K, n_max, x.shape[1]), np.float64)
        for r, rows in enumerate(per_rank_rows):
            padded[r, : len(rows)] = rows
        return padded

    monkeypatch.setattr(jax, "process_count", lambda: K)
    monkeypatch.setattr(
        multihost_utils, "process_allgather", fake_allgather
    )

    # every rank must reconstruct the same global table
    for r in range(K):
        out = ee._allgather_rows(per_rank_rows[r])
        assert out.shape == (N, 7)
        ids = sorted(out[:, 0].astype(int).tolist())
        assert ids == list(range(N)), "not a disjoint exact cover"
