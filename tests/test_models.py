"""Model-layer tests: block/backbone shapes, all four detector variants,
SimOTA assignment on hand-built cases, loss finiteness and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eas_snn_tpu.models import (
    EASYOLOX,
    NeuronCfg,
    YOLOPAFPN,
    YOLOXHead,
    build_embedding,
    simota_assign,
)


def small_model(**kw):
    defaults = dict(
        num_classes=2, depth=0.33, width=0.125, T=2, Tm_unused=None,
    )
    defaults.pop("Tm_unused")
    defaults.update(kw)
    return EASYOLOX(**defaults)


@pytest.fixture(scope="module")
def events():
    rng = np.random.default_rng(1)
    # (B, Tl, Tm, H, W, C) — H, W multiples of 32
    return jnp.asarray(rng.normal(size=(2, 1, 3, 64, 64, 2)).astype(np.float32))


@pytest.fixture(scope="module")
def labels():
    # (B, M, 5): [cls, cx, cy, w, h]; two valid boxes in img 0, none in img 1
    lab = np.zeros((2, 10, 5), np.float32)
    lab[0, 0] = [0, 32, 32, 16, 16]
    lab[0, 1] = [1, 48, 20, 10, 8]
    return jnp.asarray(lab)


class TestEmbeddings:
    def test_count(self, events):
        m = build_embedding("count")
        out = m.apply({}, events)
        assert out.shape == (2, 64, 64, 2)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(events)[:, 0].sum(1), rtol=1e-3, atol=1e-6
        )

    @pytest.mark.parametrize("name", ["snn", "rsnn"])
    def test_single_frame_embeddings(self, events, name):
        m = build_embedding(name, ksize=3)
        params = m.init(jax.random.PRNGKey(0), events)
        out = m.apply(params, events)
        assert out.shape == (2, 64, 64, 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_arsnn_slices(self, events):
        m = build_embedding("arsnn", ksize=3, Ts=2, depth=2, write_zero=True)
        params = m.init(jax.random.PRNGKey(0), events)
        out = m.apply(params, events)
        assert out.shape == (2, 2, 64, 64, 2)
        assert np.isfinite(np.asarray(out)).all()


class TestDetectorVariants:
    @pytest.mark.parametrize("mode", ["none", "backbone", "full", "full_v2"])
    def test_eval_forward_shapes(self, events, mode):
        m = small_model(use_spike=mode, embedding="count")
        params = m.init(jax.random.PRNGKey(0), events)
        out = m.apply(params, events)
        # 64x64 input -> strides 8/16/32 -> 64+16+4 = 84 anchors
        assert out.shape == (2, 84, 5 + 2)
        assert np.isfinite(np.asarray(out)).all()

    def test_train_losses_and_grads(self, events, labels):
        m = small_model(use_spike="backbone", embedding="arsnn", Ts=2, T=2,
                        embedding_ksize=3, spike_attach=True, write_zero=True)
        params = m.init(jax.random.PRNGKey(0), events, labels, train=True)

        def loss_fn(p):
            out, _ = m.apply(
                p, events, labels, train=True,
                mutable=["batch_stats"],
            )
            return out["total_loss"], out

        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        assert np.isfinite(float(loss))
        for key in ["iou_loss", "conf_loss", "cls_loss", "num_fg"]:
            assert np.isfinite(float(out[key])), key
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
        # embedding must receive gradient (it is the paper's contribution)
        emb_g = jax.tree_util.tree_leaves(grads["params"]["embedding"])
        assert sum(float(jnp.abs(g).sum()) for g in emb_g) > 0


class TestSimOTA:
    def _mk_preds(self, A=84):
        # grid for 16x16 image at strides (8, 16): 4+1... keep simple custom
        pass

    def test_perfect_prediction_assigned(self):
        # one gt box; predictions: one anchor exactly on the box, others far
        num_classes = 3
        A = 25
        gx, gy = jnp.meshgrid(jnp.arange(5.0), jnp.arange(5.0), indexing="xy")
        cx = gx.reshape(-1)
        cy = gy.reshape(-1)
        strides = jnp.full((A,), 8.0)
        acx = (cx + 0.5) * 8
        acy = (cy + 0.5) * 8
        gt = jnp.zeros((3, 4)).at[0].set(jnp.array([20.0, 20.0, 10.0, 10.0]))
        gt_cls = jnp.zeros((3,))
        gt_valid = jnp.array([True, False, False])
        pred = jnp.tile(jnp.array([[200.0, 200.0, 5.0, 5.0]]), (A, 1))
        best = 12  # anchor at center (20, 20)
        pred = pred.at[best].set(jnp.array([20.0, 20.0, 10.0, 10.0]))
        cls_logits = jnp.zeros((A, num_classes)) - 4.0
        cls_logits = cls_logits.at[best, 0].set(4.0)
        obj = jnp.zeros((A,)) - 4.0
        obj = obj.at[best].set(4.0)

        res = simota_assign(
            gt, gt_cls, gt_valid, pred, cls_logits, obj, acx, acy, strides, num_classes
        )
        assert bool(res.fg_mask[best])
        assert int(res.matched_gt[best]) == 0
        assert float(res.pred_iou[best]) > 0.99
        assert float(res.num_gt) == 1.0
        # no anchor assigned to padded gt rows
        assert np.all(np.asarray(res.matched_gt)[np.asarray(res.fg_mask)] == 0)

    def test_no_gt_no_fg(self):
        num_classes = 2
        A = 16
        res = simota_assign(
            jnp.zeros((5, 4)), jnp.zeros((5,)), jnp.zeros((5,), bool),
            jnp.ones((A, 4)), jnp.zeros((A, num_classes)), jnp.zeros((A,)),
            jnp.arange(A, dtype=jnp.float32), jnp.arange(A, dtype=jnp.float32),
            jnp.full((A,), 8.0), num_classes,
        )
        assert float(res.num_fg) == 0.0
        assert not bool(res.fg_mask.any())

    def test_iterative_topk_matches_lax_top_k(self):
        """_topk_sum/_kth_smallest (k rounds of extraction; replaces the
        TPU-sort-lowered lax.top_k that was 8.7 of the 11.8 ms flagship
        loss forward) are tie-exact vs lax.top_k — incl. duplicated
        values and all-zero iou rows."""
        from eas_snn_tpu.models.simota import _kth_smallest, _topk_sum

        rng = np.random.default_rng(0)
        # heavy ties: one-decimal rounding
        x = jnp.asarray(
            np.round(rng.normal(5, 2, (6, 9, 333)), 1).astype(np.float32)
        )
        ref = jax.lax.top_k(x, 10)[0]
        np.testing.assert_allclose(
            np.asarray(_topk_sum(x, 10)), np.asarray(ref.sum(-1)), rtol=1e-6
        )
        for ksv in (1, 3, 10):
            ks = jnp.full(x.shape[:-1], ksv, jnp.int32)
            np.testing.assert_array_equal(
                np.asarray(_kth_smallest(-x, ks, 10)),
                np.asarray(-ref[..., ksv - 1]),
            )
        # mixed per-row ks
        ks = jnp.asarray(rng.integers(1, 11, x.shape[:-1]), jnp.int32)
        got = np.asarray(_kth_smallest(-x, ks, 10))
        want = np.take_along_axis(
            np.asarray(-ref), np.asarray(ks)[..., None] - 1, axis=-1
        )[..., 0]
        np.testing.assert_array_equal(got, want)
        # all-zero rows (the cand_ious case): finite, sum 0
        z = jnp.zeros((2, 5, 50), jnp.float32)
        s = np.asarray(_topk_sum(z, 10))
        assert np.isfinite(s).all() and (s == 0).all()

    def test_conflict_resolution_single_match(self):
        # two overlapping gts competing for the same anchors: every fg anchor
        # must end up matched to exactly one gt
        num_classes = 1
        A = 25
        gx, gy = jnp.meshgrid(jnp.arange(5.0), jnp.arange(5.0), indexing="xy")
        acx = (gx.reshape(-1) + 0.5) * 8
        acy = (gy.reshape(-1) + 0.5) * 8
        strides = jnp.full((A,), 8.0)
        gt = jnp.array([[20.0, 20.0, 16.0, 16.0], [22.0, 22.0, 16.0, 16.0]])
        res = simota_assign(
            gt, jnp.zeros((2,)), jnp.ones((2,), bool),
            jnp.stack([acx, acy, jnp.full((A,), 14.0), jnp.full((A,), 14.0)], 1),
            jnp.zeros((A, num_classes)), jnp.zeros((A,)),
            acx, acy, strides, num_classes,
        )
        assert float(res.num_fg) >= 1
        # every fg anchor matched to a valid gt index
        m = np.asarray(res.matched_gt)[np.asarray(res.fg_mask)]
        assert np.all((m >= 0) & (m < 2))


class TestPAFPN:
    def test_spiking_backbone_analog_neck_shapes(self):
        T, B = 2, 1
        x = jnp.ones((T * B, 64, 64, 2))
        m = YOLOPAFPN(depth=0.33, width=0.125,
                      backbone_neuron=NeuronCfg.snn(T), neck_neuron=NeuronCfg.ann())
        params = m.init(jax.random.PRNGKey(0), x)
        outs = m.apply(params, x)
        # rate-decoded -> batch B
        assert outs[0].shape == (B, 8, 8, int(256 * 0.125))
        assert outs[1].shape == (B, 4, 4, int(512 * 0.125))
        assert outs[2].shape == (B, 2, 2, int(1024 * 0.125))


class TestModelZoo:
    def test_create_by_name(self):
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.models import MODEL_SPECS, create_model

        assert "syolox-m-gen1" in MODEL_SPECS
        m = create_model("syolox-s-gen1", width=0.125, depth=0.33, T=2, Ts=2)
        ev = jnp.zeros((1, 1, 2, 64, 64, 2))
        v = m.init(jax.random.PRNGKey(0), ev)
        out = m.apply(v, ev)
        assert out.shape == (1, 84, 7)

    def test_unknown_name_raises(self):
        import pytest as _pytest

        from eas_snn_tpu.models import create_model

        with _pytest.raises(KeyError):
            create_model("nope")


def test_remat_matches_plain(events, labels):
    m1 = small_model(use_spike="backbone", embedding="count", remat=False)
    m2 = small_model(use_spike="backbone", embedding="count", remat=True)
    params = m1.init(jax.random.PRNGKey(0), events, labels, train=True)

    def loss(m):
        def f(p):
            out, _ = m.apply(p, events, labels, train=True, mutable=["batch_stats"])
            return out["total_loss"]
        return f

    l1, g1 = jax.value_and_grad(loss(m1))(params)
    l2, g2 = jax.value_and_grad(loss(m2))(params)
    assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestSPPPoolChain:
    def test_chained_separable_pools_bitwise_equal(self):
        """spp_pools (chained separable, EAS_SPP_CHAIN default) must be
        bitwise-identical to the reference's direct 2-D max pools
        (reference network_blocks.py:131-137) for float, bf16 and the
        eval path's int8 spike tensors."""
        from flax import linen as nn

        from eas_snn_tpu.models.blocks import spp_pools

        rng = np.random.default_rng(7)
        for dt, mk in (
            (jnp.float32, lambda: rng.normal(size=(4, 8, 10, 16))),
            (jnp.bfloat16, lambda: rng.normal(size=(4, 8, 10, 16))),
            (jnp.int8, lambda: rng.integers(0, 2, (4, 8, 10, 16))),
            (jnp.bfloat16, lambda: rng.integers(0, 2, (4, 8, 10, 16))),
        ):
            x = jnp.asarray(mk(), dt)
            direct = [
                nn.max_pool(x, (k, k), strides=(1, 1),
                            padding=[(k // 2, k // 2)] * 2)
                for k in (5, 9, 13)
            ]
            chain = spp_pools(x, (5, 9, 13))
            for d, c in zip(direct, chain):
                assert d.dtype == c.dtype
                np.testing.assert_array_equal(np.asarray(d), np.asarray(c))

    def test_grads_flow_and_sum_preserved(self):
        """Tie attribution may differ from the 2-D pool backward, but the
        TOTAL cotangent mass per pyramid level is conserved (each window
        routes its full cotangent to exactly one input)."""
        from eas_snn_tpu.models.blocks import spp_pools

        x = jnp.asarray(
            np.random.default_rng(8).normal(size=(2, 8, 10, 8)), jnp.float32)

        def total(xx):
            return sum(p.sum() for p in spp_pools(xx, (5, 9, 13)))

        g = jax.grad(total)(x)
        assert np.isfinite(np.asarray(g)).all()
        np.testing.assert_allclose(float(g.sum()), 3 * x.size, rtol=1e-6)
