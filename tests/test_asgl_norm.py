"""ASGL ('patan') parity vs the reference's EfficientNoisySpikeII and the
post-embedding ``norm`` BatchNorm knob.

Reference anchors: yolox/models/activation.py:121-131 (InvArcTanh, learnable
temperature), :181-205 (EfficientNoisySpikeII mixing), and
yolox/exp/event_yolox_base.py:148 ('patan' registry entry, p=0) / :188-192
(the ``norm`` ModuleList wrap) with the x[0] slice in
yolox/models/spiking_yolox.py:41-47.
"""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eas_snn_tpu.models import EASYOLOX
from eas_snn_tpu.ops.surrogate import asgl_spike

torch = pytest.importorskip("torch")

REF = "/root/reference"


@pytest.fixture(scope="module", autouse=True)
def ref_on_path():
    if "loguru" not in sys.modules:
        fake = types.ModuleType("loguru")

        class _L:
            def __getattr__(self, k):
                return lambda *a, **kw: None

        fake.logger = _L()
        sys.modules["loguru"] = fake
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.ops = types.SimpleNamespace(batched_nms=None, nms=None)
        sys.modules["torchvision"] = tv
    if "spikingjelly" not in sys.modules:
        sj = types.ModuleType("spikingjelly")
        ab = types.ModuleType("spikingjelly.activation_based")

        class _Any(types.ModuleType):
            def __getattr__(self, k):
                if k.startswith("__"):
                    raise AttributeError(k)
                return type(k, (), {"__init__": lambda self, *a, **kw: None})

        for name in ("neuron", "functional", "layer", "surrogate"):
            mod = _Any(f"spikingjelly.activation_based.{name}")
            setattr(ab, name, mod)
            sys.modules[f"spikingjelly.activation_based.{name}"] = mod
        sj.activation_based = ab
        sys.modules["spikingjelly"] = sj
        sys.modules["spikingjelly.activation_based"] = ab
    sys.path.insert(0, REF)
    yield
    sys.path.remove(REF)


def _torch_patan(alpha, p):
    from yolox.models.activation import EfficientNoisySpikeII, InvArcTanh

    return EfficientNoisySpikeII(InvArcTanh(alpha), p=p)


class TestASGLParity:
    def test_p0_forward_and_grads_match_torch(self):
        # p=0 is the reference's reachable config (event_yolox_base.py:148)
        rng = np.random.default_rng(3)
        x = rng.normal(0.0, 1.0, (64,)).astype(np.float32)
        alpha = 2.0

        m = _torch_patan(alpha, p=0)
        m.train()
        xt = torch.tensor(x, requires_grad=True)
        yt = m(xt)
        yt.sum().backward()

        a = jnp.asarray([alpha], jnp.float32)

        def f(xx, aa):
            return asgl_spike(xx, aa, p=0.0, training=True).sum()

        y = asgl_spike(jnp.asarray(x), a, p=0.0, training=True)
        gx, ga = jax.grad(f, argnums=(0, 1))(jnp.asarray(x), a)

        np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(),
                                   rtol=1e-5, atol=1e-6)
        # learnable temperature gradient (InvArcTanh.alpha is an
        # nn.Parameter — created lazily on first forward in torch)
        np.testing.assert_allclose(
            float(ga[0]), float(m.inv_sg.alpha.grad), rtol=1e-5, atol=1e-6)

    def test_p_half_matches_torch_with_injected_mask(self):
        # p>0: inject the jax-drawn Bernoulli mask into the torch module
        # (it caches self.mask), then require exact agreement
        rng = np.random.default_rng(4)
        x = rng.normal(0.0, 1.0, (128,)).astype(np.float32)
        alpha = 1.5
        p = 0.5
        key = jax.random.PRNGKey(11)
        mask = jax.random.bernoulli(key, 1.0 - p, x.shape).astype(jnp.float32)

        m = _torch_patan(alpha, p=p)
        m.train()
        m.mask = torch.tensor(np.asarray(mask))
        xt = torch.tensor(x, requires_grad=True)
        yt = m(xt)
        yt.sum().backward()

        a = jnp.asarray([alpha], jnp.float32)
        y = asgl_spike(jnp.asarray(x), a, p=p, key=key, training=True)
        gx = jax.grad(
            lambda xx: asgl_spike(xx, a, p=p, key=key, training=True).sum()
        )(jnp.asarray(x))

        np.testing.assert_allclose(np.asarray(y), yt.detach().numpy(),
                                   rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_eval_is_hard_spike(self):
        x = jnp.asarray([-0.5, -1e-8, 0.0, 0.3])
        y = asgl_spike(x, jnp.asarray([2.0]), p=0.5, training=False)
        np.testing.assert_array_equal(np.asarray(y), [0.0, 0.0, 1.0, 1.0])


def _tiny_patan_model(**kw):
    defaults = dict(
        num_classes=2, depth=0.33, width=0.125, T=2, Tm=None,
        use_spike="backbone", embedding="count", spike_fn="patan",
        alpha=2.0,
    )
    defaults.pop("Tm")
    defaults.update(kw)
    return EASYOLOX(**defaults)


class TestPatanModelWiring:
    @pytest.mark.parametrize(
        "granularity,expect_shape",
        [("layer", (1,)), ("channel", None), ("neuron", None)],
    )
    def test_alpha_param_created_per_granularity(
            self, granularity, expect_shape):
        model = _tiny_patan_model(alpha_granularity=granularity, asgl_p=0.25)
        ev = jnp.asarray(
            np.random.default_rng(0).normal(size=(1, 1, 2, 64, 64, 2)),
            jnp.float32)
        lab = jnp.zeros((1, 5, 5), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), ev, lab, train=True)
        alphas = [
            (path, leaf) for path, leaf in
            jax.tree_util.tree_leaves_with_path(variables["params"])
            if path[-1].key == "alpha" and "PLIF" in path[-2].key
        ]
        assert alphas, "no ASGL alpha params created"
        for path, leaf in alphas:
            assert np.allclose(np.asarray(leaf), 2.0)
            if expect_shape is not None:
                assert leaf.shape == expect_shape
            elif granularity == "channel":
                assert leaf.ndim == 1 and leaf.shape[0] >= 4
            else:  # neuron: (H, W, C) per-position like ones_like(x[0])
                assert leaf.ndim == 3

    def test_patan_model_trains_with_rng(self):
        from eas_snn_tpu.core.train_state import (
            create_train_state, train_step,
        )
        import optax

        model = _tiny_patan_model(asgl_p=0.5)
        ev = jnp.asarray(
            np.random.default_rng(1).normal(size=(2, 1, 2, 64, 64, 2)),
            jnp.float32)
        lab = np.zeros((2, 5, 5), np.float32)
        lab[0, 0] = [0, 32, 32, 16, 16]
        lab = jnp.asarray(lab)
        state = create_train_state(
            model, jax.random.PRNGKey(0), ev, lab, optax.adam(1e-4))
        state, metrics = train_step(state, ev, lab)
        assert np.isfinite(float(metrics["total_loss"]))
        # the learnable temperature receives a nonzero update somewhere
        moved = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params):
            if path[-1].key == "alpha" and "PLIF" in path[-2].key:
                moved.append(float(jnp.abs(leaf - 2.0).max()))
        assert moved and max(moved) > 0


class TestNormKnob:
    def test_norm_adds_post_embedding_bn(self):
        from eas_snn_tpu.exp.event_exp import EventExp

        exp = EventExp()
        exp.num_classes = 2
        exp.depth, exp.width = 0.33, 0.125
        exp.T = exp.Ts = 2
        exp.Tm = 2
        exp.use_spike = "True"
        exp.embedding = "count"
        exp.norm = "bn"
        model = exp.get_model()
        assert model.norm == "bn"
        ev = jnp.asarray(
            np.random.default_rng(2).normal(size=(2, 1, 2, 64, 64, 2)),
            jnp.float32)
        lab = jnp.zeros((2, 5, 5), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), ev, lab, train=True)
        assert "emb_bn" in variables["params"]
        assert variables["params"]["emb_bn"]["scale"].shape == (2,)
        assert "emb_bn" in variables["batch_stats"]
        # train-mode forward updates the post-embedding BN's stats
        _, mutated = model.apply(
            variables, ev, lab, train=True, mutable=["batch_stats"])
        assert not np.allclose(
            np.asarray(mutated["batch_stats"]["emb_bn"]["mean"]), 0.0)

    def test_norm_matches_manual_bn_composition(self):
        # the normed forward == BN(embedding out) fed to the same backbone
        model_n = _tiny_patan_model(spike_fn="atan", norm="bn")
        model_p = _tiny_patan_model(spike_fn="atan")
        ev = jnp.asarray(
            np.random.default_rng(3).normal(size=(2, 1, 2, 64, 64, 2)),
            jnp.float32)
        lab = jnp.zeros((2, 5, 5), jnp.float32)
        vn = model_n.init(jax.random.PRNGKey(0), ev, lab, train=True)
        out_n = model_n.apply(vn, ev, train=False)

        # plain model sharing every non-BN param, fed the BN'd embedding:
        # eval BN with fresh stats is (x - 0) / sqrt(1 + 1e-3) * 1 + 0
        emb_out = ev[:, 0].sum(axis=1)  # count embedding
        x_bn = emb_out / np.sqrt(1.0 + 1e-3)
        params_shared = dict(vn["params"])
        params_shared.pop("emb_bn")
        out_p = model_p.apply(
            {"params": params_shared, "batch_stats": vn["batch_stats"]},
            jnp.asarray(x_bn)[:, None, None], train=False)
        np.testing.assert_allclose(
            np.asarray(out_n), np.asarray(out_p), rtol=1e-5, atol=1e-5)
