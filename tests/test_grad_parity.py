"""Gradient-level parity against the reference (torch CPU autograd).

Round-1 parity covered forward values; this file closes SURVEY.md §7 hard
part 2: the SAT (`spike_attach`) / RPD (`write_zero`) machinery and the
SimOTA losses must also produce the SAME GRADIENTS as the reference, or
training silently diverges while every forward test stays green.

  * ARSNN embedding: jax.grad vs torch.autograd.grad on translated weights,
    across {spike_attach} x {write_zero} x {readout} incl. the
    write_zero=False residual write and its `Tm-1-t_last` avg denominator
    (reference embedding.py:181-217).
  * yolox_losses vs the reference head's get_losses on a small hand-built
    batch: loss components AND input-feature gradients
    (reference spiking_yolo_head.py:272-430 == yolo_head.py same code).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from refutil import install_ref_stubs  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def ref_env():
    install_ref_stubs()
    yield


# torch OIHW -> jax HWIO
def _g2jax(g):
    return np.transpose(g, (2, 3, 1, 0))


ARSNN_CASES = [
    # readout, spike_attach, write_zero, vreset
    ("sum", True, True, 0.0),     # flagship README config
    ("sum", False, False, None),  # residual write path, soft reset
    ("sum", True, False, 0.0),    # SAT on, residual written
    ("avg", True, False, None),   # avg denominators incl. Tm-1-t_last
    ("last", False, True, 0.0),
    ("avg", False, False, 0.0),
]


class TestARSNNGradParity:
    @pytest.mark.parametrize("readout,attach,wz,vreset", ARSNN_CASES)
    def test_grads_match_reference(self, readout, attach, wz, vreset):
        import jax
        import jax.numpy as jnp

        from yolox.models.activation import Rectangle
        from yolox.models.embedding import AdaptiveRSNNEmbedding

        from eas_snn_tpu.models.embedding import ARSNNEmbedding
        from eas_snn_tpu.utils.torch_import import translate_torch_checkpoint

        Tm, B, H, W, Ts, depth = 4, 2, 10, 12, 2, 2
        torch.manual_seed(11)
        ref = AdaptiveRSNNEmbedding(
            kernel_size=3, Ts=Ts, depth=depth, readout=readout,
            write_zero=wz, spike_attach=attach,
            nb_steps=Tm, thresh=1.0, vreset=vreset, spike_fn=Rectangle,
        ).train()

        rng = np.random.default_rng(12)
        x = rng.normal(size=(B, 1, Tm, 2, H, W)).astype(np.float32) * 2.0
        mix = rng.normal(size=(Ts, B, 2, H, W)).astype(np.float32)

        # ---- torch grads
        xt = torch.from_numpy(x.copy()).requires_grad_(True)
        out_t = ref(xt)
        loss_t = (out_t * torch.from_numpy(mix)).sum()
        loss_t.backward()
        tg = {k: p.grad.detach().numpy() for k, p in ref.named_parameters()
              if p.grad is not None}
        xg_t = xt.grad.detach().numpy()

        # ---- jax grads on translated weights
        ours = ARSNNEmbedding(
            ksize=3, depth=depth, Ts=Ts, readout=readout,
            spike_attach=attach, write_zero=wz, thresh=1.0, vreset=vreset,
            spike_fn="rect", alpha=1.0,
        )
        xl = jnp.asarray(np.moveaxis(x, 3, -1))
        variables = ours.init(jax.random.PRNGKey(0), xl)
        sd = {"embedding." + k: v.detach().numpy()
              for k, v in ref.state_dict().items()}
        v2, report = translate_torch_checkpoint(
            sd, {"params": {"embedding": variables["params"]}}
        )
        assert report["unmapped"] == 0, report
        params = v2["params"]["embedding"]
        mixl = jnp.asarray(np.moveaxis(mix, 2, -1))  # (Ts, B, H, W, 2)

        def loss_fn(p, xin):
            out = ours.apply({"params": p}, xin)
            return (out * mixl).sum()

        (l_j, (gp, gx)) = (
            loss_fn(params, xl),
            jax.grad(loss_fn, argnums=(0, 1))(params, xl),
        )
        np.testing.assert_allclose(
            float(l_j), float(loss_t.detach()), rtol=1e-4, atol=1e-4
        )

        # parameter grads: torch Sequential index -> our flat index
        def seq_map(name):
            # input_conv.0.weight -> (input_conv, kernel, 0);
            # input_conv.2.weight -> (..., 1)  (ReLU at odd indices)
            parts = name.split(".")
            conv_i = int(parts[1]) // 2
            kind = "kernel" if parts[2] == "weight" else "bias"
            return f"{parts[0]}_{kind}{conv_i}"

        for name, g_t in tg.items():
            ours_name = seq_map(name)
            g_j = np.asarray(gp[ours_name])
            if g_t.ndim == 4:
                g_t = _g2jax(g_t)
            np.testing.assert_allclose(
                g_j, g_t, rtol=1e-3, atol=1e-4,
                err_msg=f"{name} -> {ours_name} "
                        f"({readout},{attach},{wz},{vreset})",
            )

        # input grads (channel-last on our side)
        np.testing.assert_allclose(
            np.asarray(gx), np.moveaxis(xg_t, 3, -1), rtol=1e-3, atol=1e-4,
        )


class TestLossParity:
    @pytest.mark.parametrize("use_l1", [False, True])
    def test_losses_and_feature_grads_match(self, use_l1):
        import jax
        import jax.numpy as jnp

        from yolox.models.yolo_head import YOLOXHead as RefHead

        from eas_snn_tpu.models import YOLOXHead
        from eas_snn_tpu.models.simota import yolox_losses
        from eas_snn_tpu.utils.torch_import import translate_torch_checkpoint

        num_classes, width = 2, 0.25
        B, H, W = 2, 64, 64
        torch.manual_seed(21)
        ref_head = RefHead(num_classes, width).train()
        ref_head.use_l1 = use_l1
        # the reference pipeline applies init_yolo BN eps/momentum 1e-3/0.03
        # (exp/event_yolox_base.py:179-183); our BaseConv hardcodes the same
        for mod in ref_head.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.eps, mod.momentum = 1e-3, 0.03

        rng = np.random.default_rng(22)
        chans = [int(256 * width), int(512 * width), int(1024 * width)]
        feats = [
            rng.normal(size=(B, c, H // s, W // s)).astype(np.float32)
            for c, s in zip(chans, (8, 16, 32))
        ]
        # hand-built batch: 2 images, 3 + 1 valid gts (cls, cx, cy, w, h)
        labels = np.zeros((B, 5, 5), np.float32)
        labels[0, 0] = [0, 20, 20, 14, 18]
        labels[0, 1] = [1, 44, 30, 10, 26]
        labels[0, 2] = [0, 32, 52, 24, 12]
        labels[1, 0] = [1, 40, 40, 30, 30]

        feats_t = [torch.from_numpy(f.copy()).requires_grad_(True)
                   for f in feats]
        loss_t = ref_head(feats_t, torch.from_numpy(labels.copy()), None)
        (total_t, iou_t, obj_t, cls_t, l1_t, num_fg_t) = [
            float(v) for v in loss_t
        ]
        torch.autograd.backward(loss_t[0])
        fg_t = [f.grad.detach().numpy() for f in feats_t]

        ours_head = YOLOXHead(num_classes=num_classes, width=width)
        feats_l = [jnp.asarray(np.moveaxis(f, 1, -1)) for f in feats]
        variables = ours_head.init(jax.random.PRNGKey(0), feats_l, train=True)
        sd = {k: v.detach().numpy() for k, v in ref_head.state_dict().items()}
        v2, report = translate_torch_checkpoint(sd, variables)
        assert report["unmapped"] == 0, report

        labels_j = jnp.asarray(labels)

        def loss_fn(fts):
            out, _ = ours_head.apply(
                v2, fts, train=True, mutable=["batch_stats"]
            )
            res = yolox_losses(
                out.outputs, out.origin_preds, labels_j,
                out.grid_x, out.grid_y, out.strides,
                num_classes, use_l1=use_l1,
            )
            return res.total_loss, res

        (total_j, res), fg_j = jax.value_and_grad(loss_fn, has_aux=True)(
            feats_l
        )

        np.testing.assert_allclose(
            float(res.iou_loss), iou_t, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(res.conf_loss), obj_t, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(res.cls_loss), cls_t, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            float(res.l1_loss), l1_t, rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(float(res.num_fg), num_fg_t, rtol=1e-6)
        np.testing.assert_allclose(
            float(total_j), total_t, rtol=1e-4, atol=1e-5
        )

        for g_j, g_t in zip(fg_j, fg_t):
            np.testing.assert_allclose(
                np.asarray(g_j), np.moveaxis(g_t, 1, -1),
                rtol=1e-3, atol=1e-5,
            )
