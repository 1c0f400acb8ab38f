"""Torch-checkpoint importer: name mapping + layout transforms land on the
right leaves of the Flax tree."""

import numpy as np
import pytest


def test_translate_representative_leaves():
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.models import EASYOLOX
    from eas_snn_tpu.utils.torch_import import translate_torch_checkpoint

    m = EASYOLOX(
        num_classes=2, depth=0.33, width=0.125, use_spike="none",
        embedding="arsnn", embedding_ksize=3, embedding_depth=2, Ts=2,
    )
    ev = jnp.zeros((1, 1, 2, 64, 64, 2))
    variables = m.init(jax.random.PRNGKey(0), ev)
    p = variables["params"]

    def oihw(hwio):
        return np.asarray(hwio).transpose(3, 2, 0, 1)

    rng = np.random.default_rng(0)

    def like(x):
        return rng.normal(size=np.asarray(x).shape).astype(np.float32)

    stem_k = like(p["backbone"]["backbone"]["stem"]["conv"]["conv"]["kernel"])
    d2_k = like(p["backbone"]["backbone"]["dark2_conv"]["conv"]["kernel"])
    csp_m0 = like(
        p["backbone"]["backbone"]["dark2_csp"]["m0"]["conv1"]["conv"]["kernel"]
    )
    lat_k = like(p["backbone"]["lateral_conv0"]["conv"]["kernel"])
    stem0_k = like(p["head"]["stem0"]["conv"]["kernel"])
    clsc_k = like(p["head"]["cls_conv1_0"]["conv"]["kernel"])
    clsp_k = like(p["head"]["cls_pred2"]["kernel"])
    clsp_b = like(p["head"]["cls_pred2"]["bias"])
    emb_k0 = like(p["embedding"]["input_conv_kernel0"])
    emb_k1 = like(p["embedding"]["input_conv_kernel1"])
    bn_scale = like(
        p["backbone"]["backbone"]["stem"]["conv"]["bn"]["scale"]
    )
    bn_mean = like(
        variables["batch_stats"]["backbone"]["backbone"]["stem"]["conv"]["bn"]["mean"]
    )

    sd = {
        # DDP prefix handled upstream; container tokens stripped
        "backbone.backbone.stem.conv.conv.weight": oihw(stem_k),
        "backbone.backbone.stem.conv.bn.weight": bn_scale,
        "backbone.backbone.stem.conv.bn.running_mean": bn_mean,
        "backbone.backbone.stem.conv.bn.num_batches_tracked": np.asarray(3),
        "backbone.backbone.dark2.0.conv.weight": oihw(d2_k),
        "backbone.backbone.dark2.1.m.0.conv1.conv.weight": oihw(csp_m0),
        "backbone.lateral_conv0.conv.weight": oihw(lat_k),
        "head.stems.0.conv.weight": oihw(stem0_k),
        "head.cls_convs.1.0.conv.weight": oihw(clsc_k),
        "head.cls_preds.2.weight": oihw(clsp_k),
        "head.cls_preds.2.bias": clsp_b,
        # embedding sequential: conv at 0, ReLU at 1, conv at 2
        "embedding.input_conv.0.weight": oihw(emb_k0),
        "embedding.input_conv.2.weight": oihw(emb_k1),
    }
    new_vars, report = translate_torch_checkpoint(sd, variables)
    assert report["unmapped"] == 0, report
    assert report["skipped"] == 1  # num_batches_tracked
    q = new_vars["params"]
    np.testing.assert_allclose(
        q["backbone"]["backbone"]["stem"]["conv"]["conv"]["kernel"], stem_k
    )
    np.testing.assert_allclose(
        q["backbone"]["backbone"]["dark2_csp"]["m0"]["conv1"]["conv"]["kernel"],
        csp_m0,
    )
    np.testing.assert_allclose(q["head"]["cls_pred2"]["kernel"], clsp_k)
    np.testing.assert_allclose(q["head"]["cls_pred2"]["bias"], clsp_b)
    np.testing.assert_allclose(q["embedding"]["input_conv_kernel0"], emb_k0)
    np.testing.assert_allclose(q["embedding"]["input_conv_kernel1"], emb_k1)
    np.testing.assert_allclose(
        new_vars["batch_stats"]["backbone"]["backbone"]["stem"]["conv"]["bn"]["mean"],
        bn_mean,
    )
    np.testing.assert_allclose(
        q["backbone"]["backbone"]["stem"]["conv"]["bn"]["scale"], bn_scale
    )


def test_load_torch_pth_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")

    from eas_snn_tpu.utils.torch_import import load_torch_state_dict

    sd = {
        "module.backbone.lateral_conv0.conv.weight": torch.ones(4, 2, 1, 1),
        "head.stems.0.conv.weight": torch.zeros(3, 3, 1, 1),
    }
    path = str(tmp_path / "ckpt.pth")
    torch.save({"model": sd, "start_epoch": 5}, path)
    out = load_torch_state_dict(path)
    assert "backbone.lateral_conv0.conv.weight" in out
    assert out["backbone.lateral_conv0.conv.weight"].shape == (4, 2, 1, 1)


def test_flagship_reference_checkpoint_end_to_end(tmp_path):
    """VERDICT #7: a full reference-initialized checkpoint (flagship Gen1-S
    geometry: arsnn depth-2 ksize-5 embedding + PAFPN + head), saved in the
    reference trainer's .pth format, loads by model-zoo name through
    models.build.load_weights with ZERO unmapped leaves and produces a
    finite eval forward."""
    torch = pytest.importorskip("torch")
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from refutil import install_ref_stubs

    install_ref_stubs()

    import jax
    import jax.numpy as jnp

    from yolox.models.embedding import AdaptiveRSNNEmbedding
    from yolox.models.activation import Rectangle
    from yolox.models.yolo_head import YOLOXHead as RefHead
    from yolox.models.yolo_pafpn import YOLOPAFPN as RefPAFPN

    from eas_snn_tpu.models.build import create_model, load_weights

    depth, width, num_classes = 0.33, 0.50, 2
    torch.manual_seed(33)
    emb = AdaptiveRSNNEmbedding(
        kernel_size=5, Ts=3, depth=2, readout="sum", write_zero=True,
        spike_attach=False, nb_steps=4, thresh=1.0, vreset=None,
        spike_fn=Rectangle,
    )
    back = RefPAFPN(depth, width, in_dim=2)
    head = RefHead(num_classes, width)

    sd = {}
    for prefix, mod in (("embedding", emb), ("backbone", back), ("head", head)):
        for k, v in mod.state_dict().items():
            sd[f"{prefix}.{k}"] = v
    path = str(tmp_path / "flagship_ref.pth")
    torch.save({"model": sd, "start_epoch": 0}, path)

    model = create_model("syolox-s-gen1", use_spike="none")
    ev = jnp.zeros((1, 1, 4, 64, 64, 2), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ev, train=False
    )
    new_vars, report = load_weights(variables, path)
    assert report["unmapped"] == 0, report
    assert report["mapped"] > 100

    x = jax.random.poisson(
        jax.random.PRNGKey(1), 0.2, (1, 1, 4, 64, 64, 2)
    ).astype(jnp.float32)
    out = jax.jit(lambda v, e: model.apply(v, e, train=False))(new_vars, x)
    arr = np.asarray(out.outputs if hasattr(out, "outputs") else out)
    assert np.isfinite(arr).all() and arr.shape[-1] == 5 + num_classes


def test_zoo_checkpoint_artifact_by_name():
    """VERDICT #7: the checked-in reference-initialized flagship checkpoint
    (checkpoints/syolox_s_gen1_init.pth, written by
    tools/make_reference_ckpt.py with the reference's own SpikingYOLOX
    classes and spikingjelly state-dict naming) loads BY ZOO NAME with zero
    unmapped leaves, transfers real values (conv kernels transposed
    OIHW->HWIO, ParametricLIF ``act.w`` scalars -> PLIF_0/w), and the
    spiking model evaluates finitely with the loaded weights."""
    pytest.importorskip("torch")
    import os

    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.models.build import ZOO_CKPTS, create_model, load_weights
    from eas_snn_tpu.utils.torch_import import (
        load_torch_state_dict,
        translate_torch_checkpoint,
    )

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pth = os.path.join(repo, ZOO_CKPTS["syolox-s-gen1"])
    assert os.path.exists(pth), "zoo artifact missing from checkpoints/"

    model = create_model("syolox-s-gen1")
    ev = jnp.zeros((1, 1, 4, 64, 64, 2), jnp.float32)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), ev, train=False
    )

    # The reference's convert_to_spiking leaves the Focus stem analog
    # (utils_snn.py:22-24): our spiking tree must NOT have a stem PLIF.
    stem = variables["params"]["backbone"]["backbone"]["stem"]["conv"]
    assert "PLIF_0" not in stem

    new_vars, report = load_weights(variables, "syolox-s-gen1")
    assert report["unmapped"] == 0, report
    assert report["shape_miss"] == 0, report
    assert report["mapped"] == 430, report

    # value transfer: stem conv kernel must equal the torch leaf, transposed
    sd = load_torch_state_dict(pth)
    ours = np.asarray(
        new_vars["params"]["backbone"]["backbone"]["stem"]["conv"]["conv"]["kernel"]
    )
    ref = sd["backbone.backbone.stem.0.conv.conv.weight"].transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(ours, ref)

    # PLIF decay logits: perturb every act.w in-memory, re-translate, and
    # check each lands on its PLIF_0/w leaf (artifact values are all 0.0,
    # which would be vacuous against PLIF_W_INIT=0).
    wkeys = [k for k in sd if k.endswith(".act.w")]
    assert len(wkeys) == 34
    for i, k in enumerate(wkeys):
        sd[k] = np.asarray(0.01 * (i + 1), np.float32)
    v2, rep2 = translate_torch_checkpoint(sd, variables)
    assert rep2["unmapped"] == 0
    d2csp = v2["params"]["backbone"]["backbone"]["dark2_csp"]
    i = wkeys.index("backbone.backbone.dark2.1.conv1.act.w")
    np.testing.assert_allclose(
        np.asarray(d2csp["conv1"]["PLIF_0"]["w"]), 0.01 * (i + 1)
    )

    out = jax.jit(lambda v, e: model.apply(v, e, train=False))(
        new_vars, jnp.ones((1, 1, 4, 64, 64, 2), jnp.float32)
    )
    arr = np.asarray(out.outputs if hasattr(out, "outputs") else out)
    assert np.isfinite(arr).all()
