"""Space-to-depth packed ARSNN equivalence (ops/pack.py).

Exactness holds in exact arithmetic; float reassociation makes f32
comparisons of the chaotic spiking scan flaky, so the scan-level tests run
in float64 where association noise (~1e-15) cannot flip a threshold.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eas_snn_tpu.ops.pack import (
    depth_to_space,
    pack_bias,
    pack_conv_kernel,
    packable,
    space_to_depth,
)


def _conv(x, k, b):
    pad = [(k.shape[0] // 2,) * 2] * 2
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + b


class TestPackPrimitives:
    def test_space_depth_roundtrip(self):
        x = jnp.arange(2 * 16 * 24 * 3, dtype=jnp.float32).reshape(2, 16, 24, 3)
        p = space_to_depth(x, 8)
        assert p.shape == (2, 2, 3, 8 * 8 * 3)
        np.testing.assert_array_equal(depth_to_space(p, 8, 3), x)

    @pytest.mark.parametrize(
        "ksize,ci,co,block",
        [(5, 2, 4, 8), (3, 4, 4, 4), (7, 2, 2, 8), (5, 2, 4, 4),
         (5, 2, 4, 2), (3, 2, 4, 2)],
    )
    def test_packed_conv_equals_original(self, ksize, ci, co, block):
        with jax.enable_x64(True):
            rng = np.random.default_rng(0)
            H, W = 2 * block, 3 * block
            x = jnp.asarray(rng.normal(size=(2, H, W, ci)))
            k = jnp.asarray(rng.normal(size=(ksize, ksize, ci, co)) * 0.3)
            b = jnp.asarray(rng.normal(size=(co,)) * 0.1)
            ref = _conv(x, k, b)
            out_p = _conv(
                space_to_depth(x, block), pack_conv_kernel(k, block),
                pack_bias(b, block),
            )
            out = depth_to_space(out_p, block, co)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), rtol=1e-10, atol=1e-10
            )

    def test_packable_gate(self):
        assert packable(256, 320, 5, 8)
        assert not packable(250, 320, 5, 8)
        assert not packable(256, 320, 21, 8)  # p > b


class TestPackedScan:
    @pytest.mark.parametrize("block", [4, 8])
    def test_packed_arsnn_matches_unpacked_x64(self, block):
        from eas_snn_tpu.models.embedding import ARSNNEmbedding

        with jax.enable_x64(True):
            x = jnp.asarray(
                np.random.default_rng(3).poisson(
                    0.3, size=(2, 1, 4, 16, 24, 2)
                ).astype(np.float64)
            )
            kw = dict(ksize=5, depth=2, Ts=3, readout="sum",
                      spike_attach=True, write_zero=True, thresh=1.0,
                      vreset=None)
            base = ARSNNEmbedding(**kw)
            packed = ARSNNEmbedding(packed="auto", packed_block=block, **kw)
            variables = base.init(jax.random.PRNGKey(0), x)
            a = base.apply(variables, x)
            b = packed.apply(variables, x)
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-8
            )

            # gradients flow and agree through the packed path
            mix = jnp.asarray(
                np.random.default_rng(4).normal(size=a.shape)
            )
            ga = jax.grad(
                lambda p: (base.apply({"params": p}, x) * mix).sum()
            )(variables["params"])
            gb = jax.grad(
                lambda p: (packed.apply({"params": p}, x) * mix).sum()
            )(variables["params"])
            for kname in ga:
                np.testing.assert_allclose(
                    np.asarray(gb[kname]), np.asarray(ga[kname]),
                    rtol=1e-7, atol=1e-8, err_msg=kname,
                )

    def test_packed_falls_back_on_bad_geometry(self):
        from eas_snn_tpu.models.embedding import ARSNNEmbedding

        x = jnp.asarray(
            np.random.default_rng(5).poisson(0.3, size=(1, 1, 3, 10, 12, 2))
            .astype(np.float32)
        )
        m = ARSNNEmbedding(packed="auto", ksize=5, depth=1, Ts=2)
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)  # 10 % 8 != 0 -> unpacked path
        assert out.shape == (2, 1, 10, 12, 2)
