"""The measured deployment config is a PRODUCT config, not a bench script.

Round-3 review finding: bench.py hand-built `state_dtype='bfloat16',
packed='auto'` while the exp system had no `embedding_state_dtype` knob at
all, so a user of `tools/eval_event.py` could not reach the headline
numbers. These tests pin the fix: the eval CLI's `--fp16` path
(exp.tpu_deploy()) constructs EXACTLY the module bench.py measures, and
every deploy knob is a mergeable exp field (reference counterpart: the
`--fp16` eval switch, reference tools/eval_event.py:66,
event_evaluator.py:141-144).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eas_snn_tpu.exp import EventExp, get_exp


class TestDeployConfigIsProduct:
    def test_eval_cli_config_equals_bench_config(self):
        """get_exp('gen1_syolox_m').tpu_deploy().get_model() — the exact
        construction in bench.py — equals the module the eval CLI builds
        under --fp16 (same code path by design; this test fails if either
        side drifts)."""
        bench_model = get_exp(exp_name="gen1_syolox_m").tpu_deploy().get_model()

        # simulate `tools/eval_event.py -n gen1_syolox_m --fp16`
        cli_exp = get_exp(exp_name="gen1_syolox_m")
        cli_exp.tpu_deploy()
        cli_model = cli_exp.get_model()

        # EASYOLOX is a flax dataclass: == compares every config field
        assert cli_model == bench_model

    def test_bench_py_uses_the_exp_path(self):
        """bench.py must construct its model through get_exp + tpu_deploy
        (source-level pin: no hand-rolled kwargs drift)."""
        bench_src = open(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "bench.py")
        ).read()
        assert "gen1_syolox_m" in bench_src
        assert "tpu_deploy()" in bench_src

    def test_tpu_deploy_sets_measured_knobs(self):
        exp = EventExp()
        out = exp.tpu_deploy()
        assert out is exp
        assert exp.compute_dtype == "bfloat16"
        assert exp.embedding_state_dtype == "bfloat16"
        assert exp.packed_embedding == "auto"

    def test_embedding_state_dtype_is_mergeable(self):
        """The CLI override MIGRATION.md documents must not assert
        (round-3 finding: `merge` rejected the key)."""
        exp = EventExp()
        exp.merge(["embedding_state_dtype", "bfloat16"])
        assert exp.embedding_state_dtype == "bfloat16"
        exp.merge(["packed_embedding", "auto", "compute_dtype", "bfloat16"])
        model = exp.get_model()
        assert model.embedding_state_dtype == "bfloat16"
        assert model.packed_embedding == "auto"

    def test_deploy_model_runs_and_matches_shapes(self):
        """The deployed module forward-runs on CPU at a tiny geometry and
        produces the same output shape as the f32 path."""
        import jax
        import jax.numpy as jnp

        exp = get_exp(exp_name="gen1_syolox_m")
        exp.depth, exp.width = 0.33, 0.125
        exp.test_size = (64, 64)
        f32_model = exp.get_model()
        dep_model = exp.tpu_deploy().get_model()

        ev = jnp.asarray(
            np.random.default_rng(0).poisson(0.2, (2, 1, exp.Tm, 64, 64, 2))
            .astype(np.float32)
        )
        rng = jax.random.PRNGKey(0)
        v32 = f32_model.init(rng, ev, train=False)
        out32 = f32_model.apply(v32, ev, train=False)
        # identical param tree (deploy changes compute, not parameters)
        vdep = dep_model.init(rng, ev, train=False)
        s32 = jax.tree_util.tree_map(lambda a: a.shape, v32)
        sdep = jax.tree_util.tree_map(lambda a: a.shape, vdep)
        assert s32 == sdep
        outdep = dep_model.apply(v32, ev, train=False)
        assert outdep.shape == out32.shape
        assert np.isfinite(np.asarray(outdep, np.float32)).all()

    def test_record_falls_back_to_scan_path_in_deploy_config(self):
        """record=True diagnostics work under the deployment config: the
        packed/fused paths transparently defer to the XLA scan, which
        supports recording (round-3 review item 5; reference
        yolox/models/embedding.py:198-224)."""
        import jax
        import jax.numpy as jnp

        from eas_snn_tpu.models.embedding import ARSNNEmbedding

        emb = ARSNNEmbedding(
            ksize=5, depth=2, Ts=2, readout="sum", write_zero=True,
            thresh=1.0, vreset=None, spike_fn="atan", alpha=2.0,
            state_dtype="bfloat16", packed="auto",
        )
        ev = jnp.asarray(
            np.random.default_rng(1).poisson(0.3, (3, 2, 1, 32, 32, 2))
            .astype(np.float32).transpose(1, 2, 0, 3, 4, 5)
        )  # (B=2, Tl=1, Tm=3, H, W, C)
        rng = jax.random.PRNGKey(0)
        variables = emb.init(rng, ev)
        agg, records = emb.apply(variables, ev, record=True)
        assert agg.shape == (2, 2, 32, 32, 2)  # (Ts, B, H, W, C)
        assert records is not None
