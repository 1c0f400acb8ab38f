#!/usr/bin/env python3
"""Evaluation CLI.

(reference: tools/eval_event.py:24-237 — same surface: exp by name/file,
checkpoint path, ``--eval_proh`` for the Prophesee protocol, ``--speed`` for
a forward-latency report, free-form overrides.)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("eas_snn_tpu eval")
    parser.add_argument("-n", "--name", type=str, default=None)
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-b", "--batch-size", type=int, default=64)
    parser.add_argument("-c", "--ckpt", type=str, default=None,
                        help="checkpoint directory (orbax tree)")
    parser.add_argument("--eval_proh", action="store_true",
                        help="use the Prophesee +/-50ms protocol")
    parser.add_argument(
        "--fp16", "--bf16", dest="fp16", action="store_true",
        help="TPU deployment precision (exp.tpu_deploy(): bf16 compute + "
             "bf16 sampler state + packed sampler convs — the config "
             "bench.py's headline measures; mirrors the reference's --fp16 "
             "half-precision eval, reference tools/eval_event.py:66)",
    )
    parser.add_argument("--speed", action="store_true",
                        help="forward-latency benchmark only")
    parser.add_argument("--energy", action="store_true",
                        help="SOP/energy estimation report")
    parser.add_argument("opts", nargs=argparse.REMAINDER, default=None)
    return parser


def main():
    args = make_parser().parse_args()

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from eas_snn_tpu.exp import get_exp
    from eas_snn_tpu.utils import get_model_info, setup_logger

    logger = setup_logger(None, 0)

    exp = get_exp(args.exp_file, args.name)
    if args.fp16:
        exp.tpu_deploy()  # before merge: explicit 'key value' opts still win
    if args.opts:
        exp.merge(args.opts)
    exp.eval_proph = args.eval_proh

    model = exp.get_model()
    h, w = exp.test_size
    sample = jnp.zeros((1, exp.Tl, exp.Tm, h, w, exp.in_dim), jnp.float32)
    rng = jax.random.PRNGKey(exp.seed or 0)
    variables = model.init(rng, sample, train=False)
    if args.ckpt:
        import orbax.checkpoint as ocp

        from eas_snn_tpu.core.checkpoint import load_partial_params

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(args.ckpt))
        params = restored.get("ema_params") or restored.get("params", restored)
        variables = dict(variables)
        variables["params"] = load_partial_params(variables["params"], params)
        if "batch_stats" in restored:
            variables["batch_stats"] = restored["batch_stats"]
        logger.info(f"loaded checkpoint from {args.ckpt}")

    logger.info(get_model_info(model, variables, sample))

    fwd = jax.jit(lambda v, e: model.apply(v, e, train=False))

    if args.energy:
        from eas_snn_tpu.evaluators import estimate_energy

        # synaptic ops are data-dependent: use event-like Poisson activity,
        # not zeros (reference runs energy estimation over real batches,
        # event_evaluator.py:466-565)
        probe = jnp.asarray(
            np.random.default_rng(0).poisson(
                0.2, (1, exp.Tl, exp.Tm, h, w, exp.in_dim)
            ).astype(np.float32)
        )
        e = estimate_energy(model, variables, probe)
        for k, v in e.items():
            logger.info(f"{k}: {v:.6g}")
        return

    if args.speed:
        # same methodology as bench.py (utils/benchmarks.py): on-device
        # Poisson inputs, forced materialization, depth-1 pipelining —
        # so `eval_event.py --fp16 --speed -b 128` reproduces the headline
        from eas_snn_tpu.utils.benchmarks import device_batches, pipelined_fps

        B = args.batch_size
        batches = device_batches((B, exp.Tl, exp.Tm, h, w, exp.in_dim))
        speed_fwd = jax.jit(
            lambda v, e: (lambda o: (o, o.sum()))(model.apply(v, e, train=False))
        )
        _, s = speed_fwd(variables, batches[0])
        float(s)  # warmup + compile
        t0 = time.perf_counter()
        for i in range(5):
            _, s = speed_fwd(variables, batches[i % len(batches)])
            float(s)
        sync_ms = (time.perf_counter() - t0) / 5 * 1000
        fps = pipelined_fps(lambda e: speed_fwd(variables, e), batches, B)
        logger.info(
            f"forward: {sync_ms:.2f} ms/batch sync ({1000 * B / sync_ms:.1f} "
            f"img/s), pipelined {fps:.1f} img/s"
        )
        return

    evaluator = exp.get_evaluator(batch_size=args.batch_size)
    ap, ap50, summary = evaluator.evaluate(
        lambda frames: np.asarray(fwd(variables, jnp.asarray(frames)))
    )
    logger.info(f"\n{summary}")
    logger.info(f"AP: {ap:.4f}, AP50: {ap50:.4f}")


if __name__ == "__main__":
    main()
