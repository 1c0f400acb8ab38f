#!/usr/bin/env python3
"""Training CLI.

(reference: tools/train_event.py:24-162 — same surface: exp by name/file,
batch size, resume, free-form ``key value`` overrides. The reference's
multi-process launch/NCCL knobs are replaced by JAX multi-host flags:
on TPU pods each host runs this same script and
``jax.distributed.initialize`` discovers the topology.)

Example (synthetic smoke):
    python tools/train_event.py -f exps/default/e_yolox_s.py -b 8 \
        data_name gen1 data_dir /data/gen1 max_epoch 30
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser("eas_snn_tpu train")
    parser.add_argument("-expn", "--experiment-name", type=str, default=None)
    parser.add_argument("-n", "--name", type=str, default=None, help="exp name")
    parser.add_argument("-f", "--exp_file", type=str, default=None)
    parser.add_argument("-b", "--batch-size", type=int, default=64)
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("-c", "--ckpt", type=str, default=None,
                        help="fine-tune checkpoint (shape-checked partial load)")
    parser.add_argument("--grid_search", action="store_true")
    parser.add_argument(
        "--fp16", "--bf16", dest="fp16", action="store_true",
        help="TPU deployment precision (exp.tpu_deploy(): bf16 compute + "
             "bf16 sampler state + packed sampler convs; the differentiable "
             "counterpart of the reference's --fp16 mixed-precision train, "
             "reference tools/train_event.py:68-69)",
    )
    parser.add_argument(
        "-l", "--logger", type=str, default="auto",
        choices=["auto", "jsonl", "tensorboard", "wandb"],
        help="metrics backend (JSONL always written; 'auto' adds every "
             "importable backend, reference tools/train_event.py --logger)",
    )
    parser.add_argument("--profile", type=int, default=0,
                        help="capture a jax.profiler trace of N iterations")
    parser.add_argument("--num_processes", type=int, default=None,
                        help="multi-host process count (jax.distributed)")
    parser.add_argument("--coordinator", type=str, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument(
        "opts", nargs=argparse.REMAINDER, default=None,
        help="free-form 'key value' config overrides",
    )
    return parser


def main():
    args = make_parser().parse_args()

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from eas_snn_tpu.exp import get_exp
    from eas_snn_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    exp = get_exp(args.exp_file, args.name)
    if args.fp16:
        exp.tpu_deploy()  # before merge: explicit 'key value' opts still win
    if args.opts:
        exp.merge(args.opts)
    exp.check_exp_value()

    trainer = exp.get_trainer(args)
    trainer.train()


if __name__ == "__main__":
    main()
