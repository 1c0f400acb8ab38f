"""Training loop driver.

(reference: yolox/core/trainer.py:36-419 Trainer — here the per-iteration
work is one jit-compiled ``train_step`` (grads + optax update + EMA fused in
one XLA program; no GradScaler because bf16 on TPU needs no loss scaling, no
``reset_net`` because neuron state is functional), batches are placed with
``device_put`` against the data-parallel sharding while the previous step
runs (the prefetch overlap the reference gets from its CUDA-stream
DataPrefetcher), and checkpoints go through Orbax.)
"""

from __future__ import annotations

import datetime
import os
import time
from typing import Optional

import numpy as np

from ..utils.logger import setup_logger
from ..utils.metric import MeterBuffer, hbm_usage_gb
from ..utils.tracking import MetricsTracker
from .checkpoint import CheckpointManager
from .train_state import create_train_state, train_step

__all__ = ["Trainer"]

_MS_JIT = None


def _ms_resize_jit(e, t, h2: int, w2: int):
    import jax
    import jax.numpy as jnp

    b, tl, tm, h, w, c = e.shape
    e2 = jax.image.resize(e, (b, tl, tm, h2, w2, c), "nearest")
    sx, sy = w2 / w, h2 / h
    scale = jnp.asarray([1.0, sx, sy, sx, sy], t.dtype)
    return e2, t * scale


def _multiscale_resize(events, targets, size):
    """Device-side nearest resize of a (B, Tl, Tm, H, W, C) batch to a new
    (H', W') plus the matching cxcywh label rescale (reference
    exp/event_yolox_base.py:337-351 random_resize + preprocess). One
    compile per distinct target size (module-level jit cache)."""
    import jax

    global _MS_JIT
    h2, w2 = size
    if events.shape[3:5] == (h2, w2):
        return events, targets
    if "_MS_JIT" not in globals() or _MS_JIT is None:
        _MS_JIT = jax.jit(_ms_resize_jit, static_argnums=(2, 3))
    return _MS_JIT(events, targets, h2, w2)


class Trainer:
    def __init__(self, exp, args):
        import jax

        self.exp = exp
        self.args = args
        self.rank = jax.process_index()
        self.world_size = jax.process_count()
        self.max_epoch = exp.max_epoch
        self.input_size = exp.input_size
        self.best_ap = 0.0
        self.meter = MeterBuffer(window_size=exp.print_interval)
        self.file_name = os.path.join(exp.output_dir, getattr(args, "experiment_name", None) or exp.exp_name)
        if self.rank == 0:
            os.makedirs(self.file_name, exist_ok=True)
        self.logger = setup_logger(self.file_name, self.rank)
        self.tracker = MetricsTracker(
            self.file_name,
            enabled=(self.rank == 0),
            backend=getattr(args, "logger", "auto") or "auto",
            run_config={
                k: v for k, v in vars(exp).items()
                if isinstance(v, (int, float, str, bool, type(None)))
            },
        )
        self.use_l1 = False
        self.no_aug = False

    # ------------------------------------------------------------------
    def train(self):
        self.before_train()
        try:
            for self.epoch in range(self.start_epoch, self.max_epoch):
                self.before_epoch()
                self.train_in_iter()
                self.after_epoch()
        finally:
            self.after_train()

    # ------------------------------------------------------------------
    def before_train(self):
        import jax
        import jax.numpy as jnp

        from ..parallel import data_parallel_shardings, make_mesh

        exp, args = self.exp, self.args
        self.logger.info(f"args: {vars(args) if args else {}}")
        self.logger.info(f"exp value:\n{exp}")

        batch_size = args.batch_size
        self.batch_size = batch_size
        self.model = exp.get_model()

        self.train_loader = exp.get_data_loader(
            batch_size=batch_size, training=True,
        )
        self.iters_per_epoch = getattr(
            exp, "iters_per_epoch", None
        ) or max(len(self.train_loader.dataset) // batch_size, 1)

        # device-binning path: build the binner BEFORE model.init so the
        # init sample can be binned (raw-events loaders yield tuples of
        # (B, Tl, N) arrays, not frame tensors)
        self._bin = None
        if getattr(exp, "device_binning", False):
            from functools import partial

            from ..data.reps import bin_event_batch

            h, w = exp.input_size
            self._bin = jax.jit(
                partial(bin_event_batch, n_bins=exp.Tm, height=h, width=w)
            )

        # sample batch for init
        self._loader_iter = iter(self.train_loader)
        frames, labels, _, _ = next(self._loader_iter)
        if isinstance(frames, tuple):
            sample_e = self._bin(*(jnp.asarray(a[:1]) for a in frames))
        else:
            sample_e = jnp.asarray(frames[:1])
        sample_t = jnp.asarray(labels[:1])

        rng = jax.random.PRNGKey(exp.seed or 0)
        # params needed for optimizer masks: init first (jitted — eager
        # init dispatches each tiny op separately, which is minutes over
        # the axon tunnel), then reuse the same variables for the state.
        variables = jax.jit(
            self.model.init, static_argnames=("train",)
        )(rng, sample_e, sample_t, train=True)
        tx = exp.get_optimizer(
            variables["params"], batch_size, iters_per_epoch=self.iters_per_epoch
        )
        self.state = create_train_state(
            self.model, rng, sample_e, sample_t, tx, use_ema=exp.ema,
            variables=variables,
        )
        self.lr_schedule = exp.get_lr_schedule(batch_size, self.iters_per_epoch)

        self.mesh = make_mesh()
        self.batch_sharding, self.repl_sharding = data_parallel_shardings(self.mesh)
        self.state = jax.device_put(self.state, self.repl_sharding)

        self.ckpt = CheckpointManager(os.path.join(self.file_name, "ckpt"))
        self.start_epoch = 0
        if getattr(self.args, "resume", False):
            self.state, self.best_ap = self.ckpt.restore(self.state)
            self.start_epoch = int(self.state.step) // self.iters_per_epoch
            self.logger.info(
                f"resumed at step {int(self.state.step)} "
                f"(epoch {self.start_epoch}), best_ap {self.best_ap:.4f}"
            )
        elif getattr(self.args, "ckpt", None):
            # fine-tune: shape-checked partial load of model weights only
            # (reference trainer.py:346-352 'loading checkpoint for fine
            # tuning' via utils/checkpoint.py:11-33)
            from ..models.build import load_weights

            variables = {
                "params": self.state.params,
                "batch_stats": self.state.batch_stats,
            }
            new_vars, report = load_weights(variables, self.args.ckpt)
            self.state = self.state.replace(
                params=new_vars["params"],
                batch_stats=new_vars.get(
                    "batch_stats", self.state.batch_stats
                ),
            )
            self.state = jax.device_put(self.state, self.repl_sharding)
            self.logger.info(
                f"fine-tune init from {self.args.ckpt}: {report}"
            )

        self.evaluator = None
        # multiscale training: bounded size set, same seeded choice on all
        # hosts (replaces the reference's rank-0 broadcast,
        # exp/event_yolox_base.py:333-335); each size compiles once.
        self._ms_interval = getattr(exp, "multiscale_interval", 0)
        if self._ms_interval:
            h, w = exp.input_size
            r = exp.multiscale_range
            self._ms_sizes = [
                (h + 32 * k, w + 32 * k) for k in range(-r, r + 1)
                if h + 32 * k > 0 and w + 32 * k > 0
            ]
            self._ms_rng = np.random.default_rng(exp.seed or 0)
            self._ms_size = (h, w)
        # conv FLOPs/frame for MFU reporting (reference get_model_info ≙
        # thop; here the 'sops' accounting collection, model_info.py)
        self._flops_per_frame = None
        try:
            from ..evaluators.energy import conv_macs_per_frame

            self._flops_per_frame = 2.0 * conv_macs_per_frame(
                self.model, tuple(sample_e.shape)
            )
            self.logger.info(
                f"model: {self._flops_per_frame / 1e9:.2f} conv GFLOPs/frame"
            )
        except Exception as e:  # accounting must never block training
            self.logger.info(f"flops accounting unavailable: {e}")

        self.logger.info(
            f"devices: {jax.device_count()} "
            f"({jax.local_device_count()} local), mesh: {self.mesh}"
        )
        self.logger.info("training starts...")

    def _put(self, frames, labels):
        import jax
        import jax.numpy as jnp

        if isinstance(frames, tuple):  # raw-events mode: bin on device
            parts = [
                jax.device_put(jnp.asarray(a), self.batch_sharding)
                for a in frames
            ]
            events = self._bin(*parts)  # (B, Tl, Tm, H, W, 2)
            return (
                events,
                jax.device_put(jnp.asarray(labels), self.batch_sharding),
            )
        return (
            jax.device_put(jnp.asarray(frames), self.batch_sharding),
            jax.device_put(jnp.asarray(labels), self.batch_sharding),
        )

    def before_epoch(self):
        if (
            self.exp.no_aug_epochs > 0
            and self.epoch >= self.max_epoch - self.exp.no_aug_epochs
            and not self.no_aug
        ):
            # reference trainer.py:228-241: the tail closes *mosaic* and
            # adds L1 — the per-sample train transform stays on, so event
            # datasets keep their random aug and only RGB mosaic/mixup stop.
            self.logger.info("--->no-aug phase: closing mosaic, adding L1")
            self.no_aug = True
            self.use_l1 = True
            ds = self.train_loader.dataset
            if hasattr(ds, "close_mosaic"):
                ds.close_mosaic()
            for attr in ("mosaic_prob", "mixup_prob"):
                if hasattr(ds, attr):
                    setattr(ds, attr, 0.0)

    def train_in_iter(self):
        import jax

        # --profile N: capture a jax.profiler device trace of N steady-state
        # iterations into <run_dir>/profile (reference has no real profiler;
        # SURVEY §5.1 names this as the TPU-native upgrade)
        profile_n = int(getattr(self.args, "profile", 0) or 0)
        # skip the compile-heavy first iter when there is more than one
        profile_start = min(1, self.iters_per_epoch - 1)
        profiling = False
        for it in range(self.iters_per_epoch):
            if profile_n and self.epoch == self.start_epoch:
                if it == profile_start and not profiling:
                    jax.profiler.start_trace(
                        os.path.join(self.file_name, "profile")
                    )
                    profiling = True
                elif profiling and it == profile_start + profile_n:
                    jax.profiler.stop_trace()
                    profiling = False
                    self.logger.info(
                        f"profiler trace ({profile_n} iters) -> "
                        f"{self.file_name}/profile"
                    )
            iter_start = time.perf_counter()
            frames, labels, _, _ = next(self._loader_iter)
            data_end = time.perf_counter()
            events, targets = self._put(frames, labels)
            if self._ms_interval:
                if it % self._ms_interval == 0:
                    self._ms_size = self._ms_sizes[
                        int(self._ms_rng.integers(len(self._ms_sizes)))
                    ]
                events, targets = _multiscale_resize(
                    events, targets, self._ms_size
                )
            self.state, metrics = train_step(
                self.state, events, targets, use_l1=self.use_l1,
                ema_decay=0.9998,
            )
            self.progress_in_iter = self.epoch * self.iters_per_epoch + it
            if (it + 1) % self.exp.print_interval == 0:
                metrics = {k: float(v) for k, v in metrics.items()}
                iter_end = time.perf_counter()
                self.meter.update(
                    iter_time=iter_end - iter_start,
                    data_time=data_end - iter_start,
                    lr=float(self.lr_schedule(self.state.step)),
                    **metrics,
                )
                self._log_iter(it)
                self.tracker.log(int(self.state.step), metrics)
        if profiling:
            jax.profiler.stop_trace()
            self.logger.info(
                f"profiler trace (epoch end, < {profile_n} iters) -> "
                f"{self.file_name}/profile"
            )

    # MFU is a lower bound (conv MACs only, 3x fwd approximation for
    # fwd+bwd); peak constant shared with the bench tooling
    from ..utils.benchmarks import V5E_BF16_PEAK as _PEAK_FLOPS

    def _mfu_str(self) -> str:
        import jax

        if not self._flops_per_frame or "iter_time" not in self.meter:
            return ""
        it_s = self.meter["iter_time"].avg
        if it_s <= 0:
            return ""
        # batch_size is the GLOBAL batch and iter_time covers a step across
        # all devices, so normalize peak by device count: this is per-chip
        # MFU (the fleet-meaningful number), not per-run.
        mfu = (
            3.0 * self._flops_per_frame * self.batch_size / it_s
            / (self._PEAK_FLOPS * jax.device_count())
        )
        return f"mfu/chip: {100 * mfu:.1f}%, "

    def _log_iter(self, it):
        left_iters = (
            self.iters_per_epoch * self.max_epoch - (self.progress_in_iter + 1)
        )
        eta = datetime.timedelta(
            seconds=int(left_iters * self.meter["iter_time"].avg)
        )
        loss_str = ", ".join(
            f"{k}: {v.latest:.3f}"
            for k, v in self.meter.items()
            if "loss" in k or k == "num_fg"
        )
        self.logger.info(
            f"epoch: {self.epoch + 1}/{self.max_epoch}, "
            f"iter: {it + 1}/{self.iters_per_epoch}, "
            f"hbm: {hbm_usage_gb():.1f}GiB, "
            f"iter_time: {self.meter['iter_time'].avg:.3f}s, "
            f"data_time: {self.meter['data_time'].avg:.3f}s, "
            f"{self._mfu_str()}"
            f"{loss_str}, "
            f"lr: {self.meter['lr'].latest:.3e}, "
            f"ETA: {eta}"
        )

    def after_epoch(self):
        self.save_ckpt()
        if (self.epoch + 1) % self.exp.eval_interval == 0:
            self.evaluate_and_save_model()

    def evaluate_and_save_model(self):
        import jax

        if self.evaluator is None:
            self.evaluator = self.exp.get_evaluator(
                batch_size=self.batch_size
            )
        state = self.state

        def forward_fn(frames):
            import jax.numpy as jnp

            from .train_state import eval_step

            return eval_step(state, jnp.asarray(frames), use_ema=self.exp.ema)

        ap, ap50, summary = self.evaluator.evaluate(forward_fn)
        update_best = ap > self.best_ap
        self.best_ap = max(self.best_ap, ap)
        self.logger.info(
            f"epoch {self.epoch + 1} eval: AP={ap:.4f} AP50={ap50:.4f} "
            f"(best {self.best_ap:.4f})\n{summary}"
        )
        self.tracker.log(
            int(self.state.step), {"AP50_95": ap, "AP50": ap50}, split="val"
        )
        self._log_pred_images(forward_fn)
        self.save_ckpt(update_best)

    def _log_pred_images(self, forward_fn):
        """Render NMS'd detections on the first eval batch into the run
        dir / TB / wandb (reference: WandbLogger's val prediction panel,
        yolox/utils/logger.py:320-385). ``EAS_LOG_PRED_IMAGES=0``
        disables."""
        if self.rank != 0 or os.environ.get(
                "EAS_LOG_PRED_IMAGES", "1") == "0":
            return
        try:
            import numpy as np

            from ..ops.boxes import postprocess_numpy

            frames, labels, img_sizes, ids = next(iter(
                self.evaluator.dataloader))
            outputs = np.asarray(forward_fn(frames))
            dets = postprocess_numpy(
                outputs, self.exp.num_classes, self.exp.test_conf,
                self.exp.nmsthre,
            )
            names = getattr(self.evaluator, "class_names", None) or tuple(
                str(i) for i in range(self.exp.num_classes))
            self.tracker.log_pred_images(
                int(self.state.step), np.asarray(frames), dets,
                class_names=names,
            )
        except Exception as e:  # logging must never kill the run
            self.logger.info(f"pred-image logging skipped: {e}")

    def save_ckpt(self, is_best: bool = False):
        if self.rank != 0:
            return
        self.ckpt.save(
            int(self.state.step), self.state, best_ap=self.best_ap,
            is_best=is_best,
        )
        if is_best and self._wandb_artifacts():
            self.tracker.log_artifact(
                self.ckpt.best_dir, name="best_ckpt", kind="model"
            )

    def _wandb_artifacts(self) -> bool:
        # checkpoint artifacts follow the reference's opt-in
        # (WandbLogger save_dir / log_checkpoints flag)
        return (
            self.tracker._wandb is not None
            and hasattr(self.ckpt, "best_dir")
            and os.environ.get("EAS_WANDB_ARTIFACTS", "0") == "1"
        )

    def after_train(self):
        self.logger.info(
            f"training done, best AP: {self.best_ap:.4f}"
        )
        self.tracker.close()
        if getattr(self.args, "grid_search", False):
            # grid-search CSV row (reference trainer.py:205-226)
            import csv
            import sys

            path = os.path.join(self.exp.output_dir, "grid_search.csv")
            with open(path, "a", newline="") as f:
                csv.writer(f).writerow(
                    [self.best_ap, self.file_name, " ".join(sys.argv)]
                )
