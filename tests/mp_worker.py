"""Real multi-process DP worker (driven by tests/test_multiprocess.py).

Each OS process runs this script: CPU backend with ONE local device, gloo
cross-process collectives, real ``jax.distributed.initialize`` rendezvous
through the framework's own ``initialize_distributed`` seam, one donated DP
train step over the global mesh, and the evaluator's real
``process_allgather`` row gather. Process 0 writes an npz with the loss,
updated params, and gathered rows; the test compares a 2-process run
against a 1-process baseline elementwise.

(reference counterpart: the torch launch path this replaces —
yolox/core/launch.py:101-147 `_distributed_worker` + utils/dist.py:195-274
`all_gather`.)

Usage: python mp_worker.py <process_id> <num_processes> <port> <out.npz>
"""

import os
import sys


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, out_path = sys.argv[3], sys.argv[4]

    # one CPU device per process; must be pinned before the backend exists
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")  # the axon plugin forces itself
    if nproc > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from eas_snn_tpu.parallel import (
        data_parallel_shardings,
        initialize_distributed,
        make_mesh,
    )

    # THE seam under test: real rendezvous (no-op when nproc == 1)
    initialize_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc if nproc > 1 else None,
        process_id=pid,
    )
    assert jax.process_count() == nproc, (jax.process_count(), nproc)
    assert len(jax.devices()) == nproc, jax.devices()

    from eas_snn_tpu.utils.jax_cache import enable_compilation_cache

    # PER-RANK cache dir: with a shared cache, the rank that compiles
    # second cache-hits programs the first just wrote and races ahead —
    # on a 1-core host that skews collective arrival past gloo's 30 s
    # context-init deadline (observed: GetKeyValue() DEADLINE_EXCEEDED).
    # Separate caches make both ranks pay the same compile bill, so the
    # fair scheduler keeps them within seconds of each other.
    enable_compilation_cache(
        os.path.expanduser(f"~/.cache/eas_snn_tpu_xla_mp{pid}")
    )

    if nproc > 1:
        # establish the gloo context while skew is only process-launch
        # seconds (not minutes of compile), and pay its one-time
        # connectFullMesh here rather than inside the timed phases below
        from jax.experimental import multihost_utils

        import numpy as _np

        multihost_utils.process_allgather(_np.zeros(3))

    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_model
    from eas_snn_tpu.core import build_lr_schedule, build_optimizer
    from eas_snn_tpu.core.train_state import create_train_state, train_step
    from eas_snn_tpu.evaluators.event_evaluator import _allgather_rows

    # same tiny geometry as dryrun_multichip (identical across processes)
    T = Ts = 2
    Tm = 3
    B, H, W = 2, 64, 64
    model = _build_model(depth=0.33, width=0.125, T=T, Ts=Ts, Tm=Tm)
    host_events = np.random.default_rng(0).normal(
        size=(B, 1, Tm, H, W, 2)
    ).astype(np.float32)
    host_targets = np.zeros((B, 10, 5), np.float32)
    host_targets[:, 0] = [0, 32, 32, 16, 16]

    rng = jax.random.PRNGKey(0)
    sample_e = jnp.asarray(host_events[:1])
    sample_t = jnp.asarray(host_targets[:1])
    sched = build_lr_schedule("yoloxwarmcos", 1e-3, 10, 10, warmup_epochs=1)
    variables = jax.jit(model.init, static_argnames=("train",))(
        rng, sample_e, sample_t, train=True
    )
    tx = build_optimizer(variables["params"], sched, weight_decay=5e-4)
    state = create_train_state(
        model, rng, sample_e, sample_t, tx, variables=variables
    )

    mesh = make_mesh()
    batch_sh, repl_sh = data_parallel_shardings(mesh)
    state = jax.device_put(state, repl_sh)
    per = B // nproc
    events = jax.make_array_from_process_local_data(
        batch_sh, host_events[pid * per:(pid + 1) * per], host_events.shape
    )
    targets = jax.make_array_from_process_local_data(
        batch_sh, host_targets[pid * per:(pid + 1) * per], host_targets.shape
    )

    new_state, metrics = train_step(state, events, targets)
    loss = float(metrics["total_loss"])

    # the evaluator's real cross-process gather, with UNEQUAL row counts
    rows = (pid + 1) * 100.0 + np.arange(
        (3 + 2 * pid) * 7, dtype=np.float64
    ).reshape(3 + 2 * pid, 7)
    gathered = _allgather_rows(rows)

    if pid == 0:
        # params are replicated: fully addressable from process 0
        flat, _ = jax.tree_util.tree_flatten(jax.device_get(new_state.params))
        np.savez(
            out_path,
            loss=np.float64(loss),
            num_fg=np.float64(metrics["num_fg"]),
            gathered=gathered,
            **{f"p{i}": np.asarray(a, np.float64) for i, a in enumerate(flat)},
        )
        print("WORKER0_DONE", flush=True)


if __name__ == "__main__":
    main()
