"""Streaming inference: rolling buffer semantics + end-to-end detect on a
tiny model."""

import numpy as np

from eas_snn_tpu.data.psee_io import EVENT_DTYPE
from eas_snn_tpu.inference import StreamingDetector


def make_packet(rng, n, t0, t1, h=48, w=64):
    ev = np.empty(n, EVENT_DTYPE)
    ev["t"] = np.sort(rng.integers(t0, t1, n))
    ev["x"] = rng.integers(0, w, n)
    ev["y"] = rng.integers(0, h, n)
    ev["p"] = rng.integers(0, 2, n)
    return ev


def test_streaming_detector(rng):
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.models import EASYOLOX

    model = EASYOLOX(
        num_classes=2, depth=0.33, width=0.125, use_spike="backbone",
        T=2, Ts=2, embedding="arsnn", embedding_ksize=3,
    )
    sample = jnp.zeros((1, 1, 3, 32, 64, 2))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)

    det = StreamingDetector(
        model, variables,
        img_size=(48, 64), input_size=(32, 64), Tm=3,
        window_us=100_000, max_events=4096, num_classes=2,
        confthre=0.0001,
    )
    # push several packets; buffer keeps only the trailing window
    for k in range(5):
        det.push(make_packet(rng, 500, k * 50_000, (k + 1) * 50_000))
    assert len(det._buf) > 0
    newest = int(det._buf["t"][-1])
    assert int(det._buf["t"][0]) >= newest - 100_000

    out = det.detect()
    # random weights: just require a well-formed result (None or (n, 7))
    assert out is None or (out.ndim == 2 and out.shape[1] == 7)

    # empty-window detect
    out2 = det.detect(t_now=10**9)
    assert out2 is None or out2.shape[1] == 7
