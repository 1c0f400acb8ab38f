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


def test_streaming_equals_batch_path_on_shared_window(rng):
    """The StreamingDetector's full device pipeline (padded scatter binning,
    nearest letterbox, model forward, NMS, scale-back) must numerically
    equal the BATCH eval path built on the dataset-side ``micro_sum``
    binning of the same window (the window re-read the streaming mode
    replaces — reference gen1.py:115-137)."""
    import jax
    import jax.numpy as jnp

    from eas_snn_tpu.data.reps import micro_sum
    from eas_snn_tpu.models import EASYOLOX
    from eas_snn_tpu.ops.boxes import postprocess_numpy

    Tm = 3
    img_hw = (48, 64)       # raw sensor
    in_hw = (32, 64)        # model input
    model = EASYOLOX(
        num_classes=2, depth=0.33, width=0.125, use_spike="backbone",
        T=2, Ts=2, embedding="arsnn", embedding_ksize=3,
    )
    sample = jnp.zeros((1, 1, Tm, in_hw[0], in_hw[1], 2))
    variables = model.init(jax.random.PRNGKey(0), sample, train=False)

    det = StreamingDetector(
        model, variables, img_size=img_hw, input_size=in_hw, Tm=Tm,
        window_us=100_000, max_events=4096, num_classes=2,
        confthre=1e-4, nmsthre=0.65,
    )
    ev = make_packet(rng, 1500, 0, 100_000, h=img_hw[0], w=img_hw[1])
    det.push(ev)
    out_stream = det.detect()

    # ---- batch path on the identical window ----
    # identical windowing convention: t0 = first event, tw = span // Tm
    frames = micro_sum(ev, Tm, img_hw[0], img_hw[1])  # (Tm, H, W, 2)
    scale = min(in_hw[0] / img_hw[0], in_hw[1] / img_hw[1])
    ih, iw = int(img_hw[0] * scale), int(img_hw[1] * scale)
    fh = jax.image.resize(
        jnp.asarray(frames, jnp.float32), (Tm, ih, iw, 2), "nearest")
    canvas = jnp.zeros((Tm, in_hw[0], in_hw[1], 2), jnp.float32)
    canvas = canvas.at[:, :ih, :iw].set(fh)
    outputs = np.asarray(jax.jit(
        lambda b: model.apply(variables, b, train=False)
    )(canvas[None, None]))
    dets = postprocess_numpy(outputs, 2, 1e-4, 0.65)[0]
    out_batch = None if dets is None else dets.copy()
    if out_batch is not None:
        out_batch[:, :4] /= scale

    if out_stream is None or out_batch is None:
        assert out_stream is None and out_batch is None
    else:
        assert out_stream.shape == out_batch.shape
        np.testing.assert_allclose(out_stream, out_batch, rtol=1e-5,
                                   atol=1e-5)
