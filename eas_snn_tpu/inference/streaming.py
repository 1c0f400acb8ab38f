"""Streaming event-camera inference.

An extension beyond the reference (SURVEY.md §5.7): the reference always
re-reads and re-bins a full look-back window per detection
(gen1.py:115-137). Here a ``StreamingDetector`` consumes raw event packets
incrementally, keeps a rolling host-side buffer, bins the current window
**on device** (one fused XLA scatter-add, reps.bin_events_device), runs the
jitted detector, and NMS-decodes — so per-detection host work is O(new
events), not O(window).

All device computation is fixed-shape (padded event budget + static frame
geometry): one compilation, reused for every call.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..data.psee_io import EVENT_DTYPE
from ..data.reps import bin_events_device
from ..ops.boxes import postprocess_numpy

__all__ = ["StreamingDetector"]


class StreamingDetector:
    def __init__(
        self,
        model,
        variables,
        *,
        img_size: Tuple[int, int],      # raw sensor (H, W)
        input_size: Tuple[int, int],    # model input (H, W), /32
        Tm: int = 4,
        window_us: int = 200_000,
        max_events: int = 262_144,
        num_classes: int = 2,
        confthre: float = 0.3,
        nmsthre: float = 0.65,
    ):
        import jax
        import jax.numpy as jnp

        self.model = model
        self.variables = variables
        self.img_size = img_size
        self.input_size = input_size
        self.Tm = Tm
        self.window_us = window_us
        self.max_events = max_events
        self.num_classes = num_classes
        self.confthre = confthre
        self.nmsthre = nmsthre
        self._buf = np.zeros(0, EVENT_DTYPE)
        self._scale = min(
            input_size[0] / img_size[0], input_size[1] / img_size[1]
        )
        ih = int(img_size[0] * self._scale)
        iw = int(img_size[1] * self._scale)
        self._scaled_hw = (ih, iw)

        h, w = input_size

        def run(t, x, y, p, v, t0, tw):
            frames = bin_events_device(
                t, x, y, p, v, t0=t0, time_window=tw, n_bins=self.Tm,
                height=img_size[0], width=img_size[1],
            )
            # device-side letterbox: nearest resize + zero pad (scale is
            # static; boxes decode back with the same scale)
            fh = jax.image.resize(
                frames, (self.Tm, ih, iw, 2), "nearest"
            )
            canvas = jnp.zeros((self.Tm, h, w, 2), frames.dtype)
            canvas = canvas.at[:, :ih, :iw].set(fh)
            batch = canvas[None, None]  # (1, Tl=1, Tm, H, W, 2)
            return self.model.apply(self.variables, batch, train=False)

        self._run = jax.jit(run)

    # ------------------------------------------------------------------
    def push(self, events: np.ndarray) -> None:
        """Append a packet of decoded events (EVENT_DTYPE, time-sorted)."""
        if len(events) == 0:
            return
        self._buf = np.concatenate([self._buf, events])
        # drop everything older than the window behind the newest event
        horizon = int(self._buf["t"][-1]) - self.window_us
        if horizon > 0:
            lo = np.searchsorted(self._buf["t"], horizon)
            self._buf = self._buf[lo:]

    def detect(self, t_now: Optional[int] = None) -> Optional[np.ndarray]:
        """Run detection on the window ending at ``t_now`` (default: newest
        event). Returns (n, 7) [x1, y1, x2, y2, obj, cls_conf, cls] at raw
        sensor resolution, or None."""
        if len(self._buf) == 0:
            return None
        t1 = int(t_now if t_now is not None else self._buf["t"][-1]) + 1
        t0 = t1 - self.window_us
        lo = np.searchsorted(self._buf["t"], t0)
        hi = np.searchsorted(self._buf["t"], t1)
        ev = self._buf[lo:hi]
        if len(ev) == 0:
            return None
        n = min(len(ev), self.max_events)
        ev = ev[len(ev) - n:]
        t = np.zeros(self.max_events, np.int32)
        x = np.zeros(self.max_events, np.int32)
        y = np.zeros(self.max_events, np.int32)
        p = np.zeros(self.max_events, np.int32)
        v = np.zeros(self.max_events, bool)
        t[:n] = ev["t"].astype(np.int64) - t0
        x[:n] = ev["x"]
        y[:n] = ev["y"]
        p[:n] = ev["p"]
        v[:n] = True
        span = int(ev["t"][-1]) - int(ev["t"][0])
        tw = max(span // self.Tm, 1)
        rel0 = int(ev["t"][0]) - t0
        outputs = np.asarray(self._run(t, x, y, p, v, rel0, tw))
        dets = postprocess_numpy(
            outputs, self.num_classes, self.confthre, self.nmsthre
        )[0]
        if dets is None:
            return None
        dets = dets.copy()
        dets[:, :4] /= self._scale
        return dets
