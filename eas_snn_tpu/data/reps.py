"""Event->tensor representation kernels.

Host (numpy) versions of each aggregation the reference datasets support —
``sum`` / ``micro_sum`` polarity histograms (reference:
yolox/data/datasets/gen1.py:333-373), bilinear-in-time **voxel grid**
(yolox/utils/event_reps.py:30-89), **voxel cube** (:92-138), **time
surface** (:141-160, timesurface_measure :13-23) — plus a jittable
**on-device** binning op that replaces CPU ``np.add.at`` with an XLA
scatter-add from padded ``(t, x, y, p)`` arrays (SURVEY.md §7 hard part 5:
bin on device from raw int arrays instead of shipping ~25 MB/sample frame
stacks over PCIe).

Convention: channel-LAST everywhere — a micro-frame stack is
``(Tm, H, W, 2)`` (the reference is channel-first ``(Tm, 2, H, W)``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "polarity_histogram",
    "micro_sum",
    "voxel_grid",
    "voxel_cube",
    "timesurface_measure",
    "timesurface",
    "pad_events",
    "bin_events_device",
    "bin_indexed_events_device",
    "bin_event_batch",
]


# --------------------------------------------------------------------------
# host (numpy) kernels — used by dataset workers and as golden references
# --------------------------------------------------------------------------

def _native_xyp(events: np.ndarray):
    """x/y/p arrays in the native core's u16/u16/u8 layout, or None.

    Datasets with wider fields (NCaltech ATIS decodes to int64) are cast
    when the values fit; anything that would wrap falls back to numpy,
    which raises IndexError on genuinely out-of-frame coordinates.
    """
    xs, ys, ps = events["x"], events["y"], events["p"]
    for arr, want in ((xs, np.uint16), (ys, np.uint16), (ps, np.uint8)):
        if arr.dtype != want and len(arr) and (
            arr.min() < 0 or arr.max() > np.iinfo(want).max
        ):
            return None
    return (
        np.ascontiguousarray(xs, np.uint16),
        np.ascontiguousarray(ys, np.uint16),
        np.ascontiguousarray(ps, np.uint8),
    )


def polarity_histogram(events: np.ndarray, height: int, width: int) -> np.ndarray:
    """2-channel polarity count image (H, W, 2), float32.

    (reference 'sum' aggregation: gen1.py:333-349 — per-polarity bincount
    over flattened pixel indices; a native single-pass core replaces the
    ``np.add.at`` scatter when the toolchain is available — the reference's
    known CPU bottleneck, gen1.py:84)
    """
    if len(events):
        from .fastbin import load_native

        lib = load_native()
        xyp = _native_xyp(events) if lib is not None else None
        if xyp is not None:
            out = np.zeros((2, height * width), np.float32)
            lib.polarity_histogram(
                len(events), *xyp, height, width, out,
            )
            return np.moveaxis(
                out.reshape(2, height, width), 0, -1
            ).copy()
    out = np.zeros((height * width, 2), np.float32)
    if len(events):
        idx = events["y"].astype(np.int64) * width + events["x"].astype(np.int64)
        p = events["p"].astype(np.int64) & 1
        np.add.at(out, (idx, p), 1.0)
    return out.reshape(height, width, 2)


def slice_time_windows(
    events: np.ndarray, n: int, overlap: float = 0.0
) -> Tuple[Sequence[Optional[np.ndarray]], float]:
    """Split events into n equal windows over [t_first, t_last).

    Reference semantics (gen1.py:313-328 slice_events): window length is
    ``(t_last - t_first) // (n(1-overlap) + overlap)`` (integer floor), the
    i-th window starts at ``t_first + i*(1-overlap)*tw`` — with overlap=0
    the trailing remainder ``(t_last - t_first) mod n`` is dropped. Returns
    (slices, stride).
    """
    times = events["t"]
    if len(times) == 0:
        return [None] * n, 0
    tw = (int(times[-1]) - int(times[0])) // (n * (1 - overlap) + overlap)
    stride = (1 - overlap) * tw
    starts = np.arange(n) * stride + times[0]
    ends = starts + tw
    i0 = np.searchsorted(times, starts)
    i1 = np.searchsorted(times, ends)
    return [events[a:b] for a, b in zip(i0, i1)], stride


def micro_sum(events: np.ndarray, n_micro: int, height: int, width: int) -> np.ndarray:
    """(Tm, H, W, 2) stack of per-micro-window polarity histograms
    (reference 'micro_sum': gen1.py:356-360; one native pass over the
    events replaces Tm searchsorted slices + Tm scatters when available —
    identical bin-edge semantics, tested in test_data.py)."""
    if len(events):
        from .fastbin import load_native

        lib = load_native()
        xyp = _native_xyp(events) if lib is not None else None
        if xyp is not None:
            t0 = int(events["t"][0])
            tw = (int(events["t"][-1]) - t0) // n_micro
            out = np.zeros((n_micro, 2, height * width), np.float32)
            if tw > 0:
                lib.micro_sum(
                    len(events),
                    np.ascontiguousarray(events["t"], np.int64),
                    *xyp,
                    t0, tw, n_micro, height, width, out,
                )
            return np.moveaxis(
                out.reshape(n_micro, 2, height, width), 1, -1
            ).copy()
    out = np.zeros((n_micro, height, width, 2), np.float32)
    if len(events):
        slices, _ = slice_time_windows(events, n_micro)
        for i, ev in enumerate(slices):
            if ev is not None and len(ev):
                out[i] = polarity_histogram(ev, height, width)
    return out


def voxel_grid(events: np.ndarray, height: int, width: int, n_time_bins: int = 10) -> np.ndarray:
    """Zhu et al. bilinear-in-time event volume, (n_time_bins, H, W, 1).

    Polarity is mapped to +/-1 and split bilinearly between the two nearest
    time bins (reference event_reps.py:30-89).
    """
    if len(events) == 0:
        return np.zeros((n_time_bins, height, width, 1), np.float32)
    grid = np.zeros((n_time_bins, height, width), np.float64).ravel()
    t = events["t"].astype(np.float64)
    denom = t[-1] - t[0]
    ts = n_time_bins * (t - t[0]) / (denom if denom > 0 else 1)
    xs = events["x"].astype(np.int64)
    ys = events["y"].astype(np.int64)
    praw = events["p"].astype(np.float64)
    pol = np.where(praw == 0, -1.0, praw)
    tis = ts.astype(np.int64)
    dts = ts - tis
    base = xs + ys * width
    m = tis < n_time_bins
    np.add.at(grid, base[m] + tis[m] * width * height, (pol * (1.0 - dts))[m])
    m = (tis + 1) < n_time_bins
    np.add.at(grid, base[m] + (tis[m] + 1) * width * height, (pol * dts)[m])
    return grid.reshape(n_time_bins, height, width, 1).astype(np.float32)


def voxel_cube(
    events: np.ndarray, height: int, width: int, num_slices: int, tbins: int = 2
) -> np.ndarray:
    """IJCNN'22 voxel cube, (num_slices, H, W, 2*tbins).

    Each slice of the [first, last) window is split into ``tbins`` micro
    bins; channel = p * tbins + tbin (one-hot scatter; reference
    event_reps.py:92-138, torch sparse tensor -> plain bincount here).
    """
    out = np.zeros((num_slices, height, width, 2 * tbins), np.float32)
    if len(events) == 0:
        return out
    t = events["t"].astype(np.int64) - int(events["t"][0])
    time_window = (t[-1] - t[0]) // num_slices
    if time_window <= 0:
        return out
    keep = t < time_window * num_slices
    t = t[keep]
    ev = events[keep]
    sl = t // time_window
    tbin = ((t % time_window) / (time_window / tbins)).astype(np.int64)
    # channel index: ((p + 1) * (tbin + 1)) - 1 with p in {0,1}
    # == p * tbins + tbin for p in {0,1} when tbin < tbins
    ch = ((ev["p"].astype(np.int64) + 1) * (tbin + 1)) - 1
    flat = (
        sl * (height * width * 2 * tbins)
        + ev["y"].astype(np.int64) * (width * 2 * tbins)
        + ev["x"].astype(np.int64) * (2 * tbins)
        + ch
    )
    np.add.at(out.reshape(-1), flat, 1.0)
    return out


def timesurface_measure(
    t_events: np.ndarray, t_target: float, tau: float, decay: str = "exp"
) -> np.ndarray:
    """Exp/tanh/linear time-decay weights (reference event_reps.py:13-23)."""
    if decay == "exp":
        return np.exp((t_events - t_target) / tau)
    if decay == "tanh":
        return 1.0 - np.tanh((t_target - t_events) / tau)
    if decay == "lin":
        return (t_events - t_target) / tau
    raise NotImplementedError(f"decay '{decay}'")


def timesurface(
    slices: Sequence[np.ndarray],
    height: int,
    width: int,
    dt: float,
    tau: float,
) -> np.ndarray:
    """Exp-decay time surface over consecutive slices, (n, H, W, 2).

    A per-(polarity, pixel) memory keeps the last event timestamp; after
    ingesting slice i the surface is exp((mem - t_i)/tau) with
    t_i = start + (i+1)*dt (reference event_reps.py:141-160).
    """
    n = len(slices)
    out = np.zeros((n, height, width, 2), np.float32)
    if n == 0 or slices[0] is None or len(slices[0]) == 0:
        return out
    memory = np.zeros((2, height, width), np.int64)
    start_t = int(slices[0]["t"][0])
    for i, ev in enumerate(slices):
        if len(ev):
            memory[
                ev["p"].astype(np.int64) & 1,
                ev["y"].astype(np.int64),
                ev["x"].astype(np.int64),
            ] = ev["t"].astype(np.int64)
        diff = memory - ((i + 1) * dt + start_t)
        out[i] = np.moveaxis(np.exp(diff / tau), 0, -1)
    return out


# --------------------------------------------------------------------------
# device binning — XLA scatter-add from padded event arrays
# --------------------------------------------------------------------------

def pad_events(
    events: np.ndarray, max_events: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Pad a decoded event record array to a fixed budget.

    Returns int32 arrays (t, x, y, p, valid) of length ``max_events``; if the
    stream is longer, the *most recent* events are kept (the reference's
    windows also end at the label timestamp, gen1.py:115-137).
    """
    n = len(events)
    if n > max_events:
        events = events[n - max_events:]
        n = max_events
    t = np.zeros(max_events, np.int32)
    x = np.zeros(max_events, np.int32)
    y = np.zeros(max_events, np.int32)
    p = np.zeros(max_events, np.int32)
    v = np.zeros(max_events, bool)
    t[:n] = events["t"].astype(np.int64) & 0x7FFFFFFF
    x[:n] = events["x"]
    y[:n] = events["y"]
    p[:n] = events["p"]
    v[:n] = True
    return t, x, y, p, v


def bin_events_device(
    t, x, y, p, valid, *, t0, time_window, n_bins: int, height: int, width: int
):
    """Jittable on-device micro-frame binning: (N,) int arrays ->
    (n_bins, H, W, 2) float32 polarity histograms.

    Bin i covers [t0 + i*time_window, t0 + (i+1)*time_window) — the same
    integer-window layout as ``slice_time_windows`` (pass
    t0 = first event time, time_window = (t_last - t_first) // n_bins for
    bit-exact ``micro_sum`` equivalence; tests assert it).

    One flat scatter-add onto a (n_bins*H*W*2,) buffer — XLA lowers this to
    a single fused scatter; out-of-window or padded events are routed to a
    dead slot.
    """
    import jax.numpy as jnp

    t = jnp.asarray(t)
    tw = jnp.maximum(jnp.asarray(time_window, t.dtype), 1)
    rel = t - t0
    b = (rel // tw).astype(jnp.int32)
    inside = valid & (rel >= 0) & (b < n_bins)
    b = jnp.clip(b, 0, n_bins - 1)
    flat = (
        b * (height * width * 2)
        + jnp.asarray(y) * (width * 2)
        + jnp.asarray(x) * 2
        + (jnp.asarray(p) & 1)
    )
    size = n_bins * height * width * 2
    flat = jnp.where(inside, flat, size)  # dead slot
    hist = jnp.zeros((size + 1,), jnp.float32).at[flat].add(1.0)
    return hist[:size].reshape(n_bins, height, width, 2)


def bin_indexed_events_device(b, x, y, p, valid, *, n_bins: int, height: int, width: int):
    """Jittable scatter-add of host-pre-indexed events: (N,) int arrays with
    precomputed micro-bin index ``b`` -> (n_bins, H, W, 2) float32.

    The training-path device-binning op (SURVEY.md §7 hard part 5): the
    host ships ~5 int16/32 arrays per slice instead of dense frame stacks
    (~100x less PCIe/relay traffic at Gen1 resolution), and the binning is
    one fused XLA scatter on device.
    """
    import jax.numpy as jnp

    b = jnp.asarray(b)
    flat = (
        b * (height * width * 2)
        + jnp.asarray(y) * (width * 2)
        + jnp.asarray(x) * 2
        + (jnp.asarray(p) & 1)
    )
    size = n_bins * height * width * 2
    flat = jnp.where(jnp.asarray(valid), flat, size)
    hist = jnp.zeros((size + 1,), jnp.float32).at[flat].add(1.0)
    return hist[:size].reshape(n_bins, height, width, 2)


def bin_event_batch(b, x, y, p, valid, *, n_bins: int, height: int, width: int):
    """(B, Tl, N) indexed events -> (B, Tl, n_bins, H, W, 2), fully vmapped.

    Wrap in jax.jit at the call site (the trainer does) so binning + the
    train step form back-to-back device programs with no host bounce.
    """
    import jax

    fn = lambda bb, xx, yy, pp, vv: bin_indexed_events_device(
        bb, xx, yy, pp, vv, n_bins=n_bins, height=height, width=width
    )
    return jax.vmap(jax.vmap(fn))(b, x, y, p, valid)
