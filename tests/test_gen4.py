"""GEN4 datasets: raw 1Mpx subclass and the RVT-preprocessed HDF5 reader
(synthetic fixtures)."""

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from eas_snn_tpu.data import Gen4Dataset, RVTGen4Dataset, write_bboxes_npy, write_dat_events
from eas_snn_tpu.data.gen4 import apply_label_filters

from test_data import make_events


def build_rvt_tree(tmp_path, rng, n_seq=2, n_frames=6, nbins=10):
    """RVT layout: <root>/<seq>/{labels_v2/{labels.npz,timestamps_us.npy},
    event_representations_v2/<rep>/{event_representations_ds2_nearest.h5,
    objframe_idx_2_repr_idx.npy, timestamps_us.npy}}"""
    rep = "stacked_histogram_dt=50_nbins=10"
    label_dtype = np.dtype([
        ("t", "<i8"), ("x", "<f4"), ("y", "<f4"), ("w", "<f4"), ("h", "<f4"),
        ("class_id", "<u4"), ("class_confidence", "<f4"), ("track_id", "<u4"),
    ])
    for s in range(n_seq):
        seq = tmp_path / f"seq{s:02d}"
        ldir = seq / "labels_v2"
        rdir = seq / "event_representations_v2" / rep
        ldir.mkdir(parents=True)
        rdir.mkdir(parents=True)
        n_repr = n_frames + 4
        data = rng.integers(0, 3, (n_repr, nbins, 360, 640)).astype(np.uint8)
        with h5py.File(rdir / "event_representations_ds2_nearest.h5", "w") as f:
            f.create_dataset("data", data=data)
        np.save(rdir / "objframe_idx_2_repr_idx.npy",
                np.arange(4, 4 + n_frames).astype(np.int64))
        np.save(rdir / "timestamps_us.npy",
                (np.arange(n_repr) * 50_000).astype(np.int64))
        rows = []
        frame_idx = []
        for i in range(n_frames):
            frame_idx.append(len(rows))
            # original-resolution (720x1280) boxes; class 1 kept, class 5 kept
            # too unless filtering is enabled
            rows.append((i * 50_000, 100.0, 80.0, 120.0, 90.0, 1, 1.0, i))
            rows.append((i * 50_000, 400.0, 200.0, 60.0, 70.0, 5, 1.0, i))
        labels = np.zeros(len(rows), label_dtype)
        for j, r in enumerate(rows):
            labels[j] = r
        np.savez(
            ldir / "labels.npz",
            labels=labels,
            objframe_idx_2_label_idx=np.asarray(frame_idx, np.int64),
        )
        np.save(ldir / "timestamps_us.npy",
                (np.arange(n_frames) * 50_000).astype(np.int64))
    return str(tmp_path)


class TestRVTGen4:
    def test_index_and_slices(self, rng, tmp_path):
        root = build_rvt_tree(tmp_path, rng)
        ds = RVTGen4Dataset(
            root, input_size=(192, 320), training=False, map_val=False,
            num_slice=3, micro_slice=3, max_labels=20,
        )
        assert len(ds) == 12  # 2 seqs x 6 frames
        frames, labels, img_size, sid = ds[0]
        # (Tl=1 macro, n=3 history frames as micro, H, W, 2)
        assert frames.shape == (1, 3, 192, 320, 2)
        assert tuple(img_size) == (360, 640)
        # ds2 rescale: x 100 -> 50, w 120 -> 60 at the 360x640 frame,
        # then letterbox 0.5 to the 192x320 input -> cx = (50+30)/2
        valid = labels[labels.sum(-1) != 0]
        assert len(valid) == 2
        np.testing.assert_allclose(valid[0, 1], (25.0 + 55.0) / 2, atol=1.0)

    def test_event_sum_collapse(self, rng, tmp_path):
        root = build_rvt_tree(tmp_path, rng)
        ds = RVTGen4Dataset(
            root, input_size=(192, 320), training=False,
            num_slice=2, micro_slice=2,
        )
        f_idx, g_idx = ds.resolve_index(0)
        rep = ds.generate_slices(f_idx, g_idx)
        # nbins=10 stacked histogram collapsed to 2 polarity channels
        assert rep.shape == (1, 2, 360, 640, 2)

    def test_history_zero_padding(self, rng, tmp_path):
        root = build_rvt_tree(tmp_path, rng)
        ds = RVTGen4Dataset(
            root, input_size=(192, 320), training=False,
            num_slice=8, micro_slice=8,  # > repr index 4 of frame 0
        )
        f_idx, g_idx = ds.resolve_index(0)
        rep = ds.generate_slices(f_idx, g_idx)
        assert rep.shape == (1, 8, 360, 640, 2)
        # first 3 history slots precede the stream start -> zero padded
        assert rep[0, :3].sum() == 0

    def test_label_filters(self):
        x = np.array([10.0, -5.0, 100.0, 1270.0], np.float32)
        y = np.array([10.0, 10.0, 10.0, 10.0], np.float32)
        w = np.array([50.0, 30.0, 3.0, 60.0], np.float32)
        h = np.array([40.0, 30.0, 30.0, 40.0], np.float32)
        cls = np.array([0, 1, 2, 6], np.float32)
        keep = apply_label_filters(x, y, w, h, cls, 720, 1280)
        # 0: ok; 1: crop fixes negative x; 2: too small; 3: class 6 removed
        assert list(keep) == [True, True, False, False]
        assert x[1] == 0.0 and w[1] == pytest.approx(25.0)


class TestGen4Raw:
    def test_basic(self, rng, tmp_path):
        # raw gen4 = gen1 skeleton at 720x1280
        base = tmp_path / "moorea_2019_a"
        ev = make_events(rng, 8000, t_max=1_500_000, h=720, w=1280)
        write_dat_events(
            str(base) + "_td.dat", ev["t"], ev["x"], ev["y"], ev["p"],
            height=720, width=1280,
        )
        write_bboxes_npy(
            str(base) + "_bbox.npy",
            [(600_000, 100.0, 100.0, 200.0, 150.0, 2, 0, 1.0)],
        )
        ds = Gen4Dataset(
            str(tmp_path), input_size=(192, 320), training=False,
            aggregation="sum", num_slice=1, micro_slice=1,
            window=(-100_000, 0),
        )
        assert len(ds) == 1
        assert ds.img_size == (720, 1280)
        frames, labels, img_size, sid = ds[0]
        assert frames.shape == (1, 192, 320, 2)
        assert tuple(img_size) == (720, 1280)
