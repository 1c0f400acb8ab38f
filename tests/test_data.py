"""Data-layer tests: binary IO round-trips, representation golden values,
device-binning equivalence, dataset end-to-end on synthetic streams."""

import os

import numpy as np
import pytest

from eas_snn_tpu.data import (
    EventStream,
    Gen1Dataset,
    NCaltechDataset,
    EventDataLoader,
    InfiniteSampler,
    bin_events_device,
    load_bboxes,
    micro_sum,
    pad_events,
    polarity_histogram,
    read_atis_events,
    slice_time_windows,
    timesurface,
    voxel_cube,
    voxel_grid,
    write_bboxes_npy,
    write_dat_events,
)
from eas_snn_tpu.data.psee_io import EVENT_DTYPE


def make_events(rng, n, t_max=1_000_000, h=240, w=304):
    ev = np.empty(n, EVENT_DTYPE)
    ev["t"] = np.sort(rng.integers(0, t_max, n))
    ev["x"] = rng.integers(0, w, n)
    ev["y"] = rng.integers(0, h, n)
    ev["p"] = rng.integers(0, 2, n)
    return ev


class TestDatIO:
    def test_roundtrip(self, rng, tmp_path):
        ev = make_events(rng, 5000)
        path = str(tmp_path / "seq_td.dat")
        write_dat_events(path, ev["t"], ev["x"], ev["y"], ev["p"])
        s = EventStream(path)
        assert s.event_count() == 5000
        assert s.get_size() == (240, 304)
        out = s.events_slice(0, 5000)
        np.testing.assert_array_equal(out["t"], ev["t"])
        np.testing.assert_array_equal(out["x"], ev["x"])
        np.testing.assert_array_equal(out["y"], ev["y"])
        np.testing.assert_array_equal(out["p"], ev["p"])

    def test_events_between(self, rng, tmp_path):
        ev = make_events(rng, 2000)
        path = str(tmp_path / "s_td.dat")
        write_dat_events(path, ev["t"], ev["x"], ev["y"], ev["p"])
        s = EventStream(path)
        t0, t1 = 100_000, 400_000
        out = s.events_between(t0, t1)
        ref = ev[(ev["t"] >= t0) & (ev["t"] < t1)]
        np.testing.assert_array_equal(out["t"], ref["t"])

    def test_streaming_facade(self, rng, tmp_path):
        ev = make_events(rng, 1000)
        path = str(tmp_path / "f_td.dat")
        write_dat_events(path, ev["t"], ev["x"], ev["y"], ev["p"])
        s = EventStream(path)
        a = s.load_n_events(300)
        assert len(a) == 300 and s.current_time == ev["t"][300]
        s.seek_time(int(ev["t"][500]))
        b = s.load_delta_t(50_000)
        ref = ev[(ev["t"] >= ev["t"][500]) & (ev["t"] < ev["t"][500] + 50_000)]
        assert len(b) == len(ref)
        s.seek_event(0)
        assert s.current_time == 0 and not s.done
        s.seek_event(10**9)
        assert s.done

    def test_bbox_roundtrip(self, tmp_path):
        rows = [
            (100000, 10.0, 20.0, 30.0, 40.0, 0, 1, 0.9),
            (100000, 50.0, 60.0, 20.0, 10.0, 1, 2, 0.8),
            (200000, 15.0, 25.0, 35.0, 45.0, 0, 1, 0.7),
        ]
        path = str(tmp_path / "seq_bbox.npy")
        write_bboxes_npy(path, rows)
        boxes = load_bboxes(path)
        assert boxes.dtype.itemsize == 40
        np.testing.assert_array_equal(boxes["t"], [100000, 100000, 200000])
        np.testing.assert_allclose(boxes["x"], [10, 50, 15])


class TestReps:
    def test_polarity_histogram_golden(self):
        ev = np.zeros(4, EVENT_DTYPE)
        ev["t"] = [0, 1, 2, 3]
        ev["x"] = [1, 1, 2, 1]
        ev["y"] = [0, 0, 1, 0]
        ev["p"] = [0, 1, 1, 0]
        h = polarity_histogram(ev, 4, 4)
        assert h.shape == (4, 4, 2)
        assert h[0, 1, 0] == 2 and h[0, 1, 1] == 1 and h[1, 2, 1] == 1
        assert h.sum() == 4

    def test_micro_sum_window_layout(self, rng):
        ev = make_events(rng, 3000, t_max=100_000, h=32, w=32)
        out = micro_sum(ev, 4, 32, 32)
        assert out.shape == (4, 32, 32, 2)
        # reference semantics: remainder after 4 equal int windows is dropped
        tw = (int(ev["t"][-1]) - int(ev["t"][0])) // 4
        kept = ev[(ev["t"] >= ev["t"][0]) & (ev["t"] < ev["t"][0] + 4 * tw)]
        # events exactly at a window's end boundary fall out of that window
        starts = int(ev["t"][0]) + tw * np.arange(4)
        n_in = sum(
            ((kept["t"] >= s) & (kept["t"] < s + tw)).sum() for s in starts
        )
        assert out.sum() == n_in

    def test_voxel_grid_bilinear(self):
        ev = np.zeros(2, EVENT_DTYPE)
        ev["t"] = [0, 100]
        ev["x"] = [3, 5]
        ev["y"] = [2, 4]
        ev["p"] = [1, 0]
        g = voxel_grid(ev, 8, 8, n_time_bins=2)
        assert g.shape == (2, 8, 8, 1)
        # first event: ts=0 -> bin0 weight 1; second: ts=2 -> beyond last bin
        assert g[0, 2, 3, 0] == pytest.approx(1.0)
        # negative polarity event at normalized t=2.0: tis=2 (out), no write
        assert g[:, 4, 5, 0].sum() == pytest.approx(0.0)

    def test_voxel_cube_counts(self, rng):
        ev = make_events(rng, 500, t_max=10_000, h=16, w=16)
        vc = voxel_cube(ev, 16, 16, num_slices=2, tbins=2)
        assert vc.shape == (2, 16, 16, 4)
        t = ev["t"].astype(np.int64) - int(ev["t"][0])
        tw = (t[-1] - t[0]) // 2
        assert vc.sum() == (t < 2 * tw).sum()

    def test_timesurface_decay(self, rng):
        ev = make_events(rng, 200, t_max=50_000, h=16, w=16)
        slices, dt = slice_time_windows(ev, 3)
        ts = timesurface(slices, 16, 16, dt=dt, tau=50e3)
        assert ts.shape == (3, 16, 16, 2)
        assert np.isfinite(ts).all() and (ts >= 0).all()

    def test_device_binning_matches_micro_sum(self, rng):
        ev = make_events(rng, 4000, t_max=200_000, h=32, w=48)
        n_bins = 4
        host = micro_sum(ev, n_bins, 32, 48)
        t, x, y, p, v = pad_events(ev, 4096)
        tw = (int(ev["t"][-1]) - int(ev["t"][0])) // n_bins
        dev = bin_events_device(
            t, x, y, p, v, t0=int(ev["t"][0]), time_window=tw,
            n_bins=n_bins, height=32, width=48,
        )
        np.testing.assert_array_equal(np.asarray(dev), host)


def build_gen1_tree(tmp_path, rng, n_streams=2, n_groups=3):
    for s in range(n_streams):
        base = tmp_path / f"17-00-0{s}_00-00-00_0_60000000"
        ev = make_events(rng, 20000, t_max=2_000_000)
        write_dat_events(str(base) + "_td.dat", ev["t"], ev["x"], ev["y"], ev["p"])
        rows = []
        for g in range(n_groups):
            t = 500_000 + g * 400_000
            rows.append((t, 20.0 + 10 * g, 30.0, 60.0, 40.0, g % 2, g, 1.0))
            if g == 0:
                rows.append((t, 120.0, 60.0, 40.0, 30.0, 1, 7, 1.0))
        write_bboxes_npy(str(base) + "_bbox.npy", rows)
    return str(tmp_path)


class TestGen1Dataset:
    def test_index_and_shapes(self, rng, tmp_path):
        root = build_gen1_tree(tmp_path, rng)
        ds = Gen1Dataset(
            root, input_size=(128, 160), training=True,
            aggregation="micro_sum", num_slice=2, micro_slice=3,
            window=(-100_000, 0), max_labels=10,
        )
        assert len(ds) == 6
        frames, labels, img_size, sid = ds[0]
        assert frames.shape == (2, 3, 128, 160, 2)
        assert labels.shape == (10, 5)
        assert tuple(img_size) == (240, 304)
        assert sid == 0
        # at least one valid padded label row (cls, cx, cy, w, h)
        assert (labels.sum(-1) > 0).any()

    def test_map_val_mode(self, rng, tmp_path):
        root = build_gen1_tree(tmp_path, rng)
        ds = Gen1Dataset(
            root, input_size=(128, 160), training=False, map_val=True,
            aggregation="sum", num_slice=1, micro_slice=1,
            window=(-100_000, 0),
        )
        frames, raw, img_size, sid = ds[1]
        assert frames.shape == (1, 128, 160, 2)
        # raw-sensor-resolution cxcywh boxes
        assert raw.ndim == 2 and raw.shape[1] == 5
        assert (raw[:, 2] > 0).all() and (raw[:, 3] > 0).all()

    def test_loader_batching(self, rng, tmp_path):
        root = build_gen1_tree(tmp_path, rng)
        ds = Gen1Dataset(
            root, input_size=(64, 64), training=True,
            aggregation="micro_sum", num_slice=1, micro_slice=2,
            window=(-100_000, 0), max_labels=5,
        )
        loader = EventDataLoader(ds, batch_size=4, num_workers=2, seed=0)
        it = iter(loader)
        frames, labels, img_sizes, ids = next(it)
        assert frames.shape == (4, 1, 2, 64, 64, 2)
        assert labels.shape == (4, 5, 5)
        frames2 = next(it)[0]
        assert frames2.shape == (4, 1, 2, 64, 64, 2)

    def test_finite_eval_loader(self, rng, tmp_path):
        root = build_gen1_tree(tmp_path, rng)
        ds = Gen1Dataset(
            root, input_size=(64, 64), training=False, map_val=True,
            aggregation="sum", num_slice=1, micro_slice=1,
            window=(-100_000, 0),
        )
        loader = EventDataLoader(
            ds, batch_size=4, shuffle=False, infinite=False, num_workers=2
        )
        batches = list(loader)
        assert sum(len(b[3]) for b in batches) == len(ds)


from eas_snn_tpu.data.ncaltech import encode_atis  # noqa: E402


class TestNCaltech:
    def test_atis_decode(self, rng):
        n = 1000
        t = np.sort(rng.integers(0, 1 << 22, n))
        x = rng.integers(0, 240, n)
        y = rng.integers(0, 180, n)
        p = rng.integers(0, 2, n)
        ev = read_atis_events(encode_atis(t, x, y, p))
        np.testing.assert_array_equal(ev["t"], t)
        np.testing.assert_array_equal(ev["x"], x)
        np.testing.assert_array_equal(ev["y"], y)
        np.testing.assert_array_equal(ev["p"], p)

    def test_atis_overflow(self):
        # overflow marker (y=240) bumps subsequent timestamps by 2^13
        data = encode_atis([100, 5, 200], [1, 0, 2], [10, 240, 20], [1, 0, 0])
        ev = read_atis_events(data)
        assert len(ev) == 2
        np.testing.assert_array_equal(ev["t"], [100, 200 + 8192])

    def _build_tree(self, tmp_path, rng, classes=("ant", "bee"), n_per=4):
        import struct as st

        for cls in classes:
            ddir = tmp_path / "Caltech101" / cls
            adir = tmp_path / "Caltech101_annotations" / cls
            ddir.mkdir(parents=True)
            adir.mkdir(parents=True)
            for i in range(n_per):
                n = 3000
                t = np.sort(rng.integers(0, 1 << 21, n))
                ev = encode_atis(
                    t, rng.integers(0, 240, n), rng.integers(0, 180, n),
                    rng.integers(0, 2, n),
                )
                (ddir / f"image_{i:04d}.bin").write_bytes(ev)
                box = np.array(
                    [[40, 160, 160, 40], [30, 130, 130, 30]], np.int16
                )  # x row, y row
                with open(adir / f"annotation_{i:04d}.bin", "wb") as f:
                    f.write(st.pack("h", 2))
                    f.write(st.pack("h", 4))
                    f.write(np.asfortranarray(box).tobytes(order="F"))
                    f.write(st.pack("h", 2))
                    f.write(st.pack("h", 4))
                    f.write(np.asfortranarray(box).tobytes(order="F"))
        return str(tmp_path)

    def test_dataset_end_to_end(self, rng, tmp_path):
        root = self._build_tree(tmp_path, rng)
        ds = NCaltechDataset(
            root, input_size=(96, 96), split="train", training=True,
            aggregation="micro_sum", num_slice=2, micro_slice=3,
            max_labels=5,
        )
        assert len(ds) > 0
        frames, labels, img_size, sid = ds[0]
        assert frames.shape == (2, 3, 96, 96, 2)
        assert labels.shape == (5, 5)
        assert tuple(img_size) == (180, 240)
        # deterministic split files exist
        assert os.path.exists(os.path.join(root, "train.txt"))
        assert os.path.exists(os.path.join(root, "val.txt"))

    def test_timesurface_measure_aggregation(self, rng, tmp_path):
        root = self._build_tree(tmp_path, rng)
        ds = NCaltechDataset(
            root, input_size=(64, 64), split="train", training=False,
            aggregation="sum", measure="timesurface",
            num_slice=1, micro_slice=1,
        )
        frames, _, _, _ = ds[0]
        assert frames.shape == (1, 64, 64, 2)
        assert np.isfinite(frames).all()


class TestSamplers:
    def test_infinite_rank_striding(self):
        a = InfiniteSampler(10, shuffle=True, seed=3, rank=0, world_size=2)
        b = InfiniteSampler(10, shuffle=True, seed=3, rank=1, world_size=2)
        xa = [x for _, x in zip(range(10), iter(a))]
        xb = [x for _, x in zip(range(10), iter(b))]
        # disjoint interleave of the same permutation stream
        merged = [v for pair in zip(xa, xb) for v in pair]
        assert sorted(merged[:10]) == list(range(10))

    @pytest.mark.parametrize("size,world", [(10, 2), (11, 3), (5, 8)])
    def test_sequential_disjoint_cover_no_duplicates(self, size, world):
        """map_val eval loaders must partition the dataset disjointly with
        NO padding duplicates — the evaluator's single end-of-eval
        allgather would double-count padded samples."""
        from eas_snn_tpu.data.loader import SequentialSampler

        parts = [
            list(iter(SequentialSampler(size, rank=r, world_size=world)))
            for r in range(world)
        ]
        flat = [i for p in parts for i in p]
        assert sorted(flat) == list(range(size))  # cover, no dupes
        for r, p in enumerate(parts):
            assert len(p) == len(SequentialSampler(size, r, world))


class TestFrameCache:
    def test_prestore_roundtrip(self, rng, tmp_path):
        os.makedirs(tmp_path / "data")
        root = build_gen1_tree(tmp_path / "data", rng)
        ds = Gen1Dataset(
            root, input_size=(64, 64), training=False,
            aggregation="sum", num_slice=2, micro_slice=1,
            window=(-100_000, 0), cache_path=str(tmp_path / "cache"),
        )
        f1, g1 = ds.resolve_index(0)
        a = ds.generate_slices(f1, g1)
        b = ds.generate_slices(f1, g1)  # cache hit
        np.testing.assert_array_equal(a, b)
        assert len(ds._frame_cache) >= 1
        # disk spill exists
        import glob
        assert glob.glob(str(tmp_path / "cache" / "*.npz"))


class TestConcatDatasets:
    class _Fake:
        def __init__(self, n, tag):
            self.n, self.tag = n, tag
            self.input_size = (64, 64)
            self.class_names = ("a", "b")
            self.sample_names = [f"{tag}{i}" for i in range(n)]
            self.mosaic_closed = False
            self.training = True

        def __len__(self):
            return self.n

        def __getitem__(self, idx):
            if isinstance(idx, tuple):
                return (self.tag, idx[1], "mix")
            return (self.tag, idx)

        def close_mosaic(self):
            self.mosaic_closed = True

    def test_concat_index_splicing(self):
        from eas_snn_tpu.data import ConcatDataset

        a, b = self._Fake(3, "a"), self._Fake(4, "b")
        ds = ConcatDataset([a, b])
        assert len(ds) == 7
        assert ds[0] == ("a", 0) and ds[2] == ("a", 2)
        assert ds[3] == ("b", 0) and ds[6] == ("b", 3)
        assert ds[-1] == ("b", 3)
        assert ds.sample_names == a.sample_names + b.sample_names
        ds.close_mosaic()
        assert a.mosaic_closed and b.mosaic_closed
        ds.training = False
        assert not a.training and not b.training

    def test_mixconcat_tuple_index(self):
        from eas_snn_tpu.data import MixConcatDataset

        a, b = self._Fake(3, "a"), self._Fake(4, "b")
        ds = MixConcatDataset([a, b])
        # (mosaic_flag, global_idx) tuples rewrite the inner index
        assert ds[(True, 4)] == ("b", 1, "mix")
        assert ds[(False, 2)] == ("a", 2, "mix")
        assert ds[5] == ("b", 2)


class TestProcessLoader:
    def test_process_mode_yields_correct_batches(self, rng, tmp_path):
        """Forked workers + shm ring must deliver the same sample CONTENT
        as direct indexing (augmentation rng differs by design — compare in
        val mode where the path is deterministic)."""
        root = build_gen1_tree(tmp_path, rng)
        ds = Gen1Dataset(
            root, input_size=(64, 64), training=False,
            aggregation="sum", num_slice=1, micro_slice=1,
            window=(-100_000, 0),
        )
        loader = EventDataLoader(
            ds, batch_size=2, shuffle=False, infinite=False,
            num_workers=2, worker_mode="process",
        )
        # force process mode even on a 1-core host for the test
        loader.worker_mode = "process"
        seen = []
        for frames, labels, sizes, ids in loader:
            assert frames.shape[1:] == (1, 64, 64, 2)
            for k, sid in enumerate(ids):
                ref_frames, ref_labels, _, ref_sid = ds[int(sid)]
                assert ref_sid == sid
                np.testing.assert_array_equal(frames[k], ref_frames)
                np.testing.assert_array_equal(labels[k], ref_labels)
                seen.append(int(sid))
        assert sorted(seen) == list(range(len(ds)))

    def test_process_ring_eight_workers(self, rng, tmp_path):
        """The shm ring at TPU-host worker counts (8 forked workers, more
        workers than ring slots or batches) on the real Gen1Dataset:
        every sample delivered exactly once, training path included."""
        root = build_gen1_tree(tmp_path, rng, n_streams=2, n_groups=6)
        ds = Gen1Dataset(
            root, input_size=(64, 64), training=True,
            aggregation="micro_sum", num_slice=1, micro_slice=2,
            window=(-100_000, 0),
        )
        loader = EventDataLoader(
            ds, batch_size=3, shuffle=False, infinite=False,
            num_workers=8, worker_mode="process",
        )
        # the 1-core host clamps both knobs; force the 8-worker process
        # topology the model in tools/loader_scale_model.py assumes
        loader.num_workers = 8
        loader.worker_mode = "process"
        seen = []
        for frames, labels, sizes, ids in loader:
            assert frames.shape[1:] == (1, 2, 64, 64, 2)
            assert np.isfinite(frames).all()
            seen.extend(int(s) for s in ids)
        assert sorted(seen) == list(range(len(ds)))
