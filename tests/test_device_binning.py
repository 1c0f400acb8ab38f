"""On-device training binning path: raw-events dataset mode must reproduce
host micro_sum exactly when the affine is identity, and boxes must match the
frame path's geometry."""

import numpy as np

from eas_snn_tpu.data import Gen1Dataset, EventDataLoader, micro_sum
from eas_snn_tpu.data.reps import bin_event_batch
from eas_snn_tpu.data.augment import apply_affine_to_boxes, sample_affine

from test_data import build_gen1_tree


def test_raw_mode_matches_host_binning_identity(rng, tmp_path):
    root = build_gen1_tree(tmp_path, rng)
    # eval-mode affine with input == sensor size -> identity transform
    ds = Gen1Dataset(
        root, input_size=(240, 304), training=False, map_val=False,
        aggregation="micro_sum", num_slice=2, micro_slice=3,
        window=(-100_000, 0), raw_events=True, max_events_per_slice=8192,
        max_labels=10,
    )
    (b, x, y, p, v), labels, img_size, sid = ds[0]
    assert b.shape == (2, 8192)
    frames = np.asarray(
        bin_event_batch(
            b[None], x[None], y[None], p[None], v[None],
            n_bins=3, height=240, width=304,
        )
    )[0]  # (Tl, Tm, H, W, 2)

    # host reference: same slices, host micro_sum
    ds_f = Gen1Dataset(
        root, input_size=(240, 304), training=False, map_val=False,
        aggregation="micro_sum", num_slice=2, micro_slice=3,
        window=(-100_000, 0), letterbox_val=True, max_labels=10,
    )
    file_idx, group_idx = ds_f.resolve_index(0)
    host = np.stack([
        micro_sum(
            ds_f.search_events(
                file_idx,
                int(ds_f.labels[file_idx][group_idx][0]) + k * 100_000,
            ),
            3, 240, 304,
        )
        for k in (-1, 0)
    ])
    np.testing.assert_array_equal(frames, host)


def test_raw_mode_loader_and_train_affine(rng, tmp_path):
    root = build_gen1_tree(tmp_path, rng)
    ds = Gen1Dataset(
        root, input_size=(128, 160), training=True,
        aggregation="micro_sum", num_slice=1, micro_slice=2,
        window=(-100_000, 0), raw_events=True, max_events_per_slice=4096,
        max_labels=10,
    )
    loader = EventDataLoader(ds, batch_size=3, num_workers=2, seed=0)
    frames, labels, img_sizes, ids = next(iter(loader))
    assert isinstance(frames, tuple) and len(frames) == 5
    b, x, y, p, v = frames
    assert b.shape == (3, 1, 4096)
    assert labels.shape == (3, 10, 5)
    # all valid coords inside the input frame
    assert (x[v] >= 0).all() and (x[v] < 160).all()
    assert (y[v] >= 0).all() and (y[v] < 128).all()
    binned = np.asarray(
        bin_event_batch(b, x, y, p, v, n_bins=2, height=128, width=160)
    )
    assert binned.shape == (3, 1, 2, 128, 160, 2)
    assert binned.sum() == v.sum()


def test_affine_box_math(rng):
    boxes = np.array([[10, 20, 110, 120, 1.0]], np.float32)
    aff = dict(sx=0.5, sy=0.25, dx=8.0, dy=4.0, flip=False)
    out = apply_affine_to_boxes(boxes, aff, (64, 96))
    np.testing.assert_allclose(out[0, :4], [13, 9, 63, 34])
    aff["flip"] = True
    out = apply_affine_to_boxes(boxes, aff, (64, 96))
    np.testing.assert_allclose(out[0, :4], [96 - 63, 9, 96 - 13, 34])
    # eval affine is the letterbox scale
    a = sample_affine((240, 304), (120, 152), np.random.default_rng(0), training=False)
    assert a["sx"] == a["sy"] == 0.5 and not a["flip"]
