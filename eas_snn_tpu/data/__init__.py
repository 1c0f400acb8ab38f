"""Data layer: event IO, representations, datasets, loaders.

(reference: yolox/data/* and yolox/utils/psee_loader/io/* — see SURVEY.md
§2.6/§2.7.)
"""

from .augment import (
    TrainTransform,
    ValTransform,
    letterbox,
    random_resize_place_flip,
    resize_frames,
)
from .cache import SampleCache
from .coco import COCODataset, VOCDataset, VOC_CLASSES
from .concat import ConcatDataset, MixConcatDataset
from .mosaic import MosaicDataset, random_affine
from .event_dataset import EventDetDataset
from .gen1 import GEN1_CLASSES, Gen1Dataset
from .gen4 import GEN4_CLASSES, Gen4Dataset, RVTGen4Dataset
from .loader import (
    EventDataLoader,
    InfiniteSampler,
    SequentialSampler,
    collate_event_batch,
)
from .ncaltech import NCaltechDataset, read_atis_events, read_ncaltech_annotation
from .psee_io import (
    BBOX_DTYPE,
    EVENT_DTYPE,
    EventStream,
    load_bboxes,
    write_bboxes_npy,
    write_dat_events,
)
from .reps import (
    bin_events_device,
    micro_sum,
    pad_events,
    polarity_histogram,
    slice_time_windows,
    timesurface,
    timesurface_measure,
    voxel_cube,
    voxel_grid,
)

__all__ = [  # noqa: F405
    "build_dataset",
    # augment
    "TrainTransform", "ValTransform", "letterbox", "random_resize_place_flip",
    "resize_frames",
    # datasets
    "EventDetDataset", "Gen1Dataset", "Gen4Dataset", "RVTGen4Dataset",
    "NCaltechDataset", "GEN1_CLASSES", "GEN4_CLASSES",
    # loaders
    "COCODataset", "VOCDataset", "VOC_CLASSES", "MosaicDataset",
    "random_affine",
    "EventDataLoader", "InfiniteSampler", "SequentialSampler",
    "collate_event_batch", "SampleCache",
    "ConcatDataset", "MixConcatDataset",
    # io
    "EventStream", "EVENT_DTYPE", "BBOX_DTYPE", "load_bboxes",
    "write_dat_events", "write_bboxes_npy",
    "read_atis_events", "read_ncaltech_annotation",
    # reps
    "polarity_histogram", "micro_sum", "voxel_grid", "voxel_cube",
    "timesurface", "timesurface_measure", "slice_time_windows",
    "pad_events", "bin_events_device",
]


def build_dataset(
    data_name: str,
    data_dir: str,
    training: bool = True,
    map_val: bool = False,
    input_size=(640, 640),
    **kw,
):
    """Dataset factory by name (reference exp dispatch:
    yolox/exp/event_yolox_base.py:220-247, 445-482)."""
    name = data_name.lower()
    if name in ("n-caltech", "ncaltech", "n-caltech101"):
        # the window knob crops the stream tail here (ncaltech.py:90-96);
        # (0, 0) or positive-start windows mean "whole stream"
        win = kw.pop("window", None)
        stream_window = win if (win and win[0] < 0) else None
        return NCaltechDataset(
            data_dir, input_size=input_size,
            split="train" if training else "val",
            window=stream_window,
            training=training, map_val=map_val, **kw,
        )
    if name == "gen1":
        sub = "train" if training else "val"
        import os

        root = os.path.join(data_dir, sub) if os.path.isdir(
            os.path.join(data_dir, sub)
        ) else data_dir
        return Gen1Dataset(
            root, input_size=input_size, training=training, map_val=map_val, **kw
        )
    if name == "gen4":
        import os

        sub = "train" if training else "val"
        root = os.path.join(data_dir, sub) if os.path.isdir(
            os.path.join(data_dir, sub)
        ) else data_dir
        return Gen4Dataset(
            root, input_size=input_size, training=training, map_val=map_val, **kw
        )
    if name in ("rvt-gen4", "rvt_gen4", "rvtgen4"):
        import os

        sub = "train" if training else "val"
        root = os.path.join(data_dir, sub) if os.path.isdir(
            os.path.join(data_dir, sub)
        ) else data_dir
        for k in ("aggregation", "window", "measure"):
            kw.pop(k, None)
        return RVTGen4Dataset(
            root, input_size=input_size, training=training, map_val=map_val, **kw
        )
    raise KeyError(f"unknown dataset '{data_name}'")
