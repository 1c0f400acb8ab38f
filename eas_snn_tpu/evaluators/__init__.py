"""Evaluation layer: COCO-protocol + Prophesee-protocol mAP, native
matching core, energy/SOP profiling.

(reference: yolox/evaluators/*, yolox/utils/psee_loader/{evaluator,
evaluation}.py, yolox/layers/* — see SURVEY.md §2.8.)
"""

from .coco_map import DetEval, EvalResults, summarize
from .energy import count_ops, estimate_energy
from .voc_eval import VOCDetEval, voc_ap, voc_eval_class
from .event_evaluator import EventEvaluator, PSEEEvaluator
from .prophesee import (
    PropheseeEvaluator,
    boxes_to_prophesee,
    evaluate_lists,
    filter_boxes,
    match_times,
)

__all__ = [
    "VOCDetEval", "voc_ap", "voc_eval_class",
    "DetEval", "EvalResults", "summarize",
    "EventEvaluator", "PSEEEvaluator",
    "PropheseeEvaluator", "evaluate_lists", "filter_boxes", "match_times",
    "boxes_to_prophesee",
    "count_ops", "estimate_energy",
]
