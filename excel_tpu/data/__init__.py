from .datasets import (ClsCropDataset, CocoDataset, EvalDataset, VocDataset,
                       make_dataset)
from .loader import eval_samples, train_batches

__all__ = ["ClsCropDataset", "CocoDataset", "EvalDataset", "VocDataset",
           "make_dataset", "eval_samples", "train_batches"]
