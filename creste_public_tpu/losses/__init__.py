from creste_public_tpu.losses.manager import (
    Loss,
    LossManager,
    load_class_weights,
    masked_mean,
    smooth_l1,
)
from creste_public_tpu.losses.supcon import (
    capped_class_sample,
    multi_pos_con_loss,
    remap_labels_per_batch,
)

__all__ = [
    "Loss",
    "LossManager",
    "load_class_weights",
    "masked_mean",
    "smooth_l1",
    "capped_class_sample",
    "multi_pos_con_loss",
    "remap_labels_per_batch",
]
