"""Dataset loading / FID-reference preparation utilities."""

from .datasets import (load_cifar10, iter_image_folder, load_lsun,
                       data_transform, inverse_data_transform,
                       logit_transform)
from .coco import load_coco_prompts

__all__ = ["load_cifar10", "iter_image_folder", "load_lsun",
           "data_transform", "inverse_data_transform", "logit_transform",
           "load_coco_prompts"]
