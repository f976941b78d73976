"""COCO caption handling for the text-to-image task.

Functional twin of /root/reference/qdiff_control/coco_prompt.py:
``get_prompts`` (:12-21) reads the COCO ``captions_val2014.json``-style
annotation file and shuffles; ``center_resize_image`` (:24-46) — the FID
reference-set crop — lives in :func:`eda_dm_tpu.eval.metrics.center_resize_image`.
"""

from __future__ import annotations

import json
import random
from typing import List, Optional


def load_coco_prompts(json_path: str, shuffle: bool = True,
                      seed: int = 1234,
                      limit: Optional[int] = None) -> List[str]:
    """Read captions from a COCO annotations JSON (``annotations[*].caption``).

    Also accepts a plain newline-separated prompt file (the round-1
    fallback format) so either source drives the COCO pipeline.
    """
    with open(json_path) as f:
        head = f.read(1)
        f.seek(0)
        if head == "{":
            ann = json.load(f)["annotations"]
            prompts = [a["caption"].strip() for a in ann]
        else:
            prompts = [ln.strip() for ln in f if ln.strip()]
    if shuffle:
        random.Random(seed).shuffle(prompts)
    return prompts[:limit] if limit is not None else prompts
