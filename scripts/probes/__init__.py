"""On-chip measurement probes behind ``scripts/probe.py --stage <name>``.

Each module is a self-contained measurement whose results are recorded in
PERF.md; they are kept runnable so future stack/hardware drift can be
re-attributed with the same instruments.
"""

import contextlib
import os

# every env kill-switch the serving policy recognizes (ops/serving_policy.py,
# nn/layers.py, ops/int8_einsum.py)
EDM_KEYS = ("EDM_FUSED_ATTN", "EDM_FUSED_ATTN_NARROW", "EDM_FUSED_SOFTMAX",
            "EDM_FUSED_GN", "EDM_FUSED_GN_NARROW", "EDM_INT8_CONV",
            "EDM_INT8_ATTN", "EDM_INT8_ACC", "EDM_RELAY")


@contextlib.contextmanager
def env_sweep(env: dict):
    """Apply one sweep configuration with a clean slate: every EDM_* key is
    cleared first (a config can't inherit the previous iteration's gates)
    and the pre-sweep environment is restored even on exception."""
    saved = {k: os.environ.get(k) for k in EDM_KEYS}
    try:
        for k in EDM_KEYS:
            os.environ.pop(k, None)
        os.environ.update(env)
        yield
    finally:
        for k in EDM_KEYS:
            os.environ.pop(k, None)
        for k, v in saved.items():
            if v is not None:
                os.environ[k] = v
