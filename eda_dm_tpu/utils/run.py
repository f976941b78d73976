"""Run management: seeding, timestamped log dirs, config dumps, profiling.

Mirrors the reference's observability conventions (SURVEY §5):
``seed_everything`` (qdiff/utils.py:35-55), the per-run
``logdir/samples/<ts>/run.log`` logging setup
(scripts/sample_diffusion_ddim.py:242-263), the final config dump
(sample_diffusion_ldm_bedroom.py:317-321), plus a jax.profiler trace
context replacing the reference's ad-hoc wall-clock prints.
"""

from __future__ import annotations

import contextlib
import dataclasses
import datetime
import json
import logging
import os
import random
import time
from typing import Any, Dict, Optional

import numpy as np


def enable_compilation_cache(path: str = "~/.cache/eda_dm_tpu_xla") -> None:
    """Turn on JAX's persistent compilation cache.

    The PTQ pipelines compile a handful of large one-shot graphs (trajectory
    scan, calibration forward, per-shape recon scans); on TPU those compiles
    dominate first-run wall-clock (PERF.md).  With the persistent cache every
    later run — and every same-shape graph across tasks — loads the compiled
    executable from disk instead.  Safe to call repeatedly.
    """
    import jax
    path = os.path.expanduser(path)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every graph that takes noticeable compile time
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def relay_mode() -> bool:
    """Whether this process talks to the TPU through a relay whose
    ``block_until_ready`` can return early (the axon tunnel).

    Relay-specific mitigations (forced readbacks in :func:`hard_sync`,
    executable-cache clearing defaults) are gated on this so a direct
    TPU deployment doesn't pay the relay tax.  Auto-detected from the
    backend platform name; ``EDM_RELAY=0/1`` overrides.
    """
    import os
    v = os.environ.get("EDM_RELAY")
    if v is not None:
        return v == "1"
    import jax
    try:
        return jax.default_backend() == "axon"
    except Exception:
        return False


def hard_sync(tree) -> None:
    """Wait until ``tree``'s computation has really finished on device.

    On relay-attached devices (:func:`relay_mode`) ``block_until_ready``
    can return before execution finishes, letting dispatches pile up
    concurrently and exhaust device memory with their transients — there,
    reading an actual value back drains the (in-order) execution queue
    (~one RTT, ~30 ms here).  On a directly-attached TPU this forced
    readback would serialize pipelines for nothing, so plain
    ``block_until_ready`` is used instead.
    """
    import jax
    import numpy as np_
    if not relay_mode():
        jax.block_until_ready(tree)
        return
    leaves = jax.tree.leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, "ravel"):
            np_.asarray(jax.device_get(leaf.ravel()[:1]))
            return


def seed_everything(seed: int) -> "jax.Array":
    """Seed python/numpy and return the root JAX PRNG key.

    JAX randomness is explicit-key; python/numpy seeding covers the host-side
    selection logic (TDAC count repair, shuffles).
    """
    import jax
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def setup_run_dir(logdir: str, name: str = "samples") -> str:
    """Create logdir/<name>/<timestamp>/ with run.log file+stream logging."""
    ts = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    run_dir = os.path.join(logdir, name, ts)
    os.makedirs(os.path.join(run_dir, "img"), exist_ok=True)
    logging.basicConfig(
        format="%(asctime)s - %(levelname)s - %(name)s -   %(message)s",
        datefmt="%m/%d/%Y %H:%M:%S", level=logging.INFO,
        handlers=[logging.FileHandler(os.path.join(run_dir, "run.log")),
                  logging.StreamHandler()], force=True)
    return run_dir


def dump_config(cfg: Any, run_dir: str,
                filename: str = "sampling_config.yaml") -> None:
    """Dump the resolved config (dataclass or dict) next to the run log."""
    if dataclasses.is_dataclass(cfg) and not isinstance(cfg, type):
        cfg = dataclasses.asdict(cfg)
    path = os.path.join(run_dir, filename)
    try:
        import yaml
        with open(path, "w") as f:
            yaml.safe_dump(cfg, f, default_flow_style=False)
    except Exception:
        with open(path.replace(".yaml", ".json"), "w") as f:
            json.dump(cfg, f, indent=2, default=str)


@contextlib.contextmanager
def profile_trace(trace_dir: Optional[str] = None, label: str = "phase"):
    """jax.profiler trace + wall-clock counter for a pipeline phase."""
    import jax
    log = logging.getLogger("eda_dm_tpu.profile")
    t0 = time.time()
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield
    log.info("%s took %.2fs", label, time.time() - t0)


class PhaseTimer:
    """Accumulates per-phase wall-clock (the reference's throughput logs,
    sample_diffusion_ldm_bedroom.py:107-124, as a structured record)."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        yield
        self.times[name] = self.times.get(name, 0.0) + time.time() - t0

    def summary(self) -> Dict[str, float]:
        return dict(self.times)
