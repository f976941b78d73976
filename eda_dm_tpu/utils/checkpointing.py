"""Checkpoint / resume of quantization state via orbax.

The reference has *loading* only and no mid-run resume (SURVEY §5: a crash
loses all calibration state).  Here the quantizer state — scales,
zero-points, AdaRound alphas, EMA ranges — is a plain pytree, so the whole
PTQ artifact checkpoints cheaply, and block reconstruction saves after every
target so an interrupted calibration resumes from the last completed block.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _to_host(tree):
    """Fetch every leaf to host numpy before handing the tree to orbax.

    Orbax's serialization awaits async device-to-host events, and on the
    axon relay those are unreliable (same class of issue as
    block_until_ready returning early, utils/run.py::relay_mode): a
    quick-calib quant tree hung its save in a futex wait for >20 min on
    chip.  Synchronous readback is the proven-reliable transfer path —
    but per-leaf np.asarray pays one relay round-trip per leaf (~2000
    leaves in a production quant tree), so leaves are bucketed by dtype,
    raveled+concatenated on device, and fetched with ONE transfer per
    dtype, then split back bit-exactly on host."""
    import jax.numpy as jnp
    leaves, treedef = jax.tree.flatten(tree)
    dev_idx = [i for i, l in enumerate(leaves) if isinstance(l, jax.Array)]
    if not dev_idx:
        return tree
    out = [l if not isinstance(l, jax.Array) else None for l in leaves]
    by_dtype = {}
    for i in dev_idx:
        by_dtype.setdefault(jnp.asarray(leaves[i]).dtype, []).append(i)
    for dt, idxs in by_dtype.items():
        flat = jnp.concatenate([jnp.ravel(leaves[i]) for i in idxs]) \
            if len(idxs) > 1 else jnp.ravel(leaves[idxs[0]])
        host = np.asarray(flat)                       # one d2h round-trip
        off = 0
        for i in idxs:
            n = int(np.prod(leaves[i].shape, dtype=np.int64))
            out[i] = host[off:off + n].reshape(leaves[i].shape)
            off += n
    return jax.tree.unflatten(treedef, out)


def save_quant_state(path: str, variables: Dict[str, Any],
                     meta: Optional[Dict[str, Any]] = None) -> None:
    """Persist the 'quant' collection (and optionally metadata)."""
    path = os.path.abspath(path)
    _ckptr().save(path, _to_host(variables["quant"]), force=True)
    if meta is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f)


def load_quant_state(path: str, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Restore a saved quant collection into ``variables``.

    The restored tree is deep-merged over the template's quant tree so a
    checkpoint from an older code revision that lacks later-added leaves
    (e.g. the ``a_bits``/``*_bits`` width records) still loads — missing
    leaves keep their freshly-initialized template values.
    """
    from .tree import deep_merge
    quant = _ckptr().restore(os.path.abspath(path))
    template = variables.get("quant") or {}
    return {**variables,
            "quant": deep_merge(template, jax.tree.map(np.asarray, quant))}


def save_serving_bundle(path: str, bundle: Dict[str, Any],
                        stats: Optional[Dict[str, Any]] = None) -> None:
    """Persist a :func:`~eda_dm_tpu.quant.export.serving_bundle` artifact
    (packed-int4 codes + scales; the deployment hand-off the reference ships
    as Google-Drive W4A8 weights, README.md:70-73)."""
    path = os.path.abspath(path)
    _ckptr().save(path, _to_host(bundle), force=True)
    if stats is not None:
        with open(path + ".meta.json", "w") as f:
            json.dump(stats, f)


def load_serving_bundle(path: str, dtype=None) -> Dict[str, Any]:
    """Load a serving bundle and rebuild the full serve-ready variable tree
    (DEPLOY / DEPLOY_INT8 forwards bit-identical to the in-memory export)."""
    from ..quant.export import restore_serving_bundle
    raw = _ckptr().restore(os.path.abspath(path))
    return restore_serving_bundle(raw, dtype)


def load_meta(path: str) -> Optional[Dict[str, Any]]:
    meta_path = os.path.abspath(path) + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None


def resumable_reconstruct(model, variables, cali_data, plan, args, key,
                          checkpoint_dir: str, progress=None,
                          group_size: int = 1, group_window: int = 0,
                          clear_caches_every: int = 0):
    """`calib.recon.reconstruct` with per-group checkpointing.

    After each target group the quant collection is saved along with the
    index of the last completed target; on restart, completed targets are
    skipped and the saved state restored (the capture-order dependence is
    preserved because state after group k fully determines group k+1's
    captures).  ``group_size`` batches adjacent same-shape targets exactly
    like ``reconstruct`` (see calib.recon.reconstruct_group).

    ``clear_caches_every=N`` drops the jit executable caches every N groups
    (same relay-memory mitigation as ``reconstruct``'s own parameter —
    which cannot fire here because each group runs in a fresh
    ``reconstruct`` call whose internal group counter restarts at 0).
    """
    from ..calib.recon import reconstruct, group_plan

    ckpt = os.path.join(checkpoint_dir, "recon_state")
    start = 0
    meta = load_meta(ckpt)
    if meta is not None and meta.get("plan_len") == len(plan):
        variables = load_quant_state(ckpt, variables)
        start = int(meta["completed"])
        if start:
            print(f"  [recon] resuming after {start}/{len(plan)} targets "
                  f"(last: {meta.get('last_target')})", flush=True)

    groups = (group_plan(plan, group_size, group_window) if group_size > 1
              else [[t] for t in plan])
    # pre-split so the key a group sees is independent of where a resume
    # restarted (same stream as an uninterrupted run)
    gkeys = jax.random.split(key, len(groups))
    done = 0
    ran = 0
    for grp, sub in zip(groups, gkeys):
        if done + len(grp) <= start:        # fully completed before resume
            done += len(grp)
            continue
        if clear_caches_every and ran and ran % clear_caches_every == 0:
            jax.clear_caches()
        variables = reconstruct(model, variables, cali_data, grp, args, sub,
                                progress=progress, group_size=group_size,
                                group_window=group_window)
        done += len(grp)
        ran += 1
        save_quant_state(ckpt, variables,
                         meta={"completed": done, "plan_len": len(plan),
                               "last_target": grp[-1].name})
    return variables
