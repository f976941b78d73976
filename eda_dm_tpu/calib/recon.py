"""AdaRound + FBR reconstruction engine.

Functional rebuild of the reference's layer/block reconstruction
(/root/reference/qdiff/layer_recon.py:13-129, qdiff/block_recon.py:13-232)
and its capture machinery (qdiff/data_utils.py:7-171):

* **Capture** — instead of forward hooks + StopForwardException, the model is
  applied once in capture mode with ``mutable=['taps']`` and only the target
  block's subtree is returned; XLA dead-code-eliminates every layer after the
  target (the reference's "early abort" for free).  The asymmetric
  (quant-input) capture simply runs the same graph in quantized mode — the
  prefix uses whatever quantizer state earlier reconstructions produced,
  reproducing the reference's block-order dependence
  (data_utils.py:141-151).
* **Optimization** — each target runs one jitted ``lax.scan`` over
  iterations: random minibatch gather, QDrop input mixing
  (block_recon.py:141-145), one block forward with inner taps, the FBR loss
  (block output + add_loss · Σ inner-layer losses excluding the last,
  block_recon.py:186-195), and two Adam groups (alphas at lr_w, activation
  deltas at lr_a) under cosine schedules (block_recon.py:110-117).

Deviation from the reference (documented): the reference recomputes the FP
("module full") inner activations every iteration on the fixed FP inputs
(block_recon.py:158-178); those are constant per sample, so they are captured
once and reused — one block forward per step instead of three, same math.
The quantized forward is likewise evaluated once per step (the reference
evaluates it twice with independent dropout masks; only the dropout noise
differs).
"""

from __future__ import annotations

import dataclasses
from functools import lru_cache, partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax
import flax.linen as nn

from ..quant.config import QuantMode
from ..quant.affine import lp_loss
from ..quant.adaround import round_regularization, soft_targets
from ..utils.tree import (get_subtree, set_subtree, deep_merge,
                          partition_leaves)


@dataclasses.dataclass(frozen=True)
class ReconTarget:
    """One reconstruction unit (a QuantModule or a quant block)."""
    name: str
    path: Tuple[str, ...]
    module: nn.Module           # standalone module matching the subtree
    kind: str                   # 'block' | 'layer'
    has_temb: bool = False
    has_ctx: bool = False       # cross-attention context (transformer blocks)
    # ordered inner QuantModule tap paths (reference hook order); the FBR
    # loss sums all but the last (block_recon.py:187-191)
    inner_taps: Tuple[Tuple[str, ...], ...] = ()
    # layer-mode attention target: optimize only the block-level q/k/v/w
    # activation deltas against the block FP output
    # (AttnBlock_layer_reconstruction, qdiff/attn_layer_recon.py:13-133)
    act_only: bool = False


@dataclasses.dataclass(frozen=True)
class ReconArgs:
    """Reference hyperparameters (scripts/sample_diffusion_ddim.py:291-307)."""
    iters: int = 5000
    batch_size: int = 32
    lr_w: float = 5e-1
    lr_a: float = 5e-4
    add_loss: float = 0.8
    input_prob: float = 0.5
    p: float = 2.0
    act_quant: bool = True
    asym: bool = True
    recon_w: bool = True
    recon_a: bool = True
    # rounding-relaxation regularizer (inactive: loss_mode='none' in every
    # reference pipeline, layer_recon.py:88 / block_recon.py:119)
    round_loss: str = "none"
    weight: float = 1e-4
    b_range: Tuple[int, int] = (20, 2)
    warmup: float = 0.2
    capture_batch_size: Optional[int] = None
    # dtype the activation caches are stored in ('bfloat16' halves the
    # multi-GB captures of the 64x64-latent production tasks so a full
    # calib-1024 recon plan fits one 16 GB chip; minibatches are upcast to
    # f32 before the block forward/loss).  None = full f32 caches.
    cache_dtype: Optional[str] = None
    # cap on a group's summed activation-cache bytes: groups whose members'
    # captures would exceed this split into smaller runs (a group of 4
    # 64x64-latent res blocks at calib 1024 needs ~36 GB).  Estimated via
    # eval_shape before any capture runs.
    capture_budget_bytes: int = 6_000_000_000
    # share ONE capture executable per mode across the whole plan (the
    # jitted program returns every plan target's taps; each group selects
    # its subset outside the jit).  Trades cold capture compiles for the
    # un-DCE'd model suffix AND the whole universe's tap materialization
    # per capture batch.  MEASURED REGRESSION at LDM scale (PERF.md round
    # 3): the church plan (~65 targets) pays multi-GB of universe-tap HBM
    # writes + readback syncs per capture — 700-990 s/target vs the
    # ~100 s/target of per-group programs — so this is OFF by default;
    # cold compiles are instead absorbed by the persistent compilation
    # cache across runs.  Consider only for small plans with few taps.
    shared_capture: bool = False


# --------------------------------------------------------------------------
# capture
# --------------------------------------------------------------------------

FP_CAPTURE = QuantMode(capture=True)


def _pad_rows(a: jnp.ndarray, target: int) -> jnp.ndarray:
    """Pad a batch to ``target`` rows by cyclic repetition."""
    if a.shape[0] >= target:
        return a[:target]
    reps = -(-target // a.shape[0])
    return jnp.tile(a, (reps,) + (1,) * (a.ndim - 1))[:target]


def quant_capture_mode(act_quant: bool) -> QuantMode:
    return QuantMode(w_quant=True, a_quant=act_quant, capture=True)


@partial(jax.jit, static_argnums=(0, 3, 4, 5, 6))
def _capture_batch(model, variables, batch, path: Tuple[str, ...],
                   keep: Tuple[Tuple[str, ...], ...], mode: QuantMode,
                   cast_dtype: Optional[str] = None):
    """Run the model, return only the ``keep`` tap leaves (+ temb).

    Selecting individual leaves inside the jit lets XLA dead-code-eliminate
    both the suffix of the network (the reference's StopForwardException,
    data_utils.py:78-104) and the unused taps — at high resolutions the
    unselected 'in' taps alone are multiple GB per capture.  ``cast_dtype``
    (e.g. bf16) is applied *inside* the program so the f32 tap buffers are
    never materialized as outputs.
    """
    _, taps = model.apply(variables, *batch, mode=mode, mutable=["taps"])
    sub = get_subtree(taps["taps"], path)
    kept = tuple(get_subtree(sub, kp) for kp in keep)
    temb = taps["taps"].get("temb")
    if cast_dtype:
        kept = jax.tree.map(lambda a: a.astype(cast_dtype), kept)
        temb = temb.astype(cast_dtype) if temb is not None else None
    return kept, temb


def capture_target(model, variables, cali_data: Sequence,
                   path: Tuple[str, ...],
                   mode: QuantMode, keep: Tuple[Tuple[str, ...], ...],
                   batch_size: Optional[int] = None,
                   cache_dtype: Optional[str] = None,
                   keep_universe: Optional[Tuple[Tuple[str, ...], ...]]
                   = None):
    """Capture selected taps (paths relative to ``path``) over the
    calibration set, batched; optionally stored at ``cache_dtype``.

    ``keep_universe``: when given (a superset of ``keep``, identical for
    every call in a reconstruction run) the jitted program returns the
    *universe* and the subset is selected outside — so every group in a
    plan shares ONE compiled capture program per mode instead of one per
    group (cold capture compiles dominated production recon wall-clock,
    PERF.md round 2).  Costs the un-DCE'd model suffix per batch and the
    unselected taps' transient memory, both bounded by the batch size.

    Returns (dict keyed by keep-path, temb).
    """
    n = cali_data[0].shape[0]
    bs = min(batch_size or n, n)
    run_keep = keep_universe if keep_universe is not None else keep
    sel = ([keep_universe.index(kp) for kp in keep]
           if keep_universe is not None else None)
    import os as _os
    if _os.environ.get("EDA_DEBUG_CAPTURE"):
        print(f"    [capture] keep[0]={keep[0]} n={n} bs={bs} "
              f"universe={len(run_keep)} "
              f"mode=(w={mode.w_quant},a={mode.a_quant})", flush=True)
    oom_retries = 0
    while True:
        try:
            return _capture_chunks(model, variables, cali_data, path, mode,
                                   keep, run_keep, sel, n, bs, cache_dtype)
        except Exception as e:  # jaxlib XlaRuntimeError has no stable type
            if "RESOURCE_EXHAUSTED" not in str(e) or oom_retries >= 3:
                raise
            oom_retries += 1
            # Late-plan captures have OOMed on bedroom-size models after
            # ~80 min of recon (round-4 queue): resident compiled programs
            # plus allocator fragmentation, not the capture's own working
            # set.  First retry just drops the executable caches (programs
            # re-load from the persistent compilation cache); subsequent
            # retries also halve the capture batch.
            jax.clear_caches()
            if oom_retries > 1:
                bs = max(1, bs // 2)
            print(f"    [capture] RESOURCE_EXHAUSTED — retry "
                  f"{oom_retries}/3 (cleared executable caches, bs={bs})",
                  flush=True)


@partial(jax.jit, donate_argnums=(0,))
def _buf_write(buf, chunk, start):
    """In-place (donated) row-range write of a capture chunk."""
    return jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, axis=0)


def _capture_chunks(model, variables, cali_data, path, mode, keep,
                    run_keep, sel, n: int, bs: int,
                    cache_dtype: Optional[str]):
    n_full, rem = divmod(n, bs)
    n_chunks = n_full + (1 if rem else 0)
    bufs = None
    tembs = []
    for i in range(n_chunks):
        batch = tuple(a[i * bs:(i + 1) * bs] for a in cali_data)
        if rem and i == n_full:
            # partial tail: pad to bs by repeating rows so the same
            # compiled program serves it; padded rows are dropped by the
            # final [:n] slice below.  (No calibration row is ever
            # silently lost for indivisible n.)
            batch = tuple(_pad_rows(a, bs) for a in batch)
        kept, temb = _capture_batch(model, variables, batch, path,
                                    run_keep, mode, cache_dtype)
        if sel is not None:
            kept = tuple(kept[j] for j in sel)
        # serialize chunks with a real readback: relay-attached devices can
        # otherwise pile up concurrent executions whose transients OOM
        # (utils/run.py::hard_sync)
        from ..utils.run import hard_sync
        hard_sync(kept)
        tembs.append(temb)
        if n_chunks == 1:
            # single chunk (bs == n): the capture outputs ARE the caches
            return dict(zip(keep, kept)), temb
        if bufs is None:
            # accumulate chunks into preallocated exact-size buffers with
            # donated row-range writes instead of a list + jnp.concatenate:
            # the concat transiently doubles the cache bytes (chunks +
            # copy), which OOM'd the imagenet recon captures (round-4
            # queue).  Buffers are exactly n rows; the padded tail chunk
            # is clipped before its write so no final slice-copy is needed.
            bufs = [jnp.zeros((n,) + k.shape[1:], k.dtype) for k in kept]
        if rem and i == n_full:
            kept = tuple(k[:rem] for k in kept)
        bufs = [_buf_write(b, k, jnp.int32(i * bs))
                for b, k in zip(bufs, kept)]
    kept = tuple(bufs)
    temb = (jnp.concatenate(tembs)[:n] if tembs[0] is not None else None)
    return dict(zip(keep, kept)), temb


# --------------------------------------------------------------------------
# trainable-parameter selection
# --------------------------------------------------------------------------

def _is_alpha(path: Tuple[str, ...], leaf) -> bool:
    return path[-1].endswith("_alpha")


def _is_act_delta(path: Tuple[str, ...], leaf) -> bool:
    return (path[-1] == "delta" and len(path) >= 2
            and path[-2].startswith("act_quantizer"))


def split_trainable(quant_sub: Dict[str, Any], recon_w: bool, recon_a: bool):
    """Partition a block's quant subtree into (trainable, frozen).

    Trainable = AdaRound alphas (block_recon.py:50-64) and activation-quantizer
    deltas (block_recon.py:66-108); everything else (weight deltas/zps, EMA
    state) stays frozen.
    """
    def pred(path, leaf):
        return ((recon_w and _is_alpha(path, leaf)) or
                (recon_a and _is_act_delta(path, leaf)))
    return partition_leaves(quant_sub, pred)


def _param_labels(train: Dict[str, Any]):
    def walk(node, path):
        if not isinstance(node, dict):
            return "w" if path[-1].endswith("_alpha") else "a"
        return {k: walk(v, path + (k,)) for k, v in node.items()}
    return walk(train, ())


# --------------------------------------------------------------------------
# per-target optimization
# --------------------------------------------------------------------------

def _linear_temp_decay(t, iters: int, warmup: float, b_range):
    """Temperature b schedule (block_recon.py:305-323)."""
    start = warmup * iters
    rel = (t - start) / (iters - start)
    b = b_range[1] + (b_range[0] - b_range[1]) * jnp.maximum(0.0, 1.0 - rel)
    return jnp.where(t < start, float(b_range[0]), b)


def _recon_impl(module, has_temb: bool, has_ctx: bool,
                inner_taps: Tuple[Tuple[str, ...], ...], use_inner: bool,
                args: ReconArgs, mesh, block_params, frozen, train, data,
                key):
    """The per-target optimization scan (pure; jitted/vmapped by wrappers).

    Static args exclude the target's name/path, and flax modules hash by
    field values — so equal block configs with equal data shapes share one
    compiled program across targets (the CIFAR UNet repeats most of its
    block shapes).

    ``mesh``: optional 1-D 'dp' device mesh.  The scan keeps global
    semantics — the same rows are drawn and the same loss computed — but
    every minibatch tensor carries a batch-axis sharding constraint, so
    GSPMD shards the block forward/backward across devices and all-reduces
    the (mean-loss) gradients, replacing the reference's single-device
    accumulation (SURVEY §2 preamble / §5 distributed-communication row).
    """
    mode = QuantMode(w_quant=True, a_quant=args.act_quant,
                     soft_targets=args.recon_w, training=True, capture=True)
    inp_q, inp_s, temb_q, ctx_q, out_fp_all, inner_fp = data
    n = out_fp_all.shape[0]
    bs = min(args.batch_size, n)

    labels = _param_labels(train)
    w_sched = optax.cosine_decay_schedule(args.lr_w, args.iters)
    a_sched = optax.cosine_decay_schedule(args.lr_a, args.iters)
    tx = optax.multi_transform(
        {"w": optax.adam(w_sched), "a": optax.adam(a_sched)}, labels)
    opt_state = tx.init(train)
    dummy = jnp.zeros((bs, 0))

    def forward(train_leaves, x, temb, ctx, rng):
        quant = deep_merge(frozen, train_leaves)
        vs = {"params": block_params, "quant": quant}
        if has_temb:
            a = (x, temb)
        elif has_ctx:
            a = (x, ctx)
        else:
            a = (x,)
        out, taps = module.apply(vs, *a, mode, mutable=["taps"],
                                 rngs={"qdrop": rng})
        return out, taps["taps"]

    def loss_fn(train_leaves, batch, rng, it):
        x, temb, ctx, out_fp, inners = batch
        out, taps = forward(train_leaves, x, temb, ctx, rng)
        loss = lp_loss(out, out_fp, args.p, channel_axis=-1)
        if use_inner:
            m_loss = 0.0
            for tap_path, fp_act in zip(inner_taps[:-1], inners[:-1]):
                q_act = get_subtree(taps, tap_path + ("out",))
                m_loss = m_loss + lp_loss(q_act, fp_act, 2.0, channel_axis=-1)
            loss = loss + args.add_loss * m_loss
        if args.round_loss == "relaxation":
            b = _linear_temp_decay(it, args.iters, args.warmup, args.b_range)
            reg = sum(round_regularization(v, b) for p, v in
                      jax.tree_util.tree_flatten_with_path(train_leaves)[0]
                      if jax.tree_util.keystr(p).endswith("_alpha']"))
            loss = loss + args.weight * reg
        return loss

    # minibatches are upcast to f32 when caches are stored at a reduced
    # dtype (ReconArgs.cache_dtype) — free (no-op) on f32 caches
    f32 = lambda a: a.astype(jnp.float32)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        axis = mesh.axis_names[0]
        shard = lambda a: jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
    else:
        shard = lambda a: a

    def step(carry, it):
        train_leaves, opt_state, key = carry
        key, k_idx, k_mix, k_drop = jax.random.split(key, 4)
        idx = jax.random.choice(k_idx, n, (bs,), replace=False)
        xq = shard(f32(jnp.take(inp_q, idx, axis=0)))
        xs = shard(f32(jnp.take(inp_s, idx, axis=0)))
        if args.input_prob < 1.0:
            m = jax.random.uniform(k_mix, xq.shape) < args.input_prob
            x = jnp.where(m, xq, xs)
        else:
            x = xs                     # reference: cur_inp = cur_sym (:145)
        temb = (shard(f32(jnp.take(temb_q, idx, axis=0)))
                if temb_q is not None else dummy)
        ctx = (shard(f32(jnp.take(ctx_q, idx, axis=0)))
               if ctx_q is not None else dummy)
        out_fp = shard(f32(jnp.take(out_fp_all, idx, axis=0)))
        inners = tuple(shard(f32(jnp.take(a, idx, axis=0)))
                       for a in inner_fp)
        loss, grads = jax.value_and_grad(loss_fn)(
            train_leaves, (x, temb, ctx, out_fp, inners), k_drop,
            it.astype(jnp.float32))
        updates, opt_state = tx.update(grads, opt_state, train_leaves)
        train_leaves = optax.apply_updates(train_leaves, updates)
        return (train_leaves, opt_state, key), loss

    (train, _, _), losses = jax.lax.scan(
        step, (train, opt_state, key), jnp.arange(args.iters))
    return train, losses


_recon_scan = partial(jax.jit,
                      static_argnums=(0, 1, 2, 3, 4, 5, 6))(_recon_impl)


@lru_cache(maxsize=None)
def _grouped_scan_fn(module, has_temb: bool, has_ctx: bool,
                     inner_taps: Tuple[Tuple[str, ...], ...], use_inner: bool,
                     args: ReconArgs, mesh=None):
    """jit(vmap(...)) of the recon scan over a stacked group of same-shape
    targets.  Cached on the static signature so repeated group shapes share
    one compiled program."""
    impl = partial(_recon_impl, module, has_temb, has_ctx, inner_taps,
                   use_inner, args, mesh)
    return jax.jit(jax.vmap(impl))


def _prepare_target(target: ReconTarget, variables: Dict[str, Any],
                    data: Dict[str, Any], args: ReconArgs):
    """Split the target's quant subtree and pack its captured data.

    Returns (block_params, block_quant, train, frozen, packed, use_inner,
    args) — everything ``_recon_impl`` needs besides the rng key.
    """
    block_params = get_subtree(variables["params"], target.path)
    block_quant = get_subtree(variables["quant"], target.path)
    if target.act_only:
        # only the attention q/k/v/w deltas train (attn_layer_recon.py)
        train, frozen = partition_leaves(
            block_quant,
            lambda p, _: (len(p) == 2 and p[1] == "delta"
                          and p[0].startswith("act_quantizer_")))
        args = dataclasses.replace(args, recon_w=False)
    else:
        train, frozen = split_trainable(block_quant, args.recon_w,
                                        args.recon_a)
    inner_fp = data.get("inner_fp", ())
    use_inner = target.kind == "block" and len(inner_fp) > 1 and \
        args.add_loss > 0.0
    packed = (data["inp_q"], data["inp_s"], data.get("temb_q"),
              data.get("ctx_q"), data["out_fp"], tuple(inner_fp))
    return block_params, block_quant, train, frozen, packed, use_inner, args


def reconstruct_target(target: ReconTarget, variables: Dict[str, Any],
                       data: Dict[str, Any], args: ReconArgs,
                       key: jax.Array, mesh=None) -> Dict[str, Any]:
    """Optimize one target's rounding masks + act scales; return new variables.

    ``data`` fields: inp_q, inp_s (captured quant/FP block inputs), out_fp
    (FP block output), optional temb_q/temb_s, inner_fp (tuple of FP inner
    layer outputs, ordered as target.inner_taps).
    """
    (block_params, block_quant, train, frozen, packed, use_inner,
     args) = _prepare_target(target, variables, data, args)
    if not jax.tree.leaves(train):
        return variables, jnp.zeros((args.iters,))

    train, losses = _recon_scan(target.module, target.has_temb,
                                target.has_ctx, target.inner_taps, use_inner,
                                args, mesh, block_params, frozen, train,
                                packed, key)

    new_quant_sub = deep_merge(block_quant, train)
    new_quant = set_subtree(variables["quant"], target.path, new_quant_sub)
    return {**variables, "quant": new_quant}, losses


def reconstruct_group(targets: Sequence[ReconTarget],
                      variables: Dict[str, Any],
                      datas: Sequence[Dict[str, Any]], args: ReconArgs,
                      key: jax.Array, mesh=None):
    """Optimize several same-signature targets in one vmapped scan.

    All members share the static signature (module config, temb/ctx layout,
    inner taps) and leaf shapes; their params, quant state and captured data
    are stacked on a new leading axis and the per-target scan runs under
    ``vmap`` — on TPU the recon step at batch 32 is latency-bound, so G
    targets cost roughly the wall-clock of one.

    Semantics vs sequential order (documented deviation): each member's
    asymmetric input capture was taken *before* any member of the group was
    reconstructed, so later members don't see earlier members' new rounding
    masks in their inputs.  The reference updates that state target-by-target
    (qdiff/recon_block_Qmodel.py:26-58); with the small groups this is used
    with (same-shape neighbours), the input drift is one block's rounding
    change.  ``group_size=1`` restores exact sequential semantics.
    """
    prepared = [_prepare_target(t, variables, d, args)
                for t, d in zip(targets, datas)]
    args = prepared[0][6]
    if not jax.tree.leaves(prepared[0][2]):
        return variables, [jnp.zeros((args.iters,))] * len(targets)

    stack = lambda i: jax.tree.map(lambda *xs: jnp.stack(xs),
                                   *[p[i] for p in prepared])
    params_s, train_s, frozen_s = stack(0), stack(2), stack(3)
    packed_s = stack(4)
    keys = jax.random.split(key, len(targets))
    t0 = targets[0]
    fn = _grouped_scan_fn(t0.module, t0.has_temb, t0.has_ctx, t0.inner_taps,
                          prepared[0][5], args, mesh)
    train_s, losses = fn(params_s, frozen_s, train_s, packed_s, keys)

    for g, (target, prep) in enumerate(zip(targets, prepared)):
        train_g = jax.tree.map(lambda x: x[g], train_s)
        new_quant_sub = deep_merge(prep[1], train_g)
        variables = {**variables,
                     "quant": set_subtree(variables["quant"], target.path,
                                          new_quant_sub)}
    return variables, [losses[g] for g in range(len(targets))]


# --------------------------------------------------------------------------
# orchestration (recon_block_Qmodel equivalent)
# --------------------------------------------------------------------------

def _keep_paths(target: ReconTarget):
    """(in_key, out_key, fp_keep, q_keep) tap paths relative to the target."""
    if target.kind == "block":
        in_key, out_key = ("block_in",), ("block_out",)
    else:
        in_key, out_key = ("in",), ("out",)
    fp_keep = [in_key, out_key]
    if target.kind == "block":
        fp_keep += [tp + ("out",) for tp in target.inner_taps]
    q_keep = [in_key]
    if target.has_ctx:
        fp_keep.append(("block_ctx",))
        q_keep.append(("block_ctx",))
    return in_key, out_key, fp_keep, q_keep


def build_group_data(model, variables, cali_data,
                     targets: Sequence[ReconTarget],
                     args: ReconArgs,
                     universe: Optional[Tuple[Tuple, Tuple]] = None
                     ) -> List[Dict[str, Any]]:
    """FP + quantized captures for a group of targets in two model forwards
    (save_inp_oup_data equivalent, data_utils.py:7-75).

    All targets' tap leaves are selected inside the same capture jit, so a
    group costs the same two compiled programs a single target does (the
    round-1 profile showed per-target capture compiles dominating recon
    wall-clock).  Memory scales with the group's summed tap sizes.
    """
    metas = [_keep_paths(t) for t in targets]
    fp_abs, q_abs = [], []
    for t, (in_key, out_key, fp_keep, q_keep) in zip(targets, metas):
        fp_abs += [t.path + kp for kp in fp_keep]
        q_abs += [t.path + kp for kp in q_keep]

    fp_univ, q_univ = universe if universe is not None else (None, None)
    fp_sub, fp_temb = capture_target(model, variables, cali_data, (),
                                     FP_CAPTURE, tuple(fp_abs),
                                     args.capture_batch_size,
                                     args.cache_dtype,
                                     keep_universe=fp_univ)
    q_sub, q_temb = capture_target(
        model, variables, cali_data, (),
        quant_capture_mode(args.act_quant) if args.asym else FP_CAPTURE,
        tuple(q_abs), args.capture_batch_size, args.cache_dtype,
        keep_universe=q_univ)

    datas = []
    for t, (in_key, out_key, fp_keep, q_keep) in zip(targets, metas):
        data = {
            "inp_s": fp_sub[t.path + in_key],
            "inp_q": q_sub[t.path + in_key],
            "out_fp": fp_sub[t.path + out_key],
        }
        if t.has_temb:
            data["temb_s"] = fp_temb
            data["temb_q"] = q_temb
        if t.has_ctx:
            data["ctx_q"] = q_sub.get(t.path + ("block_ctx",))
            data["ctx_s"] = fp_sub.get(t.path + ("block_ctx",))
        if t.kind == "block":
            data["inner_fp"] = tuple(
                fp_sub[t.path + tp + ("out",)] for tp in t.inner_taps)
        datas.append(data)
    return datas


def build_target_data(model, variables, cali_data, target: ReconTarget,
                      args: ReconArgs) -> Dict[str, Any]:
    """Single-target capture (group of one)."""
    return build_group_data(model, variables, cali_data, [target], args)[0]


def _signature(t: ReconTarget):
    """Static part of a target's compile signature (shapes checked later)."""
    return (t.module, t.kind, t.has_temb, t.has_ctx, t.inner_taps, t.act_only)


def group_plan(plan: Sequence[ReconTarget], group_size: int,
               window: int = 0) -> List[List[ReconTarget]]:
    """Split the plan into groups of same-signature targets, capped at
    ``group_size``.

    ``window=0``: only *adjacent* targets group (runs), preserving the
    reference's reconstruction order across groups.  ``window=k`` lets a
    group absorb a same-signature target up to ``k`` differently-shaped
    targets later — bridging the block/attn alternation of the attention
    levels (pattern b,a,b,a,b,a → [b,b,b], [a,a,a] at window 1).  Groups
    execute in first-member order, so relative order *between* groups is a
    bounded local reordering of the reference walk.
    """
    groups: List[List[ReconTarget]] = []
    open_groups: List[list] = []     # [sig, group, last_index]
    for idx, t in enumerate(plan):
        sig = _signature(t)
        open_groups = [og for og in open_groups
                       if idx - og[2] <= window + 1
                       and len(og[1]) < group_size]
        for og in open_groups:
            if og[0] == sig:
                og[1].append(t)
                og[2] = idx
                break
        else:
            g = [t]
            groups.append(g)
            open_groups.append([sig, g, idx])
    return groups


def _member_cache_bytes(model, variables, cali_data, target: ReconTarget,
                        args: ReconArgs) -> int:
    """Estimated bytes of one target's activation caches (no execution:
    abstract trace of the capture forward via eval_shape)."""
    _, _, fp_keep, q_keep = _keep_paths(target)
    keeps = [target.path + kp for kp in fp_keep] + \
            [target.path + kp for kp in q_keep]
    n = cali_data[0].shape[0]
    bs = args.capture_batch_size or n
    batch = tuple(jax.ShapeDtypeStruct((bs,) + a.shape[1:], a.dtype)
                  for a in cali_data)

    def fn(v, b):
        _, taps = model.apply(v, *b, mode=FP_CAPTURE, mutable=["taps"])
        return tuple(get_subtree(taps["taps"], kp) for kp in keeps)

    shapes = jax.eval_shape(fn, variables, batch)
    itemsize = 2 if args.cache_dtype else 4
    scale = -(-n // bs)          # ceil: tail chunks count in full
    return int(sum(int(np.prod(s.shape)) * itemsize * scale
                   for s in shapes))


def _split_by_budget(model, variables, cali_data,
                     grp: List[ReconTarget], args: ReconArgs):
    """Split a group so its summed cache bytes stay under the budget.

    Returns (subgroups, row_cap): when even a single member exceeds the
    budget (e.g. CFG-doubled calib rows on the 64×64-latent levels), the
    member's caches are built from the first ``row_cap`` calibration rows
    instead — the recon scan draws its minibatches from the cache either
    way, so this only shrinks the sample pool for that target.

    Every member is sized individually: a window-bridged group shares a
    *static* signature but not necessarily activation shapes (down-level
    attn vs mid attn), so sizing from the first member alone could blow
    the budget the cap exists to protect.
    """
    pers = [_member_cache_bytes(model, variables, cali_data, t, args)
            for t in grp]
    n = cali_data[0].shape[0]
    worst = max(pers)
    if worst > args.capture_budget_bytes:
        frac = args.capture_budget_bytes / worst
        bs = args.capture_batch_size or n
        row_cap = max(bs, int(n * frac) // bs * bs)
        return [[t] for t in grp], row_cap
    # greedy pack: consecutive members whose summed caches fit the budget
    subgroups: List[List[ReconTarget]] = []
    cur: List[ReconTarget] = []
    cur_bytes = 0
    for t, p in zip(grp, pers):
        if cur and cur_bytes + p > args.capture_budget_bytes:
            subgroups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(t)
        cur_bytes += p
    subgroups.append(cur)
    return subgroups, None


def _shape_sig(variables, target: ReconTarget, data: Dict[str, Any]):
    """Hashable (treedef, leaf shapes/dtypes) of everything the scan stacks."""
    tree = (get_subtree(variables["params"], target.path),
            get_subtree(variables["quant"], target.path), data)
    leaves, treedef = jax.tree.flatten(tree)
    return treedef, tuple((l.shape, str(l.dtype)) for l in leaves)


def reconstruct(model, variables: Dict[str, Any], cali_data: Sequence,
                plan: Sequence[ReconTarget], args: ReconArgs,
                key: jax.Array,
                progress: Optional[Callable[[str, float], None]] = None,
                group_size: int = 1, group_window: int = 0,
                clear_caches_every: int = 0, mesh=None):
    """Sequential block/layer reconstruction over the plan
    (recon_block_Qmodel.recon, qdiff/recon_block_Qmodel.py:18-94).

    Order matters: each target's quantized-input capture sees the quantizer
    state produced by all previous targets.  ``group_size > 1`` batches runs
    of adjacent same-shape targets into one vmapped scan + shared captures
    (see :func:`reconstruct_group` for the exact semantics deviation);
    ``group_size=1`` is the reference-exact sequential path.

    ``clear_caches_every=N`` drops the jit executable caches every N groups:
    compiled TPU programs occupy device memory, and a long plan over a large
    model can exhaust it through program accumulation alone (observed on the
    bedroom config: a capture graph with ~0 temp bytes raised
    RESOURCE_EXHAUSTED after the calibration phases' programs were resident,
    but ran fine in a fresh process).  With the persistent compilation cache
    on, re-needed programs deserialize from disk instead of recompiling.
    """
    groups = (group_plan(plan, group_size, group_window) if group_size > 1
              else [[t] for t in plan])
    release = lambda tree: jax.tree.map(
        lambda x: x.delete() if hasattr(x, "delete") else None, tree)
    universe = None
    if args.shared_capture and len(plan) > 1:
        # one capture executable per mode for the whole plan: every group's
        # capture returns the same (universe) tap set, so the compiled
        # program is reused across groups (cold capture compiles dominated
        # production recon, PERF.md round 2).  Bound the per-batch
        # transient (all taps of one batch live simultaneously) by capping
        # the capture batch size.
        fp_u, q_u = [], []
        for t in plan:
            _, _, fp_keep, q_keep = _keep_paths(t)
            fp_u += [t.path + kp for kp in fp_keep]
            q_u += [t.path + kp for kp in q_keep]
        universe = (tuple(dict.fromkeys(fp_u)), tuple(dict.fromkeys(q_u)))
        if args.capture_batch_size is None:
            args = dataclasses.replace(
                args, capture_batch_size=min(32, cali_data[0].shape[0]))
    budgeted = []
    for g in groups:
        sgs, row_cap = _split_by_budget(model, variables, cali_data, g, args)
        budgeted += [(sg, row_cap) for sg in sgs]
    for gi, (grp, row_cap) in enumerate(budgeted):
        if clear_caches_every and gi and gi % clear_caches_every == 0:
            jax.clear_caches()
        if row_cap:
            # fixed permutation, not a prefix: CFG calib sets are laid out
            # [uncond-half; cond-half] and a prefix would drop conditioning
            perm = np.random.RandomState(0).permutation(
                cali_data[0].shape[0])[:row_cap]
            grp_cali = tuple(jnp.take(a, jnp.asarray(perm), axis=0)
                             for a in cali_data)
        else:
            grp_cali = cali_data
        datas = build_group_data(model, variables, grp_cali, grp, args,
                                 universe=universe)
        if mesh is not None:
            # distribute the activation caches' rows over the mesh (each
            # device holds n/n_dev rows; the scan's row gathers and the
            # sharded minibatch compute ride GSPMD collectives)
            from ..parallel.mesh import shard_batch
            datas = [shard_batch(mesh, d) for d in datas]

        # same signature can still stack differently (e.g. inferred input
        # widths) — split into runs of identical leaf shapes
        runs: List[Tuple[Any, List[int]]] = []
        for i, (t, d) in enumerate(zip(grp, datas)):
            sig = _shape_sig(variables, t, d)
            if runs and runs[-1][0] == sig:
                runs[-1][1].append(i)
            else:
                runs.append((sig, [i]))

        for _, idxs in runs:
            key, sub = jax.random.split(key)
            members = [grp[i] for i in idxs]
            if len(members) == 1:
                variables, losses = reconstruct_target(
                    members[0], variables, datas[idxs[0]], args, sub,
                    mesh=mesh)
                losses_list = [losses]
            else:
                variables, losses_list = reconstruct_group(
                    members, variables, [datas[i] for i in idxs], args, sub,
                    mesh=mesh)
            # release this run's activation caches before the next capture
            # (high-res up-level caches are multi-GB at batch 1024); temb
            # buffers are tiny and shared across the group's members, so
            # they are left alive
            for i in idxs:
                release({k: v for k, v in datas[i].items()
                         if not k.startswith("temb")})
                datas[i] = None
            if progress is not None:
                for t, l in zip(members, losses_list):
                    progress(t.name, float(l[-1]))
    return variables
