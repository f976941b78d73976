"""TDAC — temporal density and diversity aware calibration-set selection.

Rebuild of the reference's per-task generators
(/root/reference/scripts/calibration.py:12-153 for the CIFAR flavour): run
the FP sampler once, record every intermediate latent and the mid-block
attention input feature, score each timestep by feature-space density and
diversity, and draw per-timestep sample counts proportional to the blended
score.

TPU-native design: the trajectory is one jitted ``lax.scan`` that stacks
(x_t, feature_t) on device; the O(T²) pairwise density/diversity reduce to
two Gram matrices (the reference's per-position cosine sum factorizes into an
inner product of position-normalized features); only the tiny per-timestep
count repair runs on host.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass
class TDACResult:
    calib_x: jnp.ndarray      # (N, ...) selected latents
    calib_t: jnp.ndarray      # (N,) model-time values (seq mapped)
    time_codes: np.ndarray    # (N,) selected step positions (0 = x_T)
    t_num: np.ndarray         # (T,) per-timestep counts (diagnostic plot data)
    density: np.ndarray       # (T,) raw density scores
    diversity: np.ndarray     # (T,) raw diversity scores


@jax.jit
def _pair_scores(feats: jnp.ndarray):
    """Pairwise MSE matrix and per-position cosine-similarity sums.

    feats: (T, B, H, W, C).  Returns (mse[T,T], cos_sum[T,T]) matching
    calibration.py:47-68 — MSE over whole tensors; cosine over the channel
    axis per (b, h, w) position, summed over positions.
    """
    T = feats.shape[0]
    flat = feats.reshape(T, -1).astype(jnp.float32)
    k = flat.shape[1]
    sq = jnp.sum(flat * flat, axis=1)
    gram = flat @ flat.T
    mse = (sq[:, None] + sq[None, :] - 2.0 * gram) / k

    # per-position channel-normalized features → cosine sums are a Gram matrix
    pos = feats.reshape(T, -1, feats.shape[-1]).astype(jnp.float32)  # (T,P,C)
    norm = jnp.maximum(jnp.linalg.norm(pos, axis=-1, keepdims=True), 1e-6)
    unit = (pos / norm).reshape(T, -1)
    cos_sum = unit @ unit.T
    return mse, cos_sum


def _normalize(v: np.ndarray) -> np.ndarray:
    rng = v.max() - v.min()
    return (v - v.min()) / (rng if rng > 0 else 1.0)


def timestep_counts(mse: np.ndarray, cos_sum: np.ndarray, num_positions: int,
                    lamda: float, calib_num_samples: int,
                    dense_r: float) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Blend density/diversity into per-timestep sample counts.

    calibration.py:47-92: density = #{j≠i : mse(i,j) ≤ dense_r}; diversity =
    Σ_{j≠i} Σ_pos (1 − cos); w = D̂ + λV̂; counts = round(prob·N) with
    exact-sum repair (add to the largest counts, subtract from the tail).
    """
    T = mse.shape[0]
    off = ~np.eye(T, dtype=bool)
    density = ((mse <= dense_r) & off).sum(1).astype(np.float64)
    diversity = np.where(off, num_positions - cos_sum, 0.0).sum(1)

    w = _normalize(density) + lamda * _normalize(diversity)
    prob = w / w.sum()
    t_num = np.round(prob * calib_num_samples).astype(np.int64)
    err = calib_num_samples - t_num.sum()
    if err >= 0:
        order = np.argsort(-t_num, kind="stable")
        t_num[order[:err]] += 1
    else:
        for i in reversed(range(T)):
            if err == 0:
                break
            if t_num[i] > 0:
                t_num[i] -= 1
                err += 1
    assert t_num.sum() == calib_num_samples
    return t_num, density, diversity


def select_calib_set(trajectory: jnp.ndarray, feats: jnp.ndarray,
                     seq: np.ndarray, lamda: float, calib_num_samples: int,
                     dense_r: float, key: jax.Array) -> TDACResult:
    """Full TDAC selection given a recorded trajectory.

    trajectory: (T, B, ...) per-step model inputs, index 0 = x_T
    (the reference's ``all_sample = xs[:-1]``, calibration.py:34-42).
    feats: (T, B, H, W, C) mid-block attention inputs per step.
    Sample k draws position k % B of the shared trajectory at its assigned
    timestep (the reference reuses one recorded batch, calibration.py:111-122),
    then maps step positions to model times via seq reversed
    (calibration.py:146-149).
    """
    T, B = trajectory.shape[:2]
    mse, cos_sum = _pair_scores(feats)
    num_positions = int(np.prod(feats.shape[1:-1]))  # B*H*W
    t_num, density, diversity = timestep_counts(
        np.asarray(mse), np.asarray(cos_sum), num_positions, lamda,
        calib_num_samples, dense_r)

    codes = np.repeat(np.arange(T), t_num)
    perm = np.asarray(jax.random.permutation(key, codes.shape[0]))
    codes = codes[perm]
    pos = np.arange(calib_num_samples) % B

    calib_x = trajectory[jnp.asarray(codes), jnp.asarray(pos)]
    seq = np.asarray(seq)
    calib_t = jnp.asarray(seq[(len(seq) - 1) - codes].astype(np.float32))
    return TDACResult(calib_x=calib_x, calib_t=calib_t, time_codes=codes,
                      t_num=t_num, density=density, diversity=diversity)


# Per-task dense_r defaults (calibration.py:47,189,297,428,564)
DENSE_R = {"cifar": 3.0, "bedroom": 0.3, "church": 0.3, "imagenet": 3.0,
           "coco": 0.3}


def plot_t_num(t_num: np.ndarray, path: str) -> None:
    """Diagnostic per-timestep histogram (calibration.py:94-97)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    f = plt.figure()
    plt.plot(range(len(t_num)), t_num)
    f.savefig(path)
    plt.close(f)
