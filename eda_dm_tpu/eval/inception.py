"""FID InceptionV3 (pool3 + logits) as a flax module — the in-framework
feature extractor behind FID / sFID / IS.

The reference scores images by delegating to sibling clones of
torch-fidelity / pytorch-fid (/root/reference/scripts/test.py:2-3,12-48);
both wrap the TF-slim "pt_inception-2015-12-05" network: a torchvision
InceptionV3 with 1008 logits and four FID-specific tweaks (the 3×3 average
pools inside the A/C/E mixed blocks exclude padding from the divisor, and
the last E block uses a max pool instead).  This module re-implements that
exact graph NHWC/TPU-native:

* inference-only — BatchNorms are folded into the conv kernels at weight
  load (``load_fid_inception_params``), so the hot path is pure
  conv+bias+relu and XLA fuses it end-to-end;
* ``pool3`` (2048-d) features for FID/sFID, ``logits`` (1008-way) for IS;
* intermediate taps at the pytorch-fid block boundaries (64/192/768-d) for
  sFID-style spatial features;
* preprocessing matches pytorch-fid's ``InceptionV3`` wrapper: bilinear
  resize to 299² (align_corners=False semantics) and [0,1] → [-1,1].

Weight source: the standard ``pt_inception-2015-12-05-6726825d.pth``
state dict (pytorch-fid's download), loaded from a local path — this
environment has no network.  Without weights the module still runs (random
init) so the full metric pipeline is testable end-to-end.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

BN_EPS = 1e-3                     # torchvision BasicConv2d BatchNorm eps


def _pad(p):
    if isinstance(p, int):
        return ((p, p), (p, p))
    return ((p[0], p[0]), (p[1], p[1]))


class BasicConv2d(nn.Module):
    """conv (BN folded in as bias/scale at load time) + ReLU."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=self.padding, use_bias=True, name="conv")(x)
        return nn.relu(x)


def _avg_pool_3x3(x):
    """3×3/1 avg pool, padding 1, count_include_pad=False — the FID variant
    of the in-block pools (pytorch-fid FIDInceptionA/C/E_1)."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)),
                       count_include_pad=False)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=_pad(2), name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_3")(b3)
        bp = BasicConv2d(self.pool_features, (1, 1),
                         name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=_pad(1), name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(_avg_pool_3x3(x))
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=_pad((0, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=_pad((3, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = nn.max_pool(x, (3, 3), strides=(2, 2))
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    """use_max_pool selects the FIDInceptionE_2 (Mixed_7c) variant, whose
    branch pool is a 3×3/1 max pool instead of the padded average pool."""

    use_max_pool: bool = False

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad((0, 1)),
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=_pad((1, 0)),
                        name="branch3x3_2b")(b3)], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=_pad(1),
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=_pad((0, 1)),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=_pad((1, 0)),
                        name="branch3x3dbl_3b")(bd)], axis=-1)
        if self.use_max_pool:
            pooled = nn.max_pool(x, (3, 3), strides=(1, 1),
                                 padding=((1, 1), (1, 1)))
        else:
            pooled = _avg_pool_3x3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(pooled)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """The full pt_inception-2015-12-05 graph (NHWC).

    ``__call__`` returns a dict: ``pool3`` (N, 2048), ``logits`` (N, 1008)
    and the pytorch-fid intermediate taps ``feat64`` / ``feat192`` /
    ``feat768``.
    """

    num_logits: int = 1008

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=_pad(1), name="Conv2d_2b_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        feat64 = x
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        feat192 = x
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        feat768 = x
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE(name="Mixed_7b")(x)
        x = InceptionE(use_max_pool=True, name="Mixed_7c")(x)
        pool3 = jnp.mean(x, axis=(1, 2))                 # adaptive avg → 1×1
        logits = nn.Dense(self.num_logits, name="fc")(pool3)
        return {"pool3": pool3, "logits": logits,
                "feat64": jnp.mean(feat64, axis=(1, 2)),
                "feat192": jnp.mean(feat192, axis=(1, 2)),
                "feat768": jnp.mean(feat768, axis=(1, 2))}


def preprocess(images: jnp.ndarray, resize: bool = True) -> jnp.ndarray:
    """images (N, H, W, 3) in [0, 1] → network input.

    Matches pytorch-fid's wrapper: bilinear resize to 299² without corner
    alignment, then scale to [-1, 1].
    """
    if resize and images.shape[1:3] != (299, 299):
        n, _, _, c = images.shape
        images = jax.image.resize(images, (n, 299, 299, c), "bilinear")
    return images * 2.0 - 1.0


def fold_bn(conv_w: np.ndarray, gamma, beta, mean, var,
            eps: float = BN_EPS):
    """Fold an inference BatchNorm into the preceding conv.

    conv_w is OIHW (torch layout); returns (HWIO kernel, bias).
    """
    scale = gamma / np.sqrt(var + eps)
    w = conv_w * scale[:, None, None, None]
    b = beta - mean * scale
    return np.transpose(w, (2, 3, 1, 0)).astype(np.float32), \
        b.astype(np.float32)


def load_fid_inception_params(path_or_state) -> Dict[str, Any]:
    """Convert the pt_inception-2015-12-05 torch state dict to params for
    :class:`FIDInceptionV3` (BN folded).

    Accepts a file path (torch.load'ed) or an already-loaded mapping of
    torch tensors / numpy arrays.
    """
    if isinstance(path_or_state, str):
        import torch
        state = torch.load(path_or_state, map_location="cpu",
                           weights_only=True)
    else:
        state = path_or_state
    state = {k: np.asarray(getattr(v, "numpy", lambda: v)()
                           if hasattr(v, "numpy") else v)
             for k, v in state.items()}

    params: Dict[str, Any] = {}

    def insert(path, leaf, value):
        node = params
        for p in path:
            node = node.setdefault(p, {})
        node[leaf] = value

    # group conv+bn prefixes
    prefixes = sorted({k[:-len(".conv.weight")] for k in state
                       if k.endswith(".conv.weight")})
    for pre in prefixes:
        w, b = fold_bn(state[f"{pre}.conv.weight"],
                       state[f"{pre}.bn.weight"], state[f"{pre}.bn.bias"],
                       state[f"{pre}.bn.running_mean"],
                       state[f"{pre}.bn.running_var"])
        insert(pre.split(".") + ["conv"], "kernel", w)
        insert(pre.split(".") + ["conv"], "bias", b)
    insert(["fc"], "kernel", np.transpose(state["fc.weight"], (1, 0))
           .astype(np.float32))
    insert(["fc"], "bias", state["fc.bias"].astype(np.float32))
    return params


# --------------------------------------------------------------------------
# streaming statistics over large sample sets (50k images)
# --------------------------------------------------------------------------

class StreamingStats:
    """Accumulate mean/covariance of features batch-by-batch (no need to
    hold 50k×2048 rows in memory)."""

    def __init__(self, dim: int):
        self.n = 0
        self.s1 = np.zeros((dim,), np.float64)
        self.s2 = np.zeros((dim, dim), np.float64)

    def update(self, feats: np.ndarray):
        feats = np.asarray(feats, np.float64)
        self.n += feats.shape[0]
        self.s1 += feats.sum(0)
        self.s2 += feats.T @ feats

    def finalize(self):
        from .metrics import FeatureStats
        mu = self.s1 / self.n
        # unbiased covariance, matching np.cov(rowvar=False)
        sigma = (self.s2 - self.n * np.outer(mu, mu)) / (self.n - 1)
        return FeatureStats(mu=mu, sigma=sigma)


class InceptionExtractor:
    """Jitted batched extractor: images [0,1] NHWC → features.

    ``weights_path=None`` runs with random init (architecture smoke /
    relative comparisons only); pass the local
    ``pt_inception-2015-12-05-6726825d.pth`` for real scores.
    """

    def __init__(self, weights_path: Optional[str] = None,
                 key: Optional[jax.Array] = None):
        self.model = FIDInceptionV3()
        if weights_path is not None:
            self.params = jax.tree_util.tree_map(
                jnp.asarray, load_fid_inception_params(weights_path))
        else:
            self.params = self.model.init(
                key if key is not None else jax.random.PRNGKey(0),
                jnp.zeros((1, 299, 299, 3)))["params"]
        self._fn = jax.jit(lambda p, x: self.model.apply(
            {"params": p}, preprocess(x)))

    def __call__(self, images) -> Dict[str, np.ndarray]:
        out = self._fn(self.params, jnp.asarray(images, jnp.float32))
        return {k: np.asarray(v) for k, v in out.items()}

    def pool3(self, images) -> np.ndarray:
        return self(images)["pool3"]

    def probs(self, images) -> np.ndarray:
        logits = self(images)["logits"]
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)
