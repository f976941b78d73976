"""FID-InceptionV3 flax port vs an independent torch construction of the
same graph (torchvision inception_v3 topology with the pytorch-fid pool
tweaks), on random weights + random BN statistics.

Validates conv layouts, padding, the count_include_pad=False average pools,
the Mixed_7c max-pool variant, BN folding, and the fc head — everything the
weight converter (eval/inception.py::load_fid_inception_params) relies on.
torchvision is not installed here, so the twin is built from torch
primitives; the weight-file key schema is the pytorch-fid one.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eda_dm_tpu.eval.inception import (FIDInceptionV3,
                                       load_fid_inception_params, preprocess)

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF


class BC(tnn.Module):
    """BasicConv2d: conv (no bias) + BN(eps=1e-3) + relu."""

    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, k, stride=stride, padding=padding,
                               bias=False)
        self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

    def forward(self, x):
        return tF.relu(self.bn(self.conv(x)))


def avgp(x):
    return tF.avg_pool2d(x, 3, stride=1, padding=1, count_include_pad=False)


class MixA(tnn.Module):
    def __init__(self, cin, pool):
        super().__init__()
        self.branch1x1 = BC(cin, 64, 1)
        self.branch5x5_1 = BC(cin, 48, 1)
        self.branch5x5_2 = BC(48, 64, 5, padding=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, padding=1)
        self.branch_pool = BC(cin, pool, 1)

    def forward(self, x):
        return torch.cat([
            self.branch1x1(x),
            self.branch5x5_2(self.branch5x5_1(x)),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            self.branch_pool(avgp(x))], 1)


class MixB(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3 = BC(cin, 384, 3, stride=2)
        self.branch3x3dbl_1 = BC(cin, 64, 1)
        self.branch3x3dbl_2 = BC(64, 96, 3, padding=1)
        self.branch3x3dbl_3 = BC(96, 96, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3(x),
            self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
            tF.max_pool2d(x, 3, stride=2)], 1)


class MixC(tnn.Module):
    def __init__(self, cin, c7):
        super().__init__()
        self.branch1x1 = BC(cin, 192, 1)
        self.branch7x7_1 = BC(cin, c7, 1)
        self.branch7x7_2 = BC(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7_3 = BC(c7, 192, (7, 1), padding=(3, 0))
        self.branch7x7dbl_1 = BC(cin, c7, 1)
        self.branch7x7dbl_2 = BC(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_3 = BC(c7, c7, (1, 7), padding=(0, 3))
        self.branch7x7dbl_4 = BC(c7, c7, (7, 1), padding=(3, 0))
        self.branch7x7dbl_5 = BC(c7, 192, (1, 7), padding=(0, 3))
        self.branch_pool = BC(cin, 192, 1)

    def forward(self, x):
        b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
        bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
            self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
        return torch.cat([self.branch1x1(x), b7, bd,
                          self.branch_pool(avgp(x))], 1)


class MixD(tnn.Module):
    def __init__(self, cin):
        super().__init__()
        self.branch3x3_1 = BC(cin, 192, 1)
        self.branch3x3_2 = BC(192, 320, 3, stride=2)
        self.branch7x7x3_1 = BC(cin, 192, 1)
        self.branch7x7x3_2 = BC(192, 192, (1, 7), padding=(0, 3))
        self.branch7x7x3_3 = BC(192, 192, (7, 1), padding=(3, 0))
        self.branch7x7x3_4 = BC(192, 192, 3, stride=2)

    def forward(self, x):
        return torch.cat([
            self.branch3x3_2(self.branch3x3_1(x)),
            self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                self.branch7x7x3_1(x)))),
            tF.max_pool2d(x, 3, stride=2)], 1)


class MixE(tnn.Module):
    def __init__(self, cin, use_max):
        super().__init__()
        self.use_max = use_max
        self.branch1x1 = BC(cin, 320, 1)
        self.branch3x3_1 = BC(cin, 384, 1)
        self.branch3x3_2a = BC(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3_2b = BC(384, 384, (3, 1), padding=(1, 0))
        self.branch3x3dbl_1 = BC(cin, 448, 1)
        self.branch3x3dbl_2 = BC(448, 384, 3, padding=1)
        self.branch3x3dbl_3a = BC(384, 384, (1, 3), padding=(0, 1))
        self.branch3x3dbl_3b = BC(384, 384, (3, 1), padding=(1, 0))
        self.branch_pool = BC(cin, 192, 1)

    def forward(self, x):
        b3 = self.branch3x3_1(x)
        b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
        bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
        bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
        p = (tF.max_pool2d(x, 3, stride=1, padding=1) if self.use_max
             else avgp(x))
        return torch.cat([self.branch1x1(x), b3, bd, self.branch_pool(p)], 1)


class TorchFIDInception(tnn.Module):
    def __init__(self):
        super().__init__()
        self.Conv2d_1a_3x3 = BC(3, 32, 3, stride=2)
        self.Conv2d_2a_3x3 = BC(32, 32, 3)
        self.Conv2d_2b_3x3 = BC(32, 64, 3, padding=1)
        self.Conv2d_3b_1x1 = BC(64, 80, 1)
        self.Conv2d_4a_3x3 = BC(80, 192, 3)
        self.Mixed_5b = MixA(192, 32)
        self.Mixed_5c = MixA(256, 64)
        self.Mixed_5d = MixA(288, 64)
        self.Mixed_6a = MixB(288)
        self.Mixed_6b = MixC(768, 128)
        self.Mixed_6c = MixC(768, 160)
        self.Mixed_6d = MixC(768, 160)
        self.Mixed_6e = MixC(768, 192)
        self.Mixed_7a = MixD(768)
        self.Mixed_7b = MixE(1280, use_max=False)
        self.Mixed_7c = MixE(2048, use_max=True)
        self.fc = tnn.Linear(2048, 1008)

    def forward(self, x):
        x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
        x = tF.max_pool2d(x, 3, stride=2)
        x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
        x = tF.max_pool2d(x, 3, stride=2)
        for name in ("Mixed_5b", "Mixed_5c", "Mixed_5d", "Mixed_6a",
                     "Mixed_6b", "Mixed_6c", "Mixed_6d", "Mixed_6e",
                     "Mixed_7a", "Mixed_7b", "Mixed_7c"):
            x = getattr(self, name)(x)
        pool3 = x.mean((2, 3))
        return pool3, self.fc(pool3)


@pytest.mark.slow
def test_fid_inception_parity_random_weights():
    torch.manual_seed(0)
    net = TorchFIDInception().eval()
    # randomize BN statistics so folding is actually exercised
    with torch.no_grad():
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.5)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.normal_(1.0, 0.2)
                m.bias.normal_(0, 0.2)

    params = load_fid_inception_params(net.state_dict())
    model = FIDInceptionV3()

    x = np.random.RandomState(0).rand(2, 75, 75, 3).astype(np.float32)
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)) * 2.0 - 1.0)
    with torch.no_grad():
        pool3_t, logits_t = net(xt)

    out = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                      jnp.asarray(x) * 2.0 - 1.0)
    np.testing.assert_allclose(np.asarray(out["pool3"]), pool3_t.numpy(),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["logits"]), logits_t.numpy(),
                               rtol=2e-3, atol=2e-2)


def test_preprocess_range_and_resize():
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    y = preprocess(x)
    assert y.shape == (1, 299, 299, 3)
    np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-6)
