"""WideResNet identity block numerics vs a torch transcription of
modules/residual.py:101-182 (pre-activation, ret_prev, in-place add)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cl4wsis_tpu.models.wide_resnet import IdentityResidualBlock

torch = pytest.importorskip("torch")
nn = torch.nn
F = torch.nn.functional


class _ABN(nn.Module):
    def __init__(self, c):
        super().__init__()
        self.bn = nn.BatchNorm2d(c)

    def forward(self, x):
        return F.leaky_relu(self.bn(x), 0.01)


class _TorchIdBlock(nn.Module):
    """Non-bottleneck variant (channels len 2) with projection."""

    def __init__(self, cin, channels, stride=1, dilation=1):
        super().__init__()
        self.bn1 = _ABN(cin)
        c0, c1 = channels
        self.conv1 = nn.Conv2d(cin, c0, 3, stride=stride, padding=dilation,
                               dilation=dilation, bias=False)
        self.bn2 = _ABN(c0)
        self.conv2 = nn.Conv2d(c0, c1, 3, padding=dilation,
                               dilation=dilation, bias=False)
        self.need_proj = stride != 1 or cin != c1
        if self.need_proj:
            self.proj_conv = nn.Conv2d(cin, c1, 1, stride=stride, bias=False)

    def forward(self, x, ret_prev=False):
        if self.need_proj:
            bn1 = self.bn1(x)
            shortcut = self.proj_conv(bn1)
        else:
            shortcut = x.clone()
            bn1 = self.bn1(x)
        out = self.conv2(self.bn2(self.conv1(bn1))) + shortcut
        return (out, bn1) if ret_prev else out


@pytest.mark.parametrize("stride,cin,channels", [(1, 8, (8, 8)),
                                                 (2, 8, (12, 16))])
def test_identity_block_matches_torch(stride, cin, channels):
    torch.manual_seed(0)
    tb = _TorchIdBlock(cin, channels, stride=stride)
    with torch.no_grad():
        for m in tb.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.normal_(0, 0.3)
                m.running_var.uniform_(0.5, 2.0)
                m.weight.uniform_(0.5, 1.5)
                m.bias.normal_(0, 0.3)
    tb.eval()

    fb = IdentityResidualBlock(channels=channels, stride=stride)
    x = np.random.RandomState(1).randn(1, 8, 8, cin).astype(np.float32)
    v = fb.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)

    import flax
    p = flax.core.unfreeze(v["params"])
    s = flax.core.unfreeze(v["batch_stats"])

    def put_bn(name, abn):
        p[name]["scale"] = jnp.asarray(abn.bn.weight.detach().numpy())
        p[name]["bias"] = jnp.asarray(abn.bn.bias.detach().numpy())
        s[name]["mean"] = jnp.asarray(abn.bn.running_mean.numpy())
        s[name]["var"] = jnp.asarray(abn.bn.running_var.numpy())

    def t4(w):
        return jnp.asarray(w.detach().numpy().transpose(2, 3, 1, 0))

    put_bn("bn1", tb.bn1)
    put_bn("bn2", tb.bn2)
    p["conv1"]["kernel"] = t4(tb.conv1.weight)
    p["conv2"]["kernel"] = t4(tb.conv2.weight)
    if tb.need_proj:
        p["proj_conv"]["kernel"] = t4(tb.proj_conv.weight)

    out, prev = fb.apply({"params": p, "batch_stats": s}, jnp.asarray(x),
                         train=False, ret_prev=True)
    with torch.no_grad():
        tout, tprev = tb(torch.from_numpy(x).permute(0, 3, 1, 2), ret_prev=True)
    np.testing.assert_allclose(np.asarray(out),
                               tout.permute(0, 2, 3, 1).numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(prev),
                               tprev.permute(0, 2, 3, 1).numpy(), atol=2e-4)
