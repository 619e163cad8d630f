"""Subprocess worker for tests/test_converter_forward_agreement.py.

Builds the REFERENCE's own torch backbone (/root/reference/models) with the
inplace_abn shim, randomizes every parameter AND running statistic, runs an
eval-mode forward on a fixed input, and dumps {input, output, state_dict}
to an .npz. Runs in a subprocess so the reference's top-level package names
(models, modules) never pollute the pytest process's sys.modules.

argv: arch out_npz     (arch: resnet | wrn)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "scripts", "refshim")
for p in ("/root/reference", SHIM):
    if p in sys.path:
        sys.path.remove(p)
    sys.path.insert(0, p)  # SHIM first so inplace_abn resolves to the shim


def main():
    arch, out_npz = sys.argv[1], sys.argv[2]
    import numpy as np
    import torch

    from inplace_abn import ABN  # the shim (plain BN + leaky_relu)

    torch.manual_seed(0)
    if arch == "resnet":
        from models.resnet import ResNet
        net = ResNet(structure=[1, 1, 1, 1], bottleneck=True, norm_act=ABN,
                     output_stride=16)
    elif arch == "wrn":
        from models.wide_resnet import WiderResNetA2
        net = WiderResNetA2(structure=[1, 1, 1, 1, 1, 1], norm_act=ABN,
                            dilation=True)
    else:
        raise SystemExit(f"unknown arch {arch!r}")

    # randomize EVERYTHING so the converted forward is sensitive to every
    # mapped field: conv kernels, bn scale/bias, and the running statistics
    # (default-initialized stats are 0/1 and would mask a mean/var mixup)
    g = torch.Generator().manual_seed(1)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.1)
        for name, b in net.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.2)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)

    net.eval()
    x = torch.from_numpy(
        np.random.RandomState(2).randn(2, 3, 64, 64).astype(np.float32))
    with torch.no_grad():
        out = net(x)

    blob = {"input": x.numpy(), "output": out.numpy()}
    for k, v in net.state_dict().items():
        blob["sd:" + k] = v.numpy()
    np.savez(out_npz, **blob)
    print(f"[refnet {arch}] output shape {tuple(out.shape)}", flush=True)


if __name__ == "__main__":
    main()
