"""Run the REFERENCE (/root/reference) end-to-end on the fabricated
mini-VOC fixture, on CPU, via the shim set in scripts/refshim/.

Purpose (VERDICT r2 item 4): upgrade "transcribed-op parity" to
"same-pipeline parity" — the reference's own run.py/train.py execute the
full 3-stage protocol (step-0 supervised, phase-1 CAM, phase-2 instance)
on the same fixture the rebuild's CLI tests use, so loss trajectories and
final metrics can be compared side by side on identical data.

The shims replace only environment-unavailable binaries (inplace_abn CUDA,
torchvision, pycocotools, chainercv, wandb) — reference code runs
unmodified. CUDA/DDP couplings are neutralized by monkeypatch before
import: tensors stay on CPU, DDP runs on a 1-process gloo group, AMP is
disabled (fp32; the rebuild's CPU tests also run fp32).

Usage (SOLO — 1-core host):
    python scripts/run_reference_fixture.py --root /tmp/refrun \
        --stage all --epochs 2 --size 64 --images 16
Prints one JSON line per stage with the per-epoch loss trajectory and
final validation scores.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "scripts", "refshim")
for p in (REPO, "/root/reference", SHIM):
    if p in sys.path:
        sys.path.remove(p)
    sys.path.insert(0, p)  # SHIM ends up first


def _patch_torch():
    """Neutralize the reference's CUDA/DDP couplings (run.py:38-41,
    train.py:43,188-196,252) for a 1-process CPU run."""
    from contextlib import nullcontext

    import torch

    # .cuda() marks the tensor device-resident for _DeviceSim (identity
    # move on this host; used only by the dormant img_to_tensor helper)
    def _tensor_cuda(self, *a, **k):
        self._dsim = True
        return self

    torch.Tensor.cuda = _tensor_cuda
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.manual_seed = lambda *a, **k: None
    torch.cuda.manual_seed_all = lambda *a, **k: None

    import torch.cuda.amp as amp

    class _Scaler(torch.amp.GradScaler):
        def __init__(self, *a, **k):
            super().__init__("cpu", enabled=False)

    amp.GradScaler = _Scaler
    amp.autocast = lambda *a, **k: nullcontext()

    import torch.nn.parallel as par
    real_ddp = par.DistributedDataParallel

    def ddp(module, device_ids=None, output_device=None, **kw):
        return real_ddp(module, **kw)

    par.DistributedDataParallel = ddp

    import torch.distributed as dist
    real_init = dist.init_process_group

    def init_pg(backend=None, **kw):
        if dist.is_initialized():  # run.main() per stage; init once
            return None
        return real_init(backend="gloo", **kw)

    dist.init_process_group = init_pg

    os.environ.setdefault("MASTER_ADDR", "127.0.0.1")
    os.environ.setdefault("MASTER_PORT", "29631")
    os.environ.setdefault("RANK", "0")
    os.environ.setdefault("WORLD_SIZE", "1")
    os.environ.setdefault("LOCAL_RANK", "0")


class _TorchProxy:
    """torch with ``device(int) -> the SENTINEL cpu device`` — injected ONLY
    into the reference run module's namespace (run.py:39 does
    ``torch.device(opts.local_rank)``). Patching ``torch.device`` globally
    breaks torch-internal ``str | torch.device`` annotations (it must stay
    a type). The sentinel instance is what _DeviceSim recognizes as "the
    GPU": ``.to(sentinel)`` marks a tensor device-resident."""

    def __init__(self, real, sentinel):
        self._real = real
        self._sentinel = sentinel

    def __getattr__(self, name):
        return getattr(self._real, name)

    def device(self, *a, **k):
        if a and isinstance(a[0], int):
            return self._sentinel
        return self._real.device(*a, **k)


def _make_device_sim():
    """CUDA host/device-boundary simulation for an all-CPU run.

    The reference's phase-2 pseudo-map accumulator (train.py:469-477)
    relies on ``torch.cat([cuda_tensor, cpu_tensor])`` RAISING to reset
    itself at each batch via its try/except. All-CPU the cat succeeds, the
    accumulator grows across batches, and train.py:506 dies on a size
    mismatch — so device placement must be simulated, not ignored.

    A TorchFunctionMode propagates an ``_dsim`` device mark through every
    torch op exactly like CUDA placement propagates through kernels:
    ``.to(SENTINEL)`` sets it (run.py's ``torch.device(local_rank)`` is
    proxied to SENTINEL), ``.cpu()`` / ``.to('cpu')`` clears it,
    ``torch.from_numpy`` & friends start unmarked, and every other op marks
    its tensor outputs iff any tensor input was marked (model params get
    marked by ``Module.to(device)``'s internal Tensor.to calls, so forward
    outputs are marked transitively). ``torch.cat`` over a marked/unmarked
    mix raises — the one cross-device error the reference's control flow
    depends on."""
    import torch
    from torch.overrides import TorchFunctionMode

    sentinel = torch.device("cpu")

    def tensors_in(obj, out):
        if isinstance(obj, torch.Tensor):
            out.append(obj)
        elif isinstance(obj, (list, tuple)):
            for o in obj:
                tensors_in(o, out)
        elif isinstance(obj, dict):
            for o in obj.values():
                tensors_in(o, out)
        return out

    class _DeviceSim(TorchFunctionMode):
        def __torch_function__(self, func, types, args=(), kwargs=None):
            kwargs = kwargs or {}
            ins = tensors_in(args, tensors_in(kwargs, []))
            marked = any(getattr(t, "_dsim", False) for t in ins)

            name = getattr(func, "__name__", "")
            if name in ("cat", "concat", "concatenate", "stack"):
                seq = args[0] if args else kwargs.get("tensors", ())
                marks = [getattr(t, "_dsim", False) for t in seq
                         if isinstance(t, torch.Tensor)]
                if any(marks) and not all(marks):
                    raise RuntimeError(
                        "refshim: torch.cat of device and host tensors "
                        "(simulates the CUDA cross-device error the "
                        "reference's accumulator reset relies on)")

            out = func(*args, **kwargs)

            # trans: True = moved to device, False = moved to host,
            # None = ordinary op (placement propagates from inputs)
            trans = None
            if name == "to" and args and isinstance(args[0], torch.Tensor):
                dev = kwargs.get("device")
                for a in args[1:]:
                    if isinstance(a, (torch.device, str)):
                        dev = a
                        break
                if dev is sentinel:
                    trans = True
                elif dev is not None:  # explicit non-sentinel device: host
                    trans = False
            elif name == "cpu":
                trans = False

            if trans is not None and isinstance(out, torch.Tensor):
                # .to()/.cpu() return SELF when already on the right
                # dtype/device; never flip the source's placement in
                # place — rebind to a fresh view object (on CUDA the
                # source would keep its own placement)
                if out is args[0] and getattr(out, "_dsim", False) != trans:
                    out = out.view(out.shape)
                out._dsim = trans
            elif marked:
                for t in tensors_in(out, []):
                    t._dsim = True
            return out

    return sentinel, _DeviceSim()


def _stage_args(stage, a):
    task = f"--dataset voc --task 15-5 --num_workers 0 --no_pretrained " \
           f"--batch_size {a.batch} --crop_size {a.size} " \
           f"--crop_size_val {a.size} --overlap --val_interval 100 " \
           f"--random_seed {a.seed} --logdir {a.root}/logs --sample_num 0"
    if stage == "step0":
        return (f"--name REF --step 0 --bce --lr {a.lr0} {task} "
                f"--epochs {a.epochs} --optim adam --weight_decay 0").split()
    ckpt0 = "checkpoints/step/voc-15-5-ov/REF_0.pth"
    if stage == "phase1":
        return (f"--name REF --step 1 --weakly {task} --alpha 0.5 "
                f"--lr 1e-3 --step_ckpt {ckpt0} --loss_de 1 "
                f"--lr_policy warmup --affinity --epochs {a.epochs} "
                f"--optim sgd --phase 1 --pseudo_ep 1").split()
    ckpt1 = "checkpoints/step/voc-15-5-ov/REF_1.pth"
    return (f"--name REF --step 1 --weakly {task} --alpha 0.5 --lr 5e-5 "
            f"--step_ckpt {ckpt0} --loss_de 1 --lr_policy warmup "
            f"--affinity --epochs {a.epochs} --optim adam --weight_decay 0 "
            f"--seg_ckpt {ckpt1} --phase 2 --pseudo_ep 1").split()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/refrun")
    ap.add_argument("--stage", default="all",
                    choices=["step0", "phase1", "phase2", "all"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--wrap", action="store_true",
                    help="on-image object positions for large fixtures")
    ap.add_argument("--paint", action="store_true",
                    help="learnable fixture: class-colored painted objects")
    ap.add_argument("--lr0", default="5e-5",
                    help="step-0 lr (5e-5 is the recipe; the 64^2 painted "
                         "fixture needs 3e-4 to fit from scratch)")
    a = ap.parse_args()

    os.makedirs(a.root, exist_ok=True)
    fixture = os.path.join(a.root, "data")
    if not os.path.exists(os.path.join(fixture, "voc",
                                       "pascal_sbd_train.json")):
        from tests.test_data import _write_fake_voc
        _write_fake_voc(fixture, n_images=a.images, size=a.size, rich=True,
                        wrap=a.wrap, paint=a.paint)
        print(f"fixture: wrote mini-VOC ({a.images} imgs @ {a.size}^2) "
              f"to {fixture}", flush=True)

    _patch_torch()
    os.chdir(a.root)  # reference writes checkpoints/ relative to cwd
    os.makedirs("checkpoints/step", exist_ok=True)

    import argparser as ref_argparser

    stages = ([a.stage] if a.stage != "all"
              else ["step0", "phase1", "phase2"])
    for stage in stages:
        argv = _stage_args(stage, a) + ["--data_root", fixture]
        opts = ref_argparser.get_argparser().parse_args(argv)
        opts = ref_argparser.modify_command_options(opts)
        print(f"=== reference {stage}: starting ===", flush=True)
        t0 = time.time()
        import torch

        import run as ref_run
        sentinel, sim = _make_device_sim()
        ref_run.torch = _TorchProxy(torch, sentinel)
        with sim:
            ref_run.main(opts)
        print(json.dumps({"stage": stage, "wall_s": round(time.time() - t0, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
