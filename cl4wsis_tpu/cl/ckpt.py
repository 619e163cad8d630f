"""Checkpointing, CL-step classifier expansion, torch iABN weight ingestion.

Re-design of the reference's three load paths (``train.py:747-812``) and
the background-imprinting init (``segmentation_module.py:132-144``,
``:342-358``):

1. `load_step_ckpt`: previous-step params into the new model — because the
   incremental classifiers are per-step submodules (cls_0..cls_{N-1}), the
   torch strict=False dance becomes a structural tree merge: everything the
   old tree has overwrites the new init, the new cls_{N}/center_cls_{N}
   stay at their fresh init (or balanced-imprinted).
2. `load_ckpt`: full resume (params, batch_stats, opt state, step, epoch).
3. `load_seg_ckpt`: phase-1 result into the phase-2 model + pseudolabeler
   + peakgenerator.

Checkpoints are orbax PyTree checkpoints; the torch converter ingests the
ImageNet iABN pretrained pickles (``segmentation_module.py:37-57``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- tree utils

def tree_merge(base: Any, update: Any) -> Any:
    """Deep merge `update` into `base` with torch strict=False semantics:
    keys present in both are overwritten, keys only in base keep their init,
    keys only in update are IGNORED (e.g. a step-0 instance branch loading
    into a phase-1 branch-'none' model, ``train.py:747-762``)."""
    if isinstance(base, dict) and isinstance(update, dict):
        out = dict(base)
        for k, v in update.items():
            if k in base:
                out[k] = tree_merge(base[k], v)
        return out
    return update


def init_balanced_classifier(params: Dict, classes, *, cls_path=("cls",),
                             prefix: str = "cls_") -> Dict:
    """Background imprinting for the newest step's classifier
    (``segmentation_module.py:132-144``): new weights copy the background
    row of cls_0, new bias = bkg_bias - log(n_new + 1); cls_0's background
    bias is shifted to the same value."""
    node = params
    for k in cls_path[:-1]:
        node = node[k]
    cls = dict(node[cls_path[-1]])
    n_steps = len(classes)
    new_key = f"{prefix}{n_steps - 1}"
    c0 = dict(cls[f"{prefix}0"])
    w0 = np.asarray(c0["kernel"])           # (1,1,Cin,Cout)
    b0 = np.asarray(c0["bias"])
    bias_diff = float(np.log(classes[-1] + 1))
    new_bias_val = b0[0] - bias_diff

    new = dict(cls[new_key])
    n_new = np.asarray(new["kernel"]).shape[-1]
    new["kernel"] = jnp.asarray(np.repeat(w0[..., :1], n_new, axis=-1))
    new["bias"] = jnp.full((n_new,), new_bias_val, jnp.float32)
    cls[new_key] = new

    b0 = b0.copy()
    b0[0] = new_bias_val
    c0["bias"] = jnp.asarray(b0)
    cls[f"{prefix}0"] = c0

    out = dict(params)
    tgt = out
    for k in cls_path[:-1]:
        tgt[k] = dict(tgt[k])
        tgt = tgt[k]
    tgt[cls_path[-1]] = cls
    return out


def expand_for_new_step(new_variables: Dict, old_variables: Dict,
                        classes, init_balanced: bool = False) -> Dict:
    """Load previous-step weights into a freshly-initialized new-step model
    (load_step_ckpt, ``train.py:747-762``)."""
    params = tree_merge(new_variables["params"], old_variables["params"])
    stats = tree_merge(new_variables["batch_stats"],
                       old_variables["batch_stats"])
    if init_balanced:
        params = init_balanced_classifier(params, classes, cls_path=("cls",))
        if "instance_head" in params:
            params = init_balanced_classifier(
                params, [c - 1 if i == 0 else c for i, c in enumerate(classes)],
                cls_path=("instance_head",), prefix="center_cls_")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------- orbax io

def save_checkpoint(path: str, tree: Any):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(path, tree, force=True)


def load_checkpoint(path: str) -> Any:
    import orbax.checkpoint as ocp
    ckpt = ocp.PyTreeCheckpointer()
    return ckpt.restore(os.path.abspath(path))


def ckpt_path(root: str, dataset: str, task: str, overlap: bool, name: str,
              step: int) -> str:
    """Canonical layout (reference ``run.py:52``):
    checkpoints/step/{ds}-{task}[-ov]/{name}_{step}."""
    ov = "-ov" if overlap else ""
    return os.path.join(root, "step", f"{dataset}-{task}{ov}", f"{name}_{step}")


# ------------------------------------------------------- torch iABN ingest

def convert_torch_resnet(state_dict: Dict[str, "np.ndarray"],
                         abs_bn_weight: bool = True) -> Dict:
    """Convert a torch iABN ResNet state dict (the ImageNet pretrained
    format of ``segmentation_module.py:37-57``) to this repo's flax tree.

    Torch keys: mod1.conv1.weight, mod1.bn1.{weight,bias,running_mean,
    running_var}, mod{i}.block{j}.convs.conv{k}.weight / .bn{k}.*,
    mod{i}.block{j}.proj_conv.weight / .proj_bn.*; a 'module.' prefix and
    classifier.fc.* are stripped by the caller. InPlace-ABN applies |weight|
    in its forward, so scale ingests as abs(weight) by default.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf)

    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[7:]
        if key.startswith("classifier."):
            continue
        val = np.asarray(val)
        parts = key.split(".")
        if parts[0] == "mod1":
            flax_mod = "mod1_conv1" if parts[1] == "conv1" else "mod1_bn1"
            if parts[1] == "conv1":
                put(params, (flax_mod, "kernel"), val.transpose(2, 3, 1, 0))
            else:
                _put_bn(params, stats, (flax_mod,), parts[2], val, abs_bn_weight)
        elif parts[0] == "bn_out":  # wide_resnet top-level output norm
            _put_bn(params, stats, ("bn_out",), parts[1], val, abs_bn_weight)
        else:
            mod, block = parts[0], parts[1]
            base = f"{mod}_{block}"
            rest = parts[2:]
            if rest[0] == "convs":
                layer = rest[1]  # conv1/bn1/...
                if layer.startswith("conv"):
                    put(params, (base, layer, "kernel"), val.transpose(2, 3, 1, 0))
                else:
                    _put_bn(params, stats, (base, layer), rest[2], val,
                            abs_bn_weight)
            elif rest[0] == "proj_conv":
                put(params, (base, "proj_conv", "kernel"), val.transpose(2, 3, 1, 0))
            elif rest[0] == "proj_bn":
                _put_bn(params, stats, (base, "proj_bn"), rest[1], val,
                        abs_bn_weight)
            elif rest[0].startswith("bn"):  # wide_resnet pre-act bn1
                _put_bn(params, stats, (base, rest[0]), rest[1], val,
                        abs_bn_weight)
            elif rest[0].startswith("conv"):
                put(params, (base, rest[0], "kernel"), val.transpose(2, 3, 1, 0))
    return {"params": params, "batch_stats": stats}


def _put_bn(params, stats, path, field, val, abs_weight):
    import numpy as np

    def put(tree, p, leaf):
        node = tree
        for k in p[:-1]:
            node = node.setdefault(k, {})
        node[p[-1]] = jnp.asarray(leaf)

    if field == "weight":
        put(params, path + ("scale",), np.abs(val) if abs_weight else val)
    elif field == "bias":
        put(params, path + ("bias",), val)
    elif field == "running_mean":
        put(stats, path + ("mean",), val)
    elif field == "running_var":
        put(stats, path + ("var",), val)


def load_torch_pretrained(path: str, backbone: str = "resnet101") -> Optional[Dict]:
    """Load an iABN ImageNet checkpoint if present (torch pickle)."""
    if not os.path.exists(path):
        return None
    import torch
    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob)
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_torch_resnet(sd)


# ------------------------------------------ full-model torch ckpt ingest

def convert_torch_cl4wsis(state_dict: Dict[str, "np.ndarray"],
                          abs_bn_weight: bool = True) -> Dict:
    """Convert a full reference model checkpoint (the `model_state` of
    ``run.py:save_ckpt``) to this repo's flax variable tree, so models
    trained with the PyTorch reference can be evaluated/continued here.

    Key layout transcribed from the reference model definitions:
      body.*                       (models/resnet.py, modules/residual.py)
      head.map_convs.{0-3} / map_bn / global_pooling_{conv,bn} /
        {red,pool_red}_conv / red_bn        (modules/deeplab.py:24-37)
      cls.{i}.{weight,bias}                 (segmentation_module.py:107-113)
      decoder.instance_decoder.aspp.convs.{0-4} / project
        project.{i} / fuse.{i}              (modules/panoptic_deeplab.py)
      instance_head.classifier.{center,offset}.{fuse,cls}
                                            (modules/panoptic_deeplab.py:432-468)
    A leading 'module.' (DDP) prefix is stripped.
    """
    import re

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf)

    def put_conv(path, val):
        put(params, path + ("kernel",), np.asarray(val).transpose(2, 3, 1, 0))

    def put_bias(path, val):
        put(params, path + ("bias",), np.asarray(val))

    def put_bn(path, field, val):
        _put_bn(params, stats, path, field, np.asarray(val), abs_bn_weight)

    # torch Sequential paths of a depthwise-separable fuse conv
    # (panoptic_deeplab.py:32-67): {base}.0.0.0 dw conv, .0.0.1 dw bn,
    # .0.1 pointwise conv, .0.2 pointwise bn
    def put_dwsep(flax_base, rest, val):
        if rest == "0.0.0.weight":
            put_conv(flax_base + ("depthwise", "conv"), val)
        elif rest.startswith("0.0.1."):
            put_bn(flax_base + ("depthwise", "bn"), rest.split(".")[-1], val)
        elif rest == "0.1.weight":
            put_conv(flax_base + ("pointwise",), val)
        elif rest.startswith("0.2."):
            put_bn(flax_base + ("pointwise_bn",), rest.split(".")[-1], val)

    backbone_sd = {}
    for key, val in state_dict.items():
        if key.startswith("module."):
            key = key[7:]
        val = np.asarray(val)
        if key.startswith("body."):
            backbone_sd[key[5:]] = val
        elif key.startswith("head."):
            rest = key[5:]
            m = re.match(r"map_convs\.(\d)\.weight", rest)
            if m:
                put_conv(("seg_head", f"map_conv{m.group(1)}"), val)
            elif rest.startswith("map_bn."):
                put_bn(("seg_head", "map_bn"), rest.split(".")[-1], val)
            elif rest == "global_pooling_conv.weight":
                put_conv(("seg_head", "global_pooling_conv"), val)
            elif rest.startswith("global_pooling_bn."):
                put_bn(("seg_head", "global_pooling_bn"), rest.split(".")[-1], val)
            elif rest == "red_conv.weight":
                put_conv(("seg_head", "red_conv"), val)
            elif rest == "pool_red_conv.weight":
                put_conv(("seg_head", "pool_red_conv"), val)
            elif rest.startswith("red_bn."):
                put_bn(("seg_head", "red_bn"), rest.split(".")[-1], val)
        elif key.startswith("cls."):
            i, field = key.split(".")[1:3]
            if field == "weight":
                put_conv(("cls", f"cls_{i}"), val)
            else:
                put_bias(("cls", f"cls_{i}"), val)
        elif key.startswith("decoder.instance_decoder."):
            rest = key[len("decoder.instance_decoder."):]
            if rest.startswith("aspp.convs."):
                sub = rest[len("aspp.convs."):]
                i, tail = sub.split(".", 1)
                i = int(i)
                if i < 4:  # conv branches: Sequential(conv, bn, relu)
                    if tail == "0.weight":
                        put_conv(("instance_decoder", "aspp", f"branch{i}", "conv"), val)
                    elif tail.startswith("1."):
                        put_bn(("instance_decoder", "aspp", f"branch{i}", "bn"),
                               tail.split(".")[-1], val)
                else:  # pooling branch: aspp_pooling.1 conv (no bn)
                    if tail == "aspp_pooling.1.weight":
                        put_conv(("instance_decoder", "aspp", "pool_conv"), val)
            elif rest.startswith("aspp.project."):
                tail = rest[len("aspp.project."):]
                if tail == "0.weight":
                    put_conv(("instance_decoder", "aspp", "project_conv"), val)
                elif tail.startswith("1."):
                    put_bn(("instance_decoder", "aspp", "project_bn"),
                           tail.split(".")[-1], val)
            elif re.match(r"project\.(\d)\.", rest):
                i, tail = rest.split(".", 2)[1:]
                if tail == "0.weight":
                    put_conv(("instance_decoder", f"project_{i}", "conv"), val)
                elif tail.startswith("1."):
                    put_bn(("instance_decoder", f"project_{i}", "bn"),
                           tail.split(".")[-1], val)
            elif re.match(r"fuse\.(\d)\.", rest):
                i, tail = rest.split(".", 2)[1:]
                put_dwsep(("instance_decoder", f"fuse_{i}"), tail, val)
        elif key.startswith("instance_head.classifier."):
            rest = key[len("instance_head.classifier."):]
            head, tail = rest.split(".", 1)
            if tail.startswith("fuse."):
                put_dwsep(("instance_head", f"{head}_fuse"),
                          tail[len("fuse."):], val)
            elif tail.startswith("cls."):
                i, field = tail.split(".")[1:3]
                base = ("instance_head", f"{head}_cls_{i}")
                if field == "weight":
                    put_conv(base, val)
                else:
                    put_bias(base, val)

    body = convert_torch_resnet(backbone_sd, abs_bn_weight)
    params["body"] = body["params"]
    stats["body"] = body["batch_stats"]
    return {"params": params, "batch_stats": stats}
