"""Torch-family weight re-initialization (opt-in, ``--torch_init``).

flax defaults to lecun-normal conv kernels and zero biases; torch's
``nn.Conv2d.reset_parameters`` draws kernels AND biases from
kaiming-uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)). The variance ratio (3x
per layer) compounds over a 100-layer backbone into the constant ~3.3x
loss-scale offset seen in the round-3 fixture parity table
(docs/verification.md) — same dynamics, incomparable absolute curves.

This module re-samples an already-initialized variables tree to the
reference's init recipe so fixture runs of both stacks start from the SAME
init family and loss curves compare directly:

* default: kernel ~ U(+-1/sqrt(fan_in)), bias ~ U(+-1/sqrt(fan_in)) —
  torch's Conv2d/Linear default, used by the reference's backbone
  (``models/resnet.py`` — no explicit init), panoptic decoder + instance
  head (``segmentation_module.py:290-338`` never calls ``_init_params``),
  classifier heads (``segmentation_module.py:322-325``) AND the
  PseudoLabeler (``wss/modules.py:322-333`` has no explicit init; the
  kaiming_normal_ at ``wss/modules.py:172-177`` belongs to GCI, which
  only ``wss/single_stage.py`` — a dormant path — uses);
* ``he_normal_paths`` subtrees: kernel ~ N(0, sqrt(2/fan_in)) (torch
  ``kaiming_normal_``), biases keep the torch default — empty by default
  on the CL4WSIS train path (``train.py:86`` builds no GCI);
* ``skip_paths`` subtrees are left untouched — modules whose explicit flax
  init already matches the reference's explicit init (the DeeplabV3 head's
  xavier-normal, ``modules/deeplab.py:40-52``; the PeakGenerator's
  extra_conv4 normal(0, sqrt(2/C)), ``wss/modules.py:436-441``).

BN/ABN scales+biases (weight 1, bias 0) agree between both frameworks
already and carry no "kernel" leaf, so the walk never touches them.
"""

from __future__ import annotations

from typing import Iterable, Tuple

import jax
import jax.numpy as jnp

DEFAULT_HE_NORMAL = ()
DEFAULT_SKIP = ("seg_head", "extra_conv4")


def _fan_in(kernel_shape: Tuple[int, ...]) -> int:
    """torch fan_in: in_channels * prod(kernel spatial dims).

    flax HWIO kernels are (*spatial, in, out) — everything but the last
    axis; matches ``nn.init._calculate_fan_in_and_fan_out``."""
    n = 1
    for d in kernel_shape[:-1]:
        n *= int(d)
    return max(n, 1)


def torch_family_init(params, rng: jax.Array,
                      he_normal_paths: Iterable[str] = DEFAULT_HE_NORMAL,
                      skip_paths: Iterable[str] = DEFAULT_SKIP):
    """Re-sample every conv/dense kernel+bias of `params` in torch's init
    families (see module docstring). Returns a new tree; dtypes/shapes are
    preserved. Path rules match on ANY component of the flax module path.
    """
    he_normal_paths = tuple(he_normal_paths)
    skip_paths = tuple(skip_paths)

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    keys = jax.random.split(rng, max(len(flat), 1))

    def path_names(path) -> Tuple[str, ...]:
        return tuple(getattr(p, "key", str(p)) for p in path)

    # group leaves by parent node so a bias finds its sibling kernel's fan_in
    fan_by_parent = {}
    for path, leaf in flat:
        names = path_names(path)
        if names and names[-1] == "kernel" and hasattr(leaf, "shape"):
            fan_by_parent[names[:-1]] = _fan_in(leaf.shape)

    new_leaves = []
    for i, (path, leaf) in enumerate(flat):
        names = path_names(path)
        if any(n in skip_paths for n in names) or not hasattr(leaf, "shape"):
            new_leaves.append(leaf)
            continue
        he = any(n in he_normal_paths for n in names)
        k = keys[i]
        if names and names[-1] == "kernel":
            fan = _fan_in(leaf.shape)
            if he:
                new = jax.random.normal(k, leaf.shape) * jnp.sqrt(2.0 / fan)
            else:
                b = 1.0 / jnp.sqrt(float(fan))
                new = jax.random.uniform(k, leaf.shape, minval=-b, maxval=b)
            new_leaves.append(new.astype(leaf.dtype))
        elif names and names[-1] == "bias" and names[:-1] in fan_by_parent:
            b = 1.0 / jnp.sqrt(float(fan_by_parent[names[:-1]]))
            new = jax.random.uniform(k, leaf.shape, minval=-b, maxval=b)
            new_leaves.append(new.astype(leaf.dtype))
        else:
            new_leaves.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
