"""CLI flag parity with the reference argparser (argparser.py:39-238).

Every flag the reference parser accepts must parse here too (VERDICT r1 #6).
Flags that are parsed-but-never-read in the reference (crop_val, unce,
pl_ckpt, icarl_importance, icarl_disjoint, print_interval's CLI value) are
accepted-and-inert here as well, documented in cli/config.py.
"""

import os
import re

import pytest

from cl4wsis_tpu.cli.config import Config, parse_config

# (name, sample value or None for bare boolean flags) — transcribed from
# /root/reference/argparser.py:43-236
REFERENCE_FLAGS = [
    ("local_rank", "0"), ("random_seed", "42"), ("num_workers", "1"),
    ("device", "0"), ("data_root", "data"), ("dataset", "voc"),
    ("weakly", None), ("num_classes", "21"), ("epochs", "30"),
    ("batch_size", "24"), ("crop_size", "512"), ("crop_size_val", "512"),
    ("optim", "adam"), ("lr", "0.01"), ("momentum", "0.9"),
    ("weight_decay", "1e-4"), ("lr_policy", "poly"), ("lr_decay_step", "5000"),
    ("lr_decay_factor", "0.1"), ("lr_power", "0.9"), ("bce", None),
    ("dce", None), ("val_on_trainset", None), ("crop_val", None),
    ("logdir", "./logs"), ("name", "Experiment"), ("sample_num", "8"),
    ("debug", None), ("visualize", None), ("print_interval", "10"),
    ("val_interval", "5"), ("model", "PanopticDeepLab"),
    ("backbone", "resnet101"), ("output_stride", "16"),
    ("no_pretrained", None), ("norm_act", "iabn_sync"), ("pooling", "32"),
    ("test", None), ("ckpt", "x.pth"), ("continue_ckpt", None),
    ("ckpt_interval", "1"), ("seg_ckpt", "x.pth"), ("freeze", None),
    ("freeze_seg", None), ("loss_de", "0"), ("loss_kd", "0"),
    ("icarl", None), ("icarl_importance", "1"), ("icarl_disjoint", None),
    ("icarl_bkg", "-1"), ("init_balanced", None), ("unkd", None),
    ("unce", None), ("task", "15-5"), ("step", "0"), ("no_mask", None),
    ("overlap", None), ("step_ckpt", "x.pth"), ("phase", "1"),
    ("pseudo", "x"), ("pl_ckpt", "x.pth"), ("alpha", "0.5"),
    ("pos_w", "1"), ("affinity", None), ("affinity_method", "pamr"),
    ("pseudo_ep", "5"), ("lr_pseudo", "0.01"), ("lr_head", "10"),
    ("cam", "ngwp"), ("ss_dist", None), ("l_seg", "1"),
    ("val_thresh", "0.1"), ("val_kernel", "41"), ("val_flip", "false"),
    ("val_clean", "false"), ("val_ignore", "false"),
    ("pseudo_thresh", "0.7"), ("refine_thresh", "0.3"), ("kernel", "41"),
    ("sigma", "6"), ("beta", "3.0"), ("detach_instance", None),
    ("run_refine", "true"), ("pam_alpha", "0.7"),
    ("peak_from", "peakgenerator"), ("branch", "ins"),
    ("use_DeeplabV3_as_seg_branch", None), ("flac", None), ("randrop", None),
]

REFERENCE_ARGPARSER = "/root/reference/argparser.py"


def test_every_reference_flag_parses():
    argv = []
    for name, value in REFERENCE_FLAGS:
        argv.append(f"--{name}")
        if value is not None:
            argv.append(value)
    cfg = parse_config(argv)
    assert isinstance(cfg, Config)
    # spot-check the live wiring
    assert cfg.seed == 42                # --random_seed alias
    assert cfg.pretrained is False       # --no_pretrained inversion
    assert cfg.weakly is True            # bare boolean flag
    assert cfg.print_interval == 10
    assert cfg.peak_from == "peakgenerator"


def test_reference_flag_list_is_complete():
    """If the reference tree is mounted, the transcribed list above must
    cover exactly its add_argument names (no silent drift)."""
    if not os.path.exists(REFERENCE_ARGPARSER):
        pytest.skip("reference tree not mounted")
    src = open(REFERENCE_ARGPARSER).read()
    ref_names = set(re.findall(r"add_argument\(\s*[\"']--(\w+)[\"']", src))
    ours = {n for n, _ in REFERENCE_FLAGS}
    assert ref_names == ours, (
        f"missing={ref_names - ours} extra={ours - ref_names}")


def test_explicit_bool_values_still_parse():
    cfg = parse_config(["--weakly", "true", "--flac", "false",
                        "--overlap", "1", "--bce", "0"])
    assert cfg.weakly is True
    assert cfg.flac is False
    assert cfg.overlap is True
    assert cfg.bce is False


def test_inert_flags_do_not_change_behavior():
    base = parse_config([]).finalize()
    inert = parse_config(["--crop_val", "--unce", "--pl_ckpt", "x.pth",
                          "--icarl_importance", "2.0",
                          "--icarl_disjoint"]).finalize()
    # these flags must not perturb any derived training semantics
    for field in ("branch", "freeze", "freeze_seg", "pooling", "lr_head",
                  "detach_instance", "num_classes"):
        assert getattr(base, field) == getattr(inert, field)
