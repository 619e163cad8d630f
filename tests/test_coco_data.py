"""COCO dataset + coco-voc step-1 (as_coco) pipeline on fabricated fixtures."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from cl4wsis_tpu.cl import tasks
from cl4wsis_tpu.data.coco import COCODataset, make_coco_datasets
from cl4wsis_tpu.data.cocovoc import COCO_MAP, VOC_TO_COCO_LUT, remap_voc_dir
from cl4wsis_tpu.data.voc import make_voc_datasets
from tests.test_data import _write_fake_voc


def _write_fake_coco(root, n_images=4, size=48):
    rs = np.random.RandomState(0)
    for split, folder in [("train", "train2017"), ("val", "val2017")]:
        img_dir = os.path.join(root, "coco", "images", folder)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "coco", "split"), exist_ok=True)
        os.makedirs(os.path.join(root, "coco", "annotations"), exist_ok=True)
        images, annotations, names = [], [], []
        ann_id = 1
        for i in range(n_images):
            name = f"c_{split}_{i:03d}.jpg"
            names.append(name[:-4])
            Image.fromarray((rs.rand(size, size, 3) * 255).astype(np.uint8)
                            ).save(os.path.join(img_dir, name))
            images.append({"id": i + 1, "file_name": name,
                           "height": size, "width": size})
            for c in (1, 8):  # person + a coco-voc step-0 class
                x0 = 4 + 4 * i
                poly = [x0, 4, x0 + 14, 4, x0 + 14, 20, x0, 20]
                annotations.append({
                    "id": ann_id, "image_id": i + 1, "category_id": c,
                    "segmentation": [poly], "iscrowd": 0,
                    "bbox": [x0, 4, 14, 16], "area": 224})
                ann_id += 1
        with open(os.path.join(root, "coco", "annotations",
                               f"instances_{folder}.json"), "w") as f:
            json.dump({"images": images, "annotations": annotations,
                       "categories": [{"id": c, "name": str(c)}
                                      for c in range(1, 91)]}, f)
        with open(os.path.join(root, "coco", "split", f"{split}.txt"), "w") as f:
            f.write("\n".join(names) + "\n")


def test_coco_dataset_and_factory(tmp_path):
    root = str(tmp_path)
    _write_fake_coco(root)
    raw = COCODataset(root, train=True)
    assert len(raw) == 4
    img, seg, inst, l1h, _ = raw[0]
    assert l1h.shape == (91,)
    assert l1h[0] == 1 and l1h[7] == 1  # categories 1 and 8
    assert set(np.unique(seg)) <= {0, 1, 8}

    step_dict = tasks.get_task_dict("coco-voc", "voc", 0)
    train, val = make_coco_datasets(root, step_dict, step=0, crop_size=32,
                                    crop_size_val=32)
    s = train[0]
    # coco-voc order: category 8 (cat) is order index 1, category 1 (person)
    # is a step-1 class -> masked to 0 at step 0
    assert s["image"].shape == (32, 32, 3)
    assert set(np.unique(s["seg"])) <= {0, 1}


def test_cocovoc_step1_as_coco(tmp_path):
    root = str(tmp_path)
    _write_fake_voc(root, n_images=6)
    step_dict = tasks.get_task_dict("coco-voc", "voc", 1)
    train, val = make_voc_datasets(root, step_dict, step=1, crop_size=32,
                                   crop_size_val=32, as_coco=True)
    s = train[0]
    # VOC class 16 (pottedplant) -> COCO id 64; coco-voc order index of 64
    order = [c for st in sorted(step_dict) for c in step_dict[st]]
    assert order.index(64) > 0
    assert set(np.unique(s["seg"])) <= {0, order.index(64)}
    assert s["l1h"].shape == (80,)


def test_voc_to_coco_lut_and_remap_dir(tmp_path):
    assert COCO_MAP[15] == 1  # person
    assert VOC_TO_COCO_LUT[255] == 255
    d_in = tmp_path / "in"
    d_out = tmp_path / "out"
    d_in.mkdir()
    lbl = np.zeros((8, 8), np.uint8)
    lbl[2:4, 2:4] = 15
    Image.fromarray(lbl).save(str(d_in / "a.png"))
    n = remap_voc_dir(str(d_in), str(d_out))
    assert n == 1
    out = np.asarray(Image.open(str(d_out / "a.png")))
    assert out[2, 2] == 1 and out[0, 0] == 0
