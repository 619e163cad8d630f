"""Inference example: load a checkpoint, predict instances, export COCO json.

Run: python examples/infer.py <checkpoint_dir> <image.jpg>
"""

import json
import sys

import numpy as np
from PIL import Image

from cl4wsis_tpu.serve import Predictor


def main(ckpt: str, image_path: str):
    predictor = Predictor.from_checkpoint(ckpt, classes=(16, 5))
    img = np.asarray(Image.open(image_path).convert("RGB"))
    result = predictor(img)
    for inst in result.instances():
        print(f"class={inst['label']} score={inst['score']:.3f} "
              f"area={int(inst['mask'].sum())}")
    with open("predictions.json", "w") as f:
        json.dump(result.to_coco(image_id=0), f)
    print("wrote predictions.json")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
