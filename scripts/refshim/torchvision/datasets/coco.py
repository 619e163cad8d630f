"""torchvision.datasets.coco.CocoDetection shim — the base class of the
reference's VOCInstanceSegmentation (dataset/voc.py:218). It only relies on
``self.root``, ``self.coco`` (pycocotools-like) and ``self.ids``."""

import os

import torch.utils.data as data

from pycocotools.coco import COCO


class CocoDetection(data.Dataset):
    def __init__(self, root, annFile, transform=None, target_transform=None,
                 transforms=None):
        self.root = os.path.expanduser(root)
        self.coco = COCO(annFile)
        self.ids = list(sorted(self.coco.imgs.keys()))
        self.transform = transform
        self.target_transform = target_transform
        self.transforms = transforms

    def __len__(self):
        return len(self.ids)
