"""pycocotools.mask subset over the rebuild's RLE codec."""

import numpy as np

from cl4wsis_tpu.data.maskrle import polygons_to_mask, rle_decode, rle_encode


def encode(mask: np.ndarray):
    return rle_encode(np.asfortranarray(mask).astype(np.uint8))


def decode(rle):
    counts = rle["counts"]
    h, w = rle["size"]
    if isinstance(counts, (bytes, str)):
        from cl4wsis_tpu.data.maskrle import rle_from_string
        counts = rle_from_string(counts)
    return rle_decode(counts, h, w)


def frPyObjects(objs, h, w):
    if isinstance(objs, list) and objs and isinstance(objs[0], list):
        return [rle_encode(polygons_to_mask([p], h, w)) for p in objs]
    raise NotImplementedError("only polygon lists are supported")
