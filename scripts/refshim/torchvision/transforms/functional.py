"""torchvision.transforms.functional subset (PIL-first, tensor where the
reference needs it). Semantics follow the published torchvision API docs."""

import numbers
from enum import Enum

import numpy as np
import torch
from PIL import Image, ImageEnhance, ImageOps


class InterpolationMode(Enum):
    NEAREST = "nearest"
    NEAREST_EXACT = "nearest-exact"
    BILINEAR = "bilinear"
    BICUBIC = "bicubic"
    BOX = "box"
    HAMMING = "hamming"
    LANCZOS = "lanczos"


_PIL_RESAMPLE = {
    InterpolationMode.NEAREST: Image.NEAREST,
    InterpolationMode.NEAREST_EXACT: Image.NEAREST,
    InterpolationMode.BILINEAR: Image.BILINEAR,
    InterpolationMode.BICUBIC: Image.BICUBIC,
    InterpolationMode.BOX: Image.BOX,
    InterpolationMode.HAMMING: Image.HAMMING,
    InterpolationMode.LANCZOS: Image.LANCZOS,
}


def _resample(interpolation):
    if isinstance(interpolation, InterpolationMode):
        return _PIL_RESAMPLE[interpolation]
    return int(interpolation)  # legacy PIL int constants


def resize(img, size, interpolation=InterpolationMode.BILINEAR,
           max_size=None, antialias=True):
    rs = _resample(interpolation)
    w, h = img.size
    if isinstance(size, int) or (isinstance(size, (tuple, list))
                                 and len(size) == 1):
        s = size if isinstance(size, int) else size[0]
        if (w <= h and w == s) or (h <= w and h == s):
            return img
        if w < h:
            ow, oh = s, int(round(s * h / w))
        else:
            oh, ow = s, int(round(s * w / h))
        return img.resize((ow, oh), rs)
    oh, ow = size
    return img.resize((ow, oh), rs)


def _pad_border(padding):
    if isinstance(padding, numbers.Number):
        return (int(padding),) * 4
    if len(padding) == 2:
        l, t = padding
        return (int(l), int(t), int(l), int(t))
    if len(padding) == 4:
        l, t, r, b = padding
        return (int(l), int(t), int(r), int(b))
    raise ValueError(f"bad padding {padding!r}")


def pad(img, padding, fill=0, padding_mode="constant"):
    border = _pad_border(padding)
    if padding_mode == "constant":
        return ImageOps.expand(img, border=border, fill=fill)
    l, t, r, b = border
    arr = np.asarray(img)
    mode = {"edge": "edge", "reflect": "reflect",
            "symmetric": "symmetric"}[padding_mode]
    pads = [(t, b), (l, r)] + [(0, 0)] * (arr.ndim - 2)
    return Image.fromarray(np.pad(arr, pads, mode=mode))


def crop(img, top, left, height, width):
    return img.crop((left, top, left + width, top + height))


def center_crop(img, output_size):
    if isinstance(output_size, numbers.Number):
        output_size = (int(output_size), int(output_size))
    elif len(output_size) == 1:
        output_size = (output_size[0], output_size[0])
    ch, cw = output_size
    w, h = img.size
    if cw > w or ch > h:  # torchvision pads with 0 when crop > image
        img = pad(img, [max(cw - w, 0) // 2, max(ch - h, 0) // 2,
                        (max(cw - w, 0) + 1) // 2, (max(ch - h, 0) + 1) // 2])
        w, h = img.size
    top = int(round((h - ch) / 2.0))
    left = int(round((w - cw) / 2.0))
    return crop(img, top, left, ch, cw)


def resized_crop(img, top, left, height, width, size,
                 interpolation=InterpolationMode.BILINEAR, antialias=True):
    img = crop(img, top, left, height, width)
    if isinstance(size, int):
        size = (size, size)
    return resize(img, size, interpolation)


def hflip(img):
    if isinstance(img, torch.Tensor):
        return img.flip(-1)
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def vflip(img):
    if isinstance(img, torch.Tensor):
        return img.flip(-2)
    return img.transpose(Image.FLIP_TOP_BOTTOM)


def _rotate_tensor(x, angle, mode):
    """Counter-clockwise rotation of (..., H, W) tensors about the center,
    output same shape (expand=False), zeros outside — matches torchvision's
    tensor path. Exact rot90 for multiples of 90 on square inputs."""
    squeeze = x.ndim == 3
    if squeeze:
        x = x[None]
    a = float(angle) % 360.0
    if a % 90.0 == 0 and x.shape[-1] == x.shape[-2]:
        return (torch.rot90(x, int(a // 90), dims=(-2, -1))[0] if squeeze
                else torch.rot90(x, int(a // 90), dims=(-2, -1)))
    rad = torch.tensor(float(angle) * np.pi / 180.0, dtype=torch.float32)
    cos, sin = torch.cos(rad), torch.sin(rad)
    # grid_sample's inverse map: output coords -> input coords (rotate by
    # -angle in the y-down image frame == +angle counter-clockwise visually)
    theta = torch.tensor([[cos, sin, 0.0], [-sin, cos, 0.0]],
                         dtype=x.dtype)[None].expand(x.shape[0], 2, 3)
    grid = torch.nn.functional.affine_grid(theta, x.shape, align_corners=False)
    out = torch.nn.functional.grid_sample(x, grid, mode=mode,
                                          padding_mode="zeros",
                                          align_corners=False)
    return out[0] if squeeze else out


def rotate(img, angle, interpolation=InterpolationMode.NEAREST,
           expand=False, center=None, fill=None, resample=None):
    if resample is not None:  # legacy kwarg name
        interpolation = resample
    if isinstance(img, torch.Tensor):
        mode = ("bilinear"
                if interpolation == InterpolationMode.BILINEAR else "nearest")
        return _rotate_tensor(img, angle, mode)
    rs = _resample(interpolation)
    return img.rotate(angle, resample=rs, expand=expand, center=center,
                      fillcolor=fill)


def to_tensor(pic):
    if isinstance(pic, np.ndarray):
        arr = pic
    else:
        arr = np.array(pic)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(arr.transpose(2, 0, 1).copy()).contiguous()
    if t.dtype == torch.uint8:
        return t.float().div(255.0)
    return t.float()


def normalize(tensor, mean, std, inplace=False):
    if not inplace:
        tensor = tensor.clone()
    dtype = tensor.dtype
    mean = torch.as_tensor(mean, dtype=dtype, device=tensor.device)
    std = torch.as_tensor(std, dtype=dtype, device=tensor.device)
    if tensor.ndim == 4:
        mean, std = mean.view(1, -1, 1, 1), std.view(1, -1, 1, 1)
    else:
        mean, std = mean.view(-1, 1, 1), std.view(-1, 1, 1)
    return tensor.sub_(mean).div_(std)


def adjust_brightness(img, brightness_factor):
    return ImageEnhance.Brightness(img).enhance(brightness_factor)


def adjust_contrast(img, contrast_factor):
    return ImageEnhance.Contrast(img).enhance(contrast_factor)


def adjust_saturation(img, saturation_factor):
    return ImageEnhance.Color(img).enhance(saturation_factor)


def adjust_hue(img, hue_factor):
    if not -0.5 <= hue_factor <= 0.5:
        raise ValueError("hue_factor out of [-0.5, 0.5]")
    mode = img.mode
    if mode in ("L", "1", "I", "F"):
        return img
    h, s, v = img.convert("HSV").split()
    arr = np.array(h, dtype=np.uint8)
    arr = (arr.astype(np.int16) + int(hue_factor * 255)) % 256
    h = Image.fromarray(arr.astype(np.uint8), "L")
    return Image.merge("HSV", (h, s, v)).convert(mode)
