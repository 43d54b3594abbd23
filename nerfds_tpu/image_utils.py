"""Image utilities (L2).

Parity target: reference ``hypernerf/image_utils.py`` (:33-314): float/uint
conversion, integer-safe up/downsampling, depth PNG (millimeter uint16)
save/load, checkerboard/tiling helpers.
"""
from __future__ import annotations

import math
from pathlib import Path
from typing import Tuple, Union

import numpy as np

UINT8_MAX = 255
UINT16_MAX = 65535


def image_to_uint8(image: np.ndarray) -> np.ndarray:
  """Float [0,1] -> uint8 (clipped); uint8 passes through."""
  if image.dtype == np.uint8:
    return image
  if not np.issubdtype(image.dtype, np.floating):
    raise ValueError(f'Input image should be floating: {image.dtype}')
  return (np.clip(image, 0.0, 1.0) * UINT8_MAX).astype(np.uint8)


def image_to_uint16(image: np.ndarray) -> np.ndarray:
  if image.dtype == np.uint16:
    return image
  if not np.issubdtype(image.dtype, np.floating):
    raise ValueError(f'Input image should be floating: {image.dtype}')
  return (np.clip(image, 0.0, 1.0) * UINT16_MAX).astype(np.uint16)


def image_to_float32(image: np.ndarray) -> np.ndarray:
  """Integer images -> float [0,1]; float passes through."""
  if np.issubdtype(image.dtype, np.floating):
    return image.astype(np.float32)
  if image.dtype == np.uint8:
    return image.astype(np.float32) / UINT8_MAX
  if image.dtype == np.uint16:
    return image.astype(np.float32) / UINT16_MAX
  raise ValueError(f'Unsupported dtype {image.dtype}')


def downsample_image(image: np.ndarray, scale: int) -> np.ndarray:
  """Integer-factor area downsample (reference uses cv2 INTER_AREA)."""
  import cv2
  if scale == 1:
    return image
  height, width = image.shape[:2]
  if height % scale > 0 or width % scale > 0:
    image = image[:height - height % scale, :width - width % scale]
  out = cv2.resize(image, (image.shape[1] // scale, image.shape[0] // scale),
                   interpolation=cv2.INTER_AREA)
  if image.ndim == 3 and out.ndim == 2:
    out = out[..., None]
  return out


def upsample_image(image: np.ndarray, scale: int) -> np.ndarray:
  import cv2
  if scale == 1:
    return image
  out = cv2.resize(image, (image.shape[1] * scale, image.shape[0] * scale),
                   interpolation=cv2.INTER_LANCZOS4)
  if image.ndim == 3 and out.ndim == 2:
    out = out[..., None]
  return out


def rescale_image(image: np.ndarray, scale_factor: float) -> np.ndarray:
  """Integer-safe rescale: exact integer up/down factors use the dedicated
  paths; otherwise bilinear (reference image_utils.rescale_image)."""
  import cv2
  if scale_factor == 1.0:
    return image
  if scale_factor > 1 and float(scale_factor).is_integer():
    return upsample_image(image, int(scale_factor))
  inv = 1.0 / scale_factor
  if scale_factor < 1 and float(inv).is_integer():
    return downsample_image(image, int(inv))
  height, width = image.shape[:2]
  out = cv2.resize(image, (int(round(width * scale_factor)),
                           int(round(height * scale_factor))),
                   interpolation=cv2.INTER_LINEAR)
  if image.ndim == 3 and out.ndim == 2:
    out = out[..., None]
  return out


def save_image(path: Union[str, Path], image: np.ndarray) -> None:
  import cv2
  image = image_to_uint8(image)
  if image.ndim == 3 and image.shape[-1] == 3:
    image = image[:, :, ::-1]  # RGB -> BGR
  cv2.imwrite(str(path), image)


def load_image(path: Union[str, Path]) -> np.ndarray:
  import cv2
  raw = np.fromfile(str(path), dtype=np.uint8)
  image = cv2.imdecode(raw, cv2.IMREAD_UNCHANGED)
  if image.ndim == 3 and image.shape[-1] == 3:
    image = image[:, :, ::-1]
  return np.ascontiguousarray(image)


def save_depth(path: Union[str, Path], depth: np.ndarray,
               scale: float = 1000.0) -> None:
  """Depth (meters) -> uint16 millimeter PNG (reference save_depth)."""
  import cv2
  mm = np.clip(depth * scale, 0, UINT16_MAX).astype(np.uint16)
  cv2.imwrite(str(path), mm)


def load_depth(path: Union[str, Path], scale: float = 1000.0) -> np.ndarray:
  import cv2
  mm = cv2.imread(str(path), cv2.IMREAD_ANYDEPTH)
  return mm.astype(np.float32) / scale


def checkerboard(h: int, w: int, size: int = 8,
                 low: float = 0.4, high: float = 0.6) -> np.ndarray:
  """Alpha-compositing background checkerboard."""
  yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing='ij')
  board = (((yy // size) + (xx // size)) % 2).astype(np.float32)
  return low + board * (high - low)


def composite_alpha(rgb: np.ndarray, alpha: np.ndarray,
                    background: np.ndarray = None) -> np.ndarray:
  if background is None:
    background = checkerboard(*rgb.shape[:2])[..., None]
  return rgb * alpha + background * (1.0 - alpha)


def tile_images(images, cols: int = None, pad: int = 0) -> np.ndarray:
  """Tile a list of equally-sized [H, W, C] images into a grid."""
  images = [np.asarray(im) for im in images]
  n = len(images)
  if cols is None:
    cols = int(math.ceil(math.sqrt(n)))
  rows = int(math.ceil(n / cols))
  h, w = images[0].shape[:2]
  c = images[0].shape[2] if images[0].ndim == 3 else 1
  grid = np.zeros((rows * (h + pad), cols * (w + pad), c),
                  images[0].dtype)
  for i, im in enumerate(images):
    if im.ndim == 2:
      im = im[..., None]
    r, q = divmod(i, cols)
    grid[r * (h + pad):r * (h + pad) + h,
         q * (w + pad):q * (w + pad) + w] = im
  return grid
