"""ctypes bindings for the fplnative C++ library, with numpy fallbacks.

The C++ library provides the host-side algorithmic kernels the reference got
from native third-party libs (SURVEY.md section 2.9): raster-scan distance
transforms (GeodisTK equivalent, evaluation path) and connected-component
labeling (scipy.ndimage.label equivalent, post-processing path).

On first use the library is compiled with ``make`` if the shared object is
missing (build takes <2 s). If no C++ toolchain is available the pure-Python
fallbacks keep everything functional (slower, identical results).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_THIS_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_THIS_DIR, 'libfplnative.so')
_lib: Optional[ctypes.CDLL] = None
_lib_tried = False


def _load_library() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(['make', '-C', _THIS_DIR], check=True,
                           capture_output=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = np.ctypeslib.ndpointer(np.float32, flags='C_CONTIGUOUS')
    u8p = np.ctypeslib.ndpointer(np.uint8, flags='C_CONTIGUOUS')
    i32p = np.ctypeslib.ndpointer(np.int32, flags='C_CONTIGUOUS')
    lib.raster_scan_distance_3d.argtypes = [
        f32p, u8p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        f32p, ctypes.c_float, ctypes.c_int]
    lib.raster_scan_distance_2d.argtypes = [
        f32p, u8p, f32p, ctypes.c_int64, ctypes.c_int64,
        f32p, ctypes.c_float, ctypes.c_int]
    lib.connected_components_3d.argtypes = [
        u8p, i32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int]
    lib.connected_components_3d.restype = ctypes.c_int64
    _lib = lib
    return _lib


def raster_scan_distance(seeds: np.ndarray,
                         spacing=None,
                         image: Optional[np.ndarray] = None,
                         lamb: float = 0.0,
                         iterations: int = 2) -> np.ndarray:
    """Spacing-weighted raster-scan distance transform from ``seeds``.

    Parity with the reference's GeodisTK usage (lamb=0, zero image,
    2 iterations — evaluation_seg_train.py:122-126,158-162). Supports 2D
    ``[H,W]`` and 3D ``[D,H,W]`` binary seed maps.
    """
    seeds = np.ascontiguousarray(seeds, np.uint8)
    ndim = seeds.ndim
    if spacing is None:
        spacing = [1.0] * ndim
    spacing = np.ascontiguousarray(spacing, np.float32)
    if image is None:
        image = np.zeros(seeds.shape, np.float32)
    image = np.ascontiguousarray(image, np.float32)
    dist = np.empty(seeds.shape, np.float32)
    lib = _load_library()
    if lib is not None:
        if ndim == 3:
            d, h, w = seeds.shape
            lib.raster_scan_distance_3d(image.reshape(-1), seeds.reshape(-1),
                                        dist.reshape(-1), d, h, w, spacing,
                                        lamb, iterations)
        elif ndim == 2:
            h, w = seeds.shape
            lib.raster_scan_distance_2d(image.reshape(-1), seeds.reshape(-1),
                                        dist.reshape(-1), h, w, spacing,
                                        lamb, iterations)
        else:
            raise ValueError('seeds must be 2D or 3D')
        return dist
    return _raster_scan_numpy(image, seeds, spacing, lamb, iterations)


def _raster_scan_numpy(image, seeds, spacing, lamb, iterations):
    """Pure-numpy fallback of the identical raster-scan relaxation."""
    arr3 = seeds if seeds.ndim == 3 else seeds[None]
    img3 = image if image.ndim == 3 else image[None]
    sp3 = (np.concatenate([[1.0], spacing]) if seeds.ndim == 2
           else np.asarray(spacing, np.float64))
    d_, h_, w_ = arr3.shape
    dist = np.where(arr3 > 0, 0.0, 1e10).astype(np.float64)

    offsets = []
    for dz in (-1, 0):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dz == 0 and (dy > 0 or (dy == 0 and dx >= 0)):
                    continue
                sp2 = (dz * sp3[0]) ** 2 + (dy * sp3[1]) ** 2 + (dx * sp3[2]) ** 2
                offsets.append((dz, dy, dx, sp2))

    def relax(order):
        zs = range(d_) if order > 0 else range(d_ - 1, -1, -1)
        for z in zs:
            ys = range(h_) if order > 0 else range(h_ - 1, -1, -1)
            for y in ys:
                xs = range(w_) if order > 0 else range(w_ - 1, -1, -1)
                for x in xs:
                    best = dist[z, y, x]
                    for dz, dy, dx, sp2 in offsets:
                        zz, yy, xx = z + order * dz, y + order * dy, x + order * dx
                        if 0 <= zz < d_ and 0 <= yy < h_ and 0 <= xx < w_:
                            g = lamb * (img3[z, y, x] - img3[zz, yy, xx])
                            cand = dist[zz, yy, xx] + np.sqrt(sp2 + g * g)
                            if cand < best:
                                best = cand
                    dist[z, y, x] = best

    for _ in range(iterations):
        relax(+1)
        relax(-1)
    out = dist.astype(np.float32)
    return out if seeds.ndim == 3 else out[0]


def connected_components(mask: np.ndarray,
                         connectivity: int = 6) -> Tuple[np.ndarray, int]:
    """Label connected components of a 2D/3D binary mask. Components are
    numbered 1..n in decreasing-size order (1 = largest). Returns
    (labels int32, n_components)."""
    mask = np.ascontiguousarray(mask > 0, np.uint8)
    squeeze2d = mask.ndim == 2
    m3 = mask[None] if squeeze2d else mask
    labels = np.empty(m3.shape, np.int32)
    lib = _load_library()
    if lib is not None:
        d, h, w = m3.shape
        n = lib.connected_components_3d(m3.reshape(-1), labels.reshape(-1),
                                        d, h, w, connectivity)
    else:
        from scipy import ndimage
        struct = ndimage.generate_binary_structure(
            3, 3 if connectivity >= 26 else 1)
        lab, n = ndimage.label(m3, structure=struct)
        if n > 0:
            sizes = np.bincount(lab.reshape(-1))[1:]
            order = np.argsort(-sizes, kind='stable')
            remap = np.zeros(n + 1, np.int32)
            remap[1 + order] = np.arange(1, n + 1, dtype=np.int32)
            lab = remap[lab]
        labels = lab.astype(np.int32)
    labels = labels[0] if squeeze2d else labels
    return labels, int(n)
