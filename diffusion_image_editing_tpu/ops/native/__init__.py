"""Native (C++) host ops: ctypes library + XLA FFI custom calls.

Builds on demand with g++ (cached in this directory); every entry point has a
pure-numpy fallback so the framework degrades gracefully without a toolchain.

  * `merge_part_masks_native(parts)` — ctypes hot path for the CelebAMask
    label merge (`prepropess_data.py:15-38` equivalent).
  * `resize_bilinear_u8 / normalize_imagenet / to_symmetric_range` — data
    loader fast paths.
  * `label_merge_ffi(parts)` — the same merge as an XLA custom call on the
    CPU platform (jax.ffi), usable inside jitted input pipelines.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


def _build(name: str, extra_flags: Optional[list] = None) -> Optional[str]:
    src = os.path.join(_DIR, f"{name}.cpp")
    so = os.path.join(_DIR, f"lib{name}.so")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", src, "-o", so]
    if extra_flags:
        cmd[1:1] = extra_flags
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return so
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None


def _load(name: str, extra_flags=None) -> Optional[ctypes.CDLL]:
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _build(name, extra_flags)
        lib = ctypes.CDLL(so) if so else None
        _LIBS[name] = lib
        return lib


def host_lib() -> Optional[ctypes.CDLL]:
    return _load("host_ops")


# ---------------------------------------------------------------------------
# ctypes entry points (numpy fallback when the toolchain is absent)
# ---------------------------------------------------------------------------


def merge_part_masks_native(parts: np.ndarray, marker: int = 225) -> np.ndarray:
    """(P, H, W) uint8 part masks -> (H, W) uint8 label map (part i -> i+1)."""
    parts = np.ascontiguousarray(parts, np.uint8)
    p, h, w = parts.shape
    lib = host_lib()
    if lib is None:
        out = np.zeros((h, w), np.uint8)
        for i in range(p):
            out[parts[i] == marker] = i + 1
        return out
    out = np.zeros(h * w, np.uint8)
    lib.die_merge_part_masks(
        parts.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(p), ctypes.c_int(h * w), ctypes.c_uint8(marker),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(h, w)


def resize_bilinear_u8(img: np.ndarray, oh: int, ow: int) -> np.ndarray:
    """(H, W, C) uint8 -> (oh, ow, C) uint8, half-pixel bilinear."""
    img = np.ascontiguousarray(img, np.uint8)
    ih, iw, c = img.shape
    lib = host_lib()
    if lib is None:
        ys = np.clip((np.arange(oh) + 0.5) * ih / oh - 0.5, 0, ih - 1)
        xs = np.clip((np.arange(ow) + 0.5) * iw / ow - 0.5, 0, iw - 1)
        y0 = np.floor(ys).astype(int); x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, ih - 1); x1 = np.minimum(x0 + 1, iw - 1)
        wy = (ys - y0)[:, None, None]; wx = (xs - x0)[None, :, None]
        f = img.astype(np.float32)
        v = (f[np.ix_(y0, x0)] * (1 - wy) * (1 - wx) + f[np.ix_(y0, x1)] * (1 - wy) * wx
             + f[np.ix_(y1, x0)] * wy * (1 - wx) + f[np.ix_(y1, x1)] * wy * wx)
        return np.clip(v + 0.5, 0, 255).astype(np.uint8)
    out = np.empty((oh, ow, c), np.uint8)
    lib.die_resize_bilinear_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(ih), ctypes.c_int(iw), ctypes.c_int(c),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int(oh), ctypes.c_int(ow),
    )
    return out


def normalize_imagenet(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> float32, ImageNet-normalized."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = host_lib()
    if lib is None:
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        return ((img / 255.0).astype(np.float32) - mean) / std
    out = np.empty(img.shape, np.float32)
    npix = img.shape[0] * img.shape[1]
    lib.die_normalize_imagenet(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), ctypes.c_int(npix),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def to_symmetric_range(img: np.ndarray) -> np.ndarray:
    """uint8 -> float32 in [-1, 1]."""
    img = np.ascontiguousarray(img, np.uint8)
    lib = host_lib()
    if lib is None:
        return img.astype(np.float32) * (2.0 / 255.0) - 1.0
    out = np.empty(img.shape, np.float32)
    lib.die_to_symmetric_range(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(img.size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


# ---------------------------------------------------------------------------
# XLA FFI custom calls (CPU platform)
# ---------------------------------------------------------------------------

_FFI_REGISTERED = False


def _ensure_ffi() -> bool:
    global _FFI_REGISTERED
    if _FFI_REGISTERED:
        return True
    import jax

    lib = _load("ffi_ops", extra_flags=[f"-I{jax.ffi.include_dir()}", "-std=c++17"])
    if lib is None:
        return False
    lib.die_label_merge_handler.restype = ctypes.c_void_p
    lib.die_imagenet_normalize_handler.restype = ctypes.c_void_p
    jax.ffi.register_ffi_target(
        "die_label_merge",
        jax.ffi.pycapsule(lib.die_label_merge_handler()),
        platform="cpu",
    )
    jax.ffi.register_ffi_target(
        "die_imagenet_normalize",
        jax.ffi.pycapsule(lib.die_imagenet_normalize_handler()),
        platform="cpu",
    )
    _FFI_REGISTERED = True
    return True


def label_merge_ffi(parts):
    """(P, N) uint8 part masks -> (N,) uint8 label map via the C++ XLA custom
    call (CPU platform); numpy fallback elsewhere."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu" or not _ensure_ffi():
        p = np.asarray(parts)
        out = np.zeros(p.shape[1], np.uint8)
        for i in range(p.shape[0]):
            out[p[i] == 225] = i + 1
        return jnp.asarray(out)

    call = jax.ffi.ffi_call(
        "die_label_merge", jax.ShapeDtypeStruct((parts.shape[1],), jnp.uint8)
    )
    return call(parts)


def imagenet_normalize_ffi(img_u8):
    """(N, 3) uint8 -> (N, 3) float32 via the C++ XLA custom call."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "cpu" or not _ensure_ffi():
        mean = jnp.array([0.485, 0.456, 0.406], jnp.float32)
        std = jnp.array([0.229, 0.224, 0.225], jnp.float32)
        return (img_u8.astype(jnp.float32) / 255.0 - mean) / std

    call = jax.ffi.ffi_call(
        "die_imagenet_normalize", jax.ShapeDtypeStruct(img_u8.shape, jnp.float32)
    )
    return call(img_u8)
