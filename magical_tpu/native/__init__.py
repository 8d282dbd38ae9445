"""ctypes bindings for the native host-support library.

Builds lazily with the in-tree Makefile on first use; every entry point
has a pure-numpy fallback so the package works without a toolchain.
"""

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, 'libmagical_native.so')
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(['make', '-C', _HERE], check=True,
                               capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.resize_area_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p] + [ctypes.c_int] * 7
        lib.mt_new.restype = ctypes.c_void_p
        lib.mt_new.argtypes = [ctypes.c_uint32]
        lib.mt_free.argtypes = [ctypes.c_void_p]
        lib.mt_uniform.argtypes = [ctypes.c_void_p, ctypes.c_double,
                                   ctypes.c_double, ctypes.c_void_p,
                                   ctypes.c_int]
        lib.mt_randint.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                   ctypes.c_int64, ctypes.c_void_p,
                                   ctypes.c_int]
        lib.mt_shuffle_indices.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_int]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def resize_area_batch(imgs: np.ndarray, res: int,
                      n_threads: int = 8) -> np.ndarray:
    """Batched INTER_AREA downscale of (N, H, W, C) uint8 images to
    (N, res, res, C); exact cv2 semantics at integer ratios."""
    lib = _load()
    imgs = np.ascontiguousarray(imgs, dtype=np.uint8)
    single = imgs.ndim == 3
    if single:
        imgs = imgs[None]
    n, h, w, c = imgs.shape
    fh, fw = h // res, w // res
    assert fh * res == h and fw * res == w, (h, w, res)
    if lib is None:
        x = imgs.reshape(n, res, fh, res, fw, c).astype(np.float64)
        out = np.floor(x.mean(axis=(2, 4)) + 0.5).astype(np.uint8)
    else:
        out = np.empty((n, res, res, c), np.uint8)
        lib.resize_area_batch(
            imgs.ctypes.data_as(ctypes.c_void_p),
            out.ctypes.data_as(ctypes.c_void_p),
            n, h, w, c, fh, fw, n_threads)
    return out[0] if single else out


class NativeRandomState:
    """numpy.random.RandomState-compatible MT19937 stream (native), used
    by the reference-parity reset sampler.  Falls back to numpy's own
    RandomState when the library is unavailable (identical streams)."""

    def __init__(self, seed: int):
        self._lib = _load()
        if self._lib is None:
            self._np = np.random.RandomState(seed)
            self._h = None
        else:
            self._np = None
            self._h = self._lib.mt_new(ctypes.c_uint32(seed & 0xffffffff))

    def __del__(self):
        if getattr(self, '_h', None) and self._lib is not None:
            self._lib.mt_free(self._h)
            self._h = None

    def uniform(self, low=0.0, high=1.0, size=None):
        if self._np is not None:
            return self._np.uniform(low, high, size)
        n = int(np.prod(size)) if size is not None else 1
        out = np.empty(n, np.float64)
        self._lib.mt_uniform(self._h, float(low), float(high),
                             out.ctypes.data_as(ctypes.c_void_p), n)
        if size is None:
            return float(out[0])
        return out.reshape(size)

    def randint(self, low, high=None, size=None):
        if high is None:
            low, high = 0, low
        if self._np is not None:
            return self._np.randint(low, high, size)
        n = int(np.prod(size)) if size is not None else 1
        out = np.empty(n, np.int64)
        self._lib.mt_randint(self._h, int(low), int(high),
                             out.ctypes.data_as(ctypes.c_void_p), n)
        if size is None:
            return int(out[0])
        return out.reshape(size)

    def choice(self, values, size=None):
        """RandomState.choice with uniform replacement (the only form the
        reference uses: rng.choice(arr) / rng.choice(arr, size=n))."""
        values = list(values)
        if self._np is not None:
            idx = self._np.randint(0, len(values), size)
        else:
            idx = self.randint(0, len(values), size)
        if size is None:
            return values[int(idx)]
        return [values[int(i)] for i in np.asarray(idx).ravel()]

    def shuffle(self, lst):
        n = len(lst)
        if self._np is not None:
            idx = np.arange(n)
            self._np.shuffle(idx)
        else:
            idx = np.arange(n, dtype=np.int64)
            self._lib.mt_shuffle_indices(
                self._h, idx.ctypes.data_as(ctypes.c_void_p), n)
        lst[:] = [lst[i] for i in idx]
