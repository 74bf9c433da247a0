"""ctypes loader for the native image IO kernels; builds on first import.

The reference's loader hot path is cv2.imread + fvcore/PIL resize inside
torch DataLoader workers (tridet/data/dataset_mappers/dataset_mapper.py:110-127);
here both steps run in one C call (libpng / libjpeg-turbo decode + a
bit-exact reimplementation of Pillow's uint8 bilinear resample) with the GIL
released, so the existing thread-pool mapper scales across host cores.

Import never raises: on any build/load failure `available()` is False and
callers fall back to the cv2/PIL path (byte-identical by test).
"""
import ctypes
import logging
import os
import subprocess
import threading
import uuid

import numpy as np

LOG = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imageio.cpp")
_LIB = os.path.join(_DIR, "libimageio.so")

_lib = None
_load_failed = False
_lock = threading.Lock()

_u8p = ctypes.POINTER(ctypes.c_uint8)
_i32p = ctypes.POINTER(ctypes.c_int32)


def _build():
    # Atomic build-and-replace, same scheme as evaluators/native: concurrent
    # first-use builds must never CDLL a partially written .so. The tmp name
    # carries a uuid so two racing builders (threads or processes) never
    # write the same file.
    tmp = f"{_LIB}.{os.getpid()}.{uuid.uuid4().hex[:8]}.tmp"
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", tmp, "-lpng", "-ljpeg", "-lz"]
    LOG.info("Building native image IO: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def get_lib():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    with _lock:
        if _lib is not None or _load_failed:
            return _lib
        return _get_lib_locked()


def _get_lib_locked():
    global _lib, _load_failed
    try:
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            try:
                _build()
            except (OSError, subprocess.CalledProcessError):
                if not os.path.exists(_LIB):
                    raise
                LOG.warning("Rebuild of %s failed; using the existing library.", _LIB)
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            # A stale/ABI-incompatible prebuilt .so (e.g. committed binary
            # newer than the source after checkout) must not permanently
            # disable the native path: rebuild once from source and retry.
            LOG.warning("Loading %s failed; rebuilding from source.", _LIB)
            _build()
            lib = ctypes.CDLL(_LIB)
    except Exception as e:  # missing compiler/codec libs: Python fallback
        LOG.warning("Native image IO unavailable (%s); using cv2/PIL.", e)
        _load_failed = True
        return None
    lib.image_dims.restype = ctypes.c_int32
    lib.image_dims.argtypes = [_u8p, ctypes.c_int64, _i32p, _i32p]
    lib.decode_bgr.restype = ctypes.c_int32
    lib.decode_bgr.argtypes = [_u8p, ctypes.c_int64, _u8p, ctypes.c_int32, ctypes.c_int32]
    lib.resize_bilinear_u8.restype = ctypes.c_int32
    lib.resize_bilinear_u8.argtypes = [
        _u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p, ctypes.c_int32, ctypes.c_int32
    ]
    lib.decode_resize_bgr.restype = ctypes.c_int32
    lib.decode_resize_bgr.argtypes = [
        _u8p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, _u8p, ctypes.c_int32, ctypes.c_int32
    ]
    lib.decode_resize_batch.restype = None
    lib.decode_resize_batch.argtypes = [
        ctypes.POINTER(_u8p), ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        _u8p, ctypes.c_int32, ctypes.c_int32, _i32p,
    ]
    lib.decode_resize_batch_multi.restype = None
    lib.decode_resize_batch_multi.argtypes = [
        ctypes.POINTER(_u8p), ctypes.POINTER(ctypes.c_int64), ctypes.c_int32,
        ctypes.POINTER(_u8p), _i32p, _i32p, _i32p,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


def image_dims(data: bytes):
    """(height, width) from the PNG/JPEG header, or None if unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    h = ctypes.c_int32()
    w = ctypes.c_int32()
    rc = lib.image_dims(_u8(buf), buf.size, ctypes.byref(h), ctypes.byref(w))
    return (h.value, w.value) if rc == 0 else None


def decode_bgr(data: bytes):
    """Decode PNG/JPEG bytes to an (H, W, 3) BGR uint8 array (cv2.imread
    semantics), or None if the native path can't handle the input."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(data, dtype=np.uint8)
    dims = image_dims(data)
    if dims is None:
        return None
    h, w = dims
    out = np.empty((h, w, 3), dtype=np.uint8)
    rc = lib.decode_bgr(_u8(buf), buf.size, _u8(out), h, w)
    return out if rc == 0 else None


def resize_bilinear(img: np.ndarray, new_h: int, new_w: int):
    """PIL-exact uint8 bilinear resize (HWC or HW), or None on failure."""
    lib = get_lib()
    if lib is None or img.dtype != np.uint8:
        return None
    squeeze = img.ndim == 2
    if squeeze:
        img = img[:, :, None]
    img = np.ascontiguousarray(img)
    h, w, c = img.shape
    out = np.empty((new_h, new_w, c), dtype=np.uint8)
    rc = lib.resize_bilinear_u8(_u8(img), h, w, c, _u8(out), new_h, new_w)
    if rc != 0:
        return None
    return out[:, :, 0] if squeeze else out


def load_resize_bgr(path: str, new_h: int, new_w: int):
    """Read + decode + resize in native code. Returns (new_h, new_w, 3) BGR
    uint8, or None if the file format needs the cv2 fallback."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as f:
        data = f.read()
    buf = np.frombuffer(data, dtype=np.uint8)
    dims = image_dims(data)
    if dims is None:
        return None
    h, w = dims
    out = np.empty((new_h, new_w, 3), dtype=np.uint8)
    rc = lib.decode_resize_bgr(_u8(buf), buf.size, h, w, _u8(out), new_h, new_w)
    return out if rc == 0 else None


def decode_resize_batch(blobs, new_h: int, new_w: int):
    """Decode+resize a list of encoded image byte strings to one
    (N, new_h, new_w, 3) BGR uint8 array, OpenMP-parallel over images.
    Returns None if native IO is unavailable; raises on per-image failure."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(blobs)
    arrs = [np.frombuffer(b, dtype=np.uint8) for b in blobs]
    ptrs = (_u8p * n)(*[_u8(a) for a in arrs])
    sizes = np.asarray([a.size for a in arrs], dtype=np.int64)
    out = np.empty((n, new_h, new_w, 3), dtype=np.uint8)
    status = np.zeros(n, dtype=np.int32)
    lib.decode_resize_batch(
        ptrs, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        _u8(out), new_h, new_w, status.ctypes.data_as(_i32p)
    )
    bad = np.nonzero(status)[0]
    if bad.size:
        raise ValueError(f"native decode failed for images {bad.tolist()} (codes {status[bad].tolist()})")
    return out


def decode_resize_batch_multi(blobs, targets):
    """Decode+resize encoded image byte strings with PER-IMAGE target dims,
    OpenMP-parallel over images in one GIL-released C call — the loader's
    batch hot path (cf. reference per-image cv2.imread+resize in DataLoader
    workers, tridet/data/dataset_mappers/dataset_mapper.py:110-127).

    `targets[i]` is (dh, dw) or None to skip image i. Returns a list aligned
    with `blobs` of (dh, dw, 3) BGR uint8 arrays, with None where the target
    was None or the native decode refused the input (caller falls back to
    cv2/PIL per image). Returns None if native IO is unavailable entirely."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(blobs)
    arrs = [np.frombuffer(b, dtype=np.uint8) for b in blobs]
    ptrs = (_u8p * n)(*[_u8(a) for a in arrs])
    sizes = np.asarray([a.size for a in arrs], dtype=np.int64)
    outs = [np.empty((t[0], t[1], 3), dtype=np.uint8) if t is not None else None for t in targets]
    out_ptrs = (_u8p * n)(*[(_u8(o) if o is not None else None) for o in outs])
    dhs = np.asarray([t[0] if t is not None else 0 for t in targets], dtype=np.int32)
    dws = np.asarray([t[1] if t is not None else 0 for t in targets], dtype=np.int32)
    status = np.zeros(n, dtype=np.int32)
    lib.decode_resize_batch_multi(
        ptrs, sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), n,
        out_ptrs, dhs.ctypes.data_as(_i32p), dws.ctypes.data_as(_i32p),
        status.ctypes.data_as(_i32p),
    )
    return [o if (o is not None and status[i] == 0) else None for i, o in enumerate(outs)]
