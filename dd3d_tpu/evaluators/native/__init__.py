"""ctypes loader for the native KITTI-eval kernels; builds on first import.

The reference ships these as numba CPU/CUDA JIT kernels
(tridet/evaluators/rotate_iou.py, kitti_3d_evaluator.py:749-1038); here they
are a g++-compiled shared library (SURVEY.md §2.10 rows 1-3).
"""
import ctypes
import logging
import os
import subprocess

import numpy as np

LOG = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "kitti_eval.cpp")
_LIB = os.path.join(_DIR, "libkitti_eval.so")

_lib = None


def _build():
    # Compile to a process-unique temp path and os.replace (atomic) into
    # place: concurrent first-use builds (multi-process eval, parallel test
    # runs) must never CDLL a partially written .so.
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    cmd = ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", tmp]
    LOG.info("Building native eval kernels: %s", " ".join(cmd))
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        os.replace(tmp, _LIB)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def get_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
        try:
            _build()
        except (OSError, subprocess.CalledProcessError):
            # mtimes are not preserved by git checkouts; a present .so is
            # almost certainly current — prefer it over failing outright
            # on a machine without g++.
            if not os.path.exists(_LIB):
                raise
            LOG.warning("Rebuild of %s failed; using the existing library.", _LIB)
    lib = ctypes.CDLL(_LIB)
    c_double_p = ctypes.POINTER(ctypes.c_double)
    c_int64_p = ctypes.POINTER(ctypes.c_int64)

    lib.rotated_iou_matrix.argtypes = [c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64, ctypes.c_int, c_double_p]
    lib.d3_box_overlap_inplace.argtypes = [c_double_p, ctypes.c_int64, c_double_p, ctypes.c_int64, ctypes.c_int, c_double_p]
    lib.compute_threshold.restype = ctypes.c_int64
    lib.compute_threshold.argtypes = [
        c_double_p, ctypes.c_int64, ctypes.c_int64, c_double_p, c_int64_p, c_int64_p, ctypes.c_double, c_double_p
    ]
    lib.compute_statistics.argtypes = [
        c_double_p, ctypes.c_int64, ctypes.c_int64, c_double_p, c_double_p, c_int64_p, c_int64_p,
        ctypes.c_double, ctypes.c_double, ctypes.c_int, c_double_p
    ]
    lib.fused_compute_statistics.argtypes = [
        c_double_p, c_double_p, ctypes.c_int64, ctypes.c_int64, c_int64_p, c_int64_p,
        c_double_p, c_double_p, c_int64_p, c_int64_p, ctypes.c_double, c_double_p,
        ctypes.c_int, ctypes.c_int64
    ]
    _lib = lib
    return lib


def _dp(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ip(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def rotated_iou_matrix(boxes: np.ndarray, qboxes: np.ndarray, criterion: int = -1) -> np.ndarray:
    """boxes (N, 5), qboxes (K, 5) [cx, cy, dx, dy, angle] -> (N, K)."""
    boxes = np.ascontiguousarray(boxes, dtype=np.float64)
    qboxes = np.ascontiguousarray(qboxes, dtype=np.float64)
    n, k = len(boxes), len(qboxes)
    out = np.zeros((n, k), dtype=np.float64)
    if n and k:
        get_lib().rotated_iou_matrix(_dp(boxes), n, _dp(qboxes), k, criterion, _dp(out))
    return out


def d3_box_overlap(boxes7: np.ndarray, qboxes7: np.ndarray, criterion: int = -1) -> np.ndarray:
    """boxes7 (N, 7) [x, y, z, l, h, w, ry] camera frame -> (N, K) 3D IoU.
    Mirrors box_3d_overlap (kitti_3d_evaluator.py:622-627)."""
    boxes7 = np.ascontiguousarray(boxes7, dtype=np.float64)
    qboxes7 = np.ascontiguousarray(qboxes7, dtype=np.float64)
    rinc = rotated_iou_matrix(boxes7[:, [0, 2, 3, 5, 6]], qboxes7[:, [0, 2, 3, 5, 6]], criterion=2)
    n, k = len(boxes7), len(qboxes7)
    if n and k:
        get_lib().d3_box_overlap_inplace(_dp(boxes7), n, _dp(qboxes7), k, criterion, _dp(rinc))
    return rinc


def compute_threshold(overlaps, dt_scores, ignored_gt, ignored_det, min_overlap):
    overlaps = np.ascontiguousarray(overlaps, dtype=np.float64)
    dt_scores = np.ascontiguousarray(dt_scores, dtype=np.float64)
    ignored_gt = np.ascontiguousarray(ignored_gt, dtype=np.int64)
    ignored_det = np.ascontiguousarray(ignored_det, dtype=np.int64)
    det_size, gt_size = overlaps.shape
    out = np.zeros(max(gt_size, 1), dtype=np.float64)
    n = get_lib().compute_threshold(
        _dp(overlaps), det_size, gt_size, _dp(dt_scores), _ip(ignored_gt), _ip(ignored_det),
        float(min_overlap), _dp(out)
    )
    return out[:n]


def fused_compute_statistics(overlaps, pr, gt_nums, dt_nums, gt_datas, dt_datas,
                             ignored_gts, ignored_dets, min_overlap, thresholds,
                             compute_angular=True):
    """Accumulate tp/fp/fn/... into pr (T, 8) over a shard of images."""
    overlaps = np.ascontiguousarray(overlaps, dtype=np.float64)
    gt_nums = np.ascontiguousarray(gt_nums, dtype=np.int64)
    dt_nums = np.ascontiguousarray(dt_nums, dtype=np.int64)
    gt_datas = np.ascontiguousarray(gt_datas, dtype=np.float64)
    dt_datas = np.ascontiguousarray(dt_datas, dtype=np.float64)
    ignored_gts = np.ascontiguousarray(ignored_gts, dtype=np.int64)
    ignored_dets = np.ascontiguousarray(ignored_dets, dtype=np.int64)
    thresholds = np.ascontiguousarray(thresholds, dtype=np.float64)
    assert pr.dtype == np.float64 and pr.flags.c_contiguous
    total_gt = int(gt_nums.sum())
    assert overlaps.shape == (int(dt_nums.sum()), total_gt)
    get_lib().fused_compute_statistics(
        _dp(overlaps), _dp(pr), len(gt_nums), len(thresholds), _ip(gt_nums), _ip(dt_nums),
        _dp(gt_datas), _dp(dt_datas), _ip(ignored_gts), _ip(ignored_dets),
        float(min_overlap), _dp(thresholds), int(compute_angular), total_gt
    )
