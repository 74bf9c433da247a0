"""Native image IO (dd3d_tpu/data/native): byte-parity with the cv2/PIL path.

The loader's correctness contract is that the native decode+resize is
indistinguishable from the path it replaces (cv2.imread + PIL BILINEAR — the
fvcore-parity path of ResizeTransform.apply_image, cf. reference
tridet/data/dataset_mappers/dataset_mapper.py:110-127). Every test asserts
BYTE equality, not tolerance.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")
from PIL import Image

from dd3d_tpu.data import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native image IO did not build")


def _noisy(rng, h, w):
    img = rng.randint(0, 256, (h, w, 3), np.uint8)
    return cv2.GaussianBlur(img, (7, 7), 3)


def test_png_decode_matches_cv2(tmp_path):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (123, 457, 3), np.uint8)
    p = str(tmp_path / "t.png")
    cv2.imwrite(p, img)
    ref = cv2.imread(p, cv2.IMREAD_COLOR)
    data = open(p, "rb").read()
    assert native.image_dims(data) == (123, 457)
    out = native.decode_bgr(data)
    assert np.array_equal(ref, out)


def test_png_gray_and_palette_decode(tmp_path):
    rng = np.random.RandomState(1)
    gray = rng.randint(0, 256, (64, 80), np.uint8)
    p = str(tmp_path / "g.png")
    cv2.imwrite(p, gray)
    ref = cv2.imread(p, cv2.IMREAD_COLOR)  # gray replicated to BGR
    out = native.decode_bgr(open(p, "rb").read())
    assert np.array_equal(ref, out)


def test_jpeg_decode_matches_cv2(tmp_path):
    rng = np.random.RandomState(2)
    img = _noisy(rng, 240, 320)
    p = str(tmp_path / "t.jpg")
    cv2.imwrite(p, img, [cv2.IMWRITE_JPEG_QUALITY, 90])
    ref = cv2.imread(p, cv2.IMREAD_COLOR)
    out = native.decode_bgr(open(p, "rb").read())
    # Same libjpeg-turbo underneath: byte-equal on this box. If a future
    # base image diverges the loader still works (lossy-decode LSBs only),
    # but we pin equality while it holds so any drift is a loud signal.
    assert np.array_equal(ref, out)


@pytest.mark.parametrize(
    "sh,sw,dh,dw",
    [
        (370, 1224, 384, 1270),  # KITTI train resize (upscale)
        (370, 1224, 288, 953),  # downscale -> antialiased path
        (900, 1600, 384, 683),  # nuScenes-like strong downscale
        (100, 100, 300, 200),  # anisotropic upscale
        (7, 5, 3, 11),  # degenerate tiny
        (64, 64, 64, 64),  # identity
        (50, 64, 50, 128),  # horizontal only
        (50, 64, 100, 64),  # vertical only
    ],
)
def test_resize_matches_pil(sh, sw, dh, dw):
    rng = np.random.RandomState(sh * 7 + sw)
    src = rng.randint(0, 256, (sh, sw, 3), np.uint8)
    ref = np.asarray(Image.fromarray(src).resize((dw, dh), Image.BILINEAR))
    out = native.resize_bilinear(src, dh, dw)
    assert out is not None and np.array_equal(ref, out)


def test_resize_single_channel():
    rng = np.random.RandomState(3)
    src = rng.randint(0, 256, (77, 91), np.uint8)
    ref = np.asarray(Image.fromarray(src).resize((40, 60), Image.BILINEAR))
    out = native.resize_bilinear(src, 60, 40)
    assert out.shape == (60, 40) and np.array_equal(ref, out)


def test_load_resize_fused(tmp_path):
    rng = np.random.RandomState(4)
    img = _noisy(rng, 370, 1224)
    p = str(tmp_path / "k.png")
    cv2.imwrite(p, img)
    ref = np.asarray(Image.fromarray(cv2.imread(p, cv2.IMREAD_COLOR)).resize((1270, 384), Image.BILINEAR))
    out = native.load_resize_bgr(p, 384, 1270)
    assert np.array_equal(ref, out)


def test_decode_resize_batch(tmp_path):
    rng = np.random.RandomState(5)
    blobs, refs = [], []
    for i, (h, w) in enumerate([(370, 1224), (375, 1242), (240, 320)]):
        img = _noisy(rng, h, w)
        p = str(tmp_path / f"b{i}.png")
        cv2.imwrite(p, img)
        blobs.append(open(p, "rb").read())
        refs.append(np.asarray(Image.fromarray(cv2.imread(p, cv2.IMREAD_COLOR)).resize((640, 192), Image.BILINEAR)))
    out = native.decode_resize_batch(blobs, 192, 640)
    assert out.shape == (3, 192, 640, 3)
    for i in range(3):
        assert np.array_equal(refs[i], out[i]), i


def test_mapper_path_uses_native_and_matches(tmp_path):
    """End-to-end through DatasetMapper: native on vs forced off, identical."""
    from dd3d_tpu.data.augmentations import ResizeShortestEdge
    from dd3d_tpu.data.mapper import DatasetMapper

    rng = np.random.RandomState(6)
    img = _noisy(rng, 370, 1224)
    p = str(tmp_path / "m.png")
    cv2.imwrite(p, img)
    dd = {
        "file_name": p,
        "intrinsics": np.array([[721.5, 0, 609.5], [0, 721.5, 172.8], [0, 0, 1.0]]),
        "annotations": [],
        "width": 1224,
        "height": 370,
        "image_id": "m",
    }
    mapper = DatasetMapper([ResizeShortestEdge([384], 10000, sample_style="choice")], is_train=False)
    out_native = mapper(dict(dd), rng=np.random.RandomState(0))
    lib, failed = native._lib, native._load_failed
    try:
        native._lib, native._load_failed = None, True  # force the cv2/PIL path
        out_py = mapper(dict(dd), rng=np.random.RandomState(0))
    finally:
        native._lib, native._load_failed = lib, failed
    assert np.array_equal(out_native["image"], out_py["image"])


def test_png_with_alpha_matches_cv2(tmp_path):
    """RGBA PNGs: cv2.imread(IMREAD_COLOR) drops alpha; the native path must
    do the same deterministically (ADVICE r3: compositing onto an
    uninitialized buffer was nondeterministic)."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (60, 90, 4), np.uint8)  # BGRA, random alpha
    p = str(tmp_path / "a.png")
    cv2.imwrite(p, img)
    ref = cv2.imread(p, cv2.IMREAD_COLOR)
    data = open(p, "rb").read()
    out1 = native.decode_bgr(data)
    out2 = native.decode_bgr(data)
    assert out1 is not None and np.array_equal(out1, out2)  # deterministic
    assert np.array_equal(ref, out1)  # cv2 drop-alpha semantics


def test_png_16bit_falls_back(tmp_path):
    """16-bit PNGs: libpng's simplified narrowing is sRGB-coded, cv2 takes the
    high byte — refuse natively so the loader falls back to cv2 (ADVICE r3)."""
    rng = np.random.RandomState(8)
    img16 = rng.randint(0, 65536, (40, 50, 3), np.uint16)
    p = str(tmp_path / "w.png")
    cv2.imwrite(p, img16)
    data = open(p, "rb").read()
    assert native.decode_bgr(data) is None  # native path refuses
    # and the public load path still works through the fallback:
    from dd3d_tpu.data.mapper import read_image_bgr

    ref = cv2.imread(p, cv2.IMREAD_COLOR)
    assert np.array_equal(read_image_bgr(p), ref)


def test_decode_resize_batch_multi_mixed_targets(tmp_path):
    rng = np.random.RandomState(9)
    blobs, refs, targets = [], [], []
    for i, ((h, w), (dh, dw)) in enumerate([((370, 1224), (384, 1270)), ((900, 1600), (384, 683)), ((240, 320), (192, 256))]):
        img = _noisy(rng, h, w)
        p = str(tmp_path / f"mt{i}.png")
        cv2.imwrite(p, img)
        blobs.append(open(p, "rb").read())
        targets.append((dh, dw))
        refs.append(np.asarray(Image.fromarray(cv2.imread(p, cv2.IMREAD_COLOR)).resize((dw, dh), Image.BILINEAR)))
    blobs.append(b"not an image")
    targets.append((64, 64))
    blobs.append(blobs[0])
    targets.append(None)  # explicit skip
    out = native.decode_resize_batch_multi(blobs, targets)
    assert out is not None and len(out) == 5
    for i in range(3):
        assert out[i] is not None and np.array_equal(refs[i], out[i]), i
    assert out[3] is None and out[4] is None


@pytest.fixture
def kitti_fixture_cfg(tmp_path):
    """Synthetic 4-image KITTI tree + registered config (varied image sizes so
    the per-image resize targets differ within one batch)."""
    from test_kitti_data import CALIB_TEXT, LABEL_TEXT

    from dd3d_tpu.configs import get_experiment_cfg
    from dd3d_tpu.data.catalog import register_datasets

    root = tmp_path / "KITTI3D"
    (root / "mv3d_kitti_splits").mkdir(parents=True)
    for sub in ("calib", "label_2", "image_2"):
        (root / "training" / sub).mkdir(parents=True)
    sizes = [(375, 1242), (370, 1224), (375, 1242), (374, 1238)]
    ids = []
    for i, (h, w) in enumerate(sizes):
        sid = f"{i:06d}"
        ids.append(sid)
        (root / "training" / "calib" / f"{sid}.txt").write_text(CALIB_TEXT)
        (root / "training" / "label_2" / f"{sid}.txt").write_text(LABEL_TEXT)
        img = _noisy(np.random.RandomState(i), h, w)
        cv2.imwrite(str(root / "training" / "image_2" / f"{sid}.png"), img)
    (root / "mv3d_kitti_splits" / "train.txt").write_text("".join(s + "\n" for s in ids))
    cfg = get_experiment_cfg("dd3d_kitti_dla34")
    cfg.DATASET_ROOT = str(tmp_path)
    cfg.DATASETS.TRAIN.NAME = "kitti_3d_train"
    cfg.DATASETS.TEST.NAME = "kitti_3d_train"
    cfg.INPUT.RESIZE.MIN_SIZE_TRAIN = [288]
    cfg.INPUT.RESIZE.MIN_SIZE_TEST = 288
    register_datasets(cfg)
    return cfg


def _loader_batches_with_and_without_native(build, n_batches):
    """Collect n_batches from `build()` twice: native on, then forced off."""
    batches_native = [b for b, _ in zip(iter(build()), range(n_batches))]
    lib, failed = native._lib, native._load_failed
    try:
        native._lib, native._load_failed = None, True
        batches_py = [b for b, _ in zip(iter(build()), range(n_batches))]
    finally:
        native._lib, native._load_failed = lib, failed
    return batches_native, batches_py


def _assert_batches_equal(a, b):
    """Compare the array part of (batch, meta) loader items byte-exactly."""
    batch_a, meta_a = (a if isinstance(a, tuple) else (a, None))
    batch_b, meta_b = (b if isinstance(b, tuple) else (b, None))
    assert set(batch_a) == set(batch_b)
    for k in batch_a:
        assert np.array_equal(np.asarray(batch_a[k]), np.asarray(batch_b[k])), k
    if meta_a is not None:
        assert [m.get("image_id") for m in meta_a] == [m.get("image_id") for m in meta_b]


def test_test_loader_native_batch_parity(kitti_fixture_cfg):
    """TestDataLoader through the batched native decode+resize must produce
    byte-identical batches to the per-image cv2/PIL path."""
    from dd3d_tpu.data.build import build_test_dataloader

    cfg = kitti_fixture_cfg
    cfg.TEST.IMS_PER_BATCH = 4
    a, b = _loader_batches_with_and_without_native(lambda: build_test_dataloader(cfg), 2)
    for x, y in zip(a, b):
        _assert_batches_equal(x, y)


def test_train_loader_native_batch_parity(kitti_fixture_cfg):
    """TrainDataLoader (thread path, per-batch fixed resize bucket) through
    the batched native path: byte-identical, same seed stream."""
    from dd3d_tpu.data.build import build_train_dataloader

    cfg = kitti_fixture_cfg
    cfg.SOLVER.IMS_PER_BATCH = 4
    cfg.DATALOADER.TRAIN.USE_PROCESS_POOL = False
    cfg.DATALOADER.TRAIN.NUM_WORKERS = 2
    a, b = _loader_batches_with_and_without_native(lambda: build_train_dataloader(cfg), 2)
    for x, y in zip(a, b):
        _assert_batches_equal(x, y)


def test_corrupt_input_rejected():
    assert native.image_dims(b"not an image") is None
    assert native.decode_bgr(b"\x89PNG\r\n\x1a\ngarbage") is None
    with pytest.raises(ValueError):
        native.decode_resize_batch([b"junkjunkjunk"], 64, 64)
