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


def test_corrupt_input_rejected():
    assert native.image_dims(b"not an image") is None
    assert native.decode_bgr(b"\x89PNG\r\n\x1a\ngarbage") is None
    with pytest.raises(ValueError):
        native.decode_resize_batch([b"junkjunkjunk"], 64, 64)
