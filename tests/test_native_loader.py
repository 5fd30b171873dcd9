"""Native C++ batch decoder (csrc/fastloader.cpp) vs the cv2 reference path."""

import os

import cv2
import numpy as np
import pytest

from image_classification_tpu.data import native
from image_classification_tpu.data.source import ImageSource, decode_image


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory, ):
    d = tmp_path_factory.mktemp("jpgs")
    rng = np.random.default_rng(0)
    for i in range(8):
        img = rng.integers(0, 256, size=(60, 80, 3), dtype=np.uint8)
        cv2.imwrite(str(d / f"img{i}.jpg"), img)
    # one odd-sized image (native must resize)
    odd = rng.integers(0, 256, size=(30, 40, 3), dtype=np.uint8)
    cv2.imwrite(str(d / "odd.jpg"), odd)
    # one corrupt file
    (d / "bad.jpg").write_bytes(b"not a jpeg")
    return str(d)


def test_native_available():
    assert native.available()


def test_native_matches_cv2(jpeg_dir):
    paths = [os.path.join(jpeg_dir, f"img{i}.jpg") for i in range(8)]
    out = np.zeros((8, 60, 80, 3), np.uint8)
    ok = native.decode_batch(paths, out, num_threads=4)
    assert ok.all()
    for i, p in enumerate(paths):
        ref = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        # identical JPEG decode (both are libjpeg underneath)
        np.testing.assert_array_equal(out[i], ref)


def test_native_resize_close_to_cv2(jpeg_dir):
    p = os.path.join(jpeg_dir, "odd.jpg")
    out = np.zeros((1, 60, 80, 3), np.uint8)
    ok = native.decode_batch([p], out)
    assert ok.all()
    ref = decode_image(p, (60, 80))
    diff = np.abs(out[0].astype(int) - ref.astype(int))
    assert np.median(diff) <= 1
    assert diff.mean() < 2.0


def test_native_failure_status(jpeg_dir):
    paths = [os.path.join(jpeg_dir, "bad.jpg"), None,
             os.path.join(jpeg_dir, "img0.jpg")]
    out = np.ones((3, 60, 80, 3), np.uint8)
    ok = native.decode_batch(paths, out)
    assert list(ok) == [False, False, True]
    assert (out[0] == 0).all() and (out[1] == 0).all()


def test_image_source_uses_native(jpeg_dir):
    ids = np.array([f"img{i}" for i in range(8)] + ["odd", "bad", "missing"],
                   dtype=object)
    src = ImageSource(jpeg_dir, ids, native_size=(60, 80))
    batch = src.get_batch(np.arange(11))
    assert batch.shape == (11, 60, 80, 3)
    # real images decoded, corrupt/missing became black (fallback policy)
    assert batch[0].std() > 1
    assert (batch[9] == 0).all() and (batch[10] == 0).all()
