"""Native C++ decoder vs cv2 reference."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from sigman_release_tpu.data.native_loader import (
    decode_batch,
    decode_image,
    native_available,
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, ext in enumerate(["jpg", "png", "png"]):
        img = (rng.uniform(0, 255, (64, 48, 3))).astype(np.uint8)
        # smooth it so jpeg loss is small
        img = cv2.GaussianBlur(img, (7, 7), 3)
        p = str(d / f"im{i}.{ext}")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_native_lib_builds():
    assert native_available(), "native/libsigman_loader.so missing (make -C native)"


def test_decode_matches_cv2(images):
    if not native_available():
        pytest.skip("native lib not built")
    for p in images:
        out = decode_image(p, 32, 32)
        assert out.shape == (32, 32, 3)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() <= 1.0
        ref = cv2.imread(p, cv2.IMREAD_UNCHANGED)[..., ::-1]
        ref = cv2.resize(ref.astype(np.float32) / 255.0, (32, 32))
        # same image content modulo resize-kernel details
        assert np.abs(out - ref).mean() < 0.03


def test_decode_batch_parallel(images):
    if not native_available():
        pytest.skip("native lib not built")
    paths = images * 4
    out = decode_batch(paths, 16, 16, n_threads=4)
    assert out.shape == (len(paths), 16, 16, 3)
    # identical items decode identically across threads
    np.testing.assert_allclose(out[0], out[3])


def test_decode_batch_bad_path_zeros(images):
    if not native_available():
        pytest.skip("native lib not built")
    out = decode_batch([images[0], "/nonexistent/x.jpg"], 8, 8)
    assert out[0].max() > 0
    np.testing.assert_array_equal(out[1], 0.0)
