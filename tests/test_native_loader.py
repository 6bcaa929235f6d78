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


@pytest.fixture()
def item_dir(tmp_path):
    """A minimal on-disk HGS item (rgb_map/, mask_map/, UV/, smplx.npz,
    camera json) for driving HGSDataset's real decode path."""
    import json

    rng = np.random.default_rng(0)
    cams = {}
    for v in range(90):
        img = cv2.GaussianBlur(
            rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8), (7, 7), 3)
        (tmp_path / "rgb_map").mkdir(exist_ok=True)
        (tmp_path / "mask_map").mkdir(exist_ok=True)
        cv2.imwrite(str(tmp_path / "rgb_map" / f"{v:04d}.jpg"), img)
        cv2.imwrite(str(tmp_path / "mask_map" / f"{v:04d}.png"),
                    (img[..., :1] > 100).astype(np.uint8) * 255)
        cams[f"{v:04d}"] = {"R": np.eye(3).tolist(), "T": [0.0, 0.0, 1.5]}
    (tmp_path / "UV").mkdir()
    cv2.imwrite(str(tmp_path / "UV" / "smplxuv_albedo.png"),
                rng.uniform(0, 255, (128, 128, 3)).astype(np.uint8))
    np.savez(tmp_path / "smplx.npz",
             transl=np.zeros(3), global_orient=np.zeros(3),
             betas=np.zeros(10), body_pose=np.zeros(63),
             expression=np.zeros(10), left_hand_pose=np.zeros(45),
             right_hand_pose=np.zeros(45), jaw_pose=np.zeros(3),
             leye_pose=np.zeros(3), reye_pose=np.zeros(3))
    with open(tmp_path / "camera_full_calibration.json", "w") as f:
        json.dump(cams, f)
    return str(tmp_path)


def test_hgs_dataset_native_decode_path(item_dir):
    """HGSDataset must produce a full item through the (native-or-fallback)
    batched decoder with correct shapes and nonzero image content."""
    from sigman_release_tpu.config import PRESETS
    from sigman_release_tpu.data import DataLoader, HGSDataset

    cfg = PRESETS["test_tiny"].replace(num_views=3, num_input_views=2)
    ds = HGSDataset(cfg, items=[item_dir], training=True)
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=4,
                        drop_last=False)
    batch = next(iter(loader))
    H = cfg.input_size
    assert batch["input"].shape == (1, 2, 9, H, H)
    assert batch["images_output"].shape == (1, 3, 3, cfg.output_size,
                                            cfg.output_size)
    assert batch["masks_output"].shape[2] == 1
    assert batch["smpl_params"].shape == (1, 188)
    assert np.abs(batch["images_output"]).max() > 0.05
    assert 0.0 < batch["masks_output"].mean() < 1.0
