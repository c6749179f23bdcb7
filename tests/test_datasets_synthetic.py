"""MovingObjects3D / ScanNet / VaryLighting loaders on synthetic fixtures."""

import os
import pickle

import numpy as np
import pytest
from PIL import Image


def _write_png_rgb(path, H=32, W=40, seed=0):
    rng = np.random.RandomState(seed)
    Image.fromarray(rng.randint(0, 255, (H, W, 3), dtype=np.uint8)).save(path)


def _write_png_depth16(path, H=32, W=40, value=5000):
    arr = np.full((H, W), value, np.uint16)
    Image.fromarray(arr.astype(np.int32), mode="I").convert("I;16").save(path)


def _write_png_mask(path, H=32, W=40):
    arr = np.zeros((H, W), np.uint8)
    arr[8:24, 10:30] = 1
    Image.fromarray(arr).save(path)


@pytest.fixture(scope="module")
def mo3d_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("mo3d")
    n = 6
    for obj in ("boat", "motorbike"):
        for seq in range(200):
            # only seq 0 gets real files; the rest would fail on open, so we
            # only create info.pkl for seq 0 and monkeypatch categories below
            pass
    obj = "boat"
    seq_dir = root / obj / "000000"
    seq_dir.mkdir(parents=True)
    colors, depths, masks = [], [], []
    cam_poses, obj_poses = [], []
    for i in range(n):
        c = f"{obj}/000000/color_{i:04d}.png"
        d = f"{obj}/000000/depth_{i:04d}.png"
        m = f"{obj}/000000/mask_{i:04d}.png"
        _write_png_rgb(str(root / c), seed=i)
        _write_png_depth16(str(root / d), value=2000 + 10 * i)
        _write_png_mask(str(root / m))
        colors.append("final/" + c)
        depths.append("final/" + d)
        masks.append("final/" + m)
        T = np.eye(4)
        T[2, 3] = 0.01 * i
        cam_poses.append(T)
        O = np.eye(4)
        O[0, 3] = 0.05 * i
        obj_poses.append(O)
    info = {
        "color": colors,
        "depth": depths,
        "invalid": colors,
        "object_mask": masks,
        "pose": cam_poses,
        "object_poses": {"Model_1": obj_poses},
        "object_visible_frames": {"Model_1": list(range(n))},
        "calib": [40.0, 40.0, 19.5, 15.5],
    }
    with open(seq_dir / "info.pkl", "wb") as f:
        pickle.dump(info, f)
    return str(root)


def test_moving_objects_loader(mo3d_fixture, monkeypatch):
    from deep_prob_feature_track_tpu.data import moving_objects as mo

    monkeypatch.setitem(mo.CATEGORIES, "test", {"boat": (0, 1)})
    ds = mo.MovingObjects3D(mo3d_fixture, category="test", keyframes=[1], image_resize=0.5)
    assert len(ds) == 5
    item = ds[0]
    assert item["color0"].shape == (3, 16, 20)
    assert item["obj_mask0"].shape == (1, 16, 20)
    assert item["obj_mask0"].dtype == np.bool_
    assert item["obj_mask0"].any()
    # object-centric transform: inv(cam1) @ obj1 @ inv(obj0) @ cam0
    T = item["transform"]
    assert abs(T[0, 3] - 0.05) < 1e-6  # object moved +x between frames
    np.testing.assert_allclose(item["calib"], [20.0, 20.0, 9.75, 7.75])


@pytest.fixture(scope="module")
def scannet_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("scannet")
    for split in ("train", "val"):
        seq = root / split / "scene0000_00"
        seq.mkdir(parents=True)
        n = 6
        lines = ["junk"] * 3 + [f"frames = {n}"]
        (seq / "_info.txt").write_text("\n".join(lines) + "\n")
        for i in range(n):
            frame = seq / f"frame-{i:06d}"
            _write_png_rgb(str(frame) + ".color.jpg".replace(".jpg", ".png"), seed=i)
            # loader expects .color.jpg; write real jpg
            Image.fromarray(
                np.random.RandomState(i).randint(0, 255, (32, 40, 3), dtype=np.uint8)
            ).save(str(frame) + ".color.jpg")
            _write_png_depth16(str(frame) + ".merged_depth.png", value=4000)
            pose = np.eye(4)
            if i == 3 and split == "val":
                pose = np.full((4, 4), np.inf)  # tracking failure frame
            else:
                pose[2, 3] = 0.02 * i
            np.savetxt(str(frame) + ".pose.txt", pose)
    return str(root)


def test_scannet_loader(scannet_fixture):
    from deep_prob_feature_track_tpu.data.scannet import ScanNet

    ds = ScanNet(scannet_fixture, category="test", keyframes=[1], image_resize=0.5)
    # 6 frames minus the inf-pose one -> 5 views -> 4 pairs
    assert len(ds) == 4
    item = ds[0]
    assert item["color0"].shape == (3, 16, 20)
    assert np.isfinite(item["transform"]).all()

    ds_train = ScanNet(scannet_fixture, category="train", keyframes=[1, 2])
    assert len(ds_train) >= 1
    item = ds_train[0]
    assert item["depth0"].min() >= 0.5


@pytest.fixture(scope="module")
def vl_fixture(tmp_path_factory):
    root = tmp_path_factory.mktemp("vl")
    seq = root / "vl_test_seq"
    (seq / "rgb").mkdir(parents=True)
    (seq / "depth").mkdir()
    for i in range(4):
        _write_png_rgb(str(seq / "rgb" / f"{i:04d}.png"), seed=i)
        _write_png_depth16(str(seq / "depth" / f"{i:04d}.png"), value=1500)
    return str(root)


def test_vary_lighting_loader(vl_fixture):
    from deep_prob_feature_track_tpu.data.vary_lighting import VaryLighting

    ds = VaryLighting(vl_fixture, category="test", keyframes=[1], image_resize=0.5)
    assert len(ds) == 3
    item = ds[0]
    assert item["color0"].shape == (3, 16, 20)
    assert "transform" not in item  # no GT pose
    kp = ds.get_keypair(2)
    assert kp["name"]["frame0"] == 0 and kp["name"]["frame1"] == 2
