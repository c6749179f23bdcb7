"""Data-layer tests using the in-repo sample TUM frames of the reference
(code/data/data_examples/TUM — 5 frames, public TUM RGB-D data)."""

import os

import numpy as np
import pytest

from deep_prob_feature_track_tpu.data.association import (
    associate_three,
    read_file_list,
)
from deep_prob_feature_track_tpu.data.pipeline import BatchLoader, collate
from deep_prob_feature_track_tpu.data.simple import SimpleLoader

SAMPLES = "/root/reference/code/data/data_examples/TUM"


@pytest.fixture
def sample_loader():
    if not os.path.isdir(SAMPLES):
        pytest.skip("sample TUM frames not available")
    return SimpleLoader(
        os.path.join(SAMPLES, "color"),
        os.path.join(SAMPLES, "depth"),
        [525.0, 525.0, 319.5, 239.5],
        image_resize=0.25,
    )


def test_simple_loader_shapes(sample_loader):
    assert len(sample_loader) == 4
    item = sample_loader[0]
    assert item["color0"].shape == (3, 120, 160)
    assert item["depth0"].shape == (1, 120, 160)
    assert item["color0"].dtype == np.float32
    assert 0.0 <= item["color0"].min() and item["color0"].max() <= 1.0
    assert 0.5 <= item["depth0"].min() and item["depth0"].max() <= 5.0
    np.testing.assert_allclose(item["calib"], [131.25, 131.25, 79.875, 59.875])


def test_batch_loader(sample_loader):
    loader = BatchLoader(sample_loader, batch_size=3, shuffle=False)
    batches = list(loader)
    assert len(batches) == 2
    assert batches[0]["color0"].shape == (3, 3, 120, 160)
    # final batch wrap-padded to static shape with pad_mask marking real items
    assert batches[1]["color0"].shape == (3, 3, 120, 160)
    assert batches[1]["pad_mask"].tolist() == [True, False, False]


def test_batch_loader_drop_last(sample_loader):
    loader = BatchLoader(sample_loader, batch_size=3, drop_last=True)
    assert len(list(loader)) == 1


def test_batch_loader_sharded(sample_loader):
    l0 = BatchLoader(sample_loader, batch_size=2, shard_index=0, num_shards=2)
    l1 = BatchLoader(sample_loader, batch_size=2, shard_index=1, num_shards=2)
    b0 = list(l0)
    b1 = list(l1)
    assert len(b0) == 1 and len(b1) == 1
    assert not np.allclose(b0[0]["color0"], b1[0]["color0"])


def test_collate_metadata():
    items = [
        {"a": np.zeros(3), "name": {"seq": "x", "frame0": 0}},
        {"a": np.ones(3), "name": {"seq": "x", "frame0": 1}},
    ]
    batch = collate(items)
    assert batch["a"].shape == (2, 3)
    assert isinstance(batch["name"], list) and len(batch["name"]) == 2


def test_association_three_way():
    rgb = {1.00: ["rgb/1.png"], 2.00: ["rgb/2.png"], 3.00: ["rgb/3.png"]}
    depth = {1.01: ["depth/1.png"], 2.005: ["depth/2.png"], 3.01: ["depth/3.png"]}
    pose = {0.999: list("p1"), 2.001: list("p2"), 2.995: list("p3")}
    matches = associate_three(rgb, depth, pose)
    assert matches == [(1.00, 1.01, 0.999), (2.00, 2.005, 2.001), (3.00, 3.01, 2.995)]


def test_association_unmatched_dropped():
    rgb = {1.0: ["a"], 5.0: ["b"]}
    depth = {1.005: ["c"], 9.0: ["d"]}
    pose = {1.002: ["p"], 5.001: ["q"]}
    matches = associate_three(rgb, depth, pose)
    assert matches == [(1.0, 1.005, 1.002)]


def test_read_file_list(tmp_path):
    f = tmp_path / "rgb.txt"
    f.write_text("# comment\n1.5 rgb/a.png\n2.5 rgb/b.png extra\n")
    out = read_file_list(str(f))
    assert out == {1.5: ["rgb/a.png"], 2.5: ["rgb/b.png", "extra"]}


def test_tum_augmentation():
    from deep_prob_feature_track_tpu.data.transforms import ColorAugment

    rng = np.random.RandomState(0)
    aug = ColorAugment(seed=1)
    imgs = [rng.rand(8, 10, 3).astype(np.float32) for _ in range(2)]
    out = aug([im.copy() for im in imgs])
    assert out[0].shape == imgs[0].shape
    assert out[0].min() >= 0.0 and out[0].max() <= 1.0
    # same random draw must be applied to both views
    changed = not np.allclose(out[0], imgs[0])
    if changed:
        ratio0 = out[0] / np.clip(imgs[0], 1e-6, None)
        ratio1 = out[1] / np.clip(imgs[1], 1e-6, None)
        assert abs(np.median(ratio0) - np.median(ratio1)) < 0.2


def test_native_io_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    from deep_prob_feature_track_tpu.data import native_io

    if not native_io.available():
        pytest.skip("native IO not built")
    if not os.path.isdir(SAMPLES):
        pytest.skip("samples unavailable")
    p = os.path.join(SAMPLES, "color", sorted(os.listdir(os.path.join(SAMPLES, "color")))[0])
    d = os.path.join(SAMPLES, "depth", sorted(os.listdir(os.path.join(SAMPLES, "depth")))[0])

    img = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
    ref_rgb = cv2.resize(img, None, fx=0.25, fy=0.25)
    nat_rgb = np.transpose(native_io.read_rgb_chw(p, 0.25), (1, 2, 0))
    np.testing.assert_allclose(nat_rgb, ref_rgb, atol=1e-6)

    dep = cv2.imread(d, cv2.IMREAD_UNCHANGED).astype(np.float32) / 5000.0
    ref_dep = np.clip(
        cv2.resize(dep, None, fx=0.25, fy=0.25, interpolation=cv2.INTER_NEAREST), 0.5, 5.0
    )
    nat_dep = native_io.read_depth(d, 5000.0, 0.25, (0.5, 5.0))[0]
    np.testing.assert_allclose(nat_dep, ref_dep, atol=1e-6)
