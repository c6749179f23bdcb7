"""App-level tests: kf_vo and convergence_basin on the TUM fixture."""

import os

import numpy as np
import pytest

from tests.test_eval_train_cli import tum_fixture  # noqa: F401 (fixture reuse)


def test_matrix_to_quat_roundtrip(rng):
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from deep_prob_feature_track_tpu.geometry.lie import matrix_to_quat

    R = Rotation.random(16, random_state=rng).as_matrix()
    q = np.asarray(matrix_to_quat(jnp.asarray(R)))
    q_ref = Rotation.from_matrix(R).as_quat()  # [x,y,z,w]
    # quaternions are sign-ambiguous
    dot = np.abs(np.sum(q * q_ref, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-6)


def test_ate_rmse_identity():
    from deep_prob_feature_track_tpu.apps.kf_vo import ate_rmse

    traj = np.random.RandomState(0).randn(20, 3)
    assert ate_rmse(traj, traj) < 1e-9
    # rigidly transformed trajectory aligns to zero error
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("xyz", [0.2, -0.1, 0.3]).as_matrix()
    moved = (R @ traj.T).T + np.array([1.0, -2.0, 0.5])
    assert ate_rmse(moved, traj) < 1e-9


def test_kf_vo_cli(tum_fixture, tmp_path):
    from deep_prob_feature_track_tpu.apps.kf_vo import main

    out = str(tmp_path / "traj.txt")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--vo", "RGB",
            "--vo_type", "keyframe",
            "--output", out,
        ]
    )
    assert rc == 0
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 5  # 5 frames
    assert len(lines[0].split()) == 8  # TUM format


def test_kf_vo_incremental(tum_fixture, tmp_path):
    from deep_prob_feature_track_tpu.apps.kf_vo import main

    out = str(tmp_path / "traj_inc.txt")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--vo", "RGB",
            "--vo_type", "incremental",
            "--output", out,
        ]
    )
    assert rc == 0
    vals = np.loadtxt(out)
    assert vals.shape == (5, 8)
    assert np.all(np.isfinite(vals))


def test_kf_vo_gt_tracker(tum_fixture, tmp_path, capsys):
    """--gt_tracker (ref kf_vo.py:365) chains the dataset's GT relative
    poses; the trajectory must reproduce GT exactly (ATE ~ 0)."""
    from deep_prob_feature_track_tpu.apps.kf_vo import main

    out = str(tmp_path / "traj_gt.txt")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--vo", "RGB",
            "--vo_type", "keyframe",
            "--gt_tracker",
            "--output", out,
        ]
    )
    assert rc == 0
    printed = capsys.readouterr().out
    ate_cm = float(printed.split("ATE-RMSE vs GT:")[1].split("cm")[0])
    assert ate_cm < 1e-4, printed


def test_convergence_basin_cli(tum_fixture, tmp_path):
    import pickle

    from deep_prob_feature_track_tpu.apps.convergence_basin import main

    out = str(tmp_path / "cb.pkl")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--preset", "RGB",
            "--cb_dimension", "1D",
            "--pert_samples", "5",
            "--output", out,
        ]
    )
    assert rc == 0
    with open(out, "rb") as f:
        data = pickle.load(f)
    assert data["costs"].shape == (4, 6, 5)  # levels x axes x samples
    assert np.all(np.isfinite(data["costs"]))
    # cost at the GT pose (center sample) should not exceed the worst
    # perturbation on the translation-x axis at the finest level
    center = data["costs"][0, 3, 2]
    assert center <= data["costs"][0, 3].max() + 1e-9


def test_ba_refine_cli(tum_fixture, tmp_path):
    from deep_prob_feature_track_tpu.apps.ba_refine import main

    out = str(tmp_path / "ba_traj.txt")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--preset", "feature",
            "--window", "2",
            "--iterations", "5",
            "--batch_size", "4",
            "--output", out,
        ]
    )
    assert rc == 0
    vals = np.loadtxt(out)
    assert vals.shape == (5, 8)
    assert np.all(np.isfinite(vals))


def test_ba_refine_cli_sharded(tum_fixture, tmp_path):
    from deep_prob_feature_track_tpu.apps.ba_refine import main

    out = str(tmp_path / "ba_traj_sharded.txt")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--preset", "feature",
            "--window", "2",
            "--iterations", "3",
            "--batch_size", "4",
            "--sharded",
            "--output", out,
        ]
    )
    assert rc == 0
    assert np.all(np.isfinite(np.loadtxt(out)))


def test_kf_vo_keyframe_switching(tum_fixture, tmp_path):
    """A tight switch threshold must promote keyframes and stay finite."""
    import jax
    import jax.numpy as jnp

    from deep_prob_feature_track_tpu.apps.kf_vo import run_vo
    from deep_prob_feature_track_tpu.data.tum import TUM
    from deep_prob_feature_track_tpu.models.presets import get_preset
    from deep_prob_feature_track_tpu.models.tracker import LeastSquareTracking

    ds = TUM(root="", category="test", keyframes=[1], select_traj=tum_fixture)
    net = LeastSquareTracking(cfg=get_preset("RGB"))
    item = ds[0]
    ex = tuple(
        jnp.asarray(item[k][None])
        for k in ("color0", "color1", "depth0", "depth1", "calib")
    )
    variables = net.init(jax.random.PRNGKey(0), *ex, train=False)

    @jax.jit
    def fwd(c0, c1, d0, d1, K):
        return net.apply(variables, c0, c1, d0, d1, K, train=False)

    poses, gt = run_vo(ds, fwd, vo_type="keyframe", kf_switch_dist=1e-9)
    assert poses.shape == (5, 4, 4)
    assert np.all(np.isfinite(poses))
    assert gt is not None and gt.shape == (5, 4, 4)


def test_ba_refine_dense_cli(tum_fixture, tmp_path):
    from deep_prob_feature_track_tpu.apps.ba_refine import main

    out = str(tmp_path / "ba_dense.txt")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--preset", "feature",
            "--window", "2",
            "--iterations", "3",
            "--batch_size", "4",
            "--dense",
            "--dense_iterations", "2",
            "--output", out,
        ]
    )
    assert rc == 0
    vals = np.loadtxt(out)
    assert vals.shape == (5, 8)
    assert np.all(np.isfinite(vals))


def test_convergence_basin_plots(tum_fixture, tmp_path):
    from deep_prob_feature_track_tpu.apps.convergence_basin import main

    out = str(tmp_path / "cb2.pkl")
    rc = main(
        [
            "--dataset", "TUM_RGBD",
            "--data_root", "",
            "--trajectory", tum_fixture,
            "--preset", "RGB",
            "--cb_dimension", "2D",
            "--pert_samples", "5",
            "--output", out,
            "--save_img",
        ]
    )
    assert rc == 0
    assert (tmp_path / "cb2_2d.png").exists()


def test_traj_eval_cli(tmp_path, capsys):
    """ATE/RPE tool: identical trajectories -> 0 error; a rigid-body
    offset of the whole trajectory is removed by alignment (ATE 0) while
    a per-frame corruption shows up in both metrics."""
    import json

    from deep_prob_feature_track_tpu.apps.kf_vo import write_tum_trajectory
    from deep_prob_feature_track_tpu.apps.traj_eval import main

    rng = np.random.RandomState(0)
    n = 12
    poses = [np.eye(4)]
    for _ in range(n - 1):
        d = np.eye(4)
        ang = 0.03 * rng.randn()
        d[:3, :3] = np.asarray(
            [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]]
        )
        d[:3, 3] = 0.05 * rng.randn(3)
        poses.append(poses[-1] @ d)
    poses = np.stack(poses)

    gt_file = str(tmp_path / "gt.txt")
    est_file = str(tmp_path / "est.txt")
    write_tum_trajectory(gt_file, poses)

    # rigid offset: ATE must vanish under alignment, frame-gap RPE too
    offset = np.eye(4)
    offset[:3, 3] = [1.0, -2.0, 0.5]
    write_tum_trajectory(est_file, np.einsum("ij,njk->nik", offset, poses))
    assert main(["--est", est_file, "--gt", gt_file]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["pairs"] == n
    assert out["ate_rmse_m"] < 1e-5
    assert out["rpe_trans_rmse_m"] < 1e-5

    # corrupted trajectory: both metrics move
    noisy = poses.copy()
    noisy[:, :3, 3] += 0.02 * rng.randn(n, 3)
    write_tum_trajectory(est_file, noisy)
    main(["--est", est_file, "--gt", gt_file])
    out = json.loads(capsys.readouterr().out)
    assert out["ate_rmse_m"] > 5e-3
    assert out["rpe_trans_rmse_m"] > 5e-3
