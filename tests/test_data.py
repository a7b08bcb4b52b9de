"""KITTI IO + synthetic sequence generation tests."""

import numpy as np

from vo_tpu.data.kitti import read_calib, read_poses
from vo_tpu.data.synthetic import SyntheticSequence, render_frame


def test_read_poses_shape(tmp_path):
    rows = np.hstack([np.eye(3), np.arange(3).reshape(3, 1)]).reshape(-1)
    f = tmp_path / "00.txt"
    np.savetxt(f, np.tile(rows, (5, 1)))
    poses = read_poses(str(f), max_frames=3)
    assert poses.shape == (3, 4, 4)
    assert np.allclose(poses[0, :3, :3], np.eye(3))
    assert np.allclose(poses[0, :3, 3], [0, 1, 2])
    assert np.allclose(poses[:, 3], [0, 0, 0, 1])


def test_read_calib(tmp_path):
    P = np.array([[718.856, 0, 607.19, 0], [0, 718.856, 185.2, 0], [0, 0, 1, 0]])
    f = tmp_path / "calib.txt"
    with open(f, "w") as fh:
        fh.write("P0: " + " ".join(str(v) for v in P.reshape(-1)) + "\n")
        fh.write("P1: " + " ".join("0" for _ in range(12)) + "\n")
    P_out, K = read_calib(str(f))
    assert np.allclose(P_out, P)
    assert np.allclose(K, P[:, :3])
    assert K[0, 0] == 718.856


def test_synthetic_sequence():
    seq = SyntheticSequence.generate(n_frames=5, shape=(120, 160), n_points=300)
    assert len(seq) == 5
    img = seq.frame(0)
    assert img.shape == (120, 160)
    assert img.dtype == np.float32
    assert img.min() >= 0.0 and img.max() <= 255.0
    # Blobs must produce real contrast for the detector.
    assert img.std() > 5.0
    # Ground-truth path moves forward.
    path = seq.gt_path_xz()
    assert path.shape == (5, 2)
    assert np.linalg.norm(path[-1] - path[0]) > 1.0


def test_render_is_deterministic():
    seq = SyntheticSequence.generate(n_frames=2, shape=(80, 100), n_points=100)
    a = render_frame(seq.points_w, seq.contrast, seq.poses[0], seq.K, seq.shape)
    b = render_frame(seq.points_w, seq.contrast, seq.poses[0], seq.K, seq.shape)
    assert np.array_equal(a, b)


def test_long_sequence_keeps_landmarks_visible():
    """Corridor scattering: every frame of a long sequence must render
    enough structure to track (a fixed landmark box starves after the
    camera drives past it)."""
    from vo_tpu.data.synthetic import SyntheticSequence

    seq = SyntheticSequence.generate(n_frames=200, shape=(120, 160), seed=3)
    for i in (0, 60, 120, 199):
        img = seq.frame(i)
        # structured frames deviate from the flat background
        assert float(np.abs(img - 128.0).mean()) > 1.0, i
