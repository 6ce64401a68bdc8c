"""Devkit-free radar .pcd parser vs a synthesized nuScenes-format file."""

import numpy as np

from radardistill_tpu.data.nuscenes import pcd

FIELDS = ("x y z dyn_prop id rcs vx vy vx_comp vy_comp is_quality_valid "
          "ambig_state x_rms y_rms invalid_state pdh0 vx_rms vy_rms").split()
SIZES = [4, 4, 4, 1, 2, 4, 4, 4, 4, 4, 1, 1, 1, 1, 1, 1, 1, 1]
TYPES = ["F", "F", "F", "I", "I", "F", "F", "F", "F", "F", "I", "I", "I", "I", "I", "I", "I", "I"]
_NP = {("F", 4): "<f4", ("I", 1): "<i1", ("I", 2): "<i2"}


def write_pcd(path, n=17, seed=0):
    rng = np.random.RandomState(seed)
    dtype = np.dtype([(f, _NP[(t, s)]) for f, t, s in zip(FIELDS, TYPES, SIZES)])
    rows = np.zeros(n, dtype)
    for f, t, s in zip(FIELDS, TYPES, SIZES):
        if t == "F":
            rows[f] = rng.randn(n).astype(np.float32)
        else:
            rows[f] = rng.randint(0, 5, n)
    header = "\n".join([
        "# .PCD v0.7 - Point Cloud Data file format",
        "VERSION 0.7",
        "FIELDS " + " ".join(FIELDS),
        "SIZE " + " ".join(map(str, SIZES)),
        "TYPE " + " ".join(TYPES),
        "COUNT " + " ".join(["1"] * len(FIELDS)),
        f"WIDTH {n}",
        "HEIGHT 1",
        "VIEWPOINT 0 0 0 1 0 0 0",
        f"POINTS {n}",
        "DATA binary",
    ]) + "\n"
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(rows.tobytes())
    return rows


def test_parse_roundtrip(tmp_path):
    p = tmp_path / "radar.pcd"
    rows = write_pcd(p)
    pts = pcd.load_radar_points(p)
    assert pts.shape == (17, 6)
    np.testing.assert_allclose(pts[:, 0], rows["x"], rtol=1e-6)
    np.testing.assert_allclose(pts[:, 3], rows["rcs"], rtol=1e-6)
    np.testing.assert_allclose(pts[:, 4], rows["vx_comp"], rtol=1e-6)
    np.testing.assert_allclose(pts[:, 5], rows["vy_comp"], rtol=1e-6)


def test_quaternion_helpers():
    yaw = 0.7
    q = pcd.yaw_to_quaternion(yaw)
    assert abs(pcd.quaternion_yaw(q) - yaw) < 1e-6
    R = pcd.quaternion_rotation_matrix(q)
    want = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                     [np.sin(yaw), np.cos(yaw), 0],
                     [0, 0, 1]])
    np.testing.assert_allclose(R, want, atol=1e-7)
    qi = pcd.quaternion_inverse(q)
    qq = pcd.quaternion_multiply(q, qi)
    np.testing.assert_allclose(qq, [1, 0, 0, 0], atol=1e-7)
