"""Offline prep: PLY reader roundtrip, semantic remap, S3DIS superpoints."""
import numpy as np

from tpu3dwsis.prep.ply import read_ply
from tpu3dwsis.prep.s3dis_prep import compute_superpoints
from tpu3dwsis.prep.scannet_prep import remap_semantic


def test_read_ply_ascii_and_binary(tmp_path):
    verts = np.array([(0.0, 0.0, 0.0), (1.0, 0.0, 0.0), (0.0, 1.0, 0.0)])
    # ascii
    p = tmp_path / "a.ply"
    p.write_text(
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "element face 1\nproperty list uchar int vertex_indices\nend_header\n"
        "0 0 0\n1 0 0\n0 1 0\n3 0 1 2\n"
    )
    d = read_ply(str(p))
    np.testing.assert_allclose(d["vertex"]["x"], verts[:, 0])
    np.testing.assert_array_equal(d["face"][0], [0, 1, 2])

    # binary
    pb = tmp_path / "b.ply"
    header = (
        b"ply\nformat binary_little_endian 1.0\nelement vertex 2\n"
        b"property float x\nproperty float y\nproperty float z\n"
        b"property ushort label\nend_header\n"
    )
    import struct

    body = struct.pack("<fffH", 1.5, 2.5, 3.5, 7) + struct.pack("<fffH", 0, 0, 1, 9)
    pb.write_bytes(header + body)
    d = read_ply(str(pb))
    assert d["vertex"]["label"].tolist() == [7, 9]
    np.testing.assert_allclose(d["vertex"]["x"], [1.5, 0.0])


def test_remap_semantic():
    lab = np.array([0, 1, 2, 39, 40, 13])
    got = remap_semantic(lab)
    assert got[0] == -100  # unannotated
    assert got[1] == 0  # wall
    assert got[2] == 1  # floor
    assert got[3] == 19  # otherfurniture
    assert got[4] == -100  # unmapped id
    assert got[5] == -100  # 13 not in benchmark set


def test_s3dis_superpoints_separate_geometry():
    rng = np.random.default_rng(0)
    floor = np.column_stack(
        [rng.uniform(0, 3, 3000), rng.uniform(0, 3, 3000), rng.normal(0, 0.01, 3000)]
    )
    wall = np.column_stack(
        [rng.uniform(0, 3, 3000), rng.normal(0, 0.01, 3000), rng.uniform(0, 2, 3000)]
    )
    xyz = np.concatenate([floor, wall]).astype(np.float32)
    rgb = np.full((len(xyz), 3), 128.0, np.float32)
    sp = compute_superpoints(xyz, rgb, voxel=0.1, knn_adj=8, knn_geof=20, reg=0.1)
    assert sp.max() >= 1  # partitioned into multiple superpoints
    # floor and wall should not share dominant superpoints
    floor_major = np.bincount(sp[:3000]).argmax()
    wall_major = np.bincount(sp[3000:]).argmax()
    assert floor_major != wall_major
