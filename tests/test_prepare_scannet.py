import json
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from d3net_tpu.utils.ply import read_ply, write_ply_points


def _write_binary_mesh_ply(path, xyz, rgb, faces):
    n, f = len(xyz), len(faces)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        f"element face {f}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    with open(path, "wb") as fh:
        fh.write(header.encode())
        for i in range(n):
            fh.write(struct.pack("<fff", *xyz[i]))
            fh.write(struct.pack("<BBB", *rgb[i]))
        for tri in faces:
            fh.write(struct.pack("<B", 3))
            fh.write(struct.pack("<iii", *tri))


def _write_label_ply(path, labels):
    n = len(labels)
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\nproperty ushort label\nend_header\n"
    )
    with open(path, "wb") as fh:
        fh.write(header.encode())
        fh.write(np.asarray(labels, "<u2").tobytes())


def test_ply_roundtrip_ascii(tmp_path):
    xyz = np.array([[0, 0, 0], [1, 2, 3]], np.float32)
    rgb = np.array([[255, 0, 0], [0, 255, 0]])
    p = str(tmp_path / "pts.ply")
    write_ply_points(p, xyz, rgb)
    data = read_ply(p)
    v = data["vertex"]
    np.testing.assert_allclose(np.stack([v["x"], v["y"], v["z"]], 1), xyz)


def test_ply_binary_with_faces(tmp_path):
    xyz = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    rgb = np.array([[10, 20, 30]] * 4, np.uint8)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    p = str(tmp_path / "mesh.ply")
    _write_binary_mesh_ply(p, xyz, rgb, faces)
    data = read_ply(p)
    v = data["vertex"]
    np.testing.assert_allclose(np.stack([v["x"], v["y"], v["z"]], 1), xyz)
    np.testing.assert_array_equal(data["face"], faces)


def test_process_scan_end_to_end(tmp_path):
    from prepare_scannet import process_scan

    scan = "scene9999_00"
    scan_dir = tmp_path / "scans" / scan
    scan_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    n = 60
    xyz = rng.uniform(0, 3, (n, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (n, 3)).astype(np.uint8)
    faces = np.stack([np.arange(0, n - 2), np.arange(1, n - 1), np.arange(2, n)], 1)
    _write_binary_mesh_ply(str(scan_dir / f"{scan}_vh_clean_2.ply"), xyz, rgb, faces)

    # labels: first 30 verts chair (nyu 5 -> cls 4), rest wall (nyu 1 -> 0)
    labels = np.concatenate([np.full(30, 5), np.full(30, 1)])
    _write_label_ply(str(scan_dir / f"{scan}_vh_clean_2.labels.ply"), labels)

    segs = {"segIndices": [0] * 30 + [1] * 30}
    json.dump(segs, open(scan_dir / f"{scan}_vh_clean_2.0.010000.segs.json", "w"))
    agg = {
        "segGroups": [
            {"objectId": 0, "label": "chair", "segments": [0]},
            {"objectId": 1, "label": "wall", "segments": [1]},
        ]
    }
    json.dump(agg, open(scan_dir / f"{scan}.aggregation.json", "w"))
    with open(scan_dir / f"{scan}.txt", "w") as fh:
        mat = np.eye(4).reshape(-1)
        fh.write("axisAlignment = " + " ".join(str(x) for x in mat) + "\n")

    out = tmp_path / "out"
    process_scan(str(tmp_path / "scans"), scan, str(out))
    d = np.load(out / f"{scan}.npz")
    assert d["xyz"].shape == (n, 3)
    assert d["normal"].shape == (n, 3)
    # chair points got remapped to class 4, wall to 0
    assert (d["sem_labels"][:30] == 4).all()
    assert (d["sem_labels"][30:] == 0).all()
    # wall group skipped in aggregation -> instance only for chair
    assert (d["instance_ids"][:30] == 0).all()
    assert d["instance_bboxes"].shape == (1, 8)
    assert d["instance_bboxes"][0, 6] == 4  # remapped class
    # box covers the chair points
    np.testing.assert_allclose(
        d["instance_bboxes"][0, :3],
        (xyz[:30].min(0) + xyz[:30].max(0)) / 2,
        atol=1e-5,
    )
    # loading through NpzScenes works
    from d3net_tpu.data.dataset import NpzScenes

    scenes = NpzScenes([str(out / f"{scan}.npz")])
    s = scenes[0]
    assert s.xyz.shape == (n, 3)
    assert s.instance_bboxes.shape == (1, 8)


def test_write_instance_gt(tmp_path):
    from prepare_scannet import write_instance_gt

    np.savez(
        tmp_path / "scene0001_00.npz",
        sem_labels=np.array([4, 4, 1, -1]),   # chair, chair, floor, unann
        instance_ids=np.array([0, 0, -1, -1]),
        xyz=np.zeros((4, 3)), rgb=np.zeros((4, 3)), normal=np.zeros((4, 3)),
        instance_bboxes=np.zeros((0, 8)),
    )
    write_instance_gt(str(tmp_path / "scene0001_00.npz"), str(tmp_path / "gt"))
    gt = np.loadtxt(tmp_path / "gt" / "scene0001_00.txt").astype(int)
    # chair = nyu 5 -> 5*1000 + inst 0 + 1 = 5001; floor nyu 2 no inst = 2000
    np.testing.assert_array_equal(gt, [5001, 5001, 2000, 0])
