"""Visualization toolchain: colored ply dumps + html gallery."""

import os

import numpy as np

from d3net_tpu.data.synthetic import make_scene
from d3net_tpu.utils.ply import read_ply
from scripts.visualize_scannet import (
    generate_html, inst_colors, sem_colors, write_scene_plys,
)


def test_sem_colors_match_scannet_map():
    # class 0 = wall = NYU40 id 1 -> (174, 199, 232); unannotated -> black
    got = sem_colors(np.array([0, -1, 4]))
    np.testing.assert_array_equal(got[0], [174, 199, 232])
    np.testing.assert_array_equal(got[1], [0, 0, 0])
    np.testing.assert_array_equal(got[2], [188, 189, 34])  # chair = id 5


def test_inst_colors_distinct_and_stable():
    ids = np.array([0, 0, 1, -1, 2])
    c1 = inst_colors(ids)
    c2 = inst_colors(ids)
    np.testing.assert_array_equal(c1, c2)
    assert (c1[0] == c1[1]).all()
    assert not (c1[0] == c1[2]).all()
    np.testing.assert_array_equal(c1[3], [0, 0, 0])


def test_write_scene_plys_and_html(tmp_path):
    scene = make_scene(seed=0, num_instances=3, points_per_instance=200,
                       floor_points=500)
    pred = {"sem_pred": scene.sem_labels, "inst_pred": scene.instance_ids}
    links = write_scene_plys(scene, str(tmp_path), pred)
    assert set(links) == {"rgb", "gt_sem", "gt_inst", "pred_sem", "pred_inst"}
    ply = read_ply(os.path.join(tmp_path, links["gt_sem"]))
    v = ply["vertex"]
    assert len(v) == len(scene.xyz)
    got = np.stack([v["red"], v["green"], v["blue"]], 1)
    np.testing.assert_array_equal(got, sem_colors(scene.sem_labels))

    index = os.path.join(tmp_path, "index.html")
    generate_html(index, [(scene.scene_id, "stats", links)])
    doc = open(index).read()
    assert scene.scene_id in doc and links["rgb"] in doc
