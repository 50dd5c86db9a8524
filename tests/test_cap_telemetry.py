"""Silent-truncation telemetry (SURVEY §7 hard-part #3, VERDICT r4 #8).

A deliberately-overflowing scene must increment CAP_STATS (and therefore
reach metrics.jsonl via the train loop's per-interval snapshot) instead of
silently dropping voxels/phantoms.
"""

import numpy as np

from d3net_tpu.data.collate import BatchSpec, build_batch, CAP_STATS
from d3net_tpu.data.synthetic import make_scene


def test_overflowing_scene_is_counted_not_silent():
    scene = make_scene(seed=0, num_instances=4, density=3000.0,
                       size_range=(0.3, 0.6), floor_points=2000, room=4.0)
    # caps far below the scene's real voxel/column counts
    spec = BatchSpec(max_points=4096, voxel_caps=[512, 256],
                     max_instances=8, use_multiview=False, use_normal=True,
                     column_caps=[64, 64], conv_impl="colres")
    CAP_STATS.reset()
    build_batch([scene], spec)
    snap = CAP_STATS.snapshot()
    assert snap["cap_points_truncated"] > 0      # scene > max_points
    assert snap["cap_voxel_overflow"] > 0        # voxels past caps[0]
    assert snap["cap_level_overflow"] > 0        # columns past col cap
    assert snap["batches"] == 1
    # snapshot-and-reset contract used by the train loop's logger
    taken = CAP_STATS.reset()
    assert taken["cap_voxel_overflow"] == snap["cap_voxel_overflow"]
    assert CAP_STATS.snapshot()["cap_voxel_overflow"] == 0


def test_clean_scene_counts_zero():
    scene = make_scene(seed=1, num_instances=2, density=2000.0,
                       size_range=(0.25, 0.4), floor_points=500, room=3.0)
    spec = BatchSpec(max_points=16384, voxel_caps=[16384, 8192],
                     max_instances=8, use_multiview=False, use_normal=True,
                     conv_impl="colres")
    CAP_STATS.reset()
    build_batch([scene], spec)
    snap = CAP_STATS.snapshot()
    assert snap["cap_points_truncated"] == 0
    assert snap["cap_voxel_overflow"] == 0
    assert snap["cap_level_overflow"] == 0
    assert snap["cap_dropped_phantoms"] == 0
