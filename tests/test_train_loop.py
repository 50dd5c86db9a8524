

def test_migrate_legacy_block_names():
    from d3net_tpu.train.migrate import migrate_legacy_block_names as mig

    legacy = {
        "unet": {
            "CheckpointResidualBlock_0": {"k": 0},
            "CheckpointResidualBlock_1": {"k": 1},
            "CheckpointResidualBlock_2": {"k": 2},
            "CheckpointResidualBlock_3": {"k": 3},
            "UBlock_0": {
                "ResidualBlock_0": {"k": 4},
                "ResidualBlock_1": {"k": 5},
            },
            "SubmConv_0": {"kernel": 9},
        }
    }
    got = mig(legacy)
    u = got["unet"]
    assert u["blk0"] == {"k": 0} and u["blk1"] == {"k": 1}
    assert u["tail0"] == {"k": 2} and u["tail1"] == {"k": 3}
    # deepest level (no nested UBlock): all head reps
    assert u["UBlock_0"]["blk0"] == {"k": 4}
    assert u["UBlock_0"]["blk1"] == {"k": 5}
    assert u["SubmConv_0"] == {"kernel": 9}
    # idempotent on migrated trees
    assert mig(got) == got
