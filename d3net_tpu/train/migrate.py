"""Checkpoint param-path migration.

Round 3 gave the U-Net residual/VGG blocks explicit flax names
(``blk{r}`` head reps, ``tail{i}`` post-skip reps — ``models/blocks.py``)
so parameter paths are identical whether or not the block class is
remat-wrapped (remat renames an auto-named class to
``CheckpointResidualBlock_N``, and the gather and block conv modes differ
in remat use, so auto names made their checkpoints non-interchangeable).

Round-1/2 artifacts (``outputs/*/ckpt*``, ``pretrained/*.pkl``) carry the
old auto names.  :func:`migrate_legacy_block_names` rewrites those trees
in place of load; new checkpoints pass through untouched.

Mapping per module scope: auto-numbered ``(Checkpoint)?ResidualBlock_i`` /
``(Checkpoint)?VGGBlock_i`` children split into head/tail by position —
scopes that also contain a nested ``UBlock_0`` (i.e. non-deepest U-Net
levels) have ``2*block_reps`` blocks, first half ``blk{i}``, second half
``tail{i}``; deepest scopes have only head reps.
"""

from __future__ import annotations

import re
from typing import Any, Dict

_BLOCK_RE = re.compile(r"^(?:Checkpoint)?(?:ResidualBlock|VGGBlock)_(\d+)$")


def migrate_legacy_block_names(tree: Any) -> Any:
    """Rename legacy auto-numbered U-Net block params to blk/tail names.

    Pure function over nested dicts; non-dict leaves pass through.  Safe to
    apply to already-migrated trees (no legacy keys -> identity).
    """
    if not isinstance(tree, dict):
        return tree
    legacy = {}
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        m = _BLOCK_RE.match(k) if isinstance(k, str) else None
        if m:
            legacy[int(m.group(1))] = migrate_legacy_block_names(v)
        else:
            out[k] = migrate_legacy_block_names(v)
    if legacy:
        ids = sorted(legacy)
        has_child = any(isinstance(k, str) and k.startswith("UBlock_")
                        for k in tree)
        half = len(ids) // 2 if has_child else len(ids)
        for pos, i in enumerate(ids):
            name = f"blk{pos}" if pos < half else f"tail{pos - half}"
            out[name] = legacy[i]
    return out
