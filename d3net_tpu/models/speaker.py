"""SpeakerNet: relational graph + caption decoder (parity: ``model/speaker.py``)."""

from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn

from d3net_tpu.models.caption import CaptionModule
from d3net_tpu.models.graph import GraphModule


class SpeakerNet(nn.Module):
    num_vocabs: int
    sos_id: int
    eos_id: int
    pad_id: int = 0
    m: int = 16                      # detector feature size (graph input)
    feat_size: int = 128
    num_graph_steps: int = 2
    num_locals: int = 10
    num_proposals: int = 128
    max_len: int = 30
    min_iou_threshold: float = 0.25
    use_relation: bool = True
    use_orientation: bool = True
    no_captioning: bool = False
    beam_group_size: int = 1
    diversity_lambda: float = 0.5

    def setup(self):
        if self.num_graph_steps > 0:
            self.graph = GraphModule(
                out_size=self.feat_size,
                num_layers=self.num_graph_steps,
                num_locals=self.num_locals,
                return_orientation=self.use_orientation,
            )
        if not self.no_captioning:
            self.caption = CaptionModule(
                num_vocabs=self.num_vocabs,
                sos_id=self.sos_id,
                eos_id=self.eos_id,
                pad_id=self.pad_id,
                feat_size=self.feat_size,
                num_proposals=self.num_proposals,
                num_locals=self.num_locals,
                max_len=self.max_len,
                min_iou_threshold=self.min_iou_threshold,
                use_relation=self.use_relation,
                beam_group_size=self.beam_group_size,
                diversity_lambda=self.diversity_lambda,
            )

    def __call__(self, data: Dict[str, Any], mode: str = "tf", rng=None,
                 beam_size: int = 1, sample_topn: int = 1,
                 chunk_size: int = 1) -> Dict[str, Any]:
        if self.num_graph_steps > 0:
            data = self.graph(data)
        if self.no_captioning:
            return data
        if mode != "eval":
            # expand scene-level tensors to description rows (B*chunk)
            import jax.numpy as jnp

            expand_keys = [
                "bbox_feature", "proposal_batch_mask", "proposal_bbox_batched",
                "edge_feature", "local_ids", "local_mask",
            ]
            data = dict(data)
            for k in expand_keys:
                if k in data:
                    data[k] = jnp.repeat(data[k], chunk_size, axis=0)
        return self.caption(data, mode=mode, rng=rng, beam_size=beam_size,
                            sample_topn=sample_topn)
