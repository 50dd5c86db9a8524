"""d3net_tpu — a TPU-native (JAX/XLA/Pallas/pjit) 3D dense-captioning and
visual-grounding framework with the capabilities of D3Net (arXiv 2112.01551).

The stack (mirrors the reference layer map, rebuilt TPU-first):

- ``ops``      — fixed-shape device ops: voxel scatter/gather, sparse conv via
                 neighbor-table gather + MXU matmul, grid connected-components
                 clustering, segment reductions, point-set IoU.
- ``models``   — Flax modules: PointGroup detector (sparse U-Net), relational
                 graph (dense EdgeConv), caption decoder (lax.scan GRU + beam),
                 language encoder, transformer match module.
- ``data``     — host-side input pipeline: scene preprocessing, augmentation,
                 voxelization rulebooks + per-level kernel maps, static-shape
                 batch assembly.
- ``train``    — losses, train/val steps, optimizer, checkpointing.
- ``parallel`` — jax.sharding Mesh / pjit data-parallel runtime.
- ``eval``     — detection mAP, captioning (CIDEr/BLEU/ROUGE/METEOR) and
                 grounding Acc@kIoU evaluation protocols.
"""

__version__ = "0.1.0"
