"""tpu3dsad — TPU-native rebuild of the 3DSAD size-adaptive 3D detection stack.

A from-scratch JAX/XLA/Pallas framework with the capability surface of the
reference family (see SURVEY.md): PointNet++ point ops (FPS, ball-query, kNN,
grouping, 3-NN interpolation), set-abstraction / feature-propagation modules,
the VoteNet-style vote→proposal detection head with the 3DSAD size-adaptive
clustering stage, shape-static on-device 3D NMS, losses, AP evaluation,
dataset pipelines and train/eval entry points.

Design invariants (SURVEY.md §7):
  * shape-static everywhere — fixed point budgets, padded + masked
  * layout [B, N, C] channels-last (MXU-friendly)
  * every hot op has impl='xla' (reference) and impl='pallas' (fast) behind
    one API, pinned equal by tests
"""

__version__ = "0.1.0"
