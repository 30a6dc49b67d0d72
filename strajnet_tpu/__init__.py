"""STrajNet-TPU: a TPU-native (JAX/Flax/Pallas/pjit) occupancy-flow prediction framework.

A from-scratch rebuild of the capabilities of georgeliu233/STrajNet (2nd place,
2022 Waymo Occupancy & Flow Prediction Challenge) designed TPU-first:

- ``core``      pure-JAX numerics (bilinear sampling, grid transforms, task config)
- ``ops``       attention / fused kernels (XLA + Pallas)
- ``models``    Flax model stack (Swin encoder, TrajNet fusion, FG-MSA, 3D pyramid decoder)
- ``objective`` losses, LR schedules, functional challenge metrics
- ``data``      TFRecord schema, input pipeline, offline preprocessing
- ``parallel``  device mesh + sharding rules
- ``train``     jitted train/eval steps, checkpointing, training loop CLI
- ``infer``     batch inference + Waymo challenge submission writer
"""

__version__ = "0.1.0"
