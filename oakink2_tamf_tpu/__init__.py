"""oakink2_tamf_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework providing the
capabilities of the OakInk2-TaMF reference stack (task-aware motion fulfillment):

- core:     rotation/transform math, MANO hand layer, diffusion engine, geometry
- ops:      Pallas/XLA kernels (signed chamfer, fused attention)
- models:   MF-MDM generator G, refiner R, FID segment encoder, CLIP text tower
- data:     interaction-segment dataset, slicing, static-shape collate, adaptors
- runtime:  config registry, checkpointing, logging, run-dir upkeep
- parallel: device meshes, sharded train/sample steps
- launch:   train/sample/eval command-line entry points
- eval:     CR / SIV / PSKL-J / FID metrics
"""

__version__ = "0.1.0"
