"""DVIS++ / OV-DVIS++ / DVIS-DAQ — a TPU-native JAX framework for universal
video segmentation (VIS / VPS / VSS, online + offline, open-vocabulary).

This is a from-scratch re-design of the capabilities of
zhang-tao-whu/DVIS_Plus (reference mounted at /root/reference) for TPU:

- compute path: jax / XLA / pallas, NHWC layouts, bf16 with fp32 islands
- parallelism: jax.sharding.Mesh + jit/shard_map (DP first-class, 2D mesh ready)
- recurrence (streaming tracker): lax.scan with explicit pytree carry
- assignment (Hungarian matching): in-graph lax.while_loop solver
- static shapes everywhere: fixed query counts, padded GT with validity masks
"""

__version__ = "0.1.0"
