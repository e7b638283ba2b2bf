"""ViT-Adapter-L backbone: exact vs coarse-s8 extractor timing at 736x1280,
T=5 (zoo ViT-L offline config, serving bf16 + flash trunk attention)."""
import sys

sys.path.insert(0, "/root/repo")
import time

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.asarray(leaves[0]).ravel()[::997].astype(jnp.float32)))


def timeit(fn, *args, reps=3):
    out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.models.backbones.vit_adapter import build_vit_adapter

cfg = Config()
cfg.model.backbone.name = "vit_adapter_dinov2"
cfg.model.backbone.vit_flash_attention = jax.default_backend() == "tpu"
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(5, 736, 1280, 3).astype(np.float32), jnp.bfloat16)
for tag, coarse in [("exact extractor", False), ("coarse-s8 extractor", True)]:
    cfg.model.backbone.vit_extractor_coarse = coarse
    bb = build_vit_adapter(cfg.model.backbone, dtype=jnp.bfloat16)
    p = jax.jit(bb.init)(jax.random.key(0), x)
    t = timeit(jax.jit(lambda p, x: bb.apply(p, x)), p, x)
    print(f"vit-adapter-L {tag} (T=5): {t*1e3:8.1f} ms", flush=True)
