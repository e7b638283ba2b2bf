"""Per-component timing of the Swin-L offline path at 736x1280, T=5."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import time
import jax, jax.numpy as jnp, numpy as np

def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.asarray(leaves[0]).ravel()[::997].astype(jnp.float32)))

def timeit(fn, *args, reps=3):
    out = fn(*args); sync(out)
    t0 = time.perf_counter()
    for _ in range(reps): out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.models.meta.dvis_offline import DVISOffline
from dvis_plus_tpu.models.tracker.referring_tracker import init_tracker_state
from dvis_plus_tpu.models.backbones.swin import build_swin

H, W, T = 736, 1280, 5
cfg = Config()
cfg.model.num_classes = 40
cfg.model.compute_dtype = "bfloat16"
cfg.model.pixel_decoder.msdeform_value_dtype = "bfloat16"
cfg.model.backbone.name = "swin_l"
cfg.model.backbone.swin_window_size = 12
cfg.model.transformer_decoder.num_queries = 200
cfg.model.transformer_decoder.reid_branch = True
import os
if os.environ.get("ISLAND_BF16"):
    cfg.model.pixel_decoder.island_dtype = "bfloat16"

rng = np.random.RandomState(0)

# 1. backbone alone: fp32-promoted vs bf16-threaded
xb = jnp.asarray(rng.rand(T, H, W, 3).astype(np.float32), jnp.bfloat16)
for tag, dt in [("fp32-promoted", None), ("bf16 threaded", jnp.bfloat16)]:
    bb = build_swin(cfg.model.backbone, dtype=dt)
    pb = jax.jit(bb.init)(jax.random.key(0), xb)
    t = timeit(jax.jit(lambda p, x: bb.apply(p, x)), pb, xb)
    print(f"swin-l backbone {tag} (T=5): {t*1e3:8.1f} ms")

# 2. pixel decoder alone (swin dims: 192/384/768/1536)
from dvis_plus_tpu.models.segmenter.pixel_decoder import MSDeformAttnPixelDecoder
feats = {}
for name, s, c in [("res2", 4, 192), ("res3", 8, 384), ("res4", 16, 768), ("res5", 32, 1536)]:
    feats[name] = jnp.asarray(rng.rand(T, H // s, W // s, c).astype(np.float32), jnp.bfloat16)
for tag, isl in [("fp32 island", "float32"), ("bf16 island", "bfloat16")]:
    dec = MSDeformAttnPixelDecoder(value_dtype="bfloat16", island_dtype=isl)
    pd = jax.jit(dec.init)(jax.random.key(0), feats)
    t = timeit(jax.jit(lambda p, x: dec.apply(p, x)[0]), pd, feats)
    print(f"pixel decoder {tag} (T=5):   {t*1e3:8.1f} ms")

# 3. full online_step window
model = DVISOffline(cfg.model)
Q = cfg.model.transformer_decoder.num_queries
images = jnp.zeros((1, T, H, W, 3), jnp.float32)
params = jax.jit(model.init)(jax.random.key(0), images)

@jax.jit
def win(params, imgs, state):
    lg, inst, frame, mf, new_state = model.apply(
        params, imgs, state, method=type(model).online_step
    )
    return lg[0], inst, frame, mf, new_state

state = init_tracker_state(1, Q, 512)
frames = jnp.asarray(rng.rand(1, T, H, W, 3).astype(np.float32))
t = timeit(lambda p, f, s: win(p, f, s)[3], params, frames, state)
print(f"full online_step window:      {t*1e3:8.1f} ms")

# 4. refiner embed pass + mask window (T=10 video)
@jax.jit
def refine_embeds(params, inst, frame):
    out = model.apply(params, inst, frame, method=type(model).refine_embeds)
    return out["pred_logits"][0], out["mask_embed"][0]

@jax.jit
def mask_win(params, membd, mf):
    return model.apply(params, membd[None], mf, method=type(model).refine_mask_window)[0]

_, inst, frame, mf, _ = win(params, frames, state)
inst2 = jnp.concatenate([inst, inst], axis=1)
frame2 = jnp.concatenate([frame, frame], axis=1)
t = timeit(lambda p, a, b: refine_embeds(p, a, b)[0], params, inst2, frame2)
print(f"refiner embed pass (T=10):    {t*1e3:8.1f} ms")
lg, membd = refine_embeds(params, inst2, frame2)
t = timeit(mask_win, params, jax.lax.dynamic_slice_in_dim(membd, 0, T, axis=0), jnp.asarray(mf, jnp.float32))
print(f"refiner mask window (T=5):    {t*1e3:8.1f} ms")

# 5. post-processing (inference_video)
from dvis_plus_tpu.models.meta.minvis import inference_video
r_masks = jnp.asarray(rng.rand(Q, T, H // 4, W // 4).astype(np.float32))
fused = jnp.asarray(rng.rand(Q, 41).astype(np.float32))
t = timeit(
    jax.jit(lambda f, m: inference_video(
        f, m, img_size=(720, 1280), output_size=(720, 1280), padded_size=(H, W), topk=20
    ).masks),
    fused, r_masks,
)
print(f"inference_video top-20 (T=5): {t*1e3:8.1f} ms")
