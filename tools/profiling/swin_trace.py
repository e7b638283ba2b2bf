"""Capture a device trace of one s1 Swin block pair and dump HLO op stats."""
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import glob, os, sys, time
import jax, jax.numpy as jnp, numpy as np
from jax import lax

import dvis_plus_tpu.models.backbones.swin as swin_mod

def sync(x):
    return float(jnp.sum(jnp.asarray(x).ravel()[::997].astype(jnp.float32)))

B, C, nh, H, W = 5, 192, 6, 184, 320
rng = np.random.RandomState(0)
x = jnp.asarray(rng.rand(B, H, W, C).astype(np.float32), jnp.bfloat16)
blk0 = swin_mod.SwinBlock(dim=C, num_heads=nh, window_size=12, shift_size=0, dtype=jnp.bfloat16)
blk1 = swin_mod.SwinBlock(dim=C, num_heads=nh, window_size=12, shift_size=6, dtype=jnp.bfloat16)
p = (blk0.init(jax.random.key(0), x), blk1.init(jax.random.key(1), x))

@jax.jit
def pair(p, c):
    def body(c, _):
        return blk1.apply(p[1], blk0.apply(p[0], c)), ()
    out, _ = lax.scan(body, c, None, length=8)
    return out

sync(pair(p, x))  # compile+warm
logdir = "/tmp/swin_trace"
os.system(f"rm -rf {logdir}")
jax.profiler.start_trace(logdir)
sync(pair(p, x))
jax.profiler.stop_trace()

xs = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
print("xplane files:", xs, flush=True)
from tensorboard_plugin_profile.convert import raw_to_tool_data

data, _ = raw_to_tool_data.xspace_to_tool_data(xs, "hlo_stats", {})
out = data.decode() if isinstance(data, bytes) else str(data)
with open("/tmp/swin_hlo_stats.txt", "w") as f:
    f.write(out)
print("wrote /tmp/swin_hlo_stats.txt", len(out))
