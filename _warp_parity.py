import time
import numpy as np
import jax
import jax.numpy as jnp
from comfystereo_tpu.ops import warp
from comfystereo_tpu.utils import fixtures

def sync(o): np.asarray(o[0][:1, :1])

def check(h, w, div, sep, label, depth=None):
    img = jnp.asarray(fixtures.create_test_image(h, w).astype(np.float32)[None] / 255.0)
    if depth is None:
        depth = fixtures.create_depth_map(h, w).astype(np.float32)
    d = jnp.asarray(depth[None])
    outs = {}
    for impl in ("xla", "pallas"):
        wimg, gap = warp.forward_warp(img, d, (div/100.0)*w, sep, 2.0, impl=impl)
        outs[impl] = (np.asarray(wimg), np.asarray(gap))
    ok_img = np.array_equal(outs["xla"][0], outs["pallas"][0])
    ok_gap = np.array_equal(outs["xla"][1], outs["pallas"][1])
    md = float(np.abs(outs["xla"][0] - outs["pallas"][0]).max())
    print(f"{label}: img {'EXACT' if ok_img else f'maxdiff {md:.2e}'} gap {'EXACT' if ok_gap else 'DIFF'}")
    return ok_img and ok_gap

ok = True
ok &= check(96, 640, 4.5, 0.0, "640")
ok &= check(96, 640, -4.5, 1.5, "640 neg+sep")
rng = np.random.default_rng(0)
noise = rng.uniform(0, 255, (96, 640)).astype(np.float32)
ok &= check(96, 640, 7.0, 0.0, "640 noise", depth=noise)
ok &= check(64, 3840, 4.5, 0.0, "4K width")
print("ALL OK" if ok else "FAIL")

# timing 1080p one eye
h, w = 1080, 1920
img = jax.device_put(jnp.asarray(fixtures.create_test_image(h, w).astype(np.float32)[None] / 255.0))
d = jax.device_put(jnp.asarray(fixtures.create_depth_map(h, w).astype(np.float32)[None]))
f = lambda: warp.forward_warp(img, d, 0.045*w, 0.0, 2.0)
o = f(); sync(o[0])
t0 = time.perf_counter()
for _ in range(30): o = f()
sync(o[0])
print(f"forward_warp 1080p one eye: {(time.perf_counter()-t0)/30*1000:.2f} ms")
