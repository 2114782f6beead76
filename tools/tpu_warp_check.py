"""Real-TPU bit-exactness check: double-buffered warp kernel vs golden."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from gstbad_tpu.golden import geometric as golden
from gstbad_tpu.ops import warp_pallas as wp
from gstbad_tpu.ops.remap import fix_map

print("devices:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
for name, (H, W) in [("fisheye", (1080, 1920)), ("twirl", (1080, 1920))]:
    mp = golden.MAP_BUILDERS[name](W, H)
    p = wp.plan(mp, W, H, "ignore")
    assert p is not None, name
    img = rng.integers(0, 256, (2, H, W, 4), dtype=np.uint8)
    _, valid = fix_map(mp, W, H, "ignore")
    bg = jnp.zeros(4, jnp.uint8)
    t0 = time.time()
    out = np.asarray(wp.warp_batch(jnp.asarray(img), p, jnp.asarray(valid), bg))
    print(f"{name}: compiled+ran in {time.time()-t0:.1f}s", flush=True)
    want = np.stack([golden.remap(img[i], mp, "ignore") for i in range(2)])
    np.testing.assert_array_equal(out, want)
    print(f"{name}: BIT-EXACT on TPU", flush=True)
