import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from skinjax.data.augment import augment_batch
rng = np.random.default_rng(0)
im = jnp.asarray(rng.integers(0, 256, (128, 224, 224, 3), dtype=np.uint8))
key = jax.random.key(1)
aug = jax.jit(lambda i, k: augment_batch(i, k, out_dtype=jnp.bfloat16))
for _ in range(3):
    out = aug(im, key)
jax.block_until_ready(out)
with jax.profiler.trace("/tmp/skinjax-trace-aug"):
    for _ in range(5):
        out = aug(im, key)
    jax.block_until_ready(out)
print("ok")
