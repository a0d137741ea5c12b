"""Serving latency under concurrency (VERDICT r1 #9 'done' evidence):
flagship engine + dynamic batcher, 1/8/32 concurrent clients on the v5e."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import threading
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.models import MultimodalModel
from skinjax.serve.batching import BatchingEngine
from skinjax.serve.engine import InferenceEngine

model = MultimodalModel(
    num_classes=6, num_heads=8, cnn_model_name="resnet-50",
    text_model_name="one-hot-encoder", common_dim=512, vocab_size=91,
    attention_mechanism="att-intramodal+residual+cross-attention-metadados",
    dtype=jnp.bfloat16,
)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 91), jnp.float32),
    )
variables = jax.device_put(variables, jax.devices()[0])
engine = InferenceEngine(model, variables, class_names=[str(i) for i in range(6)])
batcher = BatchingEngine(engine, max_batch=32, max_wait_ms=4.0)

rng = np.random.default_rng(0)
img_f32 = rng.normal(size=(224, 224, 3)).astype(np.float32)
img_u8 = rng.integers(0, 256, (224, 224, 3), dtype=np.uint8)
feats = rng.normal(size=(91,)).astype(np.float32)

# warm the compile cache for the power-of-two buckets, both dtype paths
for n in (1, 2, 4, 8, 16, 32):
    engine.predict_probs(
        np.repeat(img_f32[None], n, 0), np.repeat(feats[None], n, 0))
    engine.predict_probs(
        np.repeat(img_u8[None], n, 0), np.repeat(feats[None], n, 0))

for path, img in (("u8 ", img_u8), ("f32", img_f32)):
    for clients in (1, 8, 32):
        lats = []
        lock = threading.Lock()
        stats0 = dict(batcher.stats)
        wall0 = time.perf_counter()
        stop = time.time() + 12.0

        def worker():
            done = 0
            # at least 20 requests per worker even if the wall-clock window
            # elapsed (thread start can lag badly on a loaded host)
            while done < 20 or time.time() < stop:
                t0 = time.perf_counter()
                batcher.predict_probs_queued(img, feats)
                dt = (time.perf_counter() - t0) * 1e3
                done += 1
                with lock:
                    lats.append(dt)

        threads = [threading.Thread(target=worker) for _ in range(clients)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        arr = np.asarray(lats)
        wall = time.perf_counter() - wall0
        d = {k: batcher.stats[k] - stats0[k] for k in batcher.stats}
        occ = (d["occupancy_sum"] / d["batches"]) if d["batches"] else 0.0
        # server-side attribution: a starved worker (idle >> forward) means
        # requests aren't ARRIVING fast enough — the bottleneck is the
        # client side / host CPU, not the batching pipeline or the chip
        print(f"{path} clients={clients:2d}: p50={np.percentile(arr, 50):6.1f} ms "
              f"p95={np.percentile(arr, 95):6.1f} ms "
              f"throughput={len(arr) / wall:6.1f} req/s "
              f"(n={len(arr)}) | server: occ={occ:4.1f}/{batcher.max_batch} "
              f"batches={d['batches']} direct={d['direct_requests']} "
              f"fwd={d['forward_s']:5.2f}s idle={d['idle_s']:5.2f}s "
              f"wall={wall:5.2f}s", flush=True)
batcher.shutdown()
