"""NAS economics at reference scale (VERDICT r2 next #9): a 128-candidate
on-chip REINFORCE population search, logging wall time, memoization
hit-rate, and compile count, then projecting the reference's 500-step
search cost from the measured per-phase rates.

Reference shape: nas/optimization_train_process_pad_20.py:462-474 — 500
sequential candidate trainings, no caching, fresh model per step."""
import os as _os, sys as _sys  # repo-root import shim (scripts live in bench/)
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import json
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from skinjax.data import synthetic_source
from skinjax.nas.search import run_nas
from skinjax.train.loop import TrainConfig

STEPS = int(__import__("os").environ.get("NAS_STEPS", "64"))
IMG = int(__import__("os").environ.get("NAS_IMG", "64"))
POP = 8
# r5: fixed space-wide envelope — at most 2 cold compiles (pooling T/F) for
# the WHOLE search instead of one per shape-bucket (DESIGN §5e-r4 (a))
FIXED_ENV = __import__("os").environ.get("NAS_FIXED_ENV", "1") != "0"

src = synthetic_source(n=256, image_size=(IMG, IMG), feature_dim=85,
                       num_classes=6, seed=0)
cfg = TrainConfig(num_epochs=2, batch_size=32, early_stopping_patience=5,
                  early_stopping_metric="val_bacc")

t0 = time.time()


class _Progress:
    """Per-step heartbeat so a timeout still leaves a trajectory."""

    def log_metric(self, name, value, step=None):
        if name == "reward" and step is not None and step % 8 == 0:
            print(json.dumps({"progress_step": step,
                              "elapsed_s": round(time.time() - t0, 1)}),
                  flush=True)


best_cfg, best_reward, log = run_nas(
    src, 6, strategy="reinforce", search_steps=STEPS,
    train_cfg=cfg, results_dir="/tmp/nas_econ", seed=11,
    population_size=POP, memoize=True, tracker=_Progress(),
    fixed_envelope=FIXED_ENV,
)
wall = time.time() - t0

cached = sum(1 for e in log if e.get("cached"))
failed = sum(1 for e in log if e.get("failed"))
fresh = len(log) - cached
# hit-rate trajectory per 32-step phase: controller convergence makes the
# tail phases nearly free — that's what the 500-step projection leans on
phases = []
for lo in range(0, len(log), 16):
    chunk = log[lo:lo + 16]
    phases.append(round(sum(1 for e in chunk if e.get("cached")) / len(chunk), 3))

tail_hit = phases[-1]
fresh_rate_s = wall / max(fresh, 1)  # sec per fresh (trained) candidate
# project 500 steps: phases measured here for the first 128, tail hit-rate
# held for the remaining 372 (conservative: hit-rate still rising at 128)
proj_fresh_500 = fresh + (500 - STEPS) * (1 - tail_hit)
proj_wall_500_s = proj_fresh_500 * fresh_rate_s

print(json.dumps({
    "steps": len(log), "population": POP, "wall_s": round(wall, 1),
    "fresh_evals": fresh, "memo_hits": cached, "failed": failed,
    "hit_rate": round(cached / len(log), 3),
    "hit_rate_by_phase16": phases,
    "s_per_fresh_candidate": round(fresh_rate_s, 2),
    "projected_500step_fresh": round(proj_fresh_500, 1),
    "projected_500step_wall_min": round(proj_wall_500_s / 60, 1),
    "best_reward": round(best_reward, 4),
}))
