"""Profiling tools: capture a device trace around a train step and summarize
where the time goes (the analysis used to find the BN-reduction roofline in
docs/DESIGN.md §5).

  python -m skinjax.tools.profile_cli --backbone resnet-50 --batch 128
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
from typing import Dict, List, Optional, Tuple


def analyze_xplane(xplane_path: str, top: int = 20) -> List[Tuple[str, float]]:
    """Aggregate device op time (ms) by op kind from an xplane.pb capture."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    for plane in xs.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        ev_names = {i: m.name for i, m in plane.event_metadata.items()}
        cat: Dict[str, int] = collections.Counter()
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "?")
                if not name.startswith("%"):
                    continue
                kind = re.sub(r"[.\d]+$", "", name[1:].split(" ")[0].split(".")[0])
                cat[kind] += ev.duration_ps
        return [(k, v / 1e9) for k, v in cat.most_common(top)]
    return []


def find_xplane(trace_dir: str) -> Optional[str]:
    hits = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True)
    return max(hits, key=os.path.getmtime) if hits else None


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--backbone", default="resnet-50")
    p.add_argument("--mechanism",
                   default="att-intramodal+residual+cross-attention-metadados")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--trace-dir", default="/tmp/skinjax-trace")
    p.add_argument("--analyze-only", default=None,
                   help="skip capture; analyze this xplane.pb")
    args = p.parse_args(argv)

    if args.analyze_only is None:
        import numpy as np
        import jax
        import jax.numpy as jnp

        try:
            jax.config.update("jax_compilation_cache_dir",
                              os.path.join(os.path.dirname(
                                  os.path.dirname(os.path.dirname(
                                      os.path.abspath(__file__)))), ".jax_cache"))
        except Exception:
            pass

        from skinjax.models import MultimodalModel
        from skinjax.train import make_optimizer
        from skinjax.train.steps import create_train_state, make_train_step_weighted
        from skinjax.utils import trace

        model = MultimodalModel(
            num_classes=6, num_heads=8, cnn_model_name=args.backbone,
            common_dim=512, vocab_size=91, attention_mechanism=args.mechanism,
            dtype=jnp.bfloat16,
        )
        rng = np.random.default_rng(0)
        batch = {
            "image": rng.integers(0, 256, (args.batch, 224, 224, 3), dtype=np.uint8),
            "metadata": rng.normal(size=(args.batch, 91)).astype(np.float32),
            "label": rng.integers(0, 6, args.batch).astype(np.int32),
        }
        tx = make_optimizer(5e-5, 1e-4)
        try:
            cpu = jax.devices("cpu")[0]
            with jax.default_device(cpu):
                state = create_train_state(
                    model, jax.random.key(0),
                    {k: v[:2] for k, v in batch.items()}, tx,
                )
            state = jax.device_put(state, jax.devices()[0])
        except Exception:
            state = create_train_state(model, jax.random.key(0), batch, tx)
        step = make_train_step_weighted(model, tx, "weighted_ce")
        im, md = jnp.asarray(batch["image"]), jnp.asarray(batch["metadata"])
        lb, cw = jnp.asarray(batch["label"]), jnp.ones(6, jnp.float32)
        state, loss = step(state, im, md, lb, jax.random.key(1), cw)
        jax.block_until_ready(loss)
        with trace(args.trace_dir):
            for _ in range(args.steps):
                state, loss = step(state, im, md, lb, jax.random.key(1), cw)
            jax.block_until_ready(loss)
        xp = find_xplane(args.trace_dir)
    else:
        xp = args.analyze_only

    if not xp:
        print("no xplane capture found")
        return
    rows = analyze_xplane(xp)
    total = sum(ms for _, ms in rows)
    print(f"device op time by kind ({xp}):")
    for kind, ms in rows:
        print(f"  {ms:9.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%  {kind}")


if __name__ == "__main__":
    main()
