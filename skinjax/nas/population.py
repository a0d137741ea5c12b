"""Vmapped population training: K NAS candidates per compiled step.

The reference NAS loop trains one candidate per controller step
(nas/optimization_train_process_pad_20.py:308-337) — on TPU that leaves the
chip idle between small-model steps and pays one compile per architecture.
Here candidates are bucketed by shape-envelope keys, each bucket's
:class:`~skinjax.nas.supernet.SuperNet` is compiled ONCE, and ``jax.vmap``
over (params, masks) trains the whole bucket simultaneously: the augmented
batch is computed once and shared, and the MXU sees K× the work per
dispatch. Candidate semantics are preserved (see supernet.py's exactness
notes); with ``exact_init=True`` each candidate even starts from the
initialization its standalone DynamicCNN would have drawn.

Reward semantics vs the sequential path: the sequential trainer early-stops
on val_bacc with patience and rewards the best epoch; here every candidate
runs the full ``num_epochs`` (the bucket stops early only when *all*
candidates have exhausted patience) and the reward is the best per-candidate
val balanced accuracy over epochs — the same value unless a candidate would
have improved after its individual stop point (then the population reward is
the better one).
"""

from __future__ import annotations

import dataclasses
import os
from collections import defaultdict
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from skinjax.data.augment import augment_batch
from skinjax.data.pipeline import prefetch_batches
from skinjax.data.sampling import compute_class_weights, epoch_batches
from skinjax.nas.dynamic_model import make_dynamic_model
from skinjax.nas.search_space import filters_from_config
from skinjax.nas.supernet import (
    SuperNet,
    candidate_masks,
    embed_params,
    envelope_of,
)
from skinjax.train.loop import TrainConfig
from skinjax.train.losses import weighted_loss
from skinjax.train.metrics import classification_metrics
from skinjax.train.optimizer import make_optimizer

DEFAULT_BUCKET_KEYS = ("use_pooling", "num_blocks", "kernel_size")

# DynamicCNN's cfg.get(...) defaults (nas/dynamic_model.py) — population
# configs normalize through these so partially-specified configs (valid for
# the sequential path) bucket/envelope instead of KeyError-ing
_CONFIG_DEFAULTS = {
    "num_blocks": 3,
    "initial_filters": 64,
    "kernel_size": 3,
    "layers_per_block": 2,
    "use_pooling": True,
    "common_dim": 512,
    "attention_mecanism": "concatenation",
    "num_layers_text_fc": 2,
    "neurons_per_layer_size_of_text_fc": 512,
    "num_layers_fc_module": 2,
    "neurons_per_layer_size_of_fc_module": 512,
}


def _normalize(config: Dict) -> Dict:
    return {**_CONFIG_DEFAULTS, **dict(config)}


def _config_key(config: Dict) -> int:
    """Stable per-config init-seed offset: the same config draws the same
    init regardless of which group/bucket it was sampled into."""
    import json
    import zlib

    return zlib.crc32(
        json.dumps(
            {k: str(v) for k, v in sorted(config.items())}
        ).encode()
    )


@struct.dataclass
class PopulationState:
    params: Any
    opt_state: Any
    step: jax.Array


def _bucket(configs: Sequence[Dict], keys: Sequence[str]):
    buckets = defaultdict(list)
    for i, c in enumerate(configs):
        buckets[tuple(dict(c)[k] for k in keys)].append(i)
    return list(buckets.values())


def envelope_step_bytes(env, image_hw, batch_size: int) -> int:
    """Rough per-candidate HBM footprint (bytes) of one supernet train step.

    The f32 conv-pyramid activations dominate (the convs promote bf16
    images against f32 kernels): one temp per conv layer of H·W·C f32,
    spatial halving per block under pooling, ×1.25 for GroupNorm/backward
    residue. Validated against a measured compile report: a 10-block
    no-pooling envelope at 64×64, B=32, K=8 reported 18.42 GB program HBM
    (= 72 MB per candidate-sample); this estimator gives 85 MB — slightly
    conservative, which is the right side to err on (an under-estimate
    wastes a doomed multi-minute remote compile)."""
    H, W = int(image_hw[0]), int(image_hw[1])
    f = filters_from_config(
        {"num_blocks": env.num_blocks, "initial_filters": env.initial_filters}
    )
    n_layers = 2 if env.layers_per_block >= 2 else 1
    total = 0
    for bi in range(env.num_blocks):
        total += n_layers * H * W * f[bi] * 4
        if env.use_pooling and min(H, W) >= 2:
            H, W = max(H // 2, 1), max(W // 2, 1)
    return int(total * 1.25) * int(batch_size)


def hbm_width_cap(env, image_hw, batch_size: int) -> int:
    """Max vmap width for this envelope under the HBM budget
    (``SKINJAX_POP_HBM_GB``, default 11 GB — a v5e's 15.75 GB minus
    reserved/params/optimizer headroom)."""
    budget = float(os.environ.get("SKINJAX_POP_HBM_GB", "11")) * 1e9
    per = envelope_step_bytes(env, image_hw, batch_size)
    return max(1, int(budget // max(per, 1)))


class PopulationTrainer:
    """Trains a list of candidate configs with vmapped supernet steps.

    ``evaluate(configs)`` returns one reward (best val balanced accuracy)
    per config, in order.
    """

    def __init__(
        self,
        train_source,
        val_source,
        num_classes: int,
        config: Optional[TrainConfig] = None,
        bucket_keys: Sequence[str] = DEFAULT_BUCKET_KEYS,
        exact_init: bool = False,
        seed: int = 42,
        vocab_size: Optional[int] = None,
        mesh=None,
        mesh_axis: str = "data",
        pad_width: Optional[int] = None,
        fixed_envelope: Optional[Dict] = None,
    ):
        self.train_source = train_source
        self.val_source = val_source
        self.num_classes = num_classes
        # fixed_envelope: a SEARCH-SPACE dict (e.g. DEFAULT_SEARCH_SPACE).
        # When set, each bucket's envelope pins every WIDTH-like dim
        # (filters, layers_per_block, text/fc widths+layers, common_dim,
        # mechanism set) to the SPACE maxima while keeping the bucket's
        # structural dims (use_pooling, num_blocks, kernel_size). Program
        # identity then depends only on (pooling, num_blocks, kernel_size,
        # vmap width) — at most |pool|x|nb|x|ks| programs for the whole
        # search, reusable across buckets AND controller rounds via the
        # program cache below. This is the §5e-r4 follow-up (a): without
        # it, the envelope's width dims follow each bucket's sampled
        # CONTENTS, so the same (pool,nb,ks) bucket recompiles (~9-15 min
        # remote) whenever its max widths change between rounds.
        # (A single space-wide envelope — maxing num_blocks/kernel too —
        # was tried first and CRASHES the remote compile helper: the
        # 10-block x 512-filter x K=8 program is too large. Measured
        # r5; bucket-structural dims stay per-bucket for that reason.)
        self.fixed_envelope = fixed_envelope
        # (env, K) -> (model, tx, pop_step, pop_eval): jitted programs with
        # masks/cfg_keys as ARGUMENTS (not closure constants), so one
        # compiled executable serves every bucket of the same envelope+width
        self._programs: Dict[Tuple, Tuple] = {}
        # pad_width: pad every bucket to this vmap width by repeating its
        # last config. Without it, each distinct (envelope, bucket-size)
        # pair is a FRESH XLA program: as memoization shrinks the fresh-
        # candidate count per controller round, bucket widths churn through
        # 1..K and the search becomes compile-bound (measured: a 128-step
        # population-8 search on the v5e tunnel spent >90 min, dominated by
        # remote compiles of width variants). Duplicated candidates are
        # config-keyed for init/dropout, so they are exact clones; their
        # rewards are sliced off. Compile (minutes) >> the wasted clone
        # train steps (seconds).
        self.pad_width = pad_width
        # pjit across candidates: shard the stacked candidate axis over the
        # mesh, one (or more) candidates per device — SURVEY §7's
        # "vmap/pjit across candidate configs". The batch is replicated;
        # each device trains its own architectures with zero collectives.
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        self.cfg = config or TrainConfig(
            num_epochs=10, early_stopping_patience=5,
            early_stopping_metric="val_bacc",
        )
        self.bucket_keys = tuple(bucket_keys)
        self.exact_init = exact_init
        self.seed = seed
        if vocab_size is None:
            vocab_size = int(
                train_source.batch(np.arange(1))["metadata"].shape[1]
            )
        self.vocab_size = vocab_size
        self.class_weights = compute_class_weights(
            train_source.labels, num_classes
        )

    # -- per-bucket machinery ------------------------------------------------

    def _dtype(self):
        return (
            jnp.bfloat16 if self.cfg.image_dtype == "bfloat16" else jnp.float32
        )

    def _space_envelope(self, configs: Sequence[Dict]) -> "Envelope":
        """Fixed-width envelope: structural dims from the bucket (which is
        keyed on them), width dims from the SPACE maxima — so envelope
        identity is a function of the bucket key alone, never of which
        configs happened to be sampled into it."""
        from skinjax.nas.supernet import Envelope

        space = self.fixed_envelope
        mk = lambda k: max(int(v) for v in space[k])
        mxc = lambda k: max(int(c[k]) for c in configs)
        return Envelope(
            num_blocks=mxc("num_blocks"),
            initial_filters=mk("initial_filters"),
            kernel_size=mxc("kernel_size"),
            layers_per_block=mk("layers_per_block"),
            use_pooling=bool(configs[0].get("use_pooling", True)),
            text_width=mk("neurons_per_layer_size_of_text_fc"),
            text_layers=mk("num_layers_text_fc"),
            common_dim=mk("common_dim"),
            fc_width=mk("neurons_per_layer_size_of_fc_module"),
            fc_layers=mk("num_layers_fc_module"),
            mechanisms=tuple(sorted(space["attention_mecanism"])),
        )

    def _programs_for(self, env, K: int):
        """Jitted population step/eval for (envelope, width), cached so the
        compile amortizes across buckets and controller rounds. masks and
        cfg_keys are call ARGUMENTS — same executable, any candidate set."""
        key = (env, K)
        if key in self._programs:
            return self._programs[key]
        cfg = self.cfg
        model = SuperNet(
            env, num_classes=self.num_classes, vocab_size=self.vocab_size
        )
        tx = make_optimizer(cfg.learning_rate, cfg.weight_decay)
        wloss = weighted_loss(cfg.loss, cfg.focal_gamma)
        cw = jnp.asarray(self.class_weights)
        dtype = self._dtype()

        @partial(jax.jit, donate_argnums=(0,))
        def pop_step(state, masks, cfg_keys, image_u8, metadata, label, rng):
            aug_rng, drop_rng = jax.random.split(
                jax.random.fold_in(rng, state.step)
            )
            image = augment_batch(
                image_u8, aug_rng, train=cfg.augment, out_dtype=dtype,
                recipe=cfg.augment_recipe,
            )

            def one(params, opt_state, m, key):
                def loss_of(p):
                    logits = model.apply(
                        {"params": p}, image, metadata, m, train=True,
                        rngs={"dropout": key},
                    )
                    return wloss(logits.astype(jnp.float32), label, cw)

                loss, grads = jax.value_and_grad(loss_of)(params)
                updates, new_opt = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_opt, loss

            keys = jax.vmap(lambda h: jax.random.fold_in(drop_rng, h))(
                cfg_keys
            )
            new_params, new_opt, losses = jax.vmap(one)(
                state.params, state.opt_state, masks, keys
            )
            return (
                PopulationState(new_params, new_opt, state.step + 1),
                losses,
            )

        @jax.jit
        def pop_eval(params, masks, image_u8, metadata):
            image = augment_batch(
                image_u8, jax.random.key(0), train=False, out_dtype=dtype
            )
            return jax.vmap(
                lambda p, m: model.apply(
                    {"params": p}, image, metadata, m
                ).astype(jnp.float32)
            )(params, masks)

        self._programs[key] = (model, tx, pop_step, pop_eval)
        return self._programs[key]

    def _init_params(self, model, masks_list, configs, sample):
        img1 = jnp.asarray(sample["image"][:1], jnp.float32)
        md1 = jnp.asarray(sample["metadata"][:1])
        if self.exact_init:
            stacked = []
            for cfg, masks in zip(configs, masks_list):
                sup = model.init(
                    jax.random.key(self.seed), img1, md1,
                    jax.tree_util.tree_map(jnp.asarray, masks),
                )["params"]
                cand_model = make_dynamic_model(
                    cfg, num_classes=self.num_classes,
                    vocab_size=self.vocab_size,
                )
                # init key derived from the CONFIG, not its position in the
                # bucket — the same config re-sampled later draws the same
                # init/reward (the premise of run_nas's memoization)
                cand = cand_model.init(
                    jax.random.fold_in(
                        jax.random.key(self.seed), _config_key(cfg)
                    ),
                    img1, md1,
                )["params"]
                stacked.append(embed_params(cand, sup, cfg, model.env))
            return jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *stacked
            )
        rngs = jnp.stack([
            jax.random.key_data(jax.random.fold_in(
                jax.random.key(self.seed), _config_key(cfg)))
            for cfg in configs
        ])
        masks = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *masks_list
        )
        init_one = lambda kd, m: model.init(
            jax.random.wrap_key_data(kd), img1, md1, m
        )["params"]
        return jax.vmap(init_one)(rngs, masks)

    def _train_bucket(self, configs: List[Dict]) -> List[float]:
        cfg = self.cfg
        n_real = len(configs)
        env = (
            self._space_envelope(configs)
            if self.fixed_envelope is not None
            else envelope_of(configs)
        )
        # HBM-aware width: a wide envelope (e.g. no-pooling × max filters)
        # can need more activation HBM than the chip has — vmapping it at
        # full width would waste a doomed multi-minute remote compile and
        # then fail the whole bucket. Cap the vmap width to what fits and
        # train oversized buckets in chunks (chunk width is a deterministic
        # function of the envelope, so compile caching still holds).
        image_hw = self.train_source.batch(np.arange(1))["image"].shape[1:3]
        cap = hbm_width_cap(env, image_hw, cfg.batch_size)
        if n_real > cap:
            print(f"[nas] bucket of {n_real} capped to vmap width {cap} "
                  f"(envelope needs ~"
                  f"{envelope_step_bytes(env, image_hw, cfg.batch_size) / 1e9:.1f}"
                  f" GB/candidate)")
            out: List[float] = []
            for i in range(0, n_real, cap):
                out.extend(self._train_bucket(configs[i:i + cap]))
            return out
        pad_target = min(self.pad_width, cap) if self.pad_width else 0
        if pad_target and n_real < pad_target:
            configs = list(configs) + [configs[-1]] * (
                pad_target - n_real
            )
        K = len(configs)
        model, tx, pop_step, pop_eval = self._programs_for(env, K)
        masks_list = [candidate_masks(c, env) for c in configs]
        masks = jax.tree_util.tree_map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *masks_list
        )

        sample = self.train_source.batch(
            np.arange(min(2, len(self.train_source)))
        )
        params = self._init_params(model, masks_list, configs, sample)
        state = PopulationState(
            params=params,
            opt_state=jax.vmap(tx.init)(params),
            step=jnp.asarray(0, jnp.int32),
        )
        if self.mesh is not None and K % self.mesh.devices.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec as P

            cand_sh = NamedSharding(self.mesh, P(self.mesh_axis))
            rep_sh = NamedSharding(self.mesh, P())

            def put(leaf):
                leaf = jnp.asarray(leaf)
                sh = (
                    cand_sh
                    if leaf.ndim >= 1 and leaf.shape[0] == K
                    else rep_sh
                )
                return jax.device_put(leaf, sh)

            state = jax.tree_util.tree_map(put, state)
            masks = jax.tree_util.tree_map(put, masks)

        # dropout keys derived from the CONFIG (like init keys above), not
        # the candidate's position in the bucket — re-sampled configs draw
        # the same dropout stream at equal envelopes (bucket-POSITION
        # independent; under fixed_envelope the envelope is constant
        # search-wide, so the draws are fully config-deterministic)
        cfg_keys = jnp.asarray([_config_key(c) for c in configs], jnp.uint32)

        rng = jax.random.fold_in(jax.random.key(cfg.seed), 1)
        best = np.full(K, -np.inf)
        since_improve = np.zeros(K, np.int32)
        n_val = len(self.val_source)
        for epoch in range(cfg.num_epochs):
            batches = epoch_batches(
                self.train_source.labels, self.num_classes, cfg.batch_size,
                seed=cfg.seed, epoch=epoch, weighted=cfg.weighted_sampling,
            )
            for batch in prefetch_batches(self.train_source, batches):
                state, _ = pop_step(
                    state,
                    masks,
                    cfg_keys,
                    jnp.asarray(batch["image"]),
                    jnp.asarray(batch["metadata"]),
                    jnp.asarray(batch["label"]),
                    rng,
                )
            # full val pass, all K candidates at once
            probs = np.zeros((K, n_val, self.num_classes), np.float32)
            n_batches = -(-n_val // cfg.batch_size)
            for b in range(n_batches):
                idx = np.arange(
                    b * cfg.batch_size, (b + 1) * cfg.batch_size
                ) % n_val
                vb = self.val_source.batch(idx)
                logits = pop_eval(
                    state.params,
                    masks,
                    jnp.asarray(vb["image"]),
                    jnp.asarray(vb["metadata"]),
                )
                probs[:, idx] = np.asarray(
                    jax.nn.softmax(logits, axis=-1), np.float32
                )
            labels = self.val_source.labels[:n_val]
            improved = False
            for ki in range(K):
                m = classification_metrics(
                    labels, probs[ki].argmax(-1), probs[ki], self.num_classes
                )
                bacc = float(m["balanced_accuracy"])
                if bacc > best[ki] + 1e-12:
                    best[ki] = bacc
                    since_improve[ki] = 0
                    improved = True
                else:
                    since_improve[ki] += 1
            if not improved and (
                since_improve >= cfg.early_stopping_patience
            ).all():
                break
        rewards = [float(b) for b in best[:n_real]]
        # §5e-r4 follow-up (b): free this bucket's device state EXPLICITLY
        # before the next envelope program runs — the 32² economics run hit
        # RESOURCE_EXHAUSTED from HBM pressure accumulating across
        # successive bucket programs; waiting for Python GC is not enough
        # on a chip that is about to compile the next multi-GB envelope.
        for leaf in jax.tree_util.tree_leaves((state, masks)):
            if isinstance(leaf, jax.Array):
                try:
                    leaf.delete()
                except Exception:
                    pass
        del state, masks
        return rewards

    def evaluate(self, configs: Sequence[Dict]) -> List[Optional[float]]:
        """Rewards per config, in order. A config that fails to train gets
        ``None`` (run_nas scores it 0.0 for the controller — reference
        parity — but skips memoizing it, so a transient failure doesn't pin
        a config at zero for the rest of the search)."""
        configs = [_normalize(c) for c in configs]
        rewards: List[Optional[float]] = [None] * len(configs)
        for idx_group in _bucket(configs, self.bucket_keys):
            group = [configs[i] for i in idx_group]
            try:
                group_rewards: List[Optional[float]] = self._train_bucket(
                    group
                )
            except Exception as e:
                print(f"[nas] population bucket failed "
                      f"({type(e).__name__}: {e})")
                # drop cached executables before retrying: the §5e-r4 32²
                # run's single-candidate isolation retrains ALSO hit
                # RESOURCE_EXHAUSTED — stale programs/donated buffers from
                # the failed bucket keep HBM reserved. Retrace cost is
                # bounded by the persistent compilation cache.
                if os.environ.get("SKINJAX_POP_CLEAR_ON_FAIL", "1") != "0":
                    self._programs.clear()
                    jax.clear_caches()
                    import gc

                    gc.collect()
                if len(group) == 1:
                    group_rewards = [None]
                else:
                    # isolate the failure: retry each candidate alone so one
                    # pathological config can't zero its bucket-mates
                    group_rewards = []
                    for c in group:
                        try:
                            group_rewards.extend(self._train_bucket([c]))
                        except Exception as e2:
                            print(f"[nas] candidate failed alone "
                                  f"({type(e2).__name__}: {e2})")
                            group_rewards.append(None)
            for i, r in zip(idx_group, group_rewards):
                rewards[i] = r
        return rewards


def make_population_evaluator(
    source,
    num_classes: int,
    train_cfg: Optional[TrainConfig] = None,
    seed: int = 42,
    # exact_init by default: each candidate starts from the init its
    # standalone DynamicCNN would draw (keyed by config, independent of
    # grouping/envelope), so a re-sampled config re-earns the same reward up
    # to dropout draws (whose WIDTH follows the envelope; distribution-
    # equivalent, not bit-equal) — the property run_nas's memoization and
    # REINFORCE comparisons rely on
    exact_init: bool = True,
    bucket_keys: Sequence[str] = DEFAULT_BUCKET_KEYS,
    mesh=None,
    pad_width: Optional[int] = None,
    fixed_envelope: Optional[Dict] = None,
) -> Callable[[Sequence[Dict]], List[Optional[float]]]:
    """80/20 split (as nas/optimization_train_process_pad_20.py:232-237) +
    a PopulationTrainer over it; returns ``configs -> rewards``."""
    from skinjax.data.splits import train_val_split
    from skinjax.train.kfold import SubsetSource

    labels = source.labels
    train_idx, val_idx = train_val_split(labels, val_fraction=0.2, seed=seed)
    trainer = PopulationTrainer(
        SubsetSource(source, train_idx),
        SubsetSource(source, val_idx),
        num_classes,
        config=train_cfg,
        bucket_keys=bucket_keys,
        exact_init=exact_init,
        seed=seed,
        vocab_size=int(source.features.shape[1]),
        mesh=mesh,
        pad_width=pad_width,
        fixed_envelope=fixed_envelope,
    )
    return trainer.evaluate
