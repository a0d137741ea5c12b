"""REINFORCE LSTM controller (controllerMultimodalmodel.py:5-51 rebuilt in
flax) + the policy-gradient update loop state.

Architecture parity: one LSTM step per search-space key; a Dense head over
the hidden state gives the categorical logits for that key; the sampled
choice's embedding is the next LSTM input; a learned start token seeds the
chain. Sampling and the differentiable log-prob/entropy evaluation are split
(sample indices without grad, then score them) so the REINFORCE update is a
plain jax.grad.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from skinjax.nas.search_space import indices_to_config


class Controller(nn.Module):
    search_space_sizes: Tuple[Tuple[str, int], ...]  # ((key, n_choices), ...)
    hidden_size: int = 256

    def setup(self):
        self.lstm = nn.LSTMCell(features=self.hidden_size)
        self.heads = {
            name: nn.Dense(n, name=f"head_{name}")
            for name, n in self.search_space_sizes
        }
        self.embeds = {
            name: nn.Embed(n, self.hidden_size, name=f"embed_{name}")
            for name, n in self.search_space_sizes
        }
        self.start_token = self.param(
            "start_token", nn.initializers.normal(1.0), (1, self.hidden_size)
        )

    def __call__(self, indices: Dict[str, jax.Array]):
        """Score given choice indices: returns (sum_log_prob, sum_entropy).
        Differentiable in params — the REINFORCE surrogate."""
        carry = self.lstm.initialize_carry(jax.random.key(0), (1, self.hidden_size))
        x = self.start_token
        log_prob = 0.0
        entropy = 0.0
        for name, n in self.search_space_sizes:
            carry, out = self.lstm(carry, x)
            logits = self.heads[name](out)[0]
            logp = jax.nn.log_softmax(logits)
            p = jnp.exp(logp)
            idx = indices[name]
            log_prob = log_prob + logp[idx]
            entropy = entropy - (p * logp).sum()
            x = self.embeds[name](jnp.asarray(idx)[None])
        return log_prob, entropy

    def sample(self, rng: jax.Array) -> Dict[str, jax.Array]:
        """Autoregressive sampling in ONE forward pass (jittable)."""
        carry = self.lstm.initialize_carry(jax.random.key(0), (1, self.hidden_size))
        x = self.start_token
        indices: Dict[str, jax.Array] = {}
        for name, n in self.search_space_sizes:
            carry, out = self.lstm(carry, x)
            logits = self.heads[name](out)[0]
            rng, sub = jax.random.split(rng)
            idx = jax.random.categorical(sub, logits)
            indices[name] = idx
            x = self.embeds[name](idx[None])
        return indices


class ReinforceSearch:
    """EMA-baseline REINFORCE driver (optimization_train_process_pad_20.py:
    275-373): loss = -(reward - baseline)·logπ - β·entropy, Adam(1e-3),
    plateau-on-reward LR schedule, grad clipping."""

    def __init__(
        self,
        search_space: Dict[str, Sequence],
        hidden_size: int = 256,
        controller_lr: float = 1e-3,
        entropy_beta: float = 0.01,
        grad_clip_norm: float = 1.0,
        seed: int = 0,
    ):
        self.search_space = {k: list(v) for k, v in search_space.items()}
        sizes = tuple((k, len(v)) for k, v in self.search_space.items())
        self.model = Controller(search_space_sizes=sizes, hidden_size=hidden_size)
        self.rng = jax.random.key(seed)
        dummy = {k: jnp.asarray(0) for k, _ in sizes}
        self.params = self.model.init(jax.random.key(seed), dummy)
        self.tx = optax.chain(
            optax.clip_by_global_norm(grad_clip_norm), optax.adam(controller_lr)
        )
        self.opt_state = self.tx.init(self.params)
        self.entropy_beta = entropy_beta
        self.baseline = None
        self.best_reward = -float("inf")
        self.best_config = None
        self.history: List[Dict] = []

        self._sample_jit = jax.jit(
            lambda params, rng: self.model.apply(params, rng, method=Controller.sample)
        )
        self._update_jit = None

    def sample_config(self) -> Tuple[Dict, Dict[str, int]]:
        """Autoregressively sample one architecture config."""
        self.rng, sub = jax.random.split(self.rng)
        indices = self._sample_jit(self.params, sub)
        int_idx = {k: int(v) for k, v in indices.items()}
        return indices_to_config(int_idx, self.search_space), int_idx

    def update(self, indices: Dict[str, int], reward: float) -> Dict[str, float]:
        """One REINFORCE step on the sampled config's observed reward."""
        self.baseline = (
            reward if self.baseline is None else 0.5 * self.baseline + 0.5 * reward
        )
        advantage = reward - self.baseline
        jidx = {k: jnp.asarray(v) for k, v in indices.items()}

        if self._update_jit is None:
            def _step(params, opt_state, idx, adv):
                def loss_fn(p):
                    logp, ent = self.model.apply(p, idx)
                    return -adv * logp - self.entropy_beta * ent, (logp, ent)

                (loss, (logp, ent)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params)
                updates, new_opt = self.tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), new_opt, loss, ent

            self._update_jit = jax.jit(_step)

        self.params, self.opt_state, loss, ent = self._update_jit(
            self.params, self.opt_state, jidx, jnp.float32(advantage)
        )

        if reward > self.best_reward:
            self.best_reward = reward
            self.best_config = indices_to_config(indices, self.search_space)
        self.history.append(
            {"reward": reward, "baseline": self.baseline, "advantage": advantage,
             "entropy": float(ent), "loss": float(loss)}
        )
        return {"loss": float(loss), "entropy": float(ent),
                "baseline": float(self.baseline)}
