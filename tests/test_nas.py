"""NAS tests: DynamicCNN builds per config, controller learns, BO/LLM/random
search loops run end-to-end on a cheap surrogate objective."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from skinjax.data import synthetic_source
from skinjax.nas import (
    DEFAULT_SEARCH_SPACE,
    GPSearch,
    LLMSearch,
    ReinforceSearch,
    make_config_validator,
    make_dynamic_model,
    run_nas,
)

SMALL_SPACE = {
    "num_blocks": [1, 2],
    "initial_filters": [8, 16],
    "kernel_size": [3],
    "layers_per_block": [1],
    "use_pooling": [True],
    "common_dim": [16, 32],
    "attention_mecanism": ["concatenation", "crossattention", "metablock", "gfcam"],
    "num_layers_text_fc": [1],
    "neurons_per_layer_size_of_text_fc": [32],
    "num_layers_fc_module": [1],
    "neurons_per_layer_size_of_fc_module": [32],
}


@pytest.mark.parametrize("mech", ["concatenation", "crossattention", "metablock", "gfcam"])
def test_dynamic_cnn_builds_and_runs(mech):
    cfg = {
        "num_blocks": 2, "initial_filters": 8, "kernel_size": 3,
        "layers_per_block": 1, "use_pooling": True, "common_dim": 16,
        "attention_mecanism": mech, "num_layers_text_fc": 1,
        "neurons_per_layer_size_of_text_fc": 32, "num_layers_fc_module": 1,
        "neurons_per_layer_size_of_fc_module": 32,
    }
    model = make_dynamic_model(cfg, num_classes=3, vocab_size=10)
    img = jnp.zeros((2, 32, 32, 3))
    meta = jnp.zeros((2, 10))
    variables = model.init(jax.random.key(0), img, meta)
    out = model.apply(variables, img, meta)
    assert out.shape == (2, 3)


def _surrogate_reward(config):
    """Cheap objective: prefers common_dim=32 + gfcam (a known optimum)."""
    r = 0.1
    r += 0.4 * (config["common_dim"] == 32)
    r += 0.4 * (config["attention_mecanism"] == "gfcam")
    return r


def test_reinforce_controller_improves():
    s = ReinforceSearch(SMALL_SPACE, seed=0, controller_lr=2e-2, entropy_beta=0.05)
    rewards = []
    for _ in range(200):
        cfg, idx = s.sample_config()
        r = _surrogate_reward(cfg)
        s.update(idx, r)
        rewards.append(r)
    assert s.best_reward >= 0.9  # found the (common_dim=32, gfcam) optimum
    assert np.mean(rewards[-40:]) > np.mean(rewards[:40])  # policy improved


def test_gp_search_finds_optimum():
    s = GPSearch(SMALL_SPACE, seed=1, n_initial=6)
    for _ in range(30):
        cfg, idx = s.propose()
        s.observe(idx, _surrogate_reward(cfg))
    best_cfg, best_r = s.best
    assert best_r >= 0.9


def test_llm_validator():
    v = make_config_validator(SMALL_SPACE)
    good = {k: c[0] for k, c in SMALL_SPACE.items()}
    assert v(good) == good
    # stringified values tolerated
    good2 = dict(good, common_dim="16")
    assert v(good2)["common_dim"] == 16
    assert v({"common_dim": 999}) is None
    assert v(dict(good, attention_mecanism="bogus")) is None


def test_llm_search_falls_back_to_random_without_server():
    s = LLMSearch(SMALL_SPACE, model_name="qwen2.5", url="http://127.0.0.1:1/x",
                  max_retries=1)
    cfg = s.propose()  # no server -> random fallback
    assert set(cfg) == set(SMALL_SPACE)


def test_run_nas_end_to_end_random(tmp_path):
    src = synthetic_source(n=60, image_size=(16, 16), feature_dim=10, num_classes=3)
    from skinjax.train.loop import TrainConfig

    best_cfg, best_r, log = run_nas(
        src, num_classes=3, strategy="random", search_steps=2,
        search_space=SMALL_SPACE,
        train_cfg=TrainConfig(num_epochs=1, batch_size=16, image_dtype="float32",
                              augment=False),
        results_dir=str(tmp_path),
    )
    assert (tmp_path / "best_config.json").exists()
    assert len(log) == 2 and best_r > 0
