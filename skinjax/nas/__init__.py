"""NAS / HPO: search space, DynamicCNN, REINFORCE controller, GP Bayesian
optimization, LLM-as-controller, search + retrain drivers."""

from skinjax.nas.bayes_opt import GPSearch
from skinjax.nas.controller import Controller, ReinforceSearch
from skinjax.nas.dynamic_model import DynamicCNN, make_dynamic_model
from skinjax.nas.llm_controller import LLMSearch, build_prompt, make_config_validator
from skinjax.nas.population import PopulationTrainer, make_population_evaluator
from skinjax.nas.search import retrain_best, run_nas
from skinjax.nas.supernet import (
    Envelope,
    SuperNet,
    candidate_masks,
    embed_params,
    envelope_of,
)
from skinjax.nas.search_space import (
    DEFAULT_SEARCH_SPACE,
    config_to_indices,
    filters_from_config,
    indices_to_config,
)

__all__ = [
    "GPSearch",
    "Controller",
    "ReinforceSearch",
    "DynamicCNN",
    "make_dynamic_model",
    "LLMSearch",
    "build_prompt",
    "make_config_validator",
    "PopulationTrainer",
    "make_population_evaluator",
    "retrain_best",
    "run_nas",
    "Envelope",
    "SuperNet",
    "candidate_masks",
    "embed_params",
    "envelope_of",
    "DEFAULT_SEARCH_SPACE",
    "config_to_indices",
    "filters_from_config",
    "indices_to_config",
]
