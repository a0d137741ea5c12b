"""Sentence generation for sentence-metadata training.

Rebuilds data_preprocessing/create-preprocessed-prompt.py:20-54 (deterministic
template sentences) and generate-sentences.py:13-58 (LLM-generated clinical
summaries). The deterministic path needs no model; the LLM path accepts any
``generate(prompt) -> str`` callable — a HF pipeline, the Ollama client
(skinjax.tools.llm_client), or anything else — so it stays offline-safe.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import pandas as pd

PROMPT_TEMPLATE = """\
- Patient ID: {patient_id}
- Age: {age} years old
- Gender: {gender}
- Lesion Location: {region}
- Lesion Size: {diameter_1} x {diameter_2} mm
- Fitspatrick: {fitspatrick}
- Family Medical History:
    - Father: {background_father}
    - Mother: {background_mother}
- Environmental Factors:
    - Has Piped Water: {has_piped_water}
    - Has Sewage System: {has_sewage_system}
    - Pesticide Exposure: {pesticide}
- Medical History:
    - Skin Cancer History: {skin_cancer_history}
    - Family Cancer History: {cancer_history}
- Lifestyle:
    - Smoker: {smoke}
    - Alcohol Consumption: {drink}
- Symptoms:
    - Itching: {itch}
    - Growth: {grew}
    - Pain: {hurt}
    - Changes in Lesion: {changed}
    - Bleeding: {bleed}
    - Elevation: {elevation}"""


def row_to_template_sentence(row: Dict) -> str:
    """Deterministic structured sentence (create-preprocessed-prompt.py:20-54)."""
    data = {k: ("N/A" if pd.isna(v) or v == "" else str(v)) for k, v in row.items()}
    class _Default(dict):
        def __missing__(self, key):
            return "N/A"

    return PROMPT_TEMPLATE.format_map(_Default(data))


def add_template_sentences(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out["sentence"] = [
        row_to_template_sentence(r._asdict() if hasattr(r, "_asdict") else dict(r))
        for _, r in df.iterrows()
    ]
    return out


def add_llm_sentences(
    df: pd.DataFrame,
    generate: Callable[[str], str],
    instruction: str = (
        "Please produce a clinical summary in the exact following format:\n\n"
    ),
    suffix: str = "\n\nDo not include any extra commentary.",
) -> pd.DataFrame:
    """LLM-generated clinical summaries (generate-sentences.py:13-58)."""
    out = df.copy()
    sentences: List[Optional[str]] = []
    for _, row in df.iterrows():
        prompt = instruction + row_to_template_sentence(dict(row)) + suffix
        try:
            sentences.append(generate(prompt))
        except Exception as e:  # keep going; failed rows fall back to template
            print(f"[sentences] generation failed ({e}); using template")
            sentences.append(row_to_template_sentence(dict(row)))
    out["sentence"] = sentences
    return out


def join_metadata_and_predictions(
    metadata: pd.DataFrame, predictions: pd.DataFrame,
    on_meta: str = "img_id", on_pred: str = "image_name",
) -> pd.DataFrame:
    """metadata ⋈ per-sample prediction CSV
    (concatenate_metadata_and_inference_prob.py:16-24)."""
    return metadata.merge(
        predictions, left_on=on_meta, right_on=on_pred, how="inner"
    )
