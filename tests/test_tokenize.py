"""Native tokenizer parity vs transformers oracles built from the same
fixture vocab files (no network): BERT WordPiece and GPT-2 byte-level BPE,
including the reference's padding/truncation/pad=eos contract
(skinLesionDatasetsWithBert.py:30-78)."""

import json
import os

import numpy as np
import pytest

from skinjax.data.tokenize import (
    ByteLevelBPETokenizer,
    WordPieceTokenizer,
    load_tokenizer,
    tokenize_sentences,
)

SENTENCES = [
    "The patient, a 55-year-old male, presents a lesion on the left arm.",
    "Smoker: no. Drinks alcohol: yes. Fitzpatrick skin type III.",
    "História de câncer de pele na família — região: BRAZIL.",
    "Itches and bleeds; diameter 8mm, evolution over 2 years!",
    "",
    "EMPTY",
    "word " * 400,  # forces truncation at max_length
]


# ---------------------------------------------------------------------------
# BERT WordPiece
# ---------------------------------------------------------------------------

def _bert_vocab(tmp_path):
    specials = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
    words = [
        "the", "patient", "a", "55", "year", "old", "male", "presents",
        "lesion", "##s", "on", "left", "arm", "smoke", "##r", "no", "drink",
        "alcohol", "yes", "fitz", "##pat", "##rick", "skin", "type", "iii",
        "historia", "de", "cancer", "pele", "na", "familia", "regiao",
        "brazil", "itch", "##es", "and", "bleed", "diameter", "8mm",
        "evolution", "over", "2", "years", "word", "empty", ",", ".", ":",
        ";", "-", "!", "—",
    ]
    path = os.path.join(tmp_path, "vocab.txt")
    with open(path, "w", encoding="utf-8") as f:
        f.write("\n".join(specials + words))
    return path


@pytest.mark.parametrize("max_length", [16, 64, 256])
def test_wordpiece_matches_hf(tmp_path, max_length):
    from transformers import BertTokenizer

    vf = _bert_vocab(str(tmp_path))
    ours = WordPieceTokenizer.from_vocab_file(vf)
    oracle = BertTokenizer(vf)
    want = oracle(
        list(SENTENCES), padding="max_length", truncation=True,
        max_length=max_length,
    )
    got = ours.encode_batch(SENTENCES, max_length=max_length)
    np.testing.assert_array_equal(got["input_ids"],
                                  np.asarray(want["input_ids"], np.int32))
    np.testing.assert_array_equal(got["attention_mask"],
                                  np.asarray(want["attention_mask"], np.int32))


def test_wordpiece_tokens_match_hf(tmp_path):
    from transformers import BertTokenizer

    vf = _bert_vocab(str(tmp_path))
    ours = WordPieceTokenizer.from_vocab_file(vf)
    oracle = BertTokenizer(vf)
    for s in SENTENCES:
        assert ours.tokenize(s) == oracle.tokenize(s), s


# ---------------------------------------------------------------------------
# GPT-2 byte-level BPE
# ---------------------------------------------------------------------------

def _gpt2_files(tmp_path):
    from transformers.models.gpt2.tokenization_gpt2 import bytes_to_unicode

    alphabet = list(bytes_to_unicode().values())
    merges = [
        ("Ġ", "t"), ("Ġ", "a"), ("h", "e"), ("i", "n"), ("r", "e"),
        ("o", "n"), ("Ġt", "he"), ("e", "s"), ("Ġ", "p"), ("a", "t"),
        ("i", "e"), ("n", "t"), ("Ġp", "at"), ("Ġpat", "ie"), ("Ġpatie", "nt"),
        ("l", "es"), ("Ġ", "les"), ("Ġles", "i"), ("Ġlesi", "on"),
        ("5", "5"), ("y", "e"), ("a", "r"), ("ye", "ar"), ("Ġ", "ye"),
        ("s", "k"), ("sk", "in"), ("Ġ", "sk"), ("Ġsk", "in"),
        ("w", "o"), ("r", "d"), ("wo", "rd"), ("Ġ", "wo"), ("Ġwo", "rd"),
    ]
    vocab_list = alphabet + ["".join(m) for m in merges] + ["<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(dict.fromkeys(vocab_list))}
    vf = os.path.join(tmp_path, "vocab.json")
    mf = os.path.join(tmp_path, "merges.txt")
    with open(vf, "w", encoding="utf-8") as f:
        json.dump(vocab, f)
    with open(mf, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(f"{a} {b}" for a, b in merges))
    return vf, mf


@pytest.mark.parametrize("max_length", [16, 64, 256])
def test_gpt2_bpe_matches_hf(tmp_path, max_length):
    from transformers import GPT2Tokenizer

    vf, mf = _gpt2_files(str(tmp_path))
    ours = ByteLevelBPETokenizer.from_files(vf, mf)
    oracle = GPT2Tokenizer(vf, mf)
    # the reference's GPT-2 contract: pad with eos, right side
    oracle.pad_token = oracle.eos_token
    oracle.padding_side = "right"
    texts = [s for s in SENTENCES if s]  # HF GPT2 pads empty to all-eos too,
    texts.append("the patient skin 55year lesion word")
    want = oracle(texts, padding="max_length", truncation=True,
                  max_length=max_length)
    got = ours.encode_batch(texts, max_length=max_length)
    np.testing.assert_array_equal(got["input_ids"],
                                  np.asarray(want["input_ids"], np.int32))
    np.testing.assert_array_equal(got["attention_mask"],
                                  np.asarray(want["attention_mask"], np.int32))
    assert ours.pad_id == oracle.eos_token_id


# ---------------------------------------------------------------------------
# loader + TokenSource glue
# ---------------------------------------------------------------------------

def test_load_tokenizer_and_token_source(tmp_path):
    vf = _bert_vocab(str(tmp_path))
    d = os.path.join(str(tmp_path), "bert-base-uncased")
    os.makedirs(d)
    os.replace(vf, os.path.join(d, "vocab.txt"))
    os.environ["SKINJAX_TOKENIZERS"] = str(tmp_path)
    try:
        tok = load_tokenizer("bert-base-uncased")
    finally:
        del os.environ["SKINJAX_TOKENIZERS"]
    enc = tokenize_sentences(SENTENCES[:4], tok, max_length=32)
    assert enc["input_ids"].shape == (4, 32)
    assert enc["input_ids"].dtype == np.int32

    from skinjax.data.pipeline import TokenSource

    images = np.zeros((4, 8, 8, 3), np.uint8)
    labels = np.arange(4)
    src = TokenSource(images, None, enc["input_ids"], enc["attention_mask"],
                      labels)
    b = src.batch(np.array([0, 2]))
    assert b["metadata"]["input_ids"].shape == (2, 32)
