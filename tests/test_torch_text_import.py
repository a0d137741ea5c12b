"""torch HF text-encoder checkpoints -> native towers.

The reference's sentence models save the HF torch BERT/GPT-2 module at
``self.text_encoder`` (multimodalIntraInterModal.py:66,
loadImageModelClassifier.py:170-186), so a trained reference checkpoint
carries torch-layout text weights. ``import_torch_bert`` /
``import_torch_gpt2`` map them onto the native encoders' HF-Flax-identical
trees. Two oracles per family:

* output parity: the native encoder with imported weights reproduces the
  torch module's last_hidden_state on masked inputs;
* mapping parity: the imported tree numerically equals what transformers'
  own torch->flax converter (``from_pt=True``) produces — an oracle we did
  not write.

Plus the full-checkpoint path: a synthetic reference sentence-model
state_dict routes through ``import_multimodal_checkpoint`` into a
tokens-mode MultimodalModel tree.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

transformers = pytest.importorskip("transformers")


def _np_sd(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def _assert_tree_allclose(a, b, atol=1e-6):
    flat_a = jax.tree_util.tree_leaves_with_path(a)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_b[path]), atol=atol,
            err_msg=str(path))


def test_torch_bert_import_matches_torch_and_flax(tmp_path):
    import torch
    from transformers import BertConfig, BertModel, FlaxBertModel

    from skinjax.models.text.bert import (
        NativeBertEncoder,
        config_from_hf,
        import_hf_bert_params,
    )
    from skinjax.models.torch_import import import_torch_bert

    cfg = BertConfig(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     vocab_size=97, max_position_embeddings=48,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    tm = BertModel(cfg).eval()

    params = import_torch_bert(_np_sd(tm))

    # oracle 1: transformers' own torch->flax conversion
    d = str(tmp_path / "bert")
    tm.save_pretrained(d)
    fm = FlaxBertModel.from_pretrained(d, from_pt=True)
    _assert_tree_allclose(params, import_hf_bert_params(fm.params))

    # oracle 2: output parity vs the torch module
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 97, (3, 11)).astype(np.int32)
    mask = np.ones((3, 11), np.int32)
    mask[1, 6:] = 0
    enc = NativeBertEncoder(**config_from_hf(cfg))
    ours = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_torch_gpt2_import_matches_torch_and_flax(tmp_path):
    import torch
    from transformers import FlaxGPT2Model, GPT2Config, GPT2Model

    from skinjax.models.text.gpt2 import (
        NativeGPT2Encoder,
        config_from_hf_gpt2,
        import_hf_gpt2_params,
    )
    from skinjax.models.torch_import import import_torch_gpt2

    cfg = GPT2Config(n_embd=32, n_layer=2, n_head=2, vocab_size=83,
                     n_positions=48, embd_pdrop=0.0, resid_pdrop=0.0,
                     attn_pdrop=0.0)
    torch.manual_seed(1)
    tm = GPT2Model(cfg).eval()

    params = import_torch_gpt2(_np_sd(tm))

    d = str(tmp_path / "gpt2")
    tm.save_pretrained(d)
    fm = FlaxGPT2Model.from_pretrained(d, from_pt=True)
    _assert_tree_allclose(params, import_hf_gpt2_params(fm.params))

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 83, (3, 9)).astype(np.int32)
    mask = np.ones((3, 9), np.int32)
    mask[2, 5:] = 0
    enc = NativeGPT2Encoder(**config_from_hf_gpt2(cfg))
    ours = enc.apply({"params": params}, jnp.asarray(ids), jnp.asarray(mask))
    with torch.no_grad():
        ref = tm(input_ids=torch.tensor(ids, dtype=torch.long),
                 attention_mask=torch.tensor(mask, dtype=torch.long)
                 ).last_hidden_state.numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_full_sentence_checkpoint_import_matches_template():
    """A reference sentence-model checkpoint (resnet-18 backbone +
    text_encoder BERT + heads) imports into the tokens-mode MultimodalModel
    tree key-for-key (eval_shape — no FLOPs)."""
    import torch
    from transformers import BertConfig, BertModel

    from skinjax.models import MultimodalModel
    from skinjax.models.text.bert import (
        NativeBertEncoder,
        NativeSentenceTower,
        config_from_hf,
    )
    from skinjax.models.torch_import import (
        filter_to_template,
        import_multimodal_checkpoint,
    )
    from tests.test_full_model_parity import TorchMM, _torch_state_dict
    from tests.test_state_dict_manifests import _tree_shapes

    # reference-side: image half + heads from the existing full-model
    # oracle, text half a real torch BertModel under 'text_encoder.'
    tm = TorchMM("concatenation").eval()
    sd = dict(_torch_state_dict(tm))
    for k in [k for k in sd if k.startswith("text_fc.")]:
        del sd[k]
    cfg = BertConfig(hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     vocab_size=97, max_position_embeddings=48)
    torch.manual_seed(2)
    bert = BertModel(cfg)
    sd.update({f"text_encoder.{k}": v.detach().numpy()
               for k, v in bert.state_dict().items()})
    # text_projector must map hidden_size -> common_dim for tokens models
    sd["text_projector.weight"] = np.zeros((32, 32), np.float32)
    sd["text_projector.bias"] = np.zeros((32,), np.float32)

    tower = NativeSentenceTower(encoder=NativeBertEncoder(
        **config_from_hf(cfg)))
    model = MultimodalModel(
        num_classes=6, num_heads=4, cnn_model_name="resnet-18",
        text_model_name="bert-base-uncased", text_module=tower,
        text_input_mode="tokens", text_encoder_dim_output=32,
        common_dim=32, attention_mechanism="concatenation",
    )
    img = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
    md = {"input_ids": jax.ShapeDtypeStruct((1, 11), jnp.int32),
          "attention_mask": jax.ShapeDtypeStruct((1, 11), jnp.int32)}
    variables = jax.eval_shape(model.init, jax.random.key(0), img, md)

    params, stats = import_multimodal_checkpoint(
        sd, common_dim=32, backbone="resnet-18")
    params = filter_to_template(params, dict(variables["params"]))
    assert (_tree_shapes(params)
            == _tree_shapes(dict(variables["params"])))
    assert "bert" in params["text_module"]


def test_migrate_cli_sentence_model(tmp_path):
    """migrate_cli --text-model bert-base-uncased migrates a reference
    sentence-model checkpoint (BERT-base text_encoder) end-to-end."""
    import torch
    from transformers import BertConfig, BertModel

    from tests.test_full_model_parity import TorchMM, _torch_state_dict

    tm = TorchMM("concatenation").eval()
    sd = {k: torch.tensor(v) for k, v in _torch_state_dict(tm).items()
          if not k.startswith("text_fc.")}
    bert = BertModel(BertConfig())  # bert-base shapes
    sd.update({f"text_encoder.{k}": v
               for k, v in bert.state_dict().items()})
    sd["text_projector.weight"] = torch.zeros((32, 768))
    sd["text_projector.bias"] = torch.zeros((32,))
    pth = str(tmp_path / "sentence_model.pth")
    torch.save(sd, pth)

    out = str(tmp_path / "migrated")
    from skinjax.tools.migrate_cli import main

    main([
        "--state-dict", pth, "--backbone", "resnet-18", "--common-dim", "32",
        "--mechanism", "concatenation", "--num-heads", "4",
        "--num-classes", "6", "--text-model", "bert-base-uncased",
        "--max-seq-length", "64", "--image-size", "64",
        "--out", out,
    ])
    import json as _json
    import os as _os
    with open(_os.path.join(out, "model_config.json")) as f:
        cfg = _json.load(f)
    assert cfg["text_model"] == "bert-base-uncased"
    assert _os.path.isdir(_os.path.join(out, "params"))

    # the migrated text tower carries the torch BERT weights
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        params = ckptr.restore(_os.path.abspath(_os.path.join(out, "params")))
    emb = params["text_module"]["bert"]["embeddings"]["word_embeddings"][
        "embedding"]
    np.testing.assert_allclose(
        np.asarray(emb),
        bert.state_dict()["embeddings.word_embeddings.weight"].numpy(),
        atol=1e-6)
