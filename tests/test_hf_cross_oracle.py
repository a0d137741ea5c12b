"""Cross-oracle parity vs transformers' OWN ViT/BEiT/Swin implementations.

Every other parity test in this repo checks skinjax against torch oracles
the builder wrote. These use third-party implementations nobody in this
repo authored (HF transformers, installed in the container): a tiny
config-matched random-init HF torch model's state dict is renamed to the
timm layout, fed through the EXISTING skinjax importers
(models/torch_import.py import_vit/import_beit/import_swin — so the full
production import path is on trial too), and the outputs are asserted
equal. Validates from a second source both the hand-written torch oracles
and the vit/beit/swin manifests (r3 verdict Missing #1 / Weak #5).

Reference load path being mirrored: loadImageModelClassifier.py:115-150
(timm create_model + reset_classifier(0)).
"""

import numpy as np
import pytest
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from skinjax.models.backbones.beit import Beit
from skinjax.models.backbones.transformer_zoo import Swin
from skinjax.models.backbones.vit import ViT
from skinjax.models.torch_import import import_beit, import_swin, import_vit


def _np(sd):
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _cat(sd, keys, axis=0):
    return np.concatenate([sd[k] for k in keys], axis=axis)


# ---------------------------------------------------------------------------
# ViT


def _hf_vit_to_timm(sd):
    """HF ViTModel state dict -> timm vit_* naming (what import_vit eats)."""
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "pos_embed": sd["embeddings.position_embeddings"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    i = 0
    while f"encoder.layer.{i}.layernorm_before.weight" in sd:
        h = f"encoder.layer.{i}"
        b = f"blocks.{i}"
        a = f"{h}.attention.attention"
        out[f"{b}.attn.qkv.weight"] = _cat(
            sd, [f"{a}.query.weight", f"{a}.key.weight", f"{a}.value.weight"])
        out[f"{b}.attn.qkv.bias"] = _cat(
            sd, [f"{a}.query.bias", f"{a}.key.bias", f"{a}.value.bias"])
        for dst, src in [
            (f"{b}.norm1", f"{h}.layernorm_before"),
            (f"{b}.norm2", f"{h}.layernorm_after"),
            (f"{b}.attn.proj", f"{h}.attention.output.dense"),
            (f"{b}.mlp.fc1", f"{h}.intermediate.dense"),
            (f"{b}.mlp.fc2", f"{h}.output.dense"),
        ]:
            out[f"{dst}.weight"] = sd[f"{src}.weight"]
            out[f"{dst}.bias"] = sd[f"{src}.bias"]
        i += 1
    return out


def test_vit_matches_transformers_vitmodel():
    from transformers import ViTConfig, ViTModel

    cfg = ViTConfig(hidden_size=64, num_hidden_layers=2,
                    num_attention_heads=4, intermediate_size=256,
                    image_size=32, patch_size=8, layer_norm_eps=1e-6,
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = ViTModel(cfg, add_pooling_layer=False).eval()

    params = import_vit(_hf_vit_to_timm(_np(hf.state_dict())),
                        depth=2, dim=64)
    model = ViT(dim=64, depth=2, num_heads=4, patch=8)

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(x.transpose(0, 3, 1, 2))
                  ).last_hidden_state.numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                 tokens=True))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)
    # CLS read-out (the backbone-registry output) too
    np.testing.assert_allclose(
        np.asarray(model.apply({"params": params}, jnp.asarray(x))),
        want[:, 0], atol=3e-5, rtol=3e-5)


# ---------------------------------------------------------------------------
# BEiT


def _hf_beit_to_timm(sd):
    """HF BeitModel state dict -> timm beit naming (what import_beit eats)."""
    out = {
        "cls_token": sd["embeddings.cls_token"],
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "fc_norm.weight": sd["pooler.layernorm.weight"],
        "fc_norm.bias": sd["pooler.layernorm.bias"],
    }
    i = 0
    while f"encoder.layer.{i}.layernorm_before.weight" in sd:
        h = f"encoder.layer.{i}"
        b = f"blocks.{i}"
        a = f"{h}.attention.attention"
        # HF: separate q/k/v, key WITHOUT bias — exactly timm's q/v-only
        out[f"{b}.attn.qkv.weight"] = _cat(
            sd, [f"{a}.query.weight", f"{a}.key.weight", f"{a}.value.weight"])
        out[f"{b}.attn.q_bias"] = sd[f"{a}.query.bias"]
        out[f"{b}.attn.v_bias"] = sd[f"{a}.value.bias"]
        out[f"{b}.attn.relative_position_bias_table"] = sd[
            f"{a}.relative_position_bias.relative_position_bias_table"]
        out[f"{b}.gamma_1"] = sd[f"{h}.lambda_1"]
        out[f"{b}.gamma_2"] = sd[f"{h}.lambda_2"]
        for dst, src in [
            (f"{b}.norm1", f"{h}.layernorm_before"),
            (f"{b}.norm2", f"{h}.layernorm_after"),
            (f"{b}.attn.proj", f"{h}.attention.output.dense"),
            (f"{b}.mlp.fc1", f"{h}.intermediate.dense"),
            (f"{b}.mlp.fc2", f"{h}.output.dense"),
        ]:
            out[f"{dst}.weight"] = sd[f"{src}.weight"]
            out[f"{dst}.bias"] = sd[f"{src}.bias"]
        i += 1
    return out


def test_beit_matches_transformers_beitmodel():
    from transformers import BeitConfig, BeitModel

    cfg = BeitConfig(hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=256,
                     image_size=32, patch_size=8,
                     use_relative_position_bias=True,
                     use_shared_relative_position_bias=False,
                     use_mean_pooling=True, layer_scale_init_value=0.1,
                     layer_norm_eps=1e-6, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0, drop_path_rate=0.0)
    torch.manual_seed(1)
    hf = BeitModel(cfg, add_pooling_layer=True).eval()

    params = import_beit(_hf_beit_to_timm(_np(hf.state_dict())), depth=2)
    model = Beit(dim=64, depth=2, num_heads=4, patch=8)

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    # skinjax Beit output == HF pooler (LayerNorm over mean patch tokens;
    # use_mean_pooling makes HF's final `layernorm` an Identity, matching
    # timm's reset_classifier(0) fc_norm head)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, out.pooler_output.numpy(),
                               atol=3e-5, rtol=3e-5)
    # full token sequence (pre-pool) as well
    got_t = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                   tokens=True))
    np.testing.assert_allclose(got_t, out.last_hidden_state.numpy(),
                               atol=3e-5, rtol=3e-5)


# ---------------------------------------------------------------------------
# Swin


def _hf_swin_to_timm(sd, depths):
    """HF SwinModel state dict -> timm swin naming (what import_swin eats)."""
    out = {
        "patch_embed.proj.weight":
            sd["embeddings.patch_embeddings.projection.weight"],
        "patch_embed.proj.bias":
            sd["embeddings.patch_embeddings.projection.bias"],
        "patch_embed.norm.weight": sd["embeddings.norm.weight"],
        "patch_embed.norm.bias": sd["embeddings.norm.bias"],
        "norm.weight": sd["layernorm.weight"],
        "norm.bias": sd["layernorm.bias"],
    }
    for si, depth in enumerate(depths):
        for bi in range(depth):
            h = f"encoder.layers.{si}.blocks.{bi}"
            b = f"layers.{si}.blocks.{bi}"
            a = f"{h}.attention.self"
            out[f"{b}.attn.qkv.weight"] = _cat(
                sd, [f"{a}.query.weight", f"{a}.key.weight",
                     f"{a}.value.weight"])
            out[f"{b}.attn.qkv.bias"] = _cat(
                sd, [f"{a}.query.bias", f"{a}.key.bias", f"{a}.value.bias"])
            out[f"{b}.attn.relative_position_bias_table"] = sd[
                f"{a}.relative_position_bias_table"]
            for dst, src in [
                (f"{b}.norm1", f"{h}.layernorm_before"),
                (f"{b}.norm2", f"{h}.layernorm_after"),
                (f"{b}.attn.proj", f"{h}.attention.output.dense"),
                (f"{b}.mlp.fc1", f"{h}.intermediate.dense"),
                (f"{b}.mlp.fc2", f"{h}.output.dense"),
            ]:
                out[f"{dst}.weight"] = sd[f"{src}.weight"]
                out[f"{dst}.bias"] = sd[f"{src}.bias"]
        ds = f"encoder.layers.{si}.downsample"
        if f"{ds}.reduction.weight" in sd:
            out[f"layers.{si}.downsample.reduction.weight"] = sd[
                f"{ds}.reduction.weight"]
            out[f"layers.{si}.downsample.norm.weight"] = sd[f"{ds}.norm.weight"]
            out[f"layers.{si}.downsample.norm.bias"] = sd[f"{ds}.norm.bias"]
    return out


def test_swin_matches_transformers_swinmodel():
    from transformers import SwinConfig, SwinModel

    depths = (2, 2)
    cfg = SwinConfig(embed_dim=48, depths=list(depths), num_heads=[3, 6],
                     window_size=4, image_size=64, patch_size=4,
                     drop_path_rate=0.0, hidden_dropout_prob=0.0,
                     attention_probs_dropout_prob=0.0)
    torch.manual_seed(2)
    hf = SwinModel(cfg, add_pooling_layer=True).eval()

    params = import_swin(_hf_swin_to_timm(_np(hf.state_dict()), depths),
                         dims=(48, 96), depths=depths)
    model = Swin(dims=(48, 96), depths=depths, heads=(3, 6), window=4)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    B = got.shape[0]
    got_tokens = got.reshape(B, -1, got.shape[-1])  # row-major == HF order
    np.testing.assert_allclose(got_tokens, out.last_hidden_state.numpy(),
                               atol=3e-5, rtol=3e-5)
    np.testing.assert_allclose(got_tokens.mean(axis=1),
                               out.pooler_output.numpy(),
                               atol=3e-5, rtol=3e-5)
