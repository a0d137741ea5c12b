"""Full-checkpoint import across ALL backbone families.

``import_multimodal_checkpoint`` used to route only the resnet backbones;
the other 13 families had standalone importers but no path from a saved
reference MultimodalModel checkpoint (multimodalIntraInterModal.py stores
the raw timm/torchvision model at ``self.image_encoder``, line 49) into a
skinjax model — i.e. ``migrate_cli`` could not migrate a davit/swin/...
checkpoint. These tests pin the new ``import_backbone`` dispatch: for every
registry family, a synthetic full-size reference checkpoint (backbone keys
from the published-artifact manifests in tests/manifest_fixtures.py, head
keys shaped per multimodalIntraInterModal.py:54-158) imports into a tree
that matches ``MultimodalModel.init`` key-for-key and shape-for-shape
(``jax.eval_shape`` — no FLOPs).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_state_dict_manifests import (
    FAMILIES,
    _template_shapes,
    _tree_shapes,
)

COMMON_DIM = 512
VOCAB = 91
NUM_CLASSES = 6


def _zeros(shape):
    return np.zeros(shape, np.float32)


def _put_linear(sd, tname, flax_sub):
    # torch Linear stores (out, in) = kernel.T (t2f_linear)
    sd[f"{tname}.weight"] = _zeros(tuple(flax_sub["kernel"].shape)[::-1])
    sd[f"{tname}.bias"] = _zeros(tuple(flax_sub["bias"].shape))


def _put_ln(sd, tname, flax_sub):
    sd[f"{tname}.weight"] = _zeros(tuple(flax_sub["scale"].shape))
    sd[f"{tname}.bias"] = _zeros(tuple(flax_sub["bias"].shape))


def _head_sd(template_params):
    """Reference head keys (multimodalIntraInterModal.py: image_projector,
    text_projector, text_fc Sequential 0/2/4, fc_fusion Sequential
    0/1/4/5/8) shaped off the skinjax init template."""
    sd = {}
    _put_linear(sd, "image_projector", template_params["image_projector"])
    _put_linear(sd, "text_projector", template_params["text_projector"])
    tower = template_params["text_tower"]
    for flax_name, torch_idx in (("fc0", 0), ("fc1", 2), ("fc2", 4)):
        _put_linear(sd, f"text_fc.{torch_idx}", tower[flax_name])
    fusion = template_params["fc_fusion"]
    _put_linear(sd, "fc_fusion.0", fusion["fc1"])
    _put_ln(sd, "fc_fusion.1", fusion["norm1"])
    _put_linear(sd, "fc_fusion.4", fusion["fc2"])
    _put_ln(sd, "fc_fusion.5", fusion["norm2"])
    _put_linear(sd, "fc_fusion.8", fusion["fc_out"])
    return sd


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_full_checkpoint_import_matches_template(family):
    from skinjax.models import MultimodalModel
    from skinjax.models.torch_import import (
        filter_to_template,
        import_multimodal_checkpoint,
    )

    manifest_fn, _importer, registry_name = FAMILIES[family]
    manifest, _unconsumed = manifest_fn()

    model = MultimodalModel(
        num_classes=NUM_CLASSES, num_heads=4, cnn_model_name=registry_name,
        text_model_name="one-hot-encoder", common_dim=COMMON_DIM,
        vocab_size=VOCAB, attention_mechanism="concatenation",
    )
    img = jax.ShapeDtypeStruct((1, 224, 224, 3), jnp.float32)
    meta = jax.ShapeDtypeStruct((1, VOCAB), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.key(0), img, meta)
    tpl_params = dict(variables["params"])
    tpl_stats = dict(variables.get("batch_stats", {}))

    sd = {f"image_encoder.{k}": _zeros(shape) for k, shape in manifest.items()}
    sd.update(_head_sd(tpl_params))

    params, stats = import_multimodal_checkpoint(
        sd, common_dim=COMMON_DIM, backbone=registry_name)
    params = filter_to_template(params, tpl_params)
    stats = filter_to_template(stats, tpl_stats)

    got_p = _tree_shapes(params)
    want_p = _tree_shapes(jax.tree_util.tree_map(lambda s: s, tpl_params))
    assert got_p == want_p, (
        f"{family}: full-checkpoint import != init template\n"
        f"  only-imported: {sorted(set(got_p) - set(want_p))[:8]}\n"
        f"  only-template: {sorted(set(want_p) - set(got_p))[:8]}\n"
        f"  shape-mismatch: "
        f"{[(k, got_p[k], want_p[k]) for k in sorted(set(got_p) & set(want_p)) if got_p[k] != want_p[k]][:8]}")

    got_s = _tree_shapes(stats)
    want_s = _tree_shapes(tpl_stats)
    assert got_s == want_s, (
        f"{family}: batch_stats mismatch\n"
        f"  only-imported: {sorted(set(got_s) - set(want_s))[:8]}\n"
        f"  only-template: {sorted(set(want_s) - set(got_s))[:8]}")


def test_import_backbone_unknown_family_raises():
    from skinjax.models.torch_import import import_backbone

    with pytest.raises(NotImplementedError):
        import_backbone({}, "not-a-backbone")
