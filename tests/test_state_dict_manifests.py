"""Importers vs the published artifact layout (VERDICT r2 missing #2).

Every oracle-parity test builds its torch model from the same mental model
the importer encodes, so a shared misconception about the real
timm/torchvision state_dict layout would pass silently. These tests close
that hole without egress: ``tests/manifest_fixtures.py`` holds the KEY+SHAPE
manifests of the published checkpoints (written from public metadata,
importing nothing from skinjax), and each test asserts the importer
consumes EXACTLY ``manifest - unconsumed``:

* every key the importer reads exists in the manifest (a read of a key the
  artifact doesn't have raises KeyError here),
* no manifest key outside the documented ``unconsumed`` set is left unread
  (a silently-dropped weight fails the set equality),
* the imported tree's array shapes equal the flax module's init template
  (``jax.eval_shape`` — no FLOPs), so the transposes/reshapes in the
  importer map each artifact tensor onto a parameter of the right shape.

Reference: loadImageModelClassifier.py:78-150 (generic backbone loading with
reset_classifier(0) / classifier[-1] stripping).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests import manifest_fixtures as mf


class TrackingDict(dict):
    """state_dict stand-in that records which keys are READ (``in`` checks
    and .keys() iteration deliberately don't count as consumption)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.reads = set()

    def __getitem__(self, key):
        self.reads.add(key)
        return super().__getitem__(key)

    def get(self, key, default=None):
        if super().__contains__(key):
            self.reads.add(key)
        return super().get(key, default)


def _materialize(manifest):
    sd = TrackingDict()
    for key, shape in manifest.items():
        sd[key] = np.zeros(shape, np.float32)
    sd.reads.clear()
    return sd


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_tree_shapes(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = tuple(v.shape)
    return out


def _assert_exact_consumption(sd, manifest, unconsumed, family):
    expect = set(manifest) - set(unconsumed)
    missing = expect - sd.reads
    extra = sd.reads - expect
    assert not missing and not extra, (
        f"{family}: importer consumption != artifact manifest\n"
        f"  unread artifact keys: {sorted(missing)[:10]}"
        f"{' …' if len(missing) > 10 else ''}\n"
        f"  reads outside manifest-unconsumed: {sorted(extra)[:10]}")
    assert set(unconsumed) <= set(manifest)


def _template_shapes(module, *example_inputs):
    structs = [jax.ShapeDtypeStruct(x.shape, x.dtype) for x in example_inputs]
    variables = jax.eval_shape(module.init, jax.random.key(0), *structs)
    return {coll: _tree_shapes(dict(tree))
            for coll, tree in variables.items()}


def _assert_template_match(imported, template, family):
    got = _tree_shapes(imported)
    assert got == template, (
        f"{family}: imported tree != init template\n"
        f"  only-imported: "
        f"{sorted(set(got) - set(template))[:8]}\n"
        f"  only-template: "
        f"{sorted(set(template) - set(got))[:8]}\n"
        f"  shape-mismatch: "
        f"{[(k, got[k], template[k]) for k in sorted(set(got) & set(template)) if got[k] != template[k]][:8]}")


IMG = np.zeros((1, 224, 224, 3), np.float32)


def _backbone_template(name):
    from skinjax.models.backbones import create_backbone

    module, _ = create_backbone(name)
    return _template_shapes(module, IMG)


# family id -> (manifest(), importer(sd) -> params | (params, stats),
#               registry name for the init template)
FAMILIES = {}


def _family(fid, manifest_fn, importer_fn, registry_name):
    FAMILIES[fid] = (manifest_fn, importer_fn, registry_name)


def _build_families():
    from skinjax.models import torch_import as ti

    _family("resnet-18", lambda: mf.manifest_resnet(18),
            lambda sd: ti.import_resnet(sd, (2, 2, 2, 2), "basic"),
            "resnet-18")
    _family("resnet-50", lambda: mf.manifest_resnet(50),
            lambda sd: ti.import_resnet(sd), "resnet-50")
    _family("vgg16", mf.manifest_vgg16,
            lambda sd: ti.import_vgg16(sd), "vgg16")
    _family("densenet169", mf.manifest_densenet169,
            lambda sd: ti.import_densenet(sd), "densenet169")
    _family("mobilenet-v2", mf.manifest_mobilenet_v2,
            lambda sd: ti.import_mobilenet_v2(sd), "mobilenet-v2")
    _family("efficientnet-b0", mf.manifest_efficientnet,
            lambda sd: ti.import_efficientnet(sd), "efficientnet-b0")
    _family("efficientnet-b7", lambda: mf.manifest_efficientnet(2.0, 3.1),
            lambda sd: ti.import_efficientnet(sd, depth=3.1),
            "efficientnet-b7")
    _family("swin_tiny", mf.manifest_swin_tiny,
            lambda sd: ti.import_swin(sd), "swin_tiny_patch4_window7_224")
    _family("davit_tiny", mf.manifest_davit_tiny,
            lambda sd: ti.import_davit(sd), "davit_tiny")
    _family("caformer_s18", mf.manifest_caformer,
            lambda sd: ti.import_caformer(sd), "caformer_s18")
    _family("caformer_b36",
            lambda: mf.manifest_caformer((128, 256, 512, 768), (3, 12, 18, 3)),
            lambda sd: ti.import_caformer(sd, (3, 12, 18, 3)),
            "caformer_b36")
    _family("mvitv2_small", mf.manifest_mvitv2_small,
            lambda sd: ti.import_mvit(sd, (1, 2, 11, 2)), "mvitv2_small")
    _family("nextvit_small", mf.manifest_nextvit_small,
            lambda sd: ti.import_nextvit(sd), "nextvit_small")
    _family("coat_lite_small", mf.manifest_coat_lite_small,
            lambda sd: ti.import_coat(sd, (3, 4, 6, 3), n_windows=3),
            "coat_lite_small")
    _family("beitv2_large", mf.manifest_beitv2_large,
            lambda sd: ti.import_beit(sd, 24), "beitv2_large_patch16_224")
    _family("vit_large", mf.manifest_vit_large,
            lambda sd: ti.import_vit(sd, depth=24, dim=1024),
            "vit_large_patch16_224")


_build_families()


@pytest.mark.parametrize("family", sorted(FAMILIES))
def test_importer_consumes_exact_manifest(family):
    manifest_fn, importer_fn, registry_name = FAMILIES[family]
    manifest, unconsumed = manifest_fn()
    sd = _materialize(manifest)
    imported = importer_fn(sd)
    _assert_exact_consumption(sd, manifest, unconsumed, family)

    template = _backbone_template(registry_name)
    if isinstance(imported, tuple):
        params, stats = imported
        _assert_template_match(params, template["params"], family)
        _assert_template_match(stats, template.get("batch_stats", {}),
                               f"{family} (batch_stats)")
    else:
        _assert_template_match(imported, template["params"], family)


def test_mdnet_importer_consumes_exact_manifest():
    """MDNet checkpoint (multimodalMDNet.py:59-102): full consumption incl.
    the classifier (the reference loads the whole model, not a backbone)."""
    from skinjax.models.baselines import MDNet
    from skinjax.models.torch_import import import_mdnet

    manifest, unconsumed = mf.manifest_mdnet()
    sd = _materialize(manifest)
    params, stats = import_mdnet(sd)
    _assert_exact_consumption(sd, manifest, unconsumed, "mdnet")

    module = MDNet(num_classes=6, meta_dim=85, hidden_dim=128)
    template = _template_shapes(module, IMG, np.zeros((1, 85), np.float32))
    _assert_template_match(params, template["params"], "mdnet")
    _assert_template_match(stats, template.get("batch_stats", {}),
                           "mdnet (batch_stats)")
