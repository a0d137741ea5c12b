"""Full-model numerical parity: skinjax MultimodalModel vs an inline torch
implementation of the reference's forward (multimodalIntraInterModal.py math),
weights transferred through the torch→flax importer.

This is the strongest parity evidence: same weights, same inputs, same logits
(to fp32 tolerance) across fusion mechanisms — covering backbone conv/BN
conversion, projector/tower mapping, packed-MHA import, gated residuals,
MetaBlock, gates, and the fusion MLP heads.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from skinjax.models import MultimodalModel
from skinjax.models.torch_import import (
    filter_to_template,
    import_multimodal_checkpoint,
)
from tests.torch_ref import TorchResNet

D, VOCAB, NCLS = 32, 11, 6


class TorchGRB(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = nn.LayerNorm(dim)
        self.attn = nn.MultiheadAttention(dim, 8, batch_first=False)
        self.gate_linear = nn.Linear(dim, dim)

    def forward(self, q, k, v):
        a, _ = self.attn(q, k, v)
        g = torch.sigmoid(self.gate_linear(q))
        return self.norm(g * a + (1 - g) * q)


_RGATT = "att-intramodal+residual+cross-attention-metadados"
CNN_DIM = 512  # resnet-18 feature dim


class TorchMM(nn.Module):
    """Reference-math multimodal model, torch oracle — ALL 18 mechanism
    branches of multimodalIntraInterModal.py:205-416 (same math, eval-mode
    dropout off). MetaBlock dims follow the reference quirk
    (multimodalIntraInterModal.py:112-115): common-space for RGATT+metablock,
    raw tower dims for plain metablock."""

    def __init__(self, mechanism):
        super().__init__()
        self.mechanism = mechanism
        self.image_encoder = TorchResNet((2, 2, 2, 2), "basic", width=64)
        self.image_projector = nn.Linear(CNN_DIM, D)
        self.text_fc = nn.Sequential(
            nn.Linear(VOCAB, 256), nn.ReLU(), nn.Linear(256, 512), nn.ReLU(),
            nn.Linear(512, D),
        )
        self.text_projector = nn.Linear(D, D)
        mha = lambda: nn.MultiheadAttention(D, 4, batch_first=False)
        self.image_self_attention = mha()
        self.text_self_attention = mha()
        self.image_cross_attention = mha()
        self.text_cross_attention = mha()
        self.img_gate = nn.Linear(D, D)
        self.txt_gate = nn.Linear(D, D)
        self.image_residual = TorchGRB(D)
        self.text_residual = TorchGRB(D)
        # module creation order below deliberately preserves the ORIGINAL
        # oracle's torch-RNG draw sequence (meta_block D->D, fc_fusion 2D,
        # proj head) so the fold-dynamics trajectories, recorded against
        # that init, stay bit-identical; the modules new branches need are
        # appended AFTER.
        self.meta_block_fb = nn.Sequential(nn.Linear(D, D), nn.LayerNorm(D))
        self.meta_block_gb = nn.Sequential(nn.Linear(D, D), nn.LayerNorm(D))
        fusion_in = D if mechanism == "no-metadata" else 2 * D
        self.fc_fusion = nn.Sequential(
            nn.Linear(fusion_in, D), nn.LayerNorm(D), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(D, D // 2), nn.LayerNorm(D // 2), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(D // 2, NCLS),
        )
        self.fc_fusion_proj_feat2output = nn.Linear(D, NCLS)
        self.fc_visual_only = nn.Linear(CNN_DIM, NCLS)
        # plain-metablock variant: raw tower dims (V=cnn_dim, U=text_dim)
        self.meta_block_raw_fb = nn.Sequential(nn.Linear(D, CNN_DIM),
                                               nn.LayerNorm(CNN_DIM))
        self.meta_block_raw_gb = nn.Sequential(nn.Linear(D, CNN_DIM),
                                               nn.LayerNorm(CNN_DIM))
        # fc_mlp_module_after_metablock (input = cnn_dim_output, dropout 0.3)
        self.fc_after_mb = nn.Sequential(
            nn.Linear(CNN_DIM, D), nn.LayerNorm(D), nn.ReLU(), nn.Dropout(0.3),
            nn.Linear(D, D // 2), nn.LayerNorm(D // 2), nn.ReLU(), nn.Dropout(0.3),
            nn.Linear(D // 2, NCLS),
        )

    def _metablock(self, v, u, raw=False):
        fb = self.meta_block_raw_fb if raw else self.meta_block_fb
        gb = self.meta_block_raw_gb if raw else self.meta_block_gb
        return torch.sigmoid(torch.tanh(v * fb(u)) + gb(u))

    def forward(self, image, metadata):
        f = self.image_encoder(image).mean(dim=(-2, -1))
        m = self.mechanism
        if m == "no-metadata-without-mlp":
            return self.fc_visual_only(f)
        pi = self.image_projector(f)
        if m == "no-metadata":
            return self.fc_fusion(pi)
        txt_raw = self.text_fc(metadata)
        if m == "metablock":
            return self.fc_after_mb(self._metablock(f, txt_raw, raw=True))
        pt = self.text_projector(txt_raw)
        i_seq, t_seq = pi[None], pt[None]
        if m == "concatenation":
            return self.fc_fusion(torch.cat([pi, pt], dim=1))
        if m == "weighted":
            ai = torch.sigmoid(self.img_gate(pi))
            at = torch.sigmoid(self.txt_gate(pt))
            return self.fc_fusion(torch.cat([ai * pi, at * pt], dim=1))
        if m == "cross-attention-only":
            ix, _ = self.image_cross_attention(i_seq, t_seq, t_seq)
            tx, _ = self.text_cross_attention(t_seq, i_seq, i_seq)
            return self.fc_fusion(torch.cat([ix[0], tx[0]], dim=1))
        if m == "rg-att2fusefeatures":
            return self.fc_fusion_proj_feat2output(
                self.image_residual(t_seq, i_seq, i_seq)[0])
        if m == "rg-att":
            ir = self.image_residual(i_seq, t_seq, t_seq)
            tr = self.text_residual(t_seq, i_seq, i_seq)
            return self.fc_fusion(torch.cat([ir[0], tr[0]], dim=1))
        if m == "residual+cross-attention-metadados":
            ir = self.image_residual(i_seq, i_seq, i_seq)
            tr = self.text_residual(t_seq, t_seq, t_seq)
            ix, _ = self.image_cross_attention(ir, tr, tr)
            tx, _ = self.text_cross_attention(tr, ir, ir)
            return self.fc_fusion(torch.cat([ix[0], tx[0]], dim=1))
        ia, _ = self.image_self_attention(i_seq, i_seq, i_seq)
        ta, _ = self.text_self_attention(t_seq, t_seq, t_seq)
        if m == "att-intramodal":
            return self.fc_fusion(torch.cat([ia[0], ta[0]], dim=1))
        if m == "att-intramodal+residual":
            ir = self.image_residual(i_seq, ia, ia)
            tr = self.text_residual(t_seq, ta, ta)
            return self.fc_fusion(torch.cat([ir[0], tr[0]], dim=1))
        if m in ("crossattention", "gfcam",
                 "cross-weights-after-crossattention"):
            ix, _ = self.image_cross_attention(ia, ta, ta)
            tx, _ = self.text_cross_attention(ta, ia, ia)
            if m == "crossattention":
                return self.fc_fusion(torch.cat([ix[0], tx[0]], dim=1))
            ai = torch.sigmoid(self.img_gate(ix[0]))
            at = torch.sigmoid(self.txt_gate(tx[0]))
            if m == "gfcam":
                fused = torch.cat([ai * ix[0], at * tx[0]], dim=1)
            else:  # swapped gates (multimodalIntraInterModal.py:231-235)
                fused = torch.cat([at * ix[0], ai * tx[0]], dim=1)
            return self.fc_fusion(fused)
        # RG-ATT family: self-att -> gated residual -> cross-attention
        ir = self.image_residual(i_seq, ia, ia)
        tr = self.text_residual(t_seq, ta, ta)
        ix, _ = self.image_cross_attention(ir, tr, tr)
        tx, _ = self.text_cross_attention(tr, ir, ir)
        if m == _RGATT:
            return self.fc_fusion(torch.cat([ix[0], tx[0]], dim=1))
        if m == _RGATT + "+rg-att2fusefeatures":
            return self.fc_fusion_proj_feat2output(
                self.image_residual(tx, ix, ix)[0])
        if m == _RGATT + "+metablock":
            return self.fc_fusion_proj_feat2output(
                self._metablock(ix[0], tx[0]))
        if m == _RGATT + "+att-intramodal+residual":
            ia2, _ = self.image_self_attention(ix, ix, ix)
            ta2, _ = self.text_self_attention(tx, tx, tx)
            ir2 = self.image_residual(ix, ia2, ia2)
            tr2 = self.text_residual(tx, ta2, ta2)
            return self.fc_fusion(torch.cat([ir2[0], tr2[0]], dim=1))
        raise ValueError(m)


def _torch_state_dict(tm: TorchMM):
    """Rename oracle params to the reference's state_dict naming.

    Copies each tensor: ``.numpy()`` returns a VIEW of the live parameter
    storage, so torch's in-place optimizer updates would silently mutate the
    "checkpoint" after import (a real torch.load'ed dict never aliases a
    live model).
    """
    sd = {}
    # the reference has ONE meta_block whose dims depend on the mechanism
    # (multimodalIntraInterModal.py:112-115); the oracle keeps both variants
    # as separate modules (to preserve RNG draw order) and exports the one
    # this mechanism's checkpoint would contain
    raw_mb = tm.mechanism == "metablock"
    for k, v in tm.state_dict().items():
        if k.startswith("meta_block_raw_"):
            if not raw_mb:
                continue
            k = k.replace("meta_block_raw_fb", "meta_block.fb")
            k = k.replace("meta_block_raw_gb", "meta_block.gb")
        else:
            if raw_mb and k.startswith("meta_block_"):
                continue
            k = k.replace("meta_block_fb", "meta_block.fb")
            k = k.replace("meta_block_gb", "meta_block.gb")
        k = k.replace("fc_after_mb",
                      "fc_mlp_module_after_metablock_fusion_module")
        sd[k] = v.detach().numpy().copy()
    return sd


from skinjax.models.fusion.multimodal import MECHANISMS


@pytest.mark.parametrize("mechanism", MECHANISMS)
def test_full_model_logits_match_torch(mechanism):
    torch.manual_seed(3)
    tm = TorchMM(mechanism).eval()
    sd = _torch_state_dict(tm)
    params, stats = import_multimodal_checkpoint(sd, common_dim=D,
                                                 backbone="resnet-18")

    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="resnet-18",
        common_dim=D, text_encoder_dim_output=D, vocab_size=VOCAB,
        attention_mechanism=mechanism,
    )
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    meta = rng.normal(size=(2, VOCAB)).astype(np.float32)

    variables = model.init(jax.random.key(0), jnp.asarray(img), jnp.asarray(meta))
    params = filter_to_template(params, variables["params"])
    stats = filter_to_template(stats, variables.get("batch_stats", {}))

    with torch.no_grad():
        ref = tm(torch.tensor(img.transpose(0, 3, 1, 2)), torch.tensor(meta)).numpy()
    out = model.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(img), jnp.asarray(meta)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-4, rtol=5e-4)
