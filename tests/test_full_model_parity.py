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


class TorchMM(nn.Module):
    """Reference-math multimodal model (RG-ATT + friends), torch oracle."""

    def __init__(self, mechanism):
        super().__init__()
        self.mechanism = mechanism
        self.image_encoder = TorchResNet((2, 2, 2, 2), "basic", width=64)
        self.image_projector = nn.Linear(512, D)
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
        self.meta_block_fb = nn.Sequential(nn.Linear(D, D), nn.LayerNorm(D))
        self.meta_block_gb = nn.Sequential(nn.Linear(D, D), nn.LayerNorm(D))
        self.fc_fusion = nn.Sequential(
            nn.Linear(2 * D, D), nn.LayerNorm(D), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(D, D // 2), nn.LayerNorm(D // 2), nn.ReLU(), nn.Dropout(0.5),
            nn.Linear(D // 2, NCLS),
        )
        self.fc_fusion_proj_feat2output = nn.Linear(D, NCLS)

    def forward(self, image, metadata):
        f = self.image_encoder(image).mean(dim=(-2, -1))
        pi = self.image_projector(f)
        pt = self.text_projector(self.text_fc(metadata))
        i_seq, t_seq = pi[None], pt[None]
        m = self.mechanism
        if m == "concatenation":
            return self.fc_fusion(torch.cat([pi, pt], dim=1))
        if m == "weighted":
            ai = torch.sigmoid(self.img_gate(pi))
            at = torch.sigmoid(self.txt_gate(pt))
            return self.fc_fusion(torch.cat([ai * pi, at * pt], dim=1))
        ia, _ = self.image_self_attention(i_seq, i_seq, i_seq)
        ta, _ = self.text_self_attention(t_seq, t_seq, t_seq)
        if m == "crossattention":
            ix, _ = self.image_cross_attention(ia, ta, ta)
            tx, _ = self.text_cross_attention(ta, ia, ia)
            return self.fc_fusion(torch.cat([ix[0], tx[0]], dim=1))
        # RG-ATT
        ir = self.image_residual(i_seq, ia, ia)
        tr = self.text_residual(t_seq, ta, ta)
        ix, _ = self.image_cross_attention(ir, tr, tr)
        tx, _ = self.text_cross_attention(tr, ir, ir)
        if m == "att-intramodal+residual+cross-attention-metadados+metablock":
            t1 = self.meta_block_fb(tx[0])
            t2 = self.meta_block_gb(tx[0])
            fused = torch.sigmoid(torch.tanh(ix[0] * t1) + t2)
            return self.fc_fusion_proj_feat2output(fused)
        return self.fc_fusion(torch.cat([ix[0], tx[0]], dim=1))


def _torch_state_dict(tm: TorchMM):
    """Rename oracle params to the reference's state_dict naming.

    Copies each tensor: ``.numpy()`` returns a VIEW of the live parameter
    storage, so torch's in-place optimizer updates would silently mutate the
    "checkpoint" after import (a real torch.load'ed dict never aliases a
    live model).
    """
    sd = {}
    for k, v in tm.state_dict().items():
        k = k.replace("meta_block_fb", "meta_block.fb")
        k = k.replace("meta_block_gb", "meta_block.gb")
        sd[k] = v.detach().numpy().copy()
    return sd


@pytest.mark.parametrize(
    "mechanism",
    ["concatenation", "weighted", "crossattention",
     "att-intramodal+residual+cross-attention-metadados",
     "att-intramodal+residual+cross-attention-metadados+metablock"],
)
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
