"""Training-DYNAMICS parity vs torch: N Adam steps on identical weights and
batches produce matching loss trajectories and matching post-training eval
logits.

Forward-logits parity (test_full_model_parity.py) proves the model math;
this proves the part of the reference's training stack that determines the
published BACCs beyond the forward: CE loss gradients, torch-Adam semantics
(L2 added to grads BEFORE the moments — optimizer.py make_optimizer), bias
correction, and BatchNorm running-stat updates in train mode (momentum 0.1
torch == 0.9 flax). Any drift in these compounds over an epoch; matching a
4-step trajectory to fp32 tolerance pins them all at once.

Reference training loop: train_pad_20.py (Adam, weight_decay) +
multimodalIntraInterModal.py forward. Dropout is zeroed on BOTH sides (the
two frameworks cannot share dropout RNG streams; everything else is
bit-comparable).
"""

import numpy as np
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp
import optax

from skinjax.models import MultimodalModel
from skinjax.models.torch_import import (
    filter_to_template,
    import_multimodal_checkpoint,
)
from skinjax.train.optimizer import make_optimizer
from tests.test_full_model_parity import D, NCLS, VOCAB, TorchMM, _torch_state_dict

LR, WD, STEPS, B = 1e-3, 1e-4, 4, 8


def test_adam_train_dynamics_match_torch():
    torch.manual_seed(7)
    tm = TorchMM("concatenation")
    for m in tm.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
    tm.train()
    sd = _torch_state_dict(tm)
    params, stats = import_multimodal_checkpoint(sd, common_dim=D,
                                                 backbone="resnet-18")

    model = MultimodalModel(
        num_classes=NCLS, num_heads=4, cnn_model_name="resnet-18",
        common_dim=D, text_encoder_dim_output=D, vocab_size=VOCAB,
        attention_mechanism="concatenation", dropout_rate=0.0,
    )
    rng = np.random.default_rng(1)
    imgs = rng.normal(size=(STEPS, B, 64, 64, 3)).astype(np.float32)
    metas = rng.normal(size=(STEPS, B, VOCAB)).astype(np.float32)
    labels = rng.integers(0, NCLS, (STEPS, B)).astype(np.int64)
    ev_img = rng.normal(size=(4, 64, 64, 3)).astype(np.float32)
    ev_meta = rng.normal(size=(4, VOCAB)).astype(np.float32)

    variables = model.init(jax.random.key(0), jnp.asarray(imgs[0]),
                           jnp.asarray(metas[0]))
    params = filter_to_template(params, variables["params"])
    stats = filter_to_template(stats, variables.get("batch_stats", {}))

    # ---- torch side: Adam with L2 weight decay, CE mean loss -------------
    opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
    ce = nn.CrossEntropyLoss()
    torch_losses = []
    torch_grad_sd = None
    for s in range(STEPS):
        opt.zero_grad()
        out = tm(torch.tensor(imgs[s].transpose(0, 3, 1, 2)),
                 torch.tensor(metas[s]))
        loss = ce(out, torch.tensor(labels[s]))
        loss.backward()
        if s == 0:
            # Snapshot step-0 gradients under state_dict naming: gradients
            # transform through the importer exactly like params (transpose/
            # split are linear), so the importer converts them to a flax tree.
            torch_grad_sd = dict(_torch_state_dict(tm))
            for name, p in tm.named_parameters():
                name = name.replace("meta_block_fb", "meta_block.fb")
                name = name.replace("meta_block_gb", "meta_block.gb")
                g = p.grad  # None for modules unused by this mechanism
                torch_grad_sd[name] = (
                    np.zeros(p.shape, np.float32) if g is None
                    else g.detach().numpy().copy())
        opt.step()
        torch_losses.append(float(loss.detach()))
    tm.eval()
    with torch.no_grad():
        torch_eval = tm(torch.tensor(ev_img.transpose(0, 3, 1, 2)),
                        torch.tensor(ev_meta)).numpy()

    # ---- skinjax side: same optimizer semantics, same batches ------------
    tx = make_optimizer(LR, WD)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, stats, opt_state, img, md, lb):
        def loss_of(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": stats}, img, md,
                train=True, mutable=["batch_stats"],
            )
            logp = jax.nn.log_softmax(out.astype(jnp.float32))
            loss = -jnp.take_along_axis(logp, lb[:, None], axis=1).mean()
            return loss, mut["batch_stats"]

        (loss, new_stats), g = jax.value_and_grad(loss_of, has_aux=True)(params)
        updates, opt_state2 = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state2, loss

    # Step-0 gradient-tree parity: the tight backward check. Convert the
    # torch gradients through the SAME importer mapping as the params and
    # compare leaf-for-leaf against jax.grad.
    jgrad = jax.grad(
        lambda p: -jnp.take_along_axis(
            jax.nn.log_softmax(model.apply(
                {"params": p, "batch_stats": stats},
                jnp.asarray(imgs[0]), jnp.asarray(metas[0]),
                train=True, mutable=["batch_stats"])[0].astype(jnp.float32)),
            jnp.asarray(labels[0])[:, None], axis=1).mean()
    )(params)
    tgrad, _ = import_multimodal_checkpoint(torch_grad_sd, common_dim=D,
                                            backbone="resnet-18")
    tgrad = filter_to_template(tgrad, variables["params"])
    flat_j = dict(jax.tree_util.tree_leaves_with_path(jgrad))
    flat_t = dict(jax.tree_util.tree_leaves_with_path(tgrad))
    assert set(flat_j) == set(flat_t)
    for path in flat_j:
        jv, tv = np.asarray(flat_j[path]), np.asarray(flat_t[path])
        # fp32 conv-backward accumulation noise is absolute at the scale of
        # the leaf's largest gradient (different reduction orders), so the
        # tight check is relative-L2 per leaf plus a scaled max-abs bound.
        scale = float(np.abs(tv).max()) + 1e-12
        rel_l2 = float(np.linalg.norm(jv - tv) / (np.linalg.norm(tv) + 1e-12))
        assert rel_l2 < 1e-3, f"{path}: rel_l2={rel_l2}"
        assert float(np.abs(jv - tv).max()) < 5e-3 * scale + 5e-5, str(path)

    jax_losses = []
    for s in range(STEPS):
        params, stats, opt_state, loss = step(
            params, stats, opt_state, jnp.asarray(imgs[s]),
            jnp.asarray(metas[s]), jnp.asarray(labels[s]))
        jax_losses.append(float(loss))

    # Step 0 is pre-update and must match to fp32 forward tolerance. The
    # following steps go through Adam, whose first-step update is
    # m_hat/(sqrt(v_hat)+eps) ~= sign(g): fp32 cross-framework noise near
    # g=0 flips update signs, so trajectories agree only statistically —
    # 0.5% relative is the honest cross-framework bound at lr=1e-3.
    np.testing.assert_allclose(jax_losses[0], torch_losses[0], rtol=2e-5)
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=5e-3)

    jax_eval = model.apply({"params": params, "batch_stats": stats},
                           jnp.asarray(ev_img), jnp.asarray(ev_meta))
    # Post-training eval logits exercise the BN running-stat updates
    # (flax momentum 0.9 == torch 0.1). Tolerance is set by the Adam
    # trajectory divergence above (params differ ~0.5% by step 4), NOT by
    # stat semantics: a wrong momentum mapping would leave eval stats near
    # their init (mean 0 / var 1) and miss by O(0.5), 20x this bound.
    np.testing.assert_allclose(np.asarray(jax_eval), torch_eval,
                               rtol=2.5e-2, atol=2.5e-2)
