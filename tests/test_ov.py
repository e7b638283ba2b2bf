"""OV-DVIS++: classification logits, ensembling, OV meta-arch forward."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.core.config import Config
from dvis_plus_tpu.models.ov.heads import (
    geometric_ensemble,
    get_classification_logits,
    mask_pooling,
)
from dvis_plus_tpu.models.ov.text import (
    VILD_TEMPLATES,
    build_text_classifier,
    category_overlapping_mask,
    expand_prompts,
)

K, Tpl, Cc = 3, 4, 16


def test_classification_logits_template_max():
    rng = np.random.RandomState(0)
    # 3 classes x 4 templates + 2 void rows
    tc = rng.randn(K * Tpl + 2, Cc).astype(np.float32)
    x = rng.randn(5, Cc).astype(np.float32)
    nt = [Tpl] * K + [2]
    logits = get_classification_logits(
        jnp.asarray(x), jnp.asarray(tc), jnp.asarray(0.0), nt
    )
    assert logits.shape == (5, K + 1)
    # manual check for class 0
    xn = x / np.linalg.norm(x, axis=-1, keepdims=True)
    tn = tc / np.linalg.norm(tc, axis=-1, keepdims=True)
    raw = xn @ tn.T
    np.testing.assert_allclose(
        np.asarray(logits[:, 0]), raw[:, :Tpl].max(-1), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(logits[:, -1]), raw[:, -2:].max(-1), rtol=1e-4, atol=1e-5
    )


def test_mask_pooling():
    x = jnp.asarray(np.random.RandomState(1).rand(1, 8, 8, 4).astype(np.float32))
    mask = jnp.full((1, 2, 8, 8), -1.0)
    mask = mask.at[0, 0, :4, :4].set(1.0)
    pooled = mask_pooling(x, mask)
    np.testing.assert_allclose(
        np.asarray(pooled[0, 0]), np.asarray(x[0, :4, :4]).mean(axis=(0, 1)), rtol=1e-5
    )
    # empty mask -> ~0
    assert float(jnp.abs(pooled[0, 1]).max()) < 1e-4


def test_geometric_ensemble_semantics():
    rng = np.random.RandomState(2)
    in_l = jnp.asarray(rng.randn(5, K + 1).astype(np.float32))
    out_l = jnp.asarray(rng.randn(5, K + 1).astype(np.float32))
    overlap = jnp.asarray([1.0, 0.0, 1.0])
    fused = geometric_ensemble(in_l, out_l, overlap, alpha=0.0, beta=1.0)
    assert fused.shape == (5, K + 1)
    probs = np.exp(np.asarray(fused))
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
    # alpha=0 on seen classes -> ratio follows in-vocab; beta=1 unseen -> out
    in_p = np.asarray(jax.nn.softmax(in_l, -1))[:, :-1]
    out_p = np.asarray(jax.nn.softmax(out_l, -1))[:, :-1]
    ratio = probs[:, :K] / probs[:, :K].sum(-1, keepdims=True)
    expect_unnorm = np.stack([in_p[:, 0], out_p[:, 1], in_p[:, 2]], -1)
    expect = expect_unnorm / expect_unnorm.sum(-1, keepdims=True)
    np.testing.assert_allclose(ratio, expect, rtol=1e-3, atol=1e-4)


def test_text_classifier_builder():
    classes = [["cat", "kitty"], ["dog"]]
    def encode(prompts):
        rng = np.random.RandomState(abs(hash(tuple(prompts))) % 2**31)
        return rng.randn(len(prompts), Cc).astype(np.float32)

    void = np.zeros((1, Cc), np.float32)
    mat, nt = build_text_classifier(encode, classes, void)
    assert mat.shape == (2 * len(VILD_TEMPLATES) + 1, Cc)
    assert nt == [len(VILD_TEMPLATES)] * 2 + [1]
    rows, nt2 = expand_prompts(classes)
    assert rows[0] == [VILD_TEMPLATES[0].format("cat"), VILD_TEMPLATES[0].format("kitty")]

    ov = category_overlapping_mask([["cat"]], [["cat", "feline"], ["dog"]])
    np.testing.assert_array_equal(ov, [1.0, 0.0])


@pytest.fixture(scope="module")
def tiny_ov_model():
    cfg = Config()
    cfg.model.compute_dtype = "float32"
    cfg.model.ov.enabled = True
    cfg.model.ov.clip_embed_dim = Cc
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.pixel_decoder.transformer_in_features = ("res3", "res4", "res5")
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = 8
    cfg.model.transformer_decoder.nheads = 4
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.dec_layers = 2
    cfg.model.transformer_decoder.mask_dim = 32
    cfg.model.tracker.num_layers = 1
    cfg.model.tracker.feedforward_dim = 64
    cfg.model.tracker.num_heads = 4
    return cfg


@pytest.mark.slow
def test_ov_online_forward(tiny_ov_model):
    from dvis_plus_tpu.models.meta.ov import DVISOnlineOV

    cfg = tiny_ov_model
    cfg.model.backbone.clip_depths = (1, 1, 1, 1)
    cfg.model.backbone.clip_dims = (8, 16, 32, 64)
    model = DVISOnlineOV(cfg.model)
    rng = np.random.RandomState(3)
    tc = jnp.asarray(rng.randn(K * Tpl + 1, Cc).astype(np.float32))
    nt = tuple([Tpl] * K + [1])
    images = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)

    params = model.init(jax.random.key(0), images, tc, nt)
    seg_out, track_out, state = model.apply(params, images, tc, nt)
    assert seg_out["pred_logits"].shape == (2, 8, K + 1)
    assert track_out["pred_logits"].shape == (1, 2, 8, K + 1)
    assert "clip_vis_dense" in seg_out
    pooled = model.apply(
        params, seg_out["clip_vis_dense"],
        jnp.swapaxes(track_out["pred_masks"][0], 0, 1),
        method=DVISOnlineOV.pool_clip,
    )
    assert pooled.shape == (2, 8, Cc)


@pytest.mark.slow
def test_ov_train_step(tiny_ov_model):
    from dvis_plus_tpu.engine.trainer import Batch, build_train_step
    from dvis_plus_tpu.losses.targets import VideoTargets
    from dvis_plus_tpu.models.meta.ov import DVISOnlineOV

    cfg = tiny_ov_model
    cfg.model.meta_architecture = "dvis_online_ov"
    cfg.model.freeze = ("segmenter",)
    cfg.model.backbone.clip_depths = (1, 1, 1, 1)
    cfg.model.backbone.clip_dims = (8, 16, 32, 64)
    cfg.model.criterion.train_num_points = 64
    cfg.model.criterion.max_num_instances = 3
    cfg.solver.max_iter = 10
    model = DVISOnlineOV(cfg.model)
    rng = np.random.RandomState(7)
    tc = rng.randn(K * Tpl + 1, Cc).astype(np.float32)
    nt = [Tpl] * K + [1]
    B, T, H, W, N = 1, 2, 64, 64, 3
    images = jnp.zeros((B, T, H, W, 3), jnp.float32)
    params = model.init(jax.random.key(0), images, jnp.asarray(tc), tuple(nt))
    targets = VideoTargets(
        labels=jnp.asarray(rng.randint(0, K, (B, N)), jnp.int32),
        masks=jnp.asarray(rng.rand(B, N, T, H, W) > 0.8),
        valid=jnp.ones((B, N), bool),
        frame_valid=jnp.ones((B, N, T), bool),
    )
    batch = Batch(
        images=jnp.asarray(rng.rand(B, T, H, W, 3), jnp.float32), targets=targets
    )
    train_step, init_state = build_train_step(
        cfg, model, text_classifier=tc, num_templates=nt
    )
    state = init_state(params)
    state, metrics = train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_text_tower_conversion_matches_torch():
    """convert_open_clip_text: our flax CLIPTextEncoder on converted weights
    must match a torch forward using torch's own multi_head_attention_forward
    (validates the in_proj/out_proj reshape conventions; the reference loads
    these checkpoints at ov_dvis/backbones/clip.py:88-100)."""
    import torch
    import torch.nn.functional as F

    from dvis_plus_tpu.models.ov.clip_backbone import (
        CLIPTextEncoder,
        convert_open_clip_text,
    )

    L_CTX, W, HEADS, LAYERS, EMB, VOCAB = 12, 32, 4, 2, 16, 64
    rng = np.random.RandomState(0)
    sd = {
        "token_embedding.weight": rng.randn(VOCAB, W).astype(np.float32) * 0.02,
        "positional_embedding": rng.randn(L_CTX, W).astype(np.float32) * 0.01,
        "ln_final.weight": rng.rand(W).astype(np.float32) + 0.5,
        "ln_final.bias": rng.randn(W).astype(np.float32) * 0.1,
        "text_projection": rng.randn(W, EMB).astype(np.float32) * 0.1,
    }
    for i in range(LAYERS):
        pre = f"text.transformer.resblocks.{i}"  # CustomTextCLIP prefix
        sd[f"{pre}.ln_1.weight"] = rng.rand(W).astype(np.float32) + 0.5
        sd[f"{pre}.ln_1.bias"] = rng.randn(W).astype(np.float32) * 0.1
        sd[f"{pre}.attn.in_proj_weight"] = rng.randn(3 * W, W).astype(np.float32) * 0.1
        sd[f"{pre}.attn.in_proj_bias"] = rng.randn(3 * W).astype(np.float32) * 0.1
        sd[f"{pre}.attn.out_proj.weight"] = rng.randn(W, W).astype(np.float32) * 0.1
        sd[f"{pre}.attn.out_proj.bias"] = rng.randn(W).astype(np.float32) * 0.1
        sd[f"{pre}.ln_2.weight"] = rng.rand(W).astype(np.float32) + 0.5
        sd[f"{pre}.ln_2.bias"] = rng.randn(W).astype(np.float32) * 0.1
        sd[f"{pre}.mlp.c_fc.weight"] = rng.randn(4 * W, W).astype(np.float32) * 0.1
        sd[f"{pre}.mlp.c_fc.bias"] = rng.randn(4 * W).astype(np.float32) * 0.1
        sd[f"{pre}.mlp.c_proj.weight"] = rng.randn(W, 4 * W).astype(np.float32) * 0.1
        sd[f"{pre}.mlp.c_proj.bias"] = rng.randn(W).astype(np.float32) * 0.1

    tokens = np.zeros((2, L_CTX), np.int32)
    tokens[0, :4] = [1, 5, 9, VOCAB - 1]  # eot = argmax = last real token
    tokens[1, :3] = [1, 7, VOCAB - 1]

    # --- torch oracle (open_clip ResidualAttentionBlock math) ---
    t = {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}

    def tget(k):
        return t.get(k, t.get(f"text.{k}"))

    x = tget("token_embedding.weight")[torch.from_numpy(tokens).long()]
    x = x + tget("positional_embedding")[None]
    x = x.transpose(0, 1)  # (L, B, W)
    causal = torch.full((L_CTX, L_CTX), float("-inf")).triu(1)
    for i in range(LAYERS):
        pre = f"transformer.resblocks.{i}"
        h = F.layer_norm(x, (W,), tget(f"{pre}.ln_1.weight"), tget(f"{pre}.ln_1.bias"))
        attn_out, _ = F.multi_head_attention_forward(
            h, h, h, W, HEADS,
            tget(f"{pre}.attn.in_proj_weight"), tget(f"{pre}.attn.in_proj_bias"),
            None, None, False, 0.0,
            tget(f"{pre}.attn.out_proj.weight"), tget(f"{pre}.attn.out_proj.bias"),
            need_weights=False, attn_mask=causal,
        )
        x = x + attn_out
        h2 = F.layer_norm(x, (W,), tget(f"{pre}.ln_2.weight"), tget(f"{pre}.ln_2.bias"))
        h2 = F.linear(h2, tget(f"{pre}.mlp.c_fc.weight"), tget(f"{pre}.mlp.c_fc.bias"))
        h2 = F.gelu(h2)
        h2 = F.linear(h2, tget(f"{pre}.mlp.c_proj.weight"), tget(f"{pre}.mlp.c_proj.bias"))
        x = x + h2
    x = x.transpose(0, 1)
    x = F.layer_norm(x, (W,), tget("ln_final.weight"), tget("ln_final.bias"))
    eot = torch.from_numpy(tokens).long().argmax(dim=-1)
    pooled = x[torch.arange(2), eot]
    want = (pooled @ tget("text_projection")).detach().numpy()

    # --- ours ---
    enc = CLIPTextEncoder(
        vocab_size=VOCAB, context_length=L_CTX, width=W, heads=HEADS,
        layers=LAYERS, embed_dim=EMB,
    )
    params = {"params": convert_open_clip_text(sd, layers=LAYERS, heads=HEADS)}
    got = np.asarray(enc.apply(params, jnp.asarray(tokens)))
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.slow
def test_learned_void_embedding_in_graph():
    """The void block of the classifier is LEARNED model state (reference
    void_embedding, meta_architecture_ov.py:152-157): the host classifier
    carries no void rows, full_classifier appends the normalized param, and
    gradients reach it through the class logits."""
    import jax

    from dvis_plus_tpu.core.config import Config
    from dvis_plus_tpu.models.meta.ov import OVSegmenter

    cfg = Config()
    cfg.model.ov.enabled = True
    cfg.model.ov.clip_embed_dim = 16
    cfg.model.num_classes = 2
    cfg.model.compute_dtype = "float32"
    cfg.model.backbone.clip_depths = (1, 1, 1, 1)
    cfg.model.backbone.clip_dims = (8, 16, 24, 32)
    cfg.model.pixel_decoder.conv_dim = 32
    cfg.model.pixel_decoder.mask_dim = 32
    cfg.model.pixel_decoder.transformer_enc_layers = 1
    cfg.model.pixel_decoder.transformer_dim_feedforward = 64
    cfg.model.transformer_decoder.hidden_dim = 32
    cfg.model.transformer_decoder.num_queries = 4
    cfg.model.transformer_decoder.nheads = 4
    cfg.model.transformer_decoder.dim_feedforward = 64
    cfg.model.transformer_decoder.dec_layers = 1
    cfg.model.transformer_decoder.mask_dim = 32

    model = OVSegmenter(cfg.model)
    rng = np.random.RandomState(0)
    K = 2
    tc = jnp.asarray(rng.randn(K * 2, 16).astype(np.float32))  # 2 templates/class
    nt = (2, 2, 1)  # last entry = learned void row count
    imgs = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.key(0), imgs, tc, nt)
    assert params["params"]["void_embedding"].shape == (1, 16)

    def loss(p):
        # training passes the dataset's PRIVATE void row index (reference
        # get_text_classifier_with_void :205-211); the merged eval row
        # (void_index=None) is detached like the reference's .detach()
        out = model.apply(p, imgs, tc, nt, 0)
        # push void prob down -> gradient must reach the void embedding
        return jnp.sum(jax.nn.softmax(out["pred_logits"], -1)[..., -1])

    g = jax.grad(loss)(params)
    assert float(jnp.abs(g["params"]["void_embedding"]).sum()) > 0

    def loss_eval(p):
        out = model.apply(p, imgs, tc, nt)  # no private row -> detached merge
        return jnp.sum(jax.nn.softmax(out["pred_logits"], -1)[..., -1])

    g2 = jax.grad(loss_eval)(params)
    assert float(jnp.abs(g2["params"]["void_embedding"]).sum()) == 0

    out = model.apply(params, imgs, tc, nt)
    assert out["pred_logits"].shape[-1] == K + 1
