import pytest
"""MSDeformAttn core op vs a torch grid_sample oracle.

Mirrors the reference's only real test file
(DVIS_Plus/mask2former/modeling/pixel_decoder/ops/test.py), which validates the
CUDA kernel against ms_deform_attn_core_pytorch (grid_sample bilinear,
padding_mode='zeros', align_corners=False). Here the oracle is an independent
torch implementation of the same spec; gradcheck is replaced by JAX-vs-torch
gradient comparison."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from dvis_plus_tpu.ops.msdeform import ms_deform_attn

SHAPES = [(6, 4), (3, 2)]


def torch_oracle(value, shapes, loc, weights):
    """(B, Len, M, D), [(H,W)], (B,Lq,M,L,P,2), (B,Lq,M,L,P) -> (B,Lq,M*D)"""
    value = torch.from_numpy(value).double()
    loc = torch.from_numpy(loc).double()
    weights = torch.from_numpy(weights).double()
    B, _, M, D = value.shape
    _, Lq, _, L, P, _ = loc.shape
    chunks = value.split([h * w for h, w in shapes], dim=1)
    grids = 2 * loc - 1
    sampled = []
    for lid, (H, W) in enumerate(shapes):
        v = chunks[lid].flatten(2).transpose(1, 2).reshape(B * M, D, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)  # (B*M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False)
        sampled.append(s)  # (B*M, D, Lq, P)
    w = weights.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * w).sum(-1).view(B, M * D, Lq)
    return out.transpose(1, 2).contiguous().numpy()


def make_inputs(seed=0, B=2, M=4, D=8, Lq=17, P=3):
    rng = np.random.RandomState(seed)
    Len = sum(h * w for h, w in SHAPES)
    L = len(SHAPES)
    value = rng.randn(B, Len, M, D).astype(np.float64) * 0.01
    # include out-of-range locations to exercise zero padding
    loc = rng.rand(B, Lq, M, L, P, 2).astype(np.float64) * 1.4 - 0.2
    w = rng.rand(B, Lq, M, L, P).astype(np.float64) + 1e-5
    w = w / w.sum(axis=(-1, -2), keepdims=True)
    return value, loc, w


def test_forward_matches_oracle():
    value, loc, w = make_inputs()
    expected = torch_oracle(value, SHAPES, loc, w)
    got = ms_deform_attn(
        jnp.asarray(value, jnp.float32),
        SHAPES,
        jnp.asarray(loc, jnp.float32),
        jnp.asarray(w, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)


def test_forward_f64_tight():
    with jax.enable_x64(True):
        value, loc, w = make_inputs(seed=1)
        expected = torch_oracle(value, SHAPES, loc, w)
        got = ms_deform_attn(jnp.asarray(value), SHAPES, jnp.asarray(loc), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-10, atol=1e-12)


@pytest.mark.slow
def test_gradients_match_oracle():
    value, loc, w = make_inputs(seed=2, B=1, M=2, D=4, Lq=5, P=2)

    # torch grads
    tv = torch.from_numpy(value).double().requires_grad_(True)
    tl = torch.from_numpy(loc).double().requires_grad_(True)
    tw = torch.from_numpy(w).double().requires_grad_(True)
    B, _, M, D = tv.shape
    _, Lq, _, L, P, _ = tl.shape
    chunks = tv.split([h * w_ for h, w_ in SHAPES], dim=1)
    grids = 2 * tl - 1
    sampled = []
    for lid, (H, W) in enumerate(SHAPES):
        v = chunks[lid].flatten(2).transpose(1, 2).reshape(B * M, D, H, W)
        g = grids[:, :, :, lid].transpose(1, 2).flatten(0, 1)
        sampled.append(F.grid_sample(v, g, mode="bilinear", padding_mode="zeros", align_corners=False))
    ww = tw.transpose(1, 2).reshape(B * M, 1, Lq, L * P)
    out = (torch.stack(sampled, dim=-2).flatten(-2) * ww).sum(-1).view(B, M * D, Lq)
    out.sum().backward()

    with jax.enable_x64(True):
        def f(v_, l_, w_):
            return ms_deform_attn(v_, SHAPES, l_, w_).sum()

        gv, gl, gw = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w)
        )
    np.testing.assert_allclose(np.asarray(gv), tv.grad.numpy(), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(gw), tw.grad.numpy(), rtol=1e-8, atol=1e-10)
    # sampling-location grads: grid_sample subgradient choice at exact integer
    # coords can differ; inputs avoid exact integers with prob 1
    np.testing.assert_allclose(np.asarray(gl), tl.grad.numpy(), rtol=1e-6, atol=1e-8)


def test_fast_matches_reference_impl():
    """Stacked-table production op vs the straightforward gather oracle."""
    from dvis_plus_tpu.ops.msdeform import ms_deform_attn_reference

    value, loc, w = make_inputs(seed=5)
    a = ms_deform_attn(
        jnp.asarray(value, jnp.float32), SHAPES,
        jnp.asarray(loc, jnp.float32), jnp.asarray(w, jnp.float32),
    )
    b = ms_deform_attn_reference(
        jnp.asarray(value, jnp.float32), SHAPES,
        jnp.asarray(loc, jnp.float32), jnp.asarray(w, jnp.float32),
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
