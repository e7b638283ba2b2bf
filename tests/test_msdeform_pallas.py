"""Raw-window Pallas deformable sampling vs the exact op (interpret mode)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dvis_plus_tpu.ops.msdeform import ms_deform_attn
from dvis_plus_tpu.ops.msdeform_pallas import (
    _pad_value_level,
    deform_sample_window,
    ms_deform_attn_local,
)


def _run_case(B, M, D, P, H, W, tile, radius, seed=0):
    rng = np.random.RandomState(seed)
    Lq = H * W
    value = jnp.asarray(rng.randn(B, H * W, M, D).astype(np.float32))
    qi = np.arange(Lq) // W + 0.5
    qj = np.arange(Lq) % W + 0.5
    refpix = np.stack([qj, qi], -1)[None, :, None, None, :]
    # offsets inside the clamp radius: the local op is exact there
    offpix = rng.uniform(-radius + 0.5, radius - 0.5, (B, Lq, M, P, 2)).astype(np.float32)
    loc = ((refpix + offpix) / np.array([W, H])).astype(np.float32)
    attn = rng.rand(B, Lq, M, P).astype(np.float32)
    attn /= attn.sum(-1, keepdims=True)

    exact = ms_deform_attn(
        value, [(H, W)], jnp.asarray(loc)[:, :, :, None], jnp.asarray(attn)[:, :, :, None]
    )  # (B, Lq, M*D)
    table = _pad_value_level(value, H, W, unit=8)
    got = deform_sample_window(
        table, M, (H, W), jnp.asarray(loc), jnp.asarray(attn), (H, W),
        radius=radius, tile=tile, interpret=True,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, Lq, M*D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=1e-4, atol=1e-5)


def test_single_level_matches_exact():
    _run_case(B=1, M=2, D=8, P=3, H=32, W=16, tile=(8, 8), radius=8)


def test_single_level_bigger_tiles():
    _run_case(B=1, M=2, D=8, P=4, H=32, W=32, tile=(16, 8), radius=8, seed=1)


def test_border_samples_zero_padded():
    """Samples straddling the level border use grid_sample zero padding, and
    fully-outside samples contribute zero — matching the exact op."""
    rng = np.random.RandomState(2)
    B, M, D, P, H, W = 1, 1, 4, 2, 16, 16
    Lq = H * W
    value = jnp.asarray(rng.randn(B, H * W, M, D).astype(np.float32))
    qi = np.arange(Lq) // W + 0.5
    qj = np.arange(Lq) % W + 0.5
    refpix = np.stack([qj, qi], -1)[None, :, None, None, :]
    # large offsets: corner queries sample outside the level
    offpix = rng.uniform(-3.5, 3.5, (B, Lq, M, P, 2)).astype(np.float32)
    loc = ((refpix + offpix) / np.array([W, H])).astype(np.float32)
    attn = np.ones((B, Lq, M, P), np.float32) / P
    exact = ms_deform_attn(
        value, [(H, W)], jnp.asarray(loc)[:, :, :, None], jnp.asarray(attn)[:, :, :, None]
    )
    table = _pad_value_level(value, H, W, unit=8)
    got = deform_sample_window(
        table, M, (H, W), jnp.asarray(loc), jnp.asarray(attn), (H, W),
        radius=4, tile=(8, 8), interpret=True,
        precision=jax.lax.Precision.HIGHEST,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=1e-4, atol=1e-5)


def test_out_of_radius_samples_are_clamped_not_wrong():
    """Samples beyond the radius clamp to the window edge (documented
    deviation); outputs stay finite and in-radius queries stay exact."""
    rng = np.random.RandomState(3)
    B, M, D, P, H, W = 1, 1, 4, 1, 16, 16
    Lq = H * W
    value = jnp.asarray(rng.randn(B, H * W, M, D).astype(np.float32))
    qi = np.arange(Lq) // W + 0.5
    qj = np.arange(Lq) % W + 0.5
    loc = (np.stack([qj, qi], -1) / np.array([W, H]))[None, :, None, None, :]
    loc = np.tile(loc, (B, 1, M, P, 1)).astype(np.float32)
    loc[:, 0] += 0.9  # first query: way out of radius
    attn = np.ones((B, Lq, M, P), np.float32)
    table = _pad_value_level(value, H, W, unit=8)
    got = deform_sample_window(
        table, M, (H, W), jnp.asarray(loc), jnp.asarray(attn), (H, W),
        radius=4, tile=(8, 8), interpret=True,
    )
    assert np.all(np.isfinite(np.asarray(got)))


def _multi_level_case(seed=5):
    rng = np.random.RandomState(seed)
    B, M, D, P = 2, 2, 8, 4
    shapes = [(16, 16), (8, 8), (4, 4)]
    Len = sum(h * w for h, w in shapes)
    value = rng.randn(B, Len, M, D).astype(np.float32)

    refs = []
    for (H, W) in shapes:
        qi = (np.arange(H * W) // W + 0.5) / H
        qj = (np.arange(H * W) % W + 0.5) / W
        refs.append(np.stack([qj, qi], -1))
    ref = np.concatenate(refs, 0)  # (Len, 2) normalized

    loc = np.zeros((B, Len, M, len(shapes), P, 2), np.float32)
    for lv, (H, W) in enumerate(shapes):
        off = rng.uniform(-2.5, 2.5, (B, Len, M, P, 2)).astype(np.float32)
        loc[:, :, :, lv] = ref[None, :, None, None] + off / np.array([W, H])
    attn = rng.rand(B, Len, M, len(shapes), P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)
    return value, shapes, loc, attn


@pytest.mark.slow
def test_multi_level_local_matches_exact():
    """ms_deform_attn_local == exact op over 3 pyramid levels when offsets
    stay inside the clamp radius (the encoder integration surface)."""
    value, shapes, loc, attn = _multi_level_case()
    exact = ms_deform_attn(jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn))
    got = ms_deform_attn_local(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(attn),
        radius=4, interpret=True, precision=jax.lax.Precision.HIGHEST,
        min_samples=0,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(exact), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_local_op_gradients_match_exact():
    """The custom VJP (exact math on clamped locations) matches the exact
    op's gradients when offsets are inside the radius."""
    value, shapes, loc, attn = _multi_level_case(seed=7)
    v, l, a = jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)

    def loss_local(v, l, a):
        return jnp.sum(
            ms_deform_attn_local(
                v, shapes, l, a, radius=4, interpret=True,
                precision=jax.lax.Precision.HIGHEST, min_samples=0,
            ) ** 2
        )

    def loss_exact(v, l, a):
        return jnp.sum(ms_deform_attn(v, shapes, l, a) ** 2)

    g_local = jax.grad(loss_local, argnums=(0, 1, 2))(v, l, a)
    g_exact = jax.grad(loss_exact, argnums=(0, 1, 2))(v, l, a)
    for gl, ge in zip(g_local, g_exact):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(ge), rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_gather_fallback_clamps_out_of_radius():
    """The gather-fallback branch of _local_forward must apply the same
    radius clamp as the VJP oracle: with offsets far outside the radius,
    forward == _local_exact_oracle on every path split (all-gather via a
    huge min_samples, and the mixed windowed/gather split via min_samples=0),
    and forward/backward stay consistent (regression: the fallback used to
    sample UNCLAMPED locations, disagreeing with the clamped VJP)."""
    from dvis_plus_tpu.ops.msdeform_pallas import _local_exact_oracle

    rng = np.random.RandomState(11)
    B, M, D, P = 1, 2, 8, 4
    shapes = [(16, 16), (8, 8), (4, 4)]
    Len = sum(h * w for h, w in shapes)
    value = rng.randn(B, Len, M, D).astype(np.float32)

    refs = []
    for (H, W) in shapes:
        qi = (np.arange(H * W) // W + 0.5) / H
        qj = (np.arange(H * W) % W + 0.5) / W
        refs.append(np.stack([qj, qi], -1))
    ref = np.concatenate(refs, 0)

    loc = np.zeros((B, Len, M, len(shapes), P, 2), np.float32)
    for lv, (H, W) in enumerate(shapes):
        # offsets up to 12 px — far beyond radius=4 → clamp must kick in
        off = rng.uniform(-12.0, 12.0, (B, Len, M, P, 2)).astype(np.float32)
        loc[:, :, :, lv] = ref[None, :, None, None] + off / np.array([W, H])
    attn = rng.rand(B, Len, M, len(shapes), P).astype(np.float32)
    attn /= attn.sum((-1, -2), keepdims=True)

    v, l, a = jnp.asarray(value), jnp.asarray(loc), jnp.asarray(attn)
    oracle = _local_exact_oracle(v, shapes, l, a, radius=4)

    for ms in (10**9, 0):  # all-gather, then mixed windowed/gather
        got = ms_deform_attn_local(
            v, shapes, l, a, radius=4, interpret=True,
            precision=jax.lax.Precision.HIGHEST, min_samples=ms,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(oracle), rtol=1e-4, atol=1e-5,
            err_msg=f"min_samples={ms}",
        )

    # gradient consistency: VJP differentiates the oracle; the forward above
    # now matches it, so grad-of-sum-of-squares must match too
    def loss_local(v, l, a):
        return jnp.sum(
            ms_deform_attn_local(
                v, shapes, l, a, radius=4, interpret=True,
                precision=jax.lax.Precision.HIGHEST, min_samples=10**9,
            ) ** 2
        )

    def loss_oracle(v, l, a):
        return jnp.sum(_local_exact_oracle(v, shapes, l, a, radius=4) ** 2)

    g_local = jax.grad(loss_local, argnums=(0, 1, 2))(v, l, a)
    g_oracle = jax.grad(loss_oracle, argnums=(0, 1, 2))(v, l, a)
    for gl, ge in zip(g_local, g_oracle):
        np.testing.assert_allclose(np.asarray(gl), np.asarray(ge), rtol=1e-3, atol=1e-4)
