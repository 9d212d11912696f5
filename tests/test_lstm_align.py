"""Lockstep-peer TRAINING kernel (ops.lstm_align) parity vs the XLA
aligned path: encode_peers_aligned + the scan decoder, given identical
coins (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longterm360fov_tpu.models import cross_user as CU
from longterm360fov_tpu.models import seq2seq as S
from longterm360fov_tpu.models.seq2seq import Seq2SeqConfig


def _setup(layers=2, k=3, h_in=4, t_out=5, hidden=16, ctx_dim=8, seed=0,
           b=8, masked=True):
    cfg = Seq2SeqConfig(
        d=3, hidden=hidden, layers=layers, h_in=h_in, h_out=t_out,
        ctx_dim=ctx_dim, peer_align=True,
    )
    params = CU.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed)
    past = jnp.asarray(rng.normal(size=(b, h_in, 3)).astype(np.float32))
    fut = jnp.asarray(rng.normal(size=(b, t_out, 3)).astype(np.float32))
    peers = jnp.asarray(
        0.2 * rng.normal(size=(b, k, t_out, 3)).astype(np.float32)
    )
    if masked:
        mask = jnp.asarray(
            rng.integers(0, 2, size=(b, k)).astype(np.float32)
        ).at[:, 0].set(1.0)
    else:
        mask = None
    coins = jnp.asarray(
        rng.integers(0, 2, size=(t_out, b, 1)).astype(np.float32)
    )
    return cfg, params, past, fut, peers, mask, coins


def _ref(params, cfg, past, fut, peers, mask, coins):
    """XLA reference: aligned peer context + scan decoder with the same
    coins (cross_user.apply's composition, coins made explicit)."""
    ctx = CU.encode_peers_aligned(params, cfg, peers, mask)
    return S.apply(params, cfg, past, fut, coins=coins, context=ctx)


@pytest.mark.parametrize(
    "layers,masked",
    [pytest.param(1, True, marks=pytest.mark.slow), (2, True),
     pytest.param(2, False, marks=pytest.mark.slow)],
)
def test_aligned_forward_parity(layers, masked):
    cfg, params, past, fut, peers, mask, coins = _setup(
        layers=layers, masked=masked
    )
    ref = _ref(params, cfg, past, fut, peers, mask, coins)
    out = CU._apply_fused_aligned(
        params, cfg, past, fut, other_future_n=peers, other_mask=mask,
        context=None, coins=coins, tile_b=8,
    )
    assert out is not None
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


@pytest.mark.parametrize("layers,masked", [(2, True),
                                           pytest.param(1, False,
                                                        marks=pytest.mark.slow)])
def test_aligned_grad_parity(layers, masked):
    """Every leaf: decoder/encoder/peer/proj params AND the data-side
    cotangents (teacher futures, past via y0/h0/c0, peer windows, mask
    weights ride inside the masked-mean)."""
    cfg, params, past, fut, peers, mask, coins = _setup(
        layers=layers, masked=masked, seed=1
    )

    def loss_ref2(p, peers_, fut_, past_):
        ctx = CU.encode_peers_aligned(p, cfg, peers_, mask)
        out = S.apply(p, cfg, past_, fut_, coins=coins, context=ctx)
        return jnp.sum(out ** 2)

    def loss_fused(p, peers_, fut_, past_):
        out = CU._apply_fused_aligned(
            p, cfg, past_, fut_, other_future_n=peers_, other_mask=mask,
            context=None, coins=coins, tile_b=8,
            residual_dtype=jnp.float32,  # exact-parity tier
        )
        return jnp.sum(out ** 2)

    gr = jax.grad(loss_ref2, argnums=(0, 1, 2, 3))(
        params, peers, fut, past
    )
    gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(
        params, peers, fut, past
    )
    for a, b_, path in zip(
        jax.tree.leaves(gr), jax.tree.leaves(gf),
        [str(p) for p, _ in jax.tree_util.tree_leaves_with_path(gr)],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=5e-4, rtol=1e-3,
            err_msg=f"grad mismatch at {path}",
        )


def test_aligned_tf_is_ss_with_heads_coins():
    """apply_fused_tf under peer_align == the aligned kernel with every
    coin heads == the XLA teacher-forced path."""
    cfg, params, past, fut, peers, mask, _ = _setup(seed=2)
    ones = jnp.ones((fut.shape[1], past.shape[0], 1), jnp.float32)
    ref = _ref(params, cfg, past, fut, peers, mask, ones)
    out = CU.apply_fused_tf(
        params, cfg, past, fut, other_future_n=peers, other_mask=mask,
        tile_b=8,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-5
    )


def test_aligned_fused_routing_fallbacks():
    """No peers → tier returns None (XLA fallback); a short peer span
    is a loud error (the XLA aligned scan can't zip it either)."""
    cfg, params, past, fut, peers, mask, coins = _setup(seed=3)
    assert CU._apply_fused_aligned(
        params, cfg, past, fut, other_future_n=None, other_mask=None,
        context=None, coins=coins,
    ) is None
    short = peers[:, :, :3]
    with pytest.raises(ValueError, match="span"):
        CU._apply_fused_aligned(
            params, cfg, past, fut, other_future_n=short,
            other_mask=mask, context=None, coins=coins,
        )


@pytest.mark.slow
def test_aligned_grad_bf16_residuals_close():
    """The default (deployment) tier streams bf16 residuals — grads
    stay close to the f32-residual exact tier (it is the residual
    ENCODING that changes, not the math)."""
    cfg, params, past, fut, peers, mask, coins = _setup(seed=4)

    def loss(p, rd):
        out = CU._apply_fused_aligned(
            p, cfg, past, fut, other_future_n=peers, other_mask=mask,
            context=None, coins=coins, tile_b=8, residual_dtype=rd,
        )
        return jnp.sum(out ** 2)

    g32 = jax.grad(lambda p: loss(p, jnp.float32))(params)
    g16 = jax.grad(lambda p: loss(p, jnp.bfloat16))(params)
    for a, b_ in zip(jax.tree.leaves(g32), jax.tree.leaves(g16)):
        denom = max(float(jnp.abs(a).max()), 1e-3)
        assert float(jnp.abs(a - b_).max()) / denom < 0.03
