"""Real-TPU kernel smoke: compile+run every Pallas kernel at small shapes.

Interpret mode (the CPU test suite) does not enforce Mosaic's block
rules (e.g. sublane divisibility) or VMEM limits — run this after any
kernel change to catch real-lowering regressions in ~1 min:

    python scripts/tpu_smoke.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", "run on the TPU"
    from longterm360fov_tpu.models import seq2seq as S
    from longterm360fov_tpu.models.cell import init_lstm, lstm_cell
    from longterm360fov_tpu.ops import conv_resize as CR
    from longterm360fov_tpu.ops.fused_lstm import (
        fused_decode, fused_lstm_cell, fused_serve,
    )
    from longterm360fov_tpu.ops.lstm_train import lstm_seq

    rng = np.random.default_rng(0)
    ok = 0

    def check(name, fn, *args, ref=None, atol=2e-5):
        nonlocal ok
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        msg = f"{name}: {time.time()-t0:.1f}s"
        if ref is not None:
            d = float(
                max(
                    jnp.abs(a - b).max()
                    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(ref))
                )
            )
            assert d < atol, f"{name} parity {d}"
            msg += f" (maxdiff {d:.2e})"
        print(msg, flush=True)
        ok += 1

    # cell
    p = init_lstm(jax.random.PRNGKey(0), 3, 128)
    x = jnp.asarray(rng.normal(size=(16, 3)).astype(np.float32))
    st = (jnp.zeros((16, 128)), jnp.zeros((16, 128)))
    check("fused_lstm_cell", fused_lstm_cell, p, x, st, ref=lstm_cell(p, x, st))

    # decode + serve + train primitive via seq2seq
    cfg = S.Seq2SeqConfig(d=3, hidden=128, layers=2, h_in=6, h_out=9)
    params = S.init(jax.random.PRNGKey(1), cfg)
    past = jnp.asarray(rng.normal(size=(16, 6, 3)).astype(np.float32) * 0.1)
    fut = jnp.asarray(rng.normal(size=(16, 9, 3)).astype(np.float32) * 0.1)
    ref = S.decode(params, cfg, past)
    check(
        "fused_decode", lambda: S.decode_fused(params, cfg, past, tile_b=8),
        ref=ref,
    )
    check(
        "fused_serve", lambda: S.serve_fused(params, cfg, past, tile_b=8),
        ref=ref,
    )
    # lockstep-peer aligned serve (cfg.peer_align tier, r4)
    from longterm360fov_tpu.models import cross_user as CU

    acfg = S.Seq2SeqConfig(
        d=3, hidden=128, layers=2, h_in=6, h_out=9, ctx_dim=128,
        peer_align=True,
    )
    aparams = CU.init(jax.random.PRNGKey(5), acfg)
    peers = jnp.asarray(rng.normal(size=(16, 4, 9, 3)).astype(np.float32) * 0.1)
    amask = jnp.asarray(rng.integers(0, 2, size=(16, 4)).astype(np.float32))
    aref = CU.apply(aparams, acfg, past, other_future_n=peers,
                    other_mask=amask)
    check(
        "fused_serve_aligned",
        lambda: CU.serve_fused(aparams, acfg, past, other_future_n=peers,
                               other_mask=amask, tile_b=8),
        ref=aref, atol=2e-5,
    )

    ref_tf = S.apply(params, cfg, past, fut)
    check(
        "apply_fused_tf",
        lambda: S.apply_fused_tf(params, cfg, past, fut, tile_b=8),
        ref=ref_tf, atol=3e-5,
    )

    # lockstep-peer TRAINING kernel (ops.lstm_align, r5): fwd + grads
    # vs the XLA aligned path with the same coins
    afut = jnp.asarray(rng.normal(size=(16, 9, 3)).astype(np.float32) * 0.1)
    acoins = jnp.asarray(
        rng.integers(0, 2, size=(9, 16, 1)).astype(np.float32)
    )

    def _aligned_ref(p):
        ctx = CU.encode_peers_aligned(p, acfg, peers, amask)
        return S.apply(p, acfg, past, afut, coins=acoins, context=ctx)

    al_ref = _aligned_ref(aparams)
    check(
        "lstm_align fwd",
        lambda: CU._apply_fused_aligned(
            aparams, acfg, past, afut, other_future_n=peers,
            other_mask=amask, context=None, coins=acoins, tile_b=8,
        ),
        ref=al_ref, atol=3e-5,
    )

    def _al_loss_ref(p):
        return jnp.mean(_aligned_ref(p) ** 2)

    def _al_loss_fused(p):
        return jnp.mean(CU._apply_fused_aligned(
            p, acfg, past, afut, other_future_n=peers,
            other_mask=amask, context=None, coins=acoins, tile_b=8,
            residual_dtype=jnp.float32,  # exact-parity tier
        ) ** 2)

    check(
        "lstm_align grads", jax.grad(_al_loss_fused), aparams,
        ref=jax.grad(_al_loss_ref)(aparams), atol=5e-4,
    )

    def loss_fused(p):
        return jnp.mean(S.apply_fused_tf(p, cfg, past, fut, tile_b=8) ** 2)

    def loss_ref(p):
        return jnp.mean(S.apply(p, cfg, past, fut) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    check(
        "lstm_train grads", jax.grad(loss_fused), params,
        ref=g_ref, atol=5e-4,
    )

    # transformer fused AR decode
    from longterm360fov_tpu.models import transformer as TR
    from longterm360fov_tpu.ops.transformer_decode import fused_ar_decode

    tcfg = S.Seq2SeqConfig(d=3, hidden=128, layers=2, h_in=6, h_out=9)
    tparams = TR.init(jax.random.PRNGKey(2), tcfg)
    # the kernel's f32 tier pins Precision.HIGHEST; build the XLA
    # reference at the same precision (default = bf16 MXU passes whose
    # rounding differs between Mosaic and XLA)
    with jax.default_matmul_precision("highest"):
        tref = jax.block_until_ready(TR.apply(tparams, tcfg, past))
        tenc = jax.block_until_ready(TR._encode(tparams, tcfg, past))
    check(
        "transformer_decode f32",
        lambda: fused_ar_decode(
            tparams, tcfg, tenc, past[:, -1, :], compute_dtype=jnp.float32
        ),
        ref=tref, atol=5e-5,
    )
    check(
        "transformer_decode bf16",
        lambda: fused_ar_decode(
            tparams, tcfg, tenc, past[:, -1, :], compute_dtype=jnp.bfloat16
        ),
        ref=tref, atol=0.08,
    )

    # transformer fused ENCODER (serving tier)
    from longterm360fov_tpu.ops.transformer_encode import fused_encode_tokens

    check(
        "transformer_encode f32",
        lambda: fused_encode_tokens(
            tparams, tcfg, past, compute_dtype=jnp.float32
        ),
        ref=tenc, atol=5e-5,
    )

    # encode-only tier (T4)
    from longterm360fov_tpu.ops.fused_lstm import fused_encode

    enc_params = [init_lstm(jax.random.PRNGKey(7), 3, 128)]
    seq = jnp.asarray(rng.normal(size=(16, 9, 3)).astype(np.float32))
    h_scan = lstm_seq(enc_params, seq)[:, -1, :]
    check(
        "fused_encode",
        lambda: fused_encode(enc_params, seq, tile_b=8),
        ref=h_scan, atol=2e-5,
    )

    # cross_user fused serve with peers (T4 encode + ctx serve kernel)
    from longterm360fov_tpu.models import cross_user as CU

    ccfg = S.Seq2SeqConfig(d=3, hidden=128, layers=2, h_in=6, h_out=9,
                           ctx_dim=128)
    cparams = CU.init(jax.random.PRNGKey(3), ccfg)
    others = jnp.asarray(rng.normal(size=(16, 3, 9, 3)).astype(np.float32) * 0.1)
    cmask = jnp.ones((16, 3))
    cref = CU.apply(cparams, ccfg, past, other_future_n=others, other_mask=cmask)
    check(
        "cross_user serve_fused+peers",
        lambda: CU.serve_fused(
            cparams, ccfg, past, other_future_n=others, other_mask=cmask,
            tile_b=8,
        ),
        ref=cref, atol=5e-5,
    )

    # scheduled-sampling fused decoder (identical coin draws by design;
    # bit-exact parity is CPU-interpret-tested). On real TPU both paths
    # run f32 matmuls as bf16 MXU passes whose ROUNDING differs between
    # Mosaic and XLA; the SS feedback loop (model outputs re-entering
    # the decoder) amplifies that to ~3e-3 over 9 steps — measured
    # identical with f32 residual streams, so it is engine rounding, not
    # the bf16-residual tier (teacher forcing, no feedback: 1e-5 above).
    key = jax.random.PRNGKey(11)
    ss_ref = S.apply(params, cfg, past, fut, rng=key, teacher_prob=0.5)
    check(
        "apply_fused_ss",
        lambda: S.apply_fused_ss(
            params, cfg, past, fut, rng=key, teacher_prob=0.5, tile_b=8
        ),
        ref=ss_ref, atol=1e-2,
    )

    # transformer peer-attention tier (mixed mask incl. a no-peer viewer)
    pmask = np.ones((16, 3), np.float32)
    pmask[0] = 0.0
    pmask = jnp.asarray(pmask)
    with jax.default_matmul_precision("highest"):
        pref = jax.block_until_ready(
            TR.apply(tparams, tcfg, past, other_future_n=others,
                     other_mask=pmask)
        )
        pmem, pvalid = TR._peer_tokens(tparams, tcfg, others, pmask)
    check(
        "transformer_decode peer tier",
        lambda: fused_ar_decode(
            tparams, tcfg, tenc, past[:, -1, :],
            peer_mem=pmem.astype(jnp.float32), peer_valid=pvalid,
            compute_dtype=jnp.float32,
        ),
        ref=pref, atol=5e-5,
    )

    # GROUP-shared peer tier (r4 peer dedup): 256 rows = 2 group-pure
    # 128-tiles; plain + windowed variants vs the XLA per-row expansion
    import dataclasses as _dc

    past256s = jnp.asarray(
        rng.normal(size=(256, tcfg.h_in, 3)).astype(np.float32) * 0.1
    )
    gfut = jnp.asarray(
        rng.normal(size=(2, 3, tcfg.h_out, 3)).astype(np.float32) * 0.1
    )
    gmask2 = np.ones((2, 3), np.float32)
    gmask2[1, 2] = 0.0  # one absent peer in group 1
    gmask2 = jnp.asarray(gmask2)
    gid = jnp.asarray(np.repeat(np.arange(2, dtype=np.int32), 128))
    for wname, wcfg in [
        ("", tcfg), (" windowed", _dc.replace(tcfg, peer_window=2)),
    ]:
        with jax.default_matmul_precision("highest"):
            gref = jax.block_until_ready(TR.apply(
                tparams, wcfg, past256s,
                other_future_n=jnp.take(gfut, gid, axis=0),
                other_mask=jnp.take(gmask2, gid, axis=0),
            ))
            genc = TR._encode(tparams, wcfg, past256s)
            gmem, gvalid = TR._peer_tokens(tparams, wcfg, gfut, gmask2)
        check(
            f"transformer_decode shared-peer{wname} tier",
            lambda: fused_ar_decode(
                tparams, wcfg, genc, past256s[:, -1, :],
                peer_gmem=gmem.astype(jnp.float32), peer_gvalid=gvalid,
                peer_gid=gid, compute_dtype=jnp.float32,
            ),
            ref=gref, atol=5e-5,
        )

    # anchor-corrected shared tier (r5): raw group sets + per-row δv ==
    # per-row tier on anchored copies (the production dedup contract)
    anch = jnp.asarray(
        rng.normal(size=(256, 3)).astype(np.float32) * 0.1
    )
    with jax.default_matmul_precision("highest"):
        aref = jax.block_until_ready(TR.apply(
            tparams, tcfg, past256s,
            other_future_n=jnp.take(gfut, gid, axis=0)
            - anch[:, None, None, :],
            other_mask=jnp.take(gmask2, gid, axis=0),
        ))
    def _anchor_corrected():
        # serve_fused's XLA pre-stages (_peer_tokens/_encode) must run
        # at the same precision as the reference above — on TPU the
        # default lowers f32 dots to bf16 passes (~1e-2 drift), which
        # would mask/flag kernel issues either way
        with jax.default_matmul_precision("highest"):
            return TR.serve_fused(
                tparams, tcfg, past256s, group_future_n=gfut,
                group_mask=gmask2, peer_gid=gid, peer_anchor=anch,
                compute_dtype=jnp.float32, fused_encoder=False,
            )

    check(
        "transformer_decode shared-peer anchor-corrected tier",
        _anchor_corrected,
        ref=aref, atol=5e-5,
    )

    # conv+resize
    frames = jnp.asarray(rng.normal(size=(3, 48, 96)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))
    b = jnp.zeros((4,))
    check(
        "fused_conv_resize",
        lambda: CR.fused_conv_resize(frames, (16, 32), k, b),
        ref=CR.conv_resize_reference(frames, (16, 32), k, b), atol=1e-4,
    )

    # LAST + fenced: the differentiable encoder tier (fwd-stash +
    # reverse kernels). Its reverse-kernel Mosaic compile has gotten
    # the relay's compile helper OOM-killed (TODO.md) — run it after
    # every other kernel so a failure here cannot mask regressions in
    # the rest of the smoke. b=256 exercises cross-tile weight-grad
    # accumulation on real Mosaic.
    from longterm360fov_tpu.ops.transformer_encode_train import (
        fused_encode_train,
    )

    past256 = jnp.asarray(rng.normal(size=(256, 6, 3)).astype(np.float32) * 0.1)

    def tloss_fused(p):
        return jnp.mean(fused_encode_train(p, tcfg, past256) ** 2)

    def tloss_ref(p):
        return jnp.mean(TR._encode(p, tcfg, past256) ** 2)

    try:
        with jax.default_matmul_precision("highest"):
            tg_ref = jax.block_until_ready(jax.grad(tloss_ref)(tparams))
        check(
            "transformer_encode_train grads", jax.grad(tloss_fused), tparams,
            ref=tg_ref, atol=5e-4,
        )
    except Exception as e:  # noqa: BLE001
        print(
            "transformer_encode_train grads: FAILED "
            f"({type(e).__name__}: {str(e)[:160]}) — known-risky compile, "
            "all other kernels already verified above",
            flush=True,
        )

    print(f"ALL {ok} KERNELS OK on {jax.devices()[0].device_kind}")


if __name__ == "__main__":
    main()
