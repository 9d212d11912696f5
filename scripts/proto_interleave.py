"""Prototype: sub-tile-interleaved fused serve kernel.

Hypothesis: the serve kernel's per-step chain (MXU matmul → VPU gates →
MXU proj) leaves units idle; processing TWO independent batch sub-tiles
in one loop body lets the scheduler overlap A's VPU phase with B's MXU
phase. Measure vs the production kernel at the bench batch.
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(*refs, n_layers, t_in, t_out, hidden, d, tile_b, n_sub):
    it = iter(refs)
    xs_ref = next(it)
    w_enc = [next(it) for _ in range(n_layers)]
    b_enc = [next(it) for _ in range(n_layers)]
    w_dec = [next(it) for _ in range(n_layers)]
    b_dec = [next(it) for _ in range(n_layers)]
    pw_ref = next(it)
    pb_ref = next(it)
    ys_ref = next(it)
    # scratch: z[l][s], c (L, tile_b, H)
    z_s = [[next(it) for _ in range(n_sub)] for _ in range(n_layers)]
    c_s = next(it)

    sub = tile_b // n_sub

    for l in range(n_layers):
        for s in range(n_sub):
            z_s[l][s][:] = jnp.zeros_like(z_s[l][s])
    c_s[:] = jnp.zeros_like(c_s)

    def cells(l, in_l, w_refs, b_refs):
        # issue ALL sub-tile matmuls first, then all elementwise — the
        # scheduler can overlap MXU(s+1) with VPU(s)
        gates = [
            jnp.dot(z_s[l][s][:], w_refs[l][:],
                    preferred_element_type=jnp.float32) + b_refs[l][:]
            for s in range(n_sub)
        ]
        hs = []
        for s in range(n_sub):
            g = gates[s]
            i = jax.nn.sigmoid(g[:, :hidden])
            f = jax.nn.sigmoid(g[:, hidden : 2 * hidden])
            gg = jnp.tanh(g[:, 2 * hidden : 3 * hidden])
            o = jax.nn.sigmoid(g[:, 3 * hidden :])
            c_new = f * c_s[l, s * sub : (s + 1) * sub] + i * gg
            h_new = o * jnp.tanh(c_new)
            c_s[l, s * sub : (s + 1) * sub] = c_new
            z_s[l][s][:, in_l:] = h_new
            hs.append(h_new)
        return hs

    def enc_step(t, _):
        x_t = xs_ref[:, pl.ds(t, 1), :][:, 0, :].T  # (tile_b, d)
        inps = [x_t[s * sub : (s + 1) * sub] for s in range(n_sub)]
        for l in range(n_layers):
            in_l = d if l == 0 else hidden
            for s in range(n_sub):
                z_s[l][s][:, :in_l] = inps[s]
            inps = cells(l, in_l, w_enc, b_enc)
        return 0

    lax.fori_loop(0, t_in, enc_step, 0)

    y0 = xs_ref[:, pl.ds(t_in - 1, 1), :][:, 0, :].T
    for s in range(n_sub):
        z_s[0][s][:, :d] = y0[s * sub : (s + 1) * sub]

    def dec_step(t, _):
        inps = None
        for l in range(n_layers):
            if l > 0:
                for s in range(n_sub):
                    z_s[l][s][:, :hidden] = inps[s]
            inps = cells(l, d if l == 0 else hidden, w_dec, b_dec)
        ys = [
            jnp.dot(inps[s], pw_ref[:], preferred_element_type=jnp.float32)
            + pb_ref[:]
            for s in range(n_sub)
        ]
        y = jnp.concatenate(ys, axis=0)  # (tile_b, d)
        ys_ref[:, pl.ds(t, 1), :] = y.T[:, None, :]
        for s in range(n_sub):
            z_s[0][s][:, :d] = ys[s]
        return 0

    lax.fori_loop(0, t_out, dec_step, 0)


def serve_interleaved(enc_params, dec_params, proj_w, proj_b, past_n,
                      t_out, tile_b=2048, n_sub=2):
    n_layers = len(enc_params)
    batch, t_in, d = past_n.shape
    hidden = proj_w.shape[0]
    grid = (batch // tile_b,)
    xs = jnp.transpose(past_n.astype(jnp.float32), (2, 1, 0))
    kernel = functools.partial(
        _kernel, n_layers=n_layers, t_in=t_in, t_out=t_out,
        hidden=hidden, d=d, tile_b=tile_b, n_sub=n_sub,
    )
    in_specs = [pl.BlockSpec((d, t_in, tile_b), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM)]
    inputs = [xs]
    for plist in (enc_params, dec_params):
        for p in plist:
            in_specs.append(pl.BlockSpec(p.w.shape, lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(p.w)
        for p in plist:
            in_specs.append(pl.BlockSpec((1, p.b.shape[0]), lambda i: (0, 0),
                                         memory_space=pltpu.VMEM))
            inputs.append(p.b.reshape(1, -1))
    in_specs += [
        pl.BlockSpec(proj_w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    inputs += [proj_w, proj_b.reshape(1, -1)]
    scratch = []
    sub = tile_b // n_sub
    for l in range(n_layers):
        in_l = d if l == 0 else hidden
        for s in range(n_sub):
            scratch.append(pltpu.VMEM((sub, in_l + hidden), jnp.float32))
    scratch.append(pltpu.VMEM((n_layers, tile_b, hidden), jnp.float32))
    ys = pl.pallas_call(
        kernel, grid=grid,
        out_shape=jax.ShapeDtypeStruct((d, t_out, batch), jnp.float32),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((d, t_out, tile_b), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
    )(*inputs)
    return jnp.transpose(ys, (2, 1, 0))


def main():
    from longterm360fov_tpu import windows
    from longterm360fov_tpu.config import get_preset
    from longterm360fov_tpu.models import seq2seq as S

    cfg = get_preset("seq2seq-tf-30")
    params = S.init(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.default_rng(0)
    B = 262144
    past_h = rng.normal(size=(B, 30, 3)).astype(np.float32)
    past_h /= np.linalg.norm(past_h, axis=-1, keepdims=True)
    past = jnp.asarray(past_h)

    # parity first at small batch
    small = past[:2048]

    def run_inter(x, n_sub, tile):
        past_n, _, anchor = windows.normalize_window(x)
        pred = serve_interleaved(
            params["encoder"], params["decoder"],
            params["proj"]["w"], params["proj"]["b"],
            past_n, cfg.model.h_out, tile_b=tile, n_sub=n_sub,
        )
        return windows.denormalize_window(pred, anchor, to_sphere=True)

    ref = jax.jit(lambda x: windows.denormalize_window(
        S.serve_fused(params, cfg.model, windows.normalize_window(x)[0]),
        windows.normalize_window(x)[2], to_sphere=True))(small)
    out = jax.jit(functools.partial(run_inter, n_sub=2, tile=2048))(small)
    print("parity maxdiff:", float(jnp.abs(out - ref).max()), flush=True)

    for n_sub, tile in ((2, 2048), (2, 4096), (4, 4096)):
        try:
            f = jax.jit(functools.partial(run_inter, n_sub=n_sub, tile=tile))
            t0 = time.time(); f(past).block_until_ready()
            c = time.time() - t0
            t0 = time.time()
            for _ in range(10):
                o = f(past)
            o.block_until_ready()
            thr = B * 10 / (time.time() - t0)
            print(f"interleave n{n_sub} t{tile}: compile {c:.1f}s "
                  f"thr {thr:,.0f} traj/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"n{n_sub} t{tile}: FAILED {type(e).__name__} {str(e)[:100]}",
                  flush=True)


if __name__ == "__main__":
    main()

# NOTE (r3): the timings above used block_until_ready, which became a
# lying barrier over the axon relay this round (async completion).
# This file is kept as the archived round-1 experiment record; re-run
# with scalar-fetch difference timing (see bench.py) before trusting
# fresh numbers from it.
