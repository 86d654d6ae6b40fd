#!/usr/bin/env python
"""On-chip validation of the round-3 fused decode kernels.

Compiles and runs decode_select_emit / decode_attend_fused (+ ragged
variants) on the real TPU at the reference config, comparing against the
round-2 kernel path computed in the same process.  Fast signal on Mosaic
legality (sublane concat, when-guarded DMA, aliasing, SMEM-indexed DMA
starts) before any long benchmark.

  python scripts/tpu_fused_smoke.py [--batch 8] [--max-len 4096]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nsa_tpu.config import reference_model_config
from nsa_tpu.models.transformer import init_transformer
from nsa_tpu.ops.nsa import _compress_kv, _ff_apply_gelu, init_decode_cache
from nsa_tpu.ops.attention import gather_blocks
from nsa_tpu.ops.pallas.nsa_decode import decode_attend, decode_select
from nsa_tpu.ops.pallas.nsa_decode_fused import (
    decode_attend_fused,
    decode_attend_fused_ragged,
    decode_select_emit,
    decode_select_emit_ragged,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-len", type=int, default=4096)
    ap.add_argument("--t", type=int, default=127)  # t+1 % 8 == 0 -> emit
    ap.add_argument("--f32", action="store_true",
                    help="float32 (CPU interpret dry-runs; TPU uses bf16)")
    args = ap.parse_args()

    dt = "float32" if args.f32 else "bfloat16"
    cfg = reference_model_config("mlp").replace(dtype=dt, attn_impl="pallas")
    nsa = cfg.nsa
    b, d, h, kvh = args.batch, cfg.dim_head, cfg.heads, cfg.kv_heads
    g = cfg.num_grouped_queries
    Bc, stride, Bs = (nsa.compress_block_size,
                      nsa.compress_block_sliding_stride,
                      nsa.selection_block_size)
    S_k, window = nsa.num_selected_blocks, nsa.sliding_window_size
    max_len = args.max_len
    scale = d ** -0.5
    n_slide = -(-window // Bs) + 1

    DT = jnp.float32 if args.f32 else jnp.bfloat16
    params = init_transformer(jax.random.PRNGKey(0), cfg)
    layer = jax.tree_util.tree_map(
        lambda x: x.astype(DT), params["layers"][0]["attn"]
    )
    ks = jax.random.split(jax.random.PRNGKey(42), 10)
    t_val = args.t
    t = jnp.asarray(t_val, jnp.int32)
    num_cb = t // stride

    cache = init_decode_cache(cfg, b, max_len, DT)
    kv = (jax.random.normal(ks[0], cache.kv.shape) * 0.1).astype(DT)
    ckv = (jax.random.normal(ks[1], cache.ckv.shape) * 0.1).astype(DT)
    ring = (jax.random.normal(ks[2], cache.ring.shape) * 0.1).astype(DT)
    q = (jax.random.normal(ks[3], (b, kvh, g, d)) * 0.5).astype(DT)
    rq = (jax.random.normal(ks[4], (b, kvh, g, d)) * 0.5).astype(DT)
    kv_new = (jax.random.normal(ks[5], (b, kvh, 2 * d)) * 0.1).astype(DT)
    kv_new_rot = (jax.random.normal(ks[6], (b, kvh, 2 * d)) * 0.1).astype(DT)
    gates = jax.nn.sigmoid(jax.random.normal(ks[7], (b, kvh, g, 3))).astype(DT)
    x = (jax.random.normal(ks[8], (b, 1, cfg.dim)) * 0.3).astype(DT)

    # ---- round-2 reference pieces (on chip) ------------------------------
    ring_r2 = jnp.concatenate([ring[:, :, 1:], kv_new[:, :, None]], axis=2)
    kv_cache_r2 = jax.lax.dynamic_update_slice(
        kv, kv_new_rot[:, :, None], (0, 0, t_val, 0))
    row_pos = (t + 1 - Bc) + jnp.arange(Bc)
    valid = (row_pos >= 0)[None, None, :, None]
    win = jnp.where(valid, ring_r2, 0.0)
    new_ck, new_cv = _compress_kv(
        layer, cfg, win[:, :, None, :, :d], win[:, :, None, :, d:])
    cand = jnp.concatenate([new_ck, new_cv], axis=-1)
    trash = ckv.shape[2] - 1
    emit = (Bc - stride + t - num_cb * stride + 1 == Bc)
    slot = jnp.where(emit, jnp.clip(num_cb, 0, trash), trash)
    ckv_r2 = jax.lax.dynamic_update_slice(ckv, cand, (0, 0, slot, 0))
    print("emit:", bool(emit), flush=True)

    c_out_r2, idx_r2, msk_r2 = decode_select(
        q, ckv_r2, layer["mem_kv"], t, num_cb, max_blocks=max_len // Bs,
        stride=stride, sel_block=Bs, window=window, num_sel=S_k,
        n_slide=n_slide, scale=scale, batch_tile=8)
    kvb = kv_cache_r2.reshape(b, kvh, max_len // Bs, Bs, 2 * d)
    fkv = gather_blocks(kvb, idx_r2[:, :, None])[:, :, 0]
    fkv = fkv.reshape(b, kvh, (S_k + n_slide) * Bs, 2 * d)
    combined_r2 = decode_attend(
        rq, fkv, msk_r2, c_out_r2, gates, t, sel_block=Bs, window=window,
        num_sel=S_k, n_slide=n_slide, scale=scale, batch_tile=8)
    out_r2 = x + (combined_r2.reshape(b, 1, h * d)
                  @ layer["w_out"].astype(x.dtype))
    out_r2 = np.asarray(out_r2)
    print("round-2 path ran", flush=True)

    # ---- fused path (on chip) --------------------------------------------
    kc, vc = layer["k_compress"], layer["v_compress"]
    pos_kv = jnp.concatenate([layer["k_pos"], layer["v_pos"]], axis=-1)
    w2 = jnp.concatenate([kc["w2"], vc["w2"]], axis=-1)
    b2 = jnp.concatenate([kc["b2"], vc["b2"]], axis=-1)

    c_out_f, info_f, ckv_f, ring_f = decode_select_emit(
        q, ckv, ring, kv_new[:, :, None], layer["mem_kv"], pos_kv,
        kc["w1"], kc["b1"], vc["w1"], vc["b1"], w2, b2, t, num_cb,
        max_blocks=max_len // Bs, stride=stride, sel_block=Bs,
        num_sel=S_k, n_slide=n_slide, scale=scale, batch_tile=8)
    err_ring = np.abs(np.asarray(ring_f) - np.asarray(ring_r2)).max()
    err_ckv = np.abs(np.asarray(ckv_f).astype(np.float32)
                     - np.asarray(ckv_r2).astype(np.float32)).max()
    err_cout = np.abs(np.asarray(c_out_f).astype(np.float32)
                      - np.asarray(c_out_r2).astype(np.float32)).max()
    ncols = S_k + n_slide + S_k        # idx + trailing + msk (written cols)
    info_eq = np.array_equal(
        np.asarray(info_f).reshape(b, kvh, -1)[:, :, :ncols],
        np.asarray(msk_r2).reshape(b, kvh, -1)[:, :, :ncols],
    )
    print(f"A: ring_err={err_ring} ckv_err={err_ckv} cout_err={err_cout} "
          f"info_eq={info_eq}", flush=True)

    out_f, kv_f = decode_attend_fused(
        rq, kv, kv_new_rot[:, :, None], info_f, c_out_f, gates, x,
        layer["w_out"], t, sel_block=Bs, window=window, num_sel=S_k,
        n_slide=n_slide, scale=scale, batch_tile=8)
    err_kv = np.abs(np.asarray(kv_f).astype(np.float32)
                    - np.asarray(kv_cache_r2).astype(np.float32)).max()
    err_out = np.abs(np.asarray(out_f).astype(np.float32)
                     - out_r2.astype(np.float32)).max()
    print(f"B: kv_err={err_kv} out_err={err_out}", flush=True)

    # ---- with_ff variant: THE path bench.py runs (in-kernel FF tail) -----
    # round-3 shipped an unsmoked with_ff kernel and the bench died on a
    # Mosaic-illegal erfc (exact GELU); this section exists so that class
    # of failure is caught here first.
    ffp = jax.tree_util.tree_map(
        lambda a: a.astype(DT), params["layers"][0]["ff"]
    )
    ff_tuple = (ffp["norm_scale"], ffp["w1"], ffp["b1"], ffp["w2"], ffp["b2"])
    out_r2_dev = jnp.asarray(out_r2).astype(DT)
    out_ff_r2 = np.asarray(
        out_r2_dev + _ff_apply_gelu(ffp, cfg, out_r2_dev)
    ).astype(np.float32)
    out_ffk, _ = decode_attend_fused(
        rq, kv, kv_new_rot[:, :, None], info_f, c_out_f, gates, x,
        layer["w_out"], t, ff_tuple, sel_block=Bs, window=window,
        num_sel=S_k, n_slide=n_slide, scale=scale, batch_tile=8,
        eps=cfg.norm_eps)
    err_ff = np.abs(np.asarray(out_ffk).astype(np.float32)
                    - out_ff_r2).max()
    print(f"B+FF: out_err={err_ff}", flush=True)

    # ---- ragged variants (mixed per-row positions) -----------------------
    tv = jnp.asarray(
        [t_val - (i % 3) * 5 for i in range(b)], jnp.int32
    )
    ncv = tv // stride
    c_out_g, info_g, ckv_g, ring_g = decode_select_emit_ragged(
        q, ckv, ring, kv_new[:, :, None], layer["mem_kv"], pos_kv,
        kc["w1"], kc["b1"], vc["w1"], vc["b1"], w2, b2, tv, ncv,
        max_blocks=max_len // Bs, stride=stride, sel_block=Bs,
        num_sel=S_k, n_slide=n_slide, scale=scale, batch_tile=8)
    out_g, kv_g = decode_attend_fused_ragged(
        rq, kv, kv_new_rot[:, :, None], info_g, c_out_g, gates, x,
        layer["w_out"], tv, sel_block=Bs, window=window, num_sel=S_k,
        n_slide=n_slide, scale=scale, batch_tile=8)
    print("ragged kernels ran:",
          np.isfinite(np.asarray(out_g).astype(np.float32)).all(), flush=True)

    # spot-check ragged row 0 (t matches the scalar case) against fused
    same_rows = [i for i in range(b) if (i % 3) == 0]
    err_rag = max(
        np.abs(np.asarray(out_g[i]).astype(np.float32)
               - np.asarray(out_f[i]).astype(np.float32)).max()
        for i in same_rows
    )
    print(f"ragged rows-at-same-t vs scalar fused: max_err={err_rag}",
          flush=True)

    # ---- ragged with_ff (the serving engine's default path) --------------
    out_gf, _ = decode_attend_fused_ragged(
        rq, kv, kv_new_rot[:, :, None], info_g, c_out_g, gates, x,
        layer["w_out"], tv, ff_tuple, sel_block=Bs, window=window,
        num_sel=S_k, n_slide=n_slide, scale=scale, batch_tile=8,
        eps=cfg.norm_eps)
    err_rag_ff = max(
        np.abs(np.asarray(out_gf[i]).astype(np.float32)
               - np.asarray(out_ffk[i]).astype(np.float32)).max()
        for i in same_rows
    )
    print(f"ragged+FF rows-at-same-t vs scalar fused+FF: "
          f"max_err={err_rag_ff}", flush=True)

    ok = (err_ring == 0 and err_ckv < 2e-2 and err_cout < 2e-2
          and info_eq and err_kv == 0 and err_out < 5e-2 and err_rag < 5e-2
          and err_ff < 1e-1 and err_rag_ff < 5e-2)
    print("SMOKE", "PASS" if ok else "FAIL", flush=True)


if __name__ == "__main__":
    main()
