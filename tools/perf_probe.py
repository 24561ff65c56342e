"""On-chip perf probe for the 1.4B sampling path: AR/decode split, tunnel
overhead, and per-component (body / head / classifier+sampling) timing.

Feeds VERDICT round-2 item #1: quantify where the 9.5 ms/sample goes vs the
~4.4 ms/sample HBM roofline before writing any new kernel.

Usage:  python tools/perf_probe.py [--trace]
Env:    PROBE_BS (default 100), PROBE_INT8
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer import sampling as S

import bench  # reuse model builders

BS = int(os.environ.get("PROBE_BS", "100"))
bench.BATCH_SIZE = BS


def fetch(x):
    """Force completion through the tunnel (block_until_ready doesn't)."""
    return np.asarray(x)


def timeit(fn, n=3, label=""):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(f"# {label}: {best*1000:.1f} ms  ({best/BS*1000:.3f} ms/sample)", flush=True)
    return best


def main():
    tconf, params, vqvae, vq_vars = bench.build_models()
    vq_config = vqvae.quantizer_config
    vq_state = vq_vars["codebook"]["state"]
    H, W, D = tconf.block_size
    HW, C = H * W, tconf.embed_dim
    dtype = bench.DTYPE

    # --- tunnel RTT ------------------------------------------------------
    tiny = jnp.zeros((), jnp.float32) + 1
    fetch(tiny)
    rtts = []
    for _ in range(10):
        t0 = time.time()
        fetch(tiny + 1)
        rtts.append(time.time() - t0)
    print(f"# tunnel RTT (tiny fetch): median {np.median(rtts)*1000:.1f} ms", flush=True)

    cond = jnp.zeros((BS,), jnp.int32)
    skip_base = bool(os.environ.get("PROBE_SKIP_BASE"))

    def sample_fn(key):
        return S.sample(
            params, tconf, key, BS, cond=cond,
            vq_state=vq_state, vq_config=vq_config,
            temperature=1.0, top_k=None, top_p=None, dtype=dtype,
        )

    if not skip_base:
        t0 = time.time()
        codes = sample_fn(jax.random.PRNGKey(0))
        fetch(codes.sum())
        print(f"# sample compile+run: {time.time()-t0:.1f} s", flush=True)

        # --- AR timing: per-iter sync vs chained dispatch ----------------
        def ar_per_iter():
            for i in range(4):
                fetch(sample_fn(jax.random.PRNGKey(i)).sum())

        def ar_chained():
            outs = [sample_fn(jax.random.PRNGKey(10 + i)) for i in range(4)]
            fetch(sum(o.sum() for o in outs))

        t_sync = timeit(ar_per_iter, 2, f"AR x4 per-iter sync (bs{BS})") / 4
        t_chain = timeit(ar_chained, 2, f"AR x4 chained dispatch (bs{BS})") / 4
        print(f"# AR: {t_chain/BS*1000:.2f} ms/sample chained; "
              f"sync overhead {((t_sync-t_chain)/BS*1000):.2f} ms/sample", flush=True)

        # --- decode timing -----------------------------------------------
        decode_chunk = min(int(os.environ.get("BENCH_DECODE_CHUNK", "100")), BS)
        n_chunks = max(1, BS // decode_chunk)

        from rqvae_tpu.models.rqvae.model import RQVAE

        @jax.jit
        def decode_fn(codes):
            chunks = codes.reshape(n_chunks, decode_chunk, *codes.shape[1:])

            def dec(chunk):
                pix = vqvae.apply(vq_vars, chunk, method=RQVAE.decode_code)
                return jnp.clip(0.5 * pix + 0.5, 0.0, 1.0)

            pixels = jax.lax.map(dec, chunks)
            return pixels.reshape(BS, *pixels.shape[2:])

        t0 = time.time()
        fetch(decode_fn(codes)[:, ::64, ::64].mean())
        print(f"# decode compile+run: {time.time()-t0:.1f} s", flush=True)
        timeit(lambda: fetch(decode_fn(codes)[:, ::64, ::64].mean()), 3, f"decode (bs{BS})")

    # --- component probes (params passed as args: closing over them ships
    # 2.4GB of captured constants through the remote-compile tunnel) -------
    t_max = tconf.block_size_cond + HW

    @jax.jit
    def body_only(p, key):
        kv = M.init_kv_cache(tconf.body, BS, t_max, dtype)
        x0 = jax.random.normal(key, (BS, 1, C), dtype)

        def step(carry, t):
            x, kv = carry
            h, kv = M.stack_step(p, x, kv, t, tconf.body)
            return (h, kv), ()

        (h, _), _ = jax.lax.scan(step, (x0, kv), jnp.arange(HW, dtype=jnp.int32))
        return h.sum()

    fetch(body_only(params["body"], jax.random.PRNGKey(0)))
    timeit(lambda: fetch(body_only(params["body"], jax.random.PRNGKey(1))), 3,
           "body-only 64 steps")

    # head-only: 64 x (D head steps + classifier + sample), fixed spatial ctx
    @jax.jit
    def head_only(p, key):
        ctx = jax.random.normal(key, (BS, C), dtype)
        pos_d = p["pos_emb_d"][0].astype(dtype)

        def step(carry, t):
            ctx, rng = carry
            head_kv = M.init_kv_cache(tconf.head, BS, D, dtype)
            row = (ctx + pos_d[0])[:, None, :]
            acc = jnp.zeros((), jnp.float32)
            for d in range(D):
                h, head_kv = M.stack_step(p["head"], row, head_kv, jnp.int32(d), tconf.head)
                logits = M.classifier_apply(p, tconf, h[:, 0, :], depth_idx=d)
                rng, sub = jax.random.split(rng)
                code = S.sample_from_logits_fast(sub, logits, 1.0, None, None)
                e = S._vq_lookup(vq_state, vq_config, d, code)
                row = ((e @ p["head_mlp"]["kernel"] + p["head_mlp"]["bias"]).astype(dtype) + pos_d[min(d + 1, D - 1)])[:, None, :]
                acc = acc + logits.sum()
            return (ctx, rng), acc

        _, accs = jax.lax.scan(step, (ctx, key), jnp.arange(HW, dtype=jnp.int32))
        return accs.sum()

    fetch(head_only(params, jax.random.PRNGKey(0)))
    timeit(lambda: fetch(head_only(params, jax.random.PRNGKey(1))), 3,
           "head-only 64x(4 steps+cls+sample)")

    # classifier-only: 256 shared-cls matmuls [BS,C]x[C,V]
    @jax.jit
    def cls_only(p, key):
        h = jax.random.normal(key, (BS, C), dtype)

        def step(acc, t):
            logits = M.classifier_apply(p, tconf, h, depth_idx=0)
            return acc + logits.sum(), ()

        acc, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(HW * D))
        return acc

    fetch(cls_only(params, jax.random.PRNGKey(0)))
    timeit(lambda: fetch(cls_only(params, jax.random.PRNGKey(1))), 3,
           "classifier-only 256 matmuls")

    # body variant: fused QKV projection (one [C,3C] matmul per layer),
    # fused weights precomputed OUTSIDE the timed region
    fused_wqkv = jax.jit(
        lambda p: (
            jnp.concatenate([p["attn"]["wq"], p["attn"]["wk"], p["attn"]["wv"]], axis=-1),
            jnp.concatenate([p["attn"]["bq"], p["attn"]["bk"], p["attn"]["bv"]], axis=-1),
        )
    )(params["body"])

    @jax.jit
    def body_fused_qkv(p, wqkv, bqkv, key):
        kv = M.init_kv_cache(tconf.body, BS, t_max, dtype)
        x0 = jax.random.normal(key, (BS, 1, C), dtype)
        cfg = tconf.body
        import numpy as np_

        n_head, hs = cfg.n_head, C // cfg.n_head
        scale = 1.0 / np_.sqrt(hs)

        def step(carry, t):
            x, cache = carry
            past_mask_t1 = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1) < t

            def body(c, inp):
                (x,) = c
                lp, wqkv_l, bqkv_l, k_l, v_l = inp
                h = M.layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
                qkv = h @ wqkv_l + bqkv_l
                q, k, v = jnp.split(qkv, 3, axis=-1)
                prod = (k_l * q).reshape(BS, t_max, n_head, hs)
                s_past = jnp.sum(prod, axis=-1, dtype=jnp.float32) * scale
                s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
                s_self = jnp.sum((k * q).reshape(BS, 1, n_head, hs), axis=-1, dtype=jnp.float32) * scale
                s = jnp.concatenate([s_past, s_self], axis=1)
                p_att = jax.nn.softmax(s, axis=1)
                w_past = p_att[:, :t_max].astype(v_l.dtype)
                w_self = p_att[:, t_max:].astype(v.dtype)
                y = jnp.sum(v_l.reshape(BS, t_max, n_head, hs) * w_past[..., None], axis=1)
                y = y + (v.reshape(BS, 1, n_head, hs) * w_self[..., None])[:, 0]
                y = y.reshape(BS, 1, C)
                x = x + (y @ lp["attn"]["wo"] + lp["attn"]["bo"])
                h2 = M.layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
                m = M.gelu(h2 @ lp["mlp"]["w1"] + lp["mlp"]["b1"], cfg.gelu) @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
                return (x + m,), (k.astype(cache.k.dtype), v.astype(cache.v.dtype))

            (out,), (k_rows, v_rows) = jax.lax.scan(
                body, (x,), (p, wqkv, bqkv, cache.k, cache.v)
            )
            new_k = jax.lax.dynamic_update_slice(cache.k, k_rows, (0, 0, t, 0))
            new_v = jax.lax.dynamic_update_slice(cache.v, v_rows, (0, 0, t, 0))
            return (out, M.KVCache(k=new_k, v=new_v)), ()

        (h, _), _ = jax.lax.scan(step, (x0, kv), jnp.arange(HW, dtype=jnp.int32))
        return h.sum()

    fetch(body_fused_qkv(params["body"], *fused_wqkv, jax.random.PRNGKey(0)))
    timeit(lambda: fetch(body_fused_qkv(params["body"], *fused_wqkv, jax.random.PRNGKey(1))), 3,
           "body-only fused-qkv 64 steps")

    # body variant: Pallas decode attention reading the FULL stacked cache
    # (no per-layer dynamic-slice copy). Parked: Mosaic internal errors on
    # the bf16 reshape path and the fp32 version is VPU-bound (slower than
    # XLA); gate behind PROBE_KERNELS.
    from rqvae_tpu.ops.attention_kernel import decode_attention_stacked

    # Pallas wants batch tiles divisible by 8: pad the whole body batch once
    BSP = ((BS + 7) // 8) * 8
    B_TILE = 8

    @jax.jit
    def body_kernel_attn(p, key):
        cfg = tconf.body
        kv = M.init_kv_cache(cfg, BSP, t_max, dtype)
        x0 = jax.random.normal(key, (BSP, 1, C), dtype)

        def step(carry, t):
            x, cache = carry

            def body(c, inp):
                (x,) = c
                lp, l = inp
                h = M.layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
                q = (h @ lp["attn"]["wq"] + lp["attn"]["bq"])[:, 0]
                k = (h @ lp["attn"]["wk"] + lp["attn"]["bk"])[:, 0]
                v = (h @ lp["attn"]["wv"] + lp["attn"]["bv"])[:, 0]
                y = decode_attention_stacked(
                    q, k, v, cache.k, cache.v, l, t, cfg.n_head, b_tile=B_TILE
                )[:, None, :]
                x = x + (y @ lp["attn"]["wo"] + lp["attn"]["bo"])
                h2 = M.layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
                m = M.gelu(h2 @ lp["mlp"]["w1"] + lp["mlp"]["b1"], cfg.gelu) @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
                return (x + m,), (k[:, None, :].astype(cache.k.dtype), v[:, None, :].astype(cache.v.dtype))

            (out,), (k_rows, v_rows) = jax.lax.scan(
                body, (x,), (p, jnp.arange(cfg.n_layer, dtype=jnp.int32))
            )
            new_k = jax.lax.dynamic_update_slice(cache.k, k_rows, (0, 0, t, 0))
            new_v = jax.lax.dynamic_update_slice(cache.v, v_rows, (0, 0, t, 0))
            return (out, M.KVCache(k=new_k, v=new_v)), ()

        (h, _), _ = jax.lax.scan(step, (x0, kv), jnp.arange(HW, dtype=jnp.int32))
        return h.sum()

    if os.environ.get("PROBE_KERNELS"):
        fetch(body_kernel_attn(params["body"], jax.random.PRNGKey(0)))
        timeit(lambda: fetch(body_kernel_attn(params["body"], jax.random.PRNGKey(1))), 3,
               f"body-only pallas-stacked-attn (b_tile={B_TILE}) 64 steps")

    # body variant: MXU einsum attention (head-split views, S=1)
    @jax.jit
    def body_einsum_attn(p, key):
        cfg = tconf.body
        n_head, hs = cfg.n_head, C // cfg.n_head
        import numpy as np_

        scale = 1.0 / np_.sqrt(hs)
        kv = M.init_kv_cache(cfg, BS, t_max, dtype)
        x0 = jax.random.normal(key, (BS, 1, C), dtype)

        def step(carry, t):
            x, cache = carry
            past_mask = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, t_max), 3) < t)

            def body(c, inp):
                (x,) = c
                lp, k_l, v_l = inp
                h = M.layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
                q = (h @ lp["attn"]["wq"] + lp["attn"]["bq"])
                k = (h @ lp["attn"]["wk"] + lp["attn"]["bk"])
                v = (h @ lp["attn"]["wv"] + lp["attn"]["bv"])
                q4 = q.reshape(BS, 1, n_head, hs)
                kc = k_l.reshape(BS, t_max, n_head, hs)
                vc = v_l.reshape(BS, t_max, n_head, hs)
                att_past = jnp.einsum("bshd,bthd->bhst", q4, kc,
                                      preferred_element_type=jnp.float32) * scale
                att_past = jnp.where(past_mask, att_past, -jnp.inf)
                att_self = jnp.einsum("bshd,bthd->bhst", q4, k.reshape(BS, 1, n_head, hs),
                                      preferred_element_type=jnp.float32) * scale
                att = jax.nn.softmax(jnp.concatenate([att_past, att_self], axis=-1), axis=-1).astype(v.dtype)
                y = jnp.einsum("bhst,bthd->bshd", att[..., :t_max], vc) + jnp.einsum(
                    "bhst,bthd->bshd", att[..., t_max:], v.reshape(BS, 1, n_head, hs))
                y = y.reshape(BS, 1, C)
                x = x + (y @ lp["attn"]["wo"] + lp["attn"]["bo"])
                h2 = M.layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
                m = M.gelu(h2 @ lp["mlp"]["w1"] + lp["mlp"]["b1"], cfg.gelu) @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
                return (x + m,), (k.astype(cache.k.dtype), v.astype(cache.v.dtype))

            (out,), (k_rows, v_rows) = jax.lax.scan(
                body, (x,), (p, cache.k, cache.v)
            )
            new_k = jax.lax.dynamic_update_slice(cache.k, k_rows, (0, 0, t, 0))
            new_v = jax.lax.dynamic_update_slice(cache.v, v_rows, (0, 0, t, 0))
            return (out, M.KVCache(k=new_k, v=new_v)), ()

        (h, _), _ = jax.lax.scan(step, (x0, kv), jnp.arange(HW, dtype=jnp.int32))
        return h.sum()

    fetch(body_einsum_attn(params["body"], jax.random.PRNGKey(0)))
    timeit(lambda: fetch(body_einsum_attn(params["body"], jax.random.PRNGKey(1))), 3,
           "body-only einsum-mxu-attn 64 steps")

    # body variant: UNROLLED layers, separate per-layer caches — no stacked
    # cache, so no per-layer dynamic-slice copy at all
    if not os.environ.get("PROBE_SKIP_UNROLL"):
        import numpy as np_

        cfg = tconf.body
        n_head, hs = cfg.n_head, C // cfg.n_head
        scale = 1.0 / np_.sqrt(hs)
        L = cfg.n_layer

        @jax.jit
        def body_unrolled(p, key):
            x0 = jax.random.normal(key, (BS, 1, C), dtype)
            caches = tuple(
                (jnp.zeros((BS, t_max, C), dtype), jnp.zeros((BS, t_max, C), dtype))
                for _ in range(L)
            )

            def layer(x, lp, k_l, v_l, t, past_mask_t1):
                h = M.layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
                q = (h @ lp["attn"]["wq"] + lp["attn"]["bq"])
                k = (h @ lp["attn"]["wk"] + lp["attn"]["bk"])
                v = (h @ lp["attn"]["wv"] + lp["attn"]["bv"])
                prod = (k_l * q).reshape(BS, t_max, n_head, hs)
                s_past = jnp.sum(prod, axis=-1, dtype=jnp.float32) * scale
                s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
                s_self = jnp.sum((k * q).reshape(BS, 1, n_head, hs), axis=-1,
                                 dtype=jnp.float32) * scale
                s = jnp.concatenate([s_past, s_self], axis=1)
                p_att = jax.nn.softmax(s, axis=1)
                w_past = p_att[:, :t_max].astype(v_l.dtype)
                w_self = p_att[:, t_max:].astype(v.dtype)
                y = jnp.sum(v_l.reshape(BS, t_max, n_head, hs) * w_past[..., None], axis=1)
                y = y + (v.reshape(BS, 1, n_head, hs) * w_self[..., None])[:, 0]
                y = y.reshape(BS, 1, C)
                x = x + (y @ lp["attn"]["wo"] + lp["attn"]["bo"])
                h2 = M.layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
                m = M.gelu(h2 @ lp["mlp"]["w1"] + lp["mlp"]["b1"], cfg.gelu) @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
                return x + m, k, v

            lps = [jax.tree.map(lambda a, i=i: a[i], p) for i in range(L)]

            def step(carry, t):
                x, caches = carry
                past_mask_t1 = jax.lax.broadcasted_iota(jnp.int32, (1, t_max, 1), 1) < t
                new_caches = []
                for i in range(L):
                    k_l, v_l = caches[i]
                    x, k, v = layer(x, lps[i], k_l, v_l, t, past_mask_t1)
                    new_caches.append((
                        jax.lax.dynamic_update_slice(k_l, k.astype(k_l.dtype), (0, t, 0)),
                        jax.lax.dynamic_update_slice(v_l, v.astype(v_l.dtype), (0, t, 0)),
                    ))
                return (x, tuple(new_caches)), ()

            (h, _), _ = jax.lax.scan(step, (x0, caches), jnp.arange(HW, dtype=jnp.int32))
            return h.sum()

        t0 = time.time()
        fetch(body_unrolled(params["body"], jax.random.PRNGKey(0)))
        print(f"# body-unrolled compile+run: {time.time()-t0:.1f} s", flush=True)
        timeit(lambda: fetch(body_unrolled(params["body"], jax.random.PRNGKey(1))), 3,
               "body-only UNROLLED per-layer caches 64 steps")

        # UNROLLED + per-layer Pallas kernel (bf16 dataflow, no slicing)
        from rqvae_tpu.ops.attention_kernel import decode_attention

        @jax.jit
        def body_unrolled_kernel(p, key):
            x0 = jax.random.normal(key, (BSP, 1, C), dtype)
            caches = tuple(
                (jnp.zeros((BSP, t_max, C), dtype), jnp.zeros((BSP, t_max, C), dtype))
                for _ in range(L)
            )
            lps = [jax.tree.map(lambda a, i=i: a[i], p) for i in range(L)]

            def layer(x, lp, k_l, v_l, t):
                h = M.layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
                q = (h @ lp["attn"]["wq"] + lp["attn"]["bq"])[:, 0]
                k = (h @ lp["attn"]["wk"] + lp["attn"]["bk"])[:, 0]
                v = (h @ lp["attn"]["wv"] + lp["attn"]["bv"])[:, 0]
                y = decode_attention(q, k, v, k_l, v_l, t, cfg.n_head, b_tile=8)[:, None, :]
                x = x + (y @ lp["attn"]["wo"] + lp["attn"]["bo"])
                h2 = M.layer_norm(x, lp["ln2"]["scale"], lp["ln2"]["bias"])
                m = M.gelu(h2 @ lp["mlp"]["w1"] + lp["mlp"]["b1"], cfg.gelu) @ lp["mlp"]["w2"] + lp["mlp"]["b2"]
                return x + m, k, v

            def step(carry, t):
                x, caches = carry
                new_caches = []
                for i in range(L):
                    k_l, v_l = caches[i]
                    x, k, v = layer(x, lps[i], k_l, v_l, t)
                    new_caches.append((
                        jax.lax.dynamic_update_slice(k_l, k[:, None, :].astype(k_l.dtype), (0, t, 0)),
                        jax.lax.dynamic_update_slice(v_l, v[:, None, :].astype(v_l.dtype), (0, t, 0)),
                    ))
                return (x, tuple(new_caches)), ()

            (h, _), _ = jax.lax.scan(step, (x0, caches), jnp.arange(HW, dtype=jnp.int32))
            return h.sum()

        if os.environ.get("PROBE_KERNELS"):
            t0 = time.time()
            fetch(body_unrolled_kernel(params["body"], jax.random.PRNGKey(0)))
            print(f"# body-unrolled-kernel compile+run: {time.time()-t0:.1f} s", flush=True)
            timeit(lambda: fetch(body_unrolled_kernel(params["body"], jax.random.PRNGKey(1))), 3,
                   "body-only UNROLLED + pallas-bf16-attn 64 steps")

        # UNROLLED + 2-phase window: positions 0..31 read a STATIC 33-slot
        # prefix of each cache (no copy — static slice), rest full window
        @jax.jit
        def body_unrolled_2phase(p, key):
            x0 = jax.random.normal(key, (BS, 1, C), dtype)
            caches = tuple(
                (jnp.zeros((BS, t_max, C), dtype), jnp.zeros((BS, t_max, C), dtype))
                for _ in range(L)
            )
            lps2 = [jax.tree.map(lambda a, i=i: a[i], p) for i in range(L)]

            def make_step(win):
                def step(carry, t):
                    x, caches = carry
                    past_mask_t1 = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1) < t
                    new_caches = []
                    for i in range(L):
                        k_l, v_l = caches[i]
                        h = M.layer_norm(x, lps2[i]["ln1"]["scale"], lps2[i]["ln1"]["bias"])
                        q = (h @ lps2[i]["attn"]["wq"] + lps2[i]["attn"]["bq"])
                        k = (h @ lps2[i]["attn"]["wk"] + lps2[i]["attn"]["bk"])
                        v = (h @ lps2[i]["attn"]["wv"] + lps2[i]["attn"]["bv"])
                        n_head, hs = cfg.n_head, C // cfg.n_head
                        import numpy as np_
                        scale = 1.0 / np_.sqrt(hs)
                        prod = (k_l[:, :win] * q).reshape(BS, win, n_head, hs)
                        s_past = jnp.sum(prod, axis=-1, dtype=jnp.float32) * scale
                        s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
                        s_self = jnp.sum((k * q).reshape(BS, 1, n_head, hs), axis=-1,
                                         dtype=jnp.float32) * scale
                        s = jnp.concatenate([s_past, s_self], axis=1)
                        p_att = jax.nn.softmax(s, axis=1)
                        w_past = p_att[:, :win].astype(v_l.dtype)
                        w_self = p_att[:, win:].astype(v.dtype)
                        y = jnp.sum(v_l[:, :win].reshape(BS, win, n_head, hs) * w_past[..., None], axis=1)
                        y = y + (v.reshape(BS, 1, n_head, hs) * w_self[..., None])[:, 0]
                        y = y.reshape(BS, 1, C)
                        x2 = x + (y @ lps2[i]["attn"]["wo"] + lps2[i]["attn"]["bo"])
                        h2 = M.layer_norm(x2, lps2[i]["ln2"]["scale"], lps2[i]["ln2"]["bias"])
                        m = M.gelu(h2 @ lps2[i]["mlp"]["w1"] + lps2[i]["mlp"]["b1"], cfg.gelu) @ lps2[i]["mlp"]["w2"] + lps2[i]["mlp"]["b2"]
                        x = x2 + m
                        new_caches.append((
                            jax.lax.dynamic_update_slice(k_l, k.astype(k_l.dtype), (0, t, 0)),
                            jax.lax.dynamic_update_slice(v_l, v.astype(v_l.dtype), (0, t, 0)),
                        ))
                    return (x, tuple(new_caches)), ()
                return step

            half = HW // 2
            (x1, caches), _ = jax.lax.scan(
                make_step(half + 1), (x0, caches), jnp.arange(half, dtype=jnp.int32))
            (h, _), _ = jax.lax.scan(
                make_step(t_max), (x1, caches),
                jnp.arange(half, HW, dtype=jnp.int32))
            return h.sum()

        t0 = time.time()
        fetch(body_unrolled_2phase(params["body"], jax.random.PRNGKey(0)))
        print(f"# body-unrolled-2phase compile+run: {time.time()-t0:.1f} s", flush=True)
        timeit(lambda: fetch(body_unrolled_2phase(params["body"], jax.random.PRNGKey(1))), 3,
               "body-only UNROLLED 2-phase window 64 steps")

        # UNROLLED 2-phase + MERGED k|v cache: one [B, T, 2C] array per
        # layer (half the buffers, one dynamic_update_slice per layer)
        @jax.jit
        def body_unrolled_2phase_merged(p, key):
            x0 = jax.random.normal(key, (BS, 1, C), dtype)
            caches = tuple(jnp.zeros((BS, t_max, 2 * C), dtype) for _ in range(L))
            lps3 = [jax.tree.map(lambda a, i=i: a[i], p) for i in range(L)]
            import numpy as np_
            n_head, hs = cfg.n_head, C // cfg.n_head
            scale = 1.0 / np_.sqrt(hs)

            def make_step(win):
                def step(carry, t):
                    x, caches = carry
                    past_mask_t1 = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1) < t
                    new_caches = []
                    for i in range(L):
                        kv_l = caches[i]
                        k_l = kv_l[:, :win, :C]
                        v_l = kv_l[:, :win, C:]
                        h = M.layer_norm(x, lps3[i]["ln1"]["scale"], lps3[i]["ln1"]["bias"])
                        q = (h @ lps3[i]["attn"]["wq"] + lps3[i]["attn"]["bq"])
                        k = (h @ lps3[i]["attn"]["wk"] + lps3[i]["attn"]["bk"])
                        v = (h @ lps3[i]["attn"]["wv"] + lps3[i]["attn"]["bv"])
                        prod = (k_l * q).reshape(BS, win, n_head, hs)
                        s_past = jnp.sum(prod, axis=-1, dtype=jnp.float32) * scale
                        s_past = jnp.where(past_mask_t1, s_past, -jnp.inf)
                        s_self = jnp.sum((k * q).reshape(BS, 1, n_head, hs), axis=-1,
                                         dtype=jnp.float32) * scale
                        s = jnp.concatenate([s_past, s_self], axis=1)
                        p_att = jax.nn.softmax(s, axis=1)
                        w_past = p_att[:, :win].astype(v_l.dtype)
                        w_self = p_att[:, win:].astype(v.dtype)
                        y = jnp.sum(v_l.reshape(BS, win, n_head, hs) * w_past[..., None], axis=1)
                        y = y + (v.reshape(BS, 1, n_head, hs) * w_self[..., None])[:, 0]
                        y = y.reshape(BS, 1, C)
                        x2 = x + (y @ lps3[i]["attn"]["wo"] + lps3[i]["attn"]["bo"])
                        h2 = M.layer_norm(x2, lps3[i]["ln2"]["scale"], lps3[i]["ln2"]["bias"])
                        m = M.gelu(h2 @ lps3[i]["mlp"]["w1"] + lps3[i]["mlp"]["b1"], cfg.gelu) @ lps3[i]["mlp"]["w2"] + lps3[i]["mlp"]["b2"]
                        x = x2 + m
                        new_caches.append(jax.lax.dynamic_update_slice(
                            kv_l, jnp.concatenate([k, v], axis=-1).astype(kv_l.dtype),
                            (0, t, 0)))
                    return (x, tuple(new_caches)), ()
                return step

            half = HW // 2
            (x1, caches), _ = jax.lax.scan(
                make_step(half + 1), (x0, caches), jnp.arange(half, dtype=jnp.int32))
            (h, _), _ = jax.lax.scan(
                make_step(t_max), (x1, caches),
                jnp.arange(half, HW, dtype=jnp.int32))
            return h.sum()

        t0 = time.time()
        fetch(body_unrolled_2phase_merged(params["body"], jax.random.PRNGKey(0)))
        print(f"# body-unrolled-2phase-merged compile+run: {time.time()-t0:.1f} s", flush=True)
        timeit(lambda: fetch(body_unrolled_2phase_merged(params["body"], jax.random.PRNGKey(1))), 3,
               "body-only UNROLLED 2-phase MERGED-kv 64 steps")

    if "--trace" in sys.argv:
        os.makedirs("/tmp/jax_trace", exist_ok=True)
        with jax.profiler.trace("/tmp/jax_trace"):
            fetch(sample_fn(jax.random.PRNGKey(42)).sum())
        print("# trace written to /tmp/jax_trace", flush=True)


if __name__ == "__main__":
    main()
