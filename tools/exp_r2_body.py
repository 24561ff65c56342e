"""Round-2 body-decode experiments on the real chip.

Isolates the 1.4B body decode loop (the 5.19 ms/sample component, ~83% of AR
time at bs100) and measures variants the round-1/2 probes did not cover:

  v0  current: unrolled layers, per-layer [B, T, C] caches, 2-phase windows
  v1  v0 + lax.scan(unroll=2) on the position scans (software pipelining
      across adjacent positions)
  v2  [T, B, C] cache layout: contiguous cache-row writes (the [B, T, C]
      write scatters B rows of 3 KB each per layer per step)
  v3  v2 + unroll=2

Usage: EXP_BS=100 python tools/exp_r2_body.py [v0 v1 v2 v3]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.utils.config import Config, augment_arch_defaults

BS = int(os.environ.get("EXP_BS", "100"))
DTYPE = jnp.bfloat16
HW = 64
COND = 1


def fetch(x):
    return np.asarray(x)


def timeit(fn, n=3, label=""):
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    print(
        f"# {label}: {best*1000:.1f} ms  ({best/BS*1000:.3f} ms/sample)",
        flush=True,
    )
    return best


def build_body():
    arch = dict(
        type="rq-transformer",
        vocab_size=16384,
        block_size=[8, 8, 4],
        embed_dim=1536,
        input_embed_dim=256,
        shared_tok_emb=True,
        shared_cls_emb=True,
        input_emb_vqvae=True,
        head_emb_vqvae=True,
        cumsum_depth_ctx=True,
        vocab_size_cond=1000,
        block_size_cond=1,
        body={"n_layer": 42, "block": {"n_head": 24}},
        head={"n_layer": 6, "block": {"n_head": 24}},
    )
    tconf = TransformerConfig.create(augment_arch_defaults(Config(arch)).to_dict())

    @jax.jit
    def _init(key):
        p = M.init_stack_params(key, tconf.body)
        return jax.tree.map(lambda x: x.astype(DTYPE), p)

    params = _init(jax.random.PRNGKey(0))
    fetch(jax.tree.leaves(params)[0].sum())
    return tconf, params


def phase_bounds(n_steps, n_phases=2):
    return [round(n_steps * i / n_phases) for i in range(n_phases + 1)]


def run_btc(tconf, params, unroll):
    """v0/v1: the sampler's current body path (per-layer [B,T,C] caches)."""
    cfg = tconf.body
    t_max = COND + HW - 1

    @jax.jit
    def go(lps, key):
        caches = M.init_unrolled_kv_cache(cfg, BS, t_max, DTYPE)
        x0 = jax.random.normal(key, (BS, 1, cfg.embed_dim), DTYPE)
        h, caches = M.stack_step_unrolled(lps, x0, caches, jnp.int32(0), cfg)

        def make_step(window):
            def step(carry, t):
                x, caches = carry
                h, caches = M.stack_step_unrolled(
                    lps, x, caches, COND + t, cfg, window=window
                )
                return (h, caches), ()

            return step

        n_steps = HW - 1
        bounds = phase_bounds(n_steps)
        carry = (h, caches)
        for p in range(len(bounds) - 1):
            s, e = bounds[p], bounds[p + 1]
            window = min(t_max, COND + e)
            carry, _ = jax.lax.scan(
                make_step(window),
                carry,
                jnp.arange(s, e, dtype=jnp.int32),
                unroll=unroll,
            )
        return carry[0].sum()

    lps = jax.jit(lambda p: M.split_layer_params(p, cfg))(params)
    fetch(go(lps, jax.random.PRNGKey(1)))
    timeit(
        lambda: fetch(go(lps, jax.random.PRNGKey(2))),
        3,
        f"body 63 steps BTC unroll={unroll} (bs{BS})",
    )


# ---------------------------------------------------------------------------
# v2/v3: [T, B, C] cache layout
# ---------------------------------------------------------------------------


def _decode_attention_tbc(q, k, v, k_l, v_l, cur_len, n_head):
    """S=1 attention against a [T, B, C] cache."""
    B, _, C = q.shape
    t_max = k_l.shape[0]
    hs = C // n_head
    scale = 1.0 / np.sqrt(hs)
    past_mask = (
        jax.lax.broadcasted_iota(jnp.int32, (t_max, 1, 1), 0) < cur_len
    )  # [T, 1, 1]
    q_t = q[:, 0, :][None]  # [1, B, C]
    prod = (k_l * q_t).reshape(t_max, B, n_head, hs)
    s_past = jnp.sum(prod, axis=-1, dtype=jnp.float32) * scale  # [T, B, nh]
    s_past = jnp.where(past_mask, s_past, -jnp.inf)
    s_self = (
        jnp.sum((k[:, 0, :] * q[:, 0, :]).reshape(1, B, n_head, hs), axis=-1,
                dtype=jnp.float32)
        * scale
    )
    s = jnp.concatenate([s_past, s_self], axis=0)  # [T+1, B, nh]
    p_att = jax.nn.softmax(s, axis=0)
    w_past = p_att[:t_max].astype(v_l.dtype)
    w_self = p_att[t_max:].astype(v.dtype)
    y = jnp.sum(v_l.reshape(t_max, B, n_head, hs) * w_past[..., None], axis=0)
    y = y + (v[:, 0, :].reshape(1, B, n_head, hs) * w_self[..., None])[0]
    return y.reshape(B, 1, C)


def step_unrolled_tbc(layer_params, x, caches, cur_len, cfg, window=None):
    B, S, C = x.shape
    assert S == 1
    t_max = caches[0][0].shape[0]
    if window is not None:
        t_max = min(window, t_max)
    new_caches = []
    for lp, (k_l, v_l) in zip(layer_params, caches):
        h = M.layer_norm(x, lp["ln1"]["scale"], lp["ln1"]["bias"])
        qkv = M._mm(h, lp["attn"]["wqkv"]) + lp["attn"]["bqkv"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        y = _decode_attention_tbc(
            q, k, v, k_l[:t_max], v_l[:t_max], cur_len, cfg.n_head
        )
        x2 = x + (M._mm(y, lp["attn"]["wo"]) + lp["attn"]["bo"])
        h2 = M.layer_norm(x2, lp["ln2"]["scale"], lp["ln2"]["bias"])
        m = (
            M._mm(
                M.gelu(M._mm(h2, lp["mlp"]["w1"]) + lp["mlp"]["b1"], cfg.gelu),
                lp["mlp"]["w2"],
            )
            + lp["mlp"]["b2"]
        )
        x = x2 + m
        krow = k.astype(k_l.dtype).transpose(1, 0, 2)  # [1, B, C]
        vrow = v.astype(v_l.dtype).transpose(1, 0, 2)
        new_caches.append(
            (
                jax.lax.dynamic_update_slice(k_l, krow, (cur_len, 0, 0)),
                jax.lax.dynamic_update_slice(v_l, vrow, (cur_len, 0, 0)),
            )
        )
    return x, tuple(new_caches)


def run_tbc(tconf, params, unroll):
    cfg = tconf.body
    t_max = COND + HW - 1

    @jax.jit
    def go(lps, key):
        caches = tuple(
            (
                jnp.zeros((t_max, BS, cfg.embed_dim), DTYPE),
                jnp.zeros((t_max, BS, cfg.embed_dim), DTYPE),
            )
            for _ in range(cfg.n_layer)
        )
        x = jax.random.normal(key, (BS, 1, cfg.embed_dim), DTYPE)
        # prefill of 1 cond token == one decode step here
        x, caches = step_unrolled_tbc(lps, x, caches, jnp.int32(0), cfg)

        def make_step(window):
            def step(carry, t):
                x, caches = carry
                h, caches = step_unrolled_tbc(
                    lps, x, caches, COND + t, cfg, window=window
                )
                return (h, caches), ()

            return step

        n_steps = HW - 1
        bounds = phase_bounds(n_steps)
        carry = (x, caches)
        for p in range(len(bounds) - 1):
            s, e = bounds[p], bounds[p + 1]
            window = min(t_max, COND + e)
            carry, _ = jax.lax.scan(
                make_step(window),
                carry,
                jnp.arange(s, e, dtype=jnp.int32),
                unroll=unroll,
            )
        return carry[0].sum()

    lps = jax.jit(lambda p: M.split_layer_params(p, cfg))(params)
    fetch(go(lps, jax.random.PRNGKey(1)))
    timeit(
        lambda: fetch(go(lps, jax.random.PRNGKey(2))),
        3,
        f"body 63 steps TBC unroll={unroll} (bs{BS})",
    )


def main():
    variants = sys.argv[1:] or ["v0", "v1", "v2", "v3"]
    tconf, params = build_body()
    print(f"# backend {jax.default_backend()}, bs {BS}", flush=True)
    if "v0" in variants:
        run_btc(tconf, params, unroll=1)
    if "v1" in variants:
        run_btc(tconf, params, unroll=2)
    if "v2" in variants:
        run_tbc(tconf, params, unroll=1)
    if "v3" in variants:
        run_tbc(tconf, params, unroll=2)


if __name__ == "__main__":
    main()
