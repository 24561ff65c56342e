"""On-chip training-step probe: stage-1 (100M RQ-VAE + VQGAN losses) and
stage-2 (480M RQ-Transformer) step time at 256px, bs16 — the COVERAGE
"img/s/chip" numbers, measured with chained dispatch (no per-step sync).

Usage: python tools/train_probe.py [stage1|stage2|both]
"""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BS = int(os.environ.get("PROBE_BS", "16"))


def fetch(x):
    return np.asarray(x)


def stage1():
    from rqvae_tpu.losses.discriminator import NLayerDiscriminator
    from rqvae_tpu.losses.lpips import LPIPS, init_lpips
    from rqvae_tpu.models.rqvae.model import RQVAE, RQVAEHParams
    from rqvae_tpu.models.rqvae.modules import DDConfig
    from rqvae_tpu.optim.optimizer import create_optimizer
    from rqvae_tpu.optim.schedule import create_schedule
    from rqvae_tpu.trainers import trainer_stage1 as t1

    # PROBE_REMAT_S1=1: rematerialize the conv ResnetBlocks (DDConfig.
    # checkpointing) — fp32 bs64 at 256px needs 28.8G of HLO temps on a
    # 15.75G chip (the encoder's [64,256,256,128] backward temps are 2G
    # each), so the big-batch sweep points only exist with remat and/or amp
    dd = DDConfig.create(
        dict(double_z=False, z_channels=256, resolution=256, in_channels=3,
             out_ch=3, ch=128, ch_mult=[1, 1, 2, 2, 4, 4], num_res_blocks=2,
             attn_resolutions=[8], dropout=0.0,
             checkpointing=bool(os.environ.get("PROBE_REMAT_S1")))
    )
    hp = RQVAEHParams.create(
        dict(embed_dim=256, n_embed=16384, loss_type="mse",
             latent_shape=[8, 8, 256], code_shape=[8, 8, 4],
             shared_codebook=True, restart_unused_codes=True)
    )
    model = RQVAE(hparams=hp, ddconfig=dd, use_kernel=True)
    disc = NLayerDiscriminator()
    lpips = LPIPS()
    lpips_vars = init_lpips()
    sched = create_schedule(
        base_lr=4e-5,
        warmup_config={"epoch": 0, "mode": "fix", "multiplier": 1, "min_lr": 4e-5},
        steps_per_epoch=1000, max_epoch=10,
    )
    tx = create_optimizer({"type": "adam", "betas": [0.5, 0.9], "weight_decay": 0.0}, sched)
    dtx = create_optimizer({"type": "adam", "betas": [0.5, 0.9], "weight_decay": 0.0}, sched)

    t0 = time.time()
    state = t1.init_state(jax.random.PRNGKey(0), model, disc, tx, dtx,
                          image_shape=(256, 256, 3))
    print(f"# stage1 init: {time.time()-t0:.1f}s", flush=True)

    # PROBE_ABLATE=1: also time the step with LPIPS off / discriminator off
    # to attribute the step budget to components (compile cost: one extra
    # jit per variant)
    variants = [("full", 1.0, True)]
    if os.environ.get("PROBE_ABLATE"):
        variants += [("no-lpips", 0.0, True), ("no-disc+no-lpips", 0.0, False),
                     ("lpips-only(no-disc)", 1.0, False)]
    amp_s1 = bool(os.environ.get("PROBE_AMP_S1"))
    rng = jax.random.PRNGKey(2)
    # PROBE_SWEEP="16,32,64,128": batch-scaling curve in ONE process (the
    # reference trains stage-1 at per-GPU bs 32,
    # configs/imagenet256/stage1/in256-rqvae-8x8x4.yaml:50); MFU from XLA's
    # own per-executable FLOP estimate (cost_analysis) over the v5e bf16
    # peak 197 TFLOP/s
    sweep = os.environ.get("PROBE_SWEEP", "")
    bs_list = [int(t) for t in sweep.split(",") if t.strip()] or [BS]
    for bs in bs_list:
        batch = {"images": jax.random.uniform(
            jax.random.PRNGKey(1), (bs, 256, 256, 3)) * 2 - 1}
        for name, pw, use_disc in variants:
            # lpips_vars as a CALL arg: keeps the 55 MB VGG tower out of the
            # HLO constant pool (the remote compile helper dies on the
            # constant payload at bs >= 64; same as stage-2 as_args mode)
            step = jax.jit(
                t1.make_train_step(model, disc, lpips, lpips_vars,
                                   t1.GanLossConfig(disc_start=0, perceptual_weight=pw,
                                                    amp_bf16=amp_s1),
                                   tx, dtx, use_discriminator=use_disc),
                donate_argnums=(0,),
            )
            try:
                flops = step.lower(state, batch, rng, lpips_vars).compile(
                ).cost_analysis()["flops"]
            except Exception:
                flops = 0.0
            t0 = time.time()
            try:
                state, metrics, _ = step(state, batch, rng, lpips_vars)
                fetch(metrics["loss_total"])
            except Exception as e:  # OOM at large batch: report and continue
                print(f"# stage1 [{name}] bs{bs}: FAILED "
                      f"({type(e).__name__}: {str(e)[:int(os.environ.get("PROBE_ERRLEN", "120"))]})", flush=True)
                del step, batch
                jax.clear_caches()
                break
            print(f"# stage1 [{name}] compile+first step: {time.time()-t0:.1f}s", flush=True)
            N = 8
            t0 = time.time()
            for _ in range(N):
                state, metrics, _ = step(state, batch, rng, lpips_vars)
            fetch(metrics["loss_total"])
            dt = (time.time() - t0) / N
            mfu = f", ~{flops/dt/197e12*100:.1f}% MFU" if flops else ""
            print(f"# stage1 [{name}] step (bs{bs}): {dt*1000:.1f} ms -> "
                  f"{bs/dt:.1f} img/s/chip{mfu}", flush=True)
    if "--trace" in sys.argv:
        os.makedirs("/tmp/jax_trace_s1", exist_ok=True)
        with jax.profiler.trace("/tmp/jax_trace_s1"):
            for _ in range(2):
                state, metrics, _ = step(state, batch, rng, lpips_vars)
            fetch(metrics["loss_total"])
        print("# stage1 trace -> /tmp/jax_trace_s1 (tools/trace_top_ops.py)", flush=True)


def stage2():
    import optax
    from rqvae_tpu.models.rqtransformer.config import TransformerConfig
    from rqvae_tpu.models.rqvae.model import RQVAE, RQVAEHParams
    from rqvae_tpu.models.rqvae.modules import DDConfig
    from rqvae_tpu.ops import quantize as rq
    from rqvae_tpu.trainers import trainer_stage2 as t2
    from rqvae_tpu.utils.config import Config, augment_arch_defaults

    dd = DDConfig.create(
        dict(double_z=False, z_channels=256, resolution=256, in_channels=3,
             out_ch=3, ch=128, ch_mult=[1, 1, 2, 2, 4, 4], num_res_blocks=2,
             attn_resolutions=[8], dropout=0.0)
    )
    hp = RQVAEHParams.create(
        dict(embed_dim=256, n_embed=16384, loss_type="mse",
             latent_shape=[8, 8, 256], code_shape=[8, 8, 4],
             shared_codebook=True, restart_unused_codes=False)
    )
    vqvae = RQVAE(hparams=hp, ddconfig=dd, use_kernel=True)
    x0 = jnp.zeros((1, 256, 256, 3))
    vq_vars = vqvae.init(
        {"params": jax.random.PRNGKey(0), "quantizer": jax.random.PRNGKey(1)}, x0
    )

    # bf16 frozen encode (PROBE_ENCODE_FP32=1 for the old fp32 path);
    # args-mode keeps the 100M-param encoder out of the HLO constant pool —
    # closure constants upload through the remote-compile tunnel per compile
    # and crash the compile helper at bs>=64
    encode_fn, enc_vars = t2.make_frozen_encode_fn(
        vqvae, vq_vars,
        dtype=None if os.environ.get("PROBE_ENCODE_FP32") else jnp.bfloat16,
        as_args=True,
        # cap the frozen encoder's peak conv temps at big batch (bs>=128
        # OOMs the compile unchunked); 0 disables
        chunk=int(os.environ.get("PROBE_ENCODE_CHUNK", "64")) or None,
    )

    arch = dict(
        type="rq-transformer", vocab_size=16384, block_size=[8, 8, 4],
        embed_dim=1024, input_embed_dim=256, shared_tok_emb=True,
        shared_cls_emb=True, input_emb_vqvae=True, head_emb_vqvae=True,
        cumsum_depth_ctx=True, vocab_size_cond=1000, block_size_cond=1,
        body={"n_layer": 24, "block": {"n_head": 16}},
        head={"n_layer": 4, "block": {"n_head": 16}},
    )
    tconf = TransformerConfig.create(augment_arch_defaults(Config(arch)).to_dict())
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(5e-4, b1=0.9, b2=0.95, weight_decay=1e-4))
    # PROBE_REMAT=1: layer-scan rematerialization; PROBE_ACCUM=k: grad-accum
    # scan over k microbatches of PROBE_BS each (the reference's
    # total_batch 2048 semantics, utils/config.py:114-129).
    # PROBE_SWEEP="16,64,256,64x4,256r": measure several operating points in
    # ONE process (spec = BS[xACCUM][r]; r = remat) — the img/s-vs-batch MFU
    # curve at the reference's realistic per-chip batches.
    sweep = os.environ.get("PROBE_SWEEP", "")
    if sweep:
        specs = []
        for tok in sweep.split(","):
            tok = tok.strip().lower()
            remat = tok.endswith("r")
            tok = tok.rstrip("r")
            bs_s, _, acc_s = tok.partition("x")
            specs.append((int(bs_s), int(acc_s or "1"), remat))
    else:
        specs = [(BS, int(os.environ.get("PROBE_ACCUM", "1")),
                  bool(os.environ.get("PROBE_REMAT")))]

    for bs, accum, remat in specs:
        t0 = time.time()
        state = t2.init_state(jax.random.PRNGKey(2), tconf, tx, use_ema=True)
        print(f"# stage2 init: {time.time()-t0:.1f}s", flush=True)
        step = jax.jit(
            t2.make_train_step(
                tconf, t2.Stage2LossConfig(use_soft_target=True, temp=0.5,
                                           stochastic_codes=True, remat=remat),
                tx, encode_fn=encode_fn, encode_takes_vars=True,
                vq_state=vq_vars["codebook"]["state"],
                vq_config=vqvae.quantizer_config,
                ema_mu=0.9999, grad_accum_steps=accum,
            ),
            donate_argnums=(0,),
        )
        tot = bs * accum  # bs images per microbatch, accum microbatches per step
        batch = {
            "images": jax.random.uniform(jax.random.PRNGKey(3), (tot, 256, 256, 3)) * 2 - 1,
            "cond": jnp.zeros((tot,), jnp.int32),
        }
        rng = jax.random.PRNGKey(4)
        t0 = time.time()
        try:
            state, metrics = step(state, batch, rng, enc_vars)
            fetch(metrics["loss_total"])
        except Exception as e:  # OOM at large batch: report and continue the sweep
            print(f"# stage2 bs{bs}x{accum}{'r' if remat else ''}: "
                  f"FAILED ({type(e).__name__}: {str(e)[:int(os.environ.get("PROBE_ERRLEN", "120"))]})", flush=True)
            # drop the failed point's executable + oversized buffers so dead
            # HBM can't poison the next sweep point
            del step, batch, state
            jax.clear_caches()
            continue
        print(f"# stage2 compile+first step: {time.time()-t0:.1f}s", flush=True)
        N = 8
        t0 = time.time()
        for _ in range(N):
            state, metrics = step(state, batch, rng, enc_vars)
        fetch(metrics["loss_total"])
        dt = (time.time() - t0) / N
        tag = f"bs{bs}" + (f"x{accum}" if accum > 1 else "") + ("r" if remat else "")
        # analytic MFU: fwd+bwd ~6 FLOPs/param/token on the matmul params
        # (body runs T=64 spatial positions, head + classifier run 64*D=256
        # depth positions per image); v5e bf16 peak 197 TFLOP/s
        p = state.params
        n_body = sum(x.size for x in jax.tree.leaves(p["body"]))
        n_head_p = sum(x.size for x in jax.tree.leaves(p["head"]))
        n_cls = sum(
            x.size for k in ("classifier",) if k in p for x in jax.tree.leaves(p[k])
        )
        flops_img = 6 * (n_body * 64 + (n_head_p + n_cls) * 256)
        mfu = flops_img * tot / dt / 197e12
        print(
            f"# stage2 step ({tag}): {dt*1000:.1f} ms -> {tot/dt:.1f} img/s/chip "
            f"(~{mfu*100:.1f}% MFU, {flops_img*tot/1e12:.1f} TFLOP/step)",
            flush=True,
        )
        del state
        if "--trace" in sys.argv:
            os.makedirs("/tmp/jax_trace_s2", exist_ok=True)
            with jax.profiler.trace("/tmp/jax_trace_s2"):
                for _ in range(2):
                    state2, metrics = step(
                        t2.init_state(jax.random.PRNGKey(2), tconf, tx, use_ema=True),
                        batch, rng, enc_vars)
                fetch(metrics["loss_total"])
            print("# stage2 trace -> /tmp/jax_trace_s2 (tools/trace_top_ops.py)", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    if what in ("stage1", "both"):
        stage1()
    if what in ("stage2", "both"):
        stage2()
