"""Stage-2 (RQ-Transformer) training step.

The reference deliberately does not release its stage-2 trainer
(/root/reference/README.md:214-215); the model's compute_loss
(transformers.py:371-391), the loss/optimizer configs
(configs/*/stage2/*.yaml), and the config plumbing for grad accumulation and
grad clipping (utils/config.py:114-129, :56) fully specify it. This module
implements that trainer TPU-natively:

 - one jitted step: frozen stage-1 encode -> (stochastic) soft codes ->
   teacher-forced transformer -> soft-target xent (+ txt_weight * cond loss)
   -> grad -> optax(adamW, global-norm clip, warmup-cosine) -> EMA params
 - gradient accumulation folded into the step as a lax.scan over microbatches
   (total_batch_size semantics of augment_dist_defaults)
 - designed to run under pjit over a (data, model) mesh; all cross-device
   reduction is implicit GSPMD collectives.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from rqvae_tpu.models import ema as ema_lib
from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.ops import quantize as rq


@flax.struct.dataclass
class Stage2State:
    step: jax.Array
    params: Any
    opt_state: Any
    ema_params: Any = None


@dataclasses.dataclass(frozen=True)
class Stage2LossConfig:
    use_soft_target: bool = True
    temp: float = 1.0
    stochastic_codes: bool = False
    txt_weight: float = 0.1
    img_weight: float = 0.9
    # bf16 activations/matmul compute in the transformer fwd/bwd (params,
    # optimizer state and gradient accumulation stay fp32; LayerNorm stats,
    # attention softmax and the xent log_softmax are fp32 inside the model
    # regardless — model.py:336-382, :1078-1088). The standard TPU
    # mixed-precision training recipe; the fp32-activation path measured
    # 95.9 ms/step on the 480M stage-2 step (256px bs16 v5e) with the body
    # scans at ~25% MFU, dominated by fp32 activation traffic.
    amp_bf16: bool = True
    # rematerialize transformer layer activations in the backward pass
    # (jax.checkpoint on the layer-scan body): caps saved activations at one
    # [B, T, C] boundary per layer so per-chip batch can grow ~10x before
    # HBM binds, at the cost of ~1 extra forward of FLOPs. Off by default
    # (at small batch the step is latency- not memory-bound); flip on via
    # experiment.remat for big-batch training.
    remat: bool = False


def init_state(
    rng: jax.Array,
    config: TransformerConfig,
    tx: optax.GradientTransformation,
    use_ema: bool = False,
) -> Stage2State:
    params = M.init_transformer_params(rng, config)
    return Stage2State(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        ema_params=jax.tree.map(jnp.copy, params) if use_ema else None,
    )


def make_frozen_encode_fn(vqvae, vq_vars: dict, dtype=jnp.bfloat16, as_args=False,
                          chunk: Optional[int] = None):
    """Frozen stage-1 encode for stage-2 training, in `dtype` compute.

    The encoder carries no gradients and its output only feeds the code
    argmin / soft-code distances, so bf16 conv compute is numerically safe:
    GroupNorm statistics stay fp32 inside the modules (modules.py:61-77) and
    the distances against the fp32 codebook promote back to fp32 before the
    argmin. Measured on the 99 ms stage-2 step (256px bs16, v5e) the fp32
    encoder was ~13 ms; bf16 halves its HBM/VPU traffic and doubles the conv
    MXU rate. dtype=None keeps full fp32 (bit-parity with the reference's
    no_grad fp32 encode).

    as_args=True returns `(encode_fn, enc_vars)` with the signature
    `encode_fn(images, enc_vars)`: the 100M-param encoder then rides the
    train step as a jit ARGUMENT instead of a closure constant. Closed-over
    device arrays embed in the lowered HLO, which this environment uploads
    through the remote-compile tunnel on every (re)compile — hundreds of MB
    per batch-size change — and large enough constants crash the compile
    helper outright. Args-mode is the production path (cli/main_stage2.py,
    trainers/loops.py); closure mode survives for small-model tests.

    chunk=k encodes k images at a time under lax.map: the 256px encoder's
    peak conv temps scale with batch, so an unchunked bs-256 encode needs
    multi-GB scratch that OOMs the step compile at big batch (the
    batch-scaling sweep regime) — chunking caps the encoder's peak at one
    chunk while its body compiles ONCE. No-op when B <= chunk; B must be
    divisible by chunk (pad upstream)."""
    def cast(t):
        if dtype is None:
            return t
        return t.astype(dtype) if (hasattr(t, "dtype") and t.dtype == jnp.float32) else t

    enc_vars = dict(vq_vars)
    enc_vars["params"] = jax.tree.map(cast, vq_vars["params"])

    def _encode(images, variables):
        x = images if dtype is None else images.astype(dtype)
        B = x.shape[0]
        if chunk and B > chunk and B % chunk == 0:
            xc = x.reshape(B // chunk, chunk, *x.shape[1:])
            z = jax.lax.map(
                lambda c: vqvae.apply(variables, c, method=type(vqvae).encode), xc
            )
            return z.reshape(B, *z.shape[2:])
        return vqvae.apply(variables, x, method=type(vqvae).encode)

    if as_args:
        return _encode, enc_vars

    def encode_fn(images):
        return _encode(images, enc_vars)

    return encode_fn


def make_soft_code_fn(vq_state: rq.CodebookState, vq_config: rq.QuantizerConfig, loss_cfg: Stage2LossConfig):
    """Soft targets + codes from a frozen stage-1 latent (z_e)."""

    def fn(z_e, rng):
        return rq.get_soft_codes(
            z_e,
            vq_state,
            vq_config,
            temp=loss_cfg.temp,
            stochastic=loss_cfg.stochastic_codes,
            rng=rng,
        )

    return fn


def loss_fn(
    params,
    config: TransformerConfig,
    loss_cfg: Stage2LossConfig,
    codes,  # [B, H, W, D]
    soft_targets,  # [B, h, w, D, V] or None (hard targets)
    cond,  # [B] / [B, Lc] or None
    xs_emb,  # [B, HW, D, input_embed_dim] or None
    rng,
    deterministic: bool = False,
):
    if loss_cfg.amp_bf16:
        def cast(t):
            return t.astype(jnp.bfloat16) if t.dtype == jnp.float32 else t

        params = jax.tree.map(cast, params)
        xs_emb = cast(xs_emb) if xs_emb is not None else None
    out = M.forward(
        params, config, codes, cond, xs_emb, rng=rng, deterministic=deterministic,
        remat=loss_cfg.remat,
    )
    if config.block_size_cond > 1:
        logits, cond_logits = out
    else:
        logits, cond_logits = out, None

    if loss_cfg.use_soft_target:
        assert soft_targets is not None
        img_loss = M.compute_loss(logits, soft_targets, use_soft_target=True)
    else:
        img_loss = M.compute_loss(logits, codes)

    metrics = {"loss_img": img_loss}
    if cond_logits is not None:
        cond_loss = M.compute_cond_loss(cond_logits, cond)
        total = loss_cfg.img_weight * img_loss + loss_cfg.txt_weight * cond_loss
        metrics["loss_txt"] = cond_loss
    else:
        total = img_loss
    metrics["loss_total"] = total
    metrics["codebook_loss"] = M.compute_codebook_loss(
        logits,
        soft_targets if loss_cfg.use_soft_target else codes,
        use_soft_target=loss_cfg.use_soft_target,
    )
    return total, metrics


def make_train_step(
    config: TransformerConfig,
    loss_cfg: Stage2LossConfig,
    tx: optax.GradientTransformation,
    *,
    encode_fn: Optional[Callable] = None,  # images [B,H,W,3] -> z_e (frozen stage-1)
    vq_state: Optional[rq.CodebookState] = None,
    vq_config: Optional[rq.QuantizerConfig] = None,
    grad_accum_steps: int = 1,
    ema_mu: float = 0.9999,
    encode_takes_vars: bool = False,
):
    """Build the jittable train step.

    batch: {"images": [B,...,3]} (with encode_fn) or {"codes": [B,H,W,D]};
    optional "cond". B must be divisible by grad_accum_steps.

    encode_takes_vars=True pairs with make_frozen_encode_fn(as_args=True):
    the returned step's signature becomes
    `train_step(state, batch, rng, enc_vars)` and the frozen encoder's
    parameters are jit ARGUMENTS (never HLO constants — see the
    make_frozen_encode_fn docstring for why that matters here).
    """
    soft_fn = (
        make_soft_code_fn(vq_state, vq_config, loss_cfg)
        if (vq_state is not None and loss_cfg.use_soft_target)
        else None
    )

    def prepare_micro(batch_slice, rng, enc_vars):
        """From raw batch to (codes, soft_targets, xs_emb)."""
        if "codes" in batch_slice:
            codes = batch_slice["codes"]
            soft_targets = batch_slice.get("soft_targets")
            if soft_targets is None and loss_cfg.use_soft_target:
                # derive soft targets from code distances is impossible w/o z_e
                raise ValueError("soft targets required when use_soft_target")
        else:
            assert encode_fn is not None and soft_fn is not None
            z_e = jax.lax.stop_gradient(
                encode_fn(batch_slice["images"], enc_vars)
                if encode_takes_vars else encode_fn(batch_slice["images"])
            )
            soft_targets, codes_hw = soft_fn(z_e, rng)
            h, w, D = codes_hw.shape[1:]
            codes = codes_hw.reshape(codes_hw.shape[0], h, w, D)
        xs_emb = None
        if config.input_emb_vqvae or config.head_emb_vqvae:
            B = codes.shape[0]
            codes_flat = codes.reshape(B, -1, codes.shape[-1])
            xs_emb = rq.embed_code_with_depth(codes_flat, vq_state, vq_config)
        return codes, soft_targets, xs_emb

    def micro_grad(params, batch_slice, rng, enc_vars):
        r_soft, r_drop = jax.random.split(rng)
        codes, soft_targets, xs_emb = prepare_micro(batch_slice, r_soft, enc_vars)
        cond = batch_slice.get("cond")
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, config, loss_cfg, codes, soft_targets, cond, xs_emb, r_drop
        )
        return grads, metrics

    def train_step(state: Stage2State, batch: dict, rng: jax.Array, enc_vars=None):
        rng = jax.random.fold_in(rng, state.step)
        if grad_accum_steps == 1:
            grads, metrics = micro_grad(state.params, batch, rng, enc_vars)
        else:
            def reshape(x):
                return x.reshape(grad_accum_steps, x.shape[0] // grad_accum_steps, *x.shape[1:])

            micro = jax.tree.map(reshape, batch)
            rngs = jax.random.split(rng, grad_accum_steps)

            def body(carry, inp):
                slice_, r = inp
                g, m = micro_grad(state.params, slice_, r, enc_vars)
                return jax.tree.map(jnp.add, carry, g), m

            zero = jax.tree.map(jnp.zeros_like, state.params)
            grads, metrics = jax.lax.scan(body, zero, (micro, rngs))
            grads = jax.tree.map(lambda g: g / grad_accum_steps, grads)
            metrics = jax.tree.map(lambda m: jnp.mean(m, axis=0), metrics)

        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema_params = state.ema_params
        if ema_params is not None:
            ema_params = ema_lib.ema_update(ema_params, params, state.step, ema_mu)
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            Stage2State(
                step=state.step + 1,
                params=params,
                opt_state=opt_state,
                ema_params=ema_params,
            ),
            metrics,
        )

    return train_step


def make_eval_step(config, loss_cfg, *, encode_fn=None, vq_state=None, vq_config=None,
                   encode_takes_vars: bool = False):
    soft_fn = (
        make_soft_code_fn(vq_state, vq_config, loss_cfg)
        if (vq_state is not None and loss_cfg.use_soft_target)
        else None
    )

    def eval_step(params, batch, rng, enc_vars=None):
        if "codes" in batch:
            codes, soft_targets = batch["codes"], batch.get("soft_targets")
        else:
            z_e = (encode_fn(batch["images"], enc_vars)
                   if encode_takes_vars else encode_fn(batch["images"]))
            soft_targets, codes_hw = soft_fn(z_e, rng)
            h, w, D = codes_hw.shape[1:]
            codes = codes_hw.reshape(codes_hw.shape[0], h, w, D)
        xs_emb = None
        if config.input_emb_vqvae or config.head_emb_vqvae:
            codes_flat = codes.reshape(codes.shape[0], -1, codes.shape[-1])
            xs_emb = rq.embed_code_with_depth(codes_flat, vq_state, vq_config)
        _, metrics = loss_fn(
            params, config, loss_cfg, codes, soft_targets,
            batch.get("cond"), xs_emb, rng=None, deterministic=True,
        )
        return metrics

    return eval_step
