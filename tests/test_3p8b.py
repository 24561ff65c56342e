"""3.8B-readiness without 3.8B hardware (VERDICT r1 next-round #7).

Abstract-evaluates the FULL stage-2 train step at the reference 3.8B config
(/root/reference/configs/imagenet256/stage2/in256-rqtransformer-8x8x4-3800M.yaml:
embed 2560, body 42 x nh40, head 6) and checks the TP/ZeRO sharding math and
the per-device HBM budget against a v5p chip — no weights are materialised
(`jax.eval_shape` only). The companion runtime proof on real (virtual)
devices is test_parallel.py's TP/ZeRO tests at small scale.
"""

import numpy as np
import optax
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from rqvae_tpu.models.rqtransformer import model as M
from rqvae_tpu.models.rqtransformer.config import TransformerConfig
from rqvae_tpu.ops import quantize as rq
from rqvae_tpu.parallel import mesh as mesh_lib
from rqvae_tpu.trainers import trainer_stage2 as t2
from rqvae_tpu.utils.config import load_config, augment_arch_defaults, Config

YAML_3P8B = (
    "/root/reference/configs/imagenet256/stage2/in256-rqtransformer-8x8x4-3800M.yaml"
)
V5P_HBM_GB = 95.0
TP = 2  # model axis of the (4, 2) mesh
DP = 4
MICRO_BATCH = 8  # per-device micro batch (config experiment.batch_size)


@pytest.fixture(scope="module")
def tconf():
    cfg = load_config(YAML_3P8B)
    arch = Config(cfg["arch"])
    arch["vocab_size"] = cfg["dataset"]["vocab_size"]
    return TransformerConfig.create(augment_arch_defaults(arch).to_dict())


def _spec_divisor(leaf, spec, mesh_shape):
    d = 1
    for axis_name in spec:
        if axis_name is not None:
            d *= mesh_shape[axis_name]
    return d


def _bytes_per_device(shapes, specs, mesh_shape):
    total = 0
    for leaf, spec in zip(
        jax.tree.leaves(shapes),
        jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P)),
    ):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n * leaf.dtype.itemsize // _spec_divisor(leaf, spec, mesh_shape)
    return total


class Test3p8bReadiness:
    def test_config_matches_reference(self, tconf):
        assert tconf.embed_dim == 2560
        assert tconf.body.n_layer == 42 and tconf.body.n_head == 40
        assert tconf.head.n_layer == 6
        n_params = sum(
            int(np.prod(l.shape))
            for l in jax.tree.leaves(
                jax.eval_shape(
                    lambda k: M.init_transformer_params(k, tconf),
                    jax.random.PRNGKey(0),
                )
            )
        )
        assert 3.5e9 < n_params < 4.2e9, f"{n_params/1e9:.2f}B != ~3.8B"

    def test_tp_divisibility(self, tconf):
        # Megatron split must divide heads / mlp / vocab evenly at TP=2
        assert tconf.body.n_head % TP == 0
        assert (4 * tconf.embed_dim) % TP == 0
        assert tconf.vocab_size[0] % TP == 0

    def test_full_train_step_traces_and_fits_v5p(self, tconf):
        """eval_shape the entire 3.8B train step (micro-batch grad-accum,
        AdamW + clip, EMA) and bound per-device HBM at (data=4, model=2)."""
        tx = optax.chain(
            optax.clip_by_global_norm(1.0),
            optax.adamw(5e-4, b1=0.9, b2=0.95, weight_decay=1e-4),
        )
        vq_config = rq.QuantizerConfig.create(
            (8, 8, 256), (8, 8, 4), 16384, shared_codebook=True
        )
        vq_state_shape = jax.eval_shape(
            lambda k: rq.init_codebook_state(k, vq_config), jax.random.PRNGKey(1)
        )
        loss_cfg = t2.Stage2LossConfig(use_soft_target=False)

        state_shape = jax.eval_shape(
            lambda k: t2.init_state(k, tconf, tx, use_ema=True),
            jax.random.PRNGKey(0),
        )

        B = MICRO_BATCH * DP
        batch = {
            "codes": jax.ShapeDtypeStruct((B, 8, 8, 4), jnp.int32),
            "cond": jax.ShapeDtypeStruct((B,), jnp.int32),
        }

        # vq_state enters as a closure constant: shape-only stand-in
        vq_state = jax.tree.map(
            lambda s: jnp.zeros(s.shape, s.dtype), vq_state_shape
        )
        step = t2.make_train_step(
            tconf, loss_cfg, tx, vq_state=vq_state, vq_config=vq_config,
        )
        out_state, metrics = jax.eval_shape(
            step, state_shape, batch, jax.random.PRNGKey(2)
        )
        assert out_state.params["body"]["attn"]["wq"].shape == (42, 2560, 2560)
        assert metrics["loss_total"].shape == ()

        # ---- HBM budget at mesh (data=4, model=2), ZeRO-1 over data ----
        mesh_shape = {"data": DP, "model": TP}
        param_specs = mesh_lib.transformer_param_specs(
            jax.tree.map(lambda s: s, state_shape.params)
        )
        p_bytes = _bytes_per_device(state_shape.params, param_specs, mesh_shape)
        ema_bytes = p_bytes  # same layout

        # optimizer moments: ZeRO-1 over data on top of the TP split
        opt_leaves = jax.tree.leaves(state_shape.opt_state)
        opt_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize for l in opt_leaves if l.shape
        ) // (TP * DP)
        grads_bytes = p_bytes  # transient, same sharding as params

        # activations: micro-batch 8, seq 64, fp32 worst case, no remat
        act_bytes = (
            MICRO_BATCH * 64 * tconf.embed_dim * 4
            * (tconf.body.n_layer + tconf.head.n_layer) * 20
        ) // TP

        total_gb = (p_bytes + ema_bytes + opt_bytes + grads_bytes + act_bytes) / 1e9
        print(
            f"\n3.8B per-device HBM @ (data={DP}, model={TP}): "
            f"params {p_bytes/1e9:.1f} + ema {ema_bytes/1e9:.1f} + "
            f"opt(ZeRO-1) {opt_bytes/1e9:.1f} + grads {grads_bytes/1e9:.1f} + "
            f"acts {act_bytes/1e9:.1f} = {total_gb:.1f} GB"
        )
        assert total_gb < V5P_HBM_GB * 0.85, (
            f"3.8B does not fit v5p HBM with margin: {total_gb:.1f} GB"
        )

    def test_sharded_lowering(self, tconf):
        """jit-lower the 3.8B forward with TP in/out shardings on an abstract
        (4, 2) mesh — catches inconsistent PartitionSpecs without compiling."""
        from jax.sharding import AbstractMesh, NamedSharding

        mesh = AbstractMesh((DP, TP), ("data", "model"))
        params_shape = jax.eval_shape(
            lambda k: M.init_transformer_params(k, tconf), jax.random.PRNGKey(0)
        )
        specs = mesh_lib.transformer_param_specs(params_shape)
        param_shardings = jax.tree.map(
            lambda s: NamedSharding(mesh, s), specs,
            is_leaf=lambda x: isinstance(x, P),
        )

        B = MICRO_BATCH * DP
        xs = jax.ShapeDtypeStruct(
            (B, 8, 8, 4), jnp.int32, sharding=NamedSharding(mesh, P("data"))
        )
        xs_emb = jax.ShapeDtypeStruct(
            (B, 64, 4, 256), jnp.float32, sharding=NamedSharding(mesh, P("data"))
        )
        cond = jax.ShapeDtypeStruct(
            (B, 1), jnp.int32, sharding=NamedSharding(mesh, P("data"))
        )
        params_abs = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh),
            params_shape, param_shardings,
        )

        lowered = (
            jax.jit(lambda p, x, c, e: M.forward(p, tconf, x, c, e))
            .trace(params_abs, xs, cond, xs_emb)
            .lower(lowering_platforms=("tpu",))
        )
        hlo = lowered.as_text()
        assert "sharding" in hlo  # shardings survived into the HLO
