"""Unit + parity tests for the RQ bottleneck core ops.

Parity target: /root/reference/rqvae/models/rqvae/quantizations.py, executed
directly (torch CPU) with identical weights/inputs.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rqvae_tpu.ops import quantize as rq

from ref_loader import load_rqvae_modules


def make_config(depth=4, shared=False, n_embed=64, restart=False):
    return rq.QuantizerConfig.create(
        latent_shape=(8, 8, 16),
        code_shape=(8, 8, depth),
        n_embed=n_embed,
        decay=0.99,
        shared_codebook=shared,
        restart_unused_codes=restart,
    )


def make_state(key, config):
    return rq.init_codebook_state(key, config)


class TestReshapes:
    def test_roundtrip(self):
        cfg = rq.QuantizerConfig.create((16, 16, 8), (8, 8, 4), 32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 8))
        y = rq.to_code_shape(x, cfg)
        assert y.shape == (2, 8, 8, 32)
        x2 = rq.to_latent_shape(y, cfg)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x2))

    def test_matches_reference(self):
        import torch

        _, _, Q = load_rqvae_modules()
        ref = Q.RQBottleneck((16, 16, 8), (8, 8, 4), 32)
        cfg = rq.QuantizerConfig.create((16, 16, 8), (8, 8, 4), 32)
        x = np.random.RandomState(0).randn(2, 16, 16, 8).astype(np.float32)
        ref_y = ref.to_code_shape(torch.from_numpy(x)).numpy()
        y = np.asarray(rq.to_code_shape(jnp.asarray(x), cfg))
        np.testing.assert_allclose(y, ref_y, rtol=1e-6)


class TestNearest:
    def test_vs_reference_distances_and_argmin(self):
        import torch

        _, _, Q = load_rqvae_modules()
        rng = np.random.RandomState(1)
        n_embed, dim = 96, 16
        vq = Q.VQEmbedding(n_embed, dim, ema=True)
        cb = vq.weight.detach().numpy()[:-1]
        x = rng.randn(4, 8, 8, dim).astype(np.float32)

        ref_dist = vq.compute_distances(torch.from_numpy(x)).numpy()
        ref_idx = vq.find_nearest_embedding(torch.from_numpy(x)).numpy()

        dist = np.asarray(rq.compute_distances(jnp.asarray(x), jnp.asarray(cb)))
        idx = np.asarray(rq.find_nearest(jnp.asarray(x), jnp.asarray(cb), use_kernel=False))
        np.testing.assert_allclose(dist, ref_dist, rtol=1e-4, atol=1e-4)
        np.testing.assert_array_equal(idx, ref_idx)

    def test_padding_row_lookup(self):
        cb = jnp.arange(12, dtype=jnp.float32).reshape(4, 3) + 1.0
        idx = jnp.array([0, 3, 4])  # 4 == n_embed -> zero row
        out = np.asarray(rq.embed_lookup(cb, idx))
        np.testing.assert_allclose(out[0], [1, 2, 3])
        np.testing.assert_allclose(out[2], [0, 0, 0])


class TestQuantize:
    @pytest.mark.parametrize("shared", [False, True])
    def test_vs_reference_eval_path(self, shared):
        import torch

        _, _, Q = load_rqvae_modules()
        cfg = make_config(depth=4, shared=shared, n_embed=64)
        ref = Q.RQBottleneck(
            (8, 8, 16), (8, 8, 4), 64, shared_codebook=shared, restart_unused_codes=False
        )
        ref.eval()

        state = make_state(jax.random.PRNGKey(0), cfg)
        # copy our init into the torch model
        for d in range(4):
            w = np.asarray(state.embed[cfg.codebook_index(d)])
            with torch.no_grad():
                ref.codebooks[d].weight[:-1] = torch.from_numpy(w)

        x = np.random.RandomState(2).randn(2, 8, 8, 16).astype(np.float32)
        with torch.no_grad():
            ref_zq, ref_loss, ref_codes = ref(torch.from_numpy(x))

        zq, loss, codes, _ = rq.rq_bottleneck_forward(
            jnp.asarray(x), state, cfg, training=False, use_kernel=False
        )
        np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
        np.testing.assert_allclose(np.asarray(zq), ref_zq.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)

    def test_ste_gradient(self):
        """d z_q / d z_e must be identity (straight-through)."""
        cfg = make_config(depth=2, n_embed=16)
        state = make_state(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 16))

        def f(z):
            zq, _, _, _ = rq.rq_bottleneck_forward(z, state, cfg, training=False, use_kernel=False)
            return jnp.sum(zq * 3.0)

        g = jax.grad(f)(x)
        np.testing.assert_allclose(np.asarray(g), 3.0 * np.ones_like(np.asarray(g)), rtol=1e-6)

    def test_commitment_loss_grad_flows_to_input(self):
        cfg = make_config(depth=2, n_embed=16)
        state = make_state(jax.random.PRNGKey(0), cfg)
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 16))

        def f(z):
            _, loss, _, _ = rq.rq_bottleneck_forward(z, state, cfg, training=False, use_kernel=False)
            return loss

        g = jax.grad(f)(x)
        assert np.abs(np.asarray(g)).max() > 0


class TestEMAUpdate:
    @pytest.mark.parametrize("shared", [False, True])
    def test_vs_reference_training_step(self, shared):
        import torch

        _, _, Q = load_rqvae_modules()
        cfg = make_config(depth=3, shared=shared, n_embed=32, restart=False)
        ref = Q.RQBottleneck(
            (8, 8, 16), (8, 8, 3), 32, shared_codebook=shared, restart_unused_codes=False
        )
        ref.train()

        state = make_state(jax.random.PRNGKey(0), cfg)
        for d in range(3):
            w = np.asarray(state.embed[cfg.codebook_index(d)])
            with torch.no_grad():
                ref.codebooks[d].weight[:-1] = torch.from_numpy(w)
                ref.codebooks[d].embed_ema.copy_(torch.from_numpy(w))
                ref.codebooks[d].cluster_size_ema.zero_()

        x = np.random.RandomState(5).randn(2, 8, 8, 16).astype(np.float32)
        ref_zq, ref_loss, ref_codes = ref(torch.from_numpy(x))

        zq, loss, codes, new_state = rq.rq_bottleneck_forward(
            jnp.asarray(x), state, cfg, training=True, rng=None, use_kernel=False
        )
        np.testing.assert_array_equal(np.asarray(codes), ref_codes.detach().numpy())
        np.testing.assert_allclose(
            np.asarray(zq), ref_zq.detach().numpy(), rtol=1e-4, atol=1e-5
        )
        # EMA state parity after one training forward
        for b in range(cfg.n_codebooks):
            np.testing.assert_allclose(
                np.asarray(new_state.cluster_size[b]),
                ref.codebooks[b].cluster_size_ema.numpy(),
                rtol=1e-4,
                atol=1e-5,
            )
            np.testing.assert_allclose(
                np.asarray(new_state.embed_ema[b]),
                ref.codebooks[b].embed_ema.numpy(),
                rtol=1e-3,
                atol=1e-4,
            )
            np.testing.assert_allclose(
                np.asarray(new_state.embed[b]),
                ref.codebooks[b].weight[:-1].detach().numpy(),
                rtol=1e-3,
                atol=1e-4,
            )

    def test_restart_unused_codes_replaces_dead_codes(self):
        cfg = make_config(depth=1, n_embed=32, restart=True)
        state = make_state(jax.random.PRNGKey(0), cfg)
        # push codebook far away so most codes never win
        state = state.replace(embed=state.embed + 100.0, embed_ema=state.embed_ema + 100.0)
        x = jax.random.normal(jax.random.PRNGKey(6), (4, 8, 8, 16))
        _, _, _, new_state = rq.rq_bottleneck_forward(
            x, state, cfg, training=True, rng=jax.random.PRNGKey(7), use_kernel=False
        )
        # dead codes restarted with batch vectors (near 0, not near 100)
        dead_mag = np.abs(np.asarray(new_state.embed)).mean()
        assert dead_mag < 50.0
        # cluster sizes of dead codes reset to 1
        cs = np.asarray(new_state.cluster_size[0])
        assert (cs >= 1.0 - 1e-6).sum() > 0


class TestDecodePaths:
    def test_embed_code_matches_reference(self):
        import torch

        _, _, Q = load_rqvae_modules()
        cfg = make_config(depth=4, n_embed=64)
        ref = Q.RQBottleneck((8, 8, 16), (8, 8, 4), 64, restart_unused_codes=False)
        state = make_state(jax.random.PRNGKey(0), cfg)
        for d in range(4):
            with torch.no_grad():
                ref.codebooks[d].weight[:-1] = torch.from_numpy(
                    np.asarray(state.embed[cfg.codebook_index(d)])
                )

        codes = np.random.RandomState(8).randint(0, 64, (2, 8, 8, 4))
        ref_out = ref.embed_code(torch.from_numpy(codes)).numpy()
        out = np.asarray(rq.embed_code(jnp.asarray(codes), state, cfg))
        np.testing.assert_allclose(out, ref_out, rtol=1e-5, atol=1e-5)

        ref_depth, _ = ref.embed_code_with_depth(torch.from_numpy(codes))
        depth = np.asarray(rq.embed_code_with_depth(jnp.asarray(codes), state, cfg))
        np.testing.assert_allclose(depth, ref_depth.numpy(), rtol=1e-5, atol=1e-5)

        for decode_type in ("select", "add"):
            ref_p = ref.embed_partial_code(torch.from_numpy(codes), 2, decode_type).numpy()
            p = np.asarray(rq.embed_partial_code(jnp.asarray(codes), 2, state, cfg, decode_type))
            np.testing.assert_allclose(p, ref_p, rtol=1e-5, atol=1e-5)

    def test_soft_codes_match_reference(self):
        import torch

        _, _, Q = load_rqvae_modules()
        cfg = make_config(depth=3, n_embed=32)
        ref = Q.RQBottleneck((8, 8, 16), (8, 8, 3), 32, restart_unused_codes=False)
        state = make_state(jax.random.PRNGKey(0), cfg)
        for d in range(3):
            with torch.no_grad():
                ref.codebooks[d].weight[:-1] = torch.from_numpy(
                    np.asarray(state.embed[cfg.codebook_index(d)])
                )

        x = np.random.RandomState(9).randn(2, 8, 8, 16).astype(np.float32)
        ref_soft, ref_codes = ref.get_soft_codes(torch.from_numpy(x), temp=0.5)
        soft, codes = rq.get_soft_codes(jnp.asarray(x), state, cfg, temp=0.5)
        np.testing.assert_array_equal(np.asarray(codes), ref_codes.numpy())
        np.testing.assert_allclose(np.asarray(soft), ref_soft.numpy(), rtol=1e-3, atol=1e-5)


class TestPallasKernelInterpret:
    def test_kernel_matches_xla_interpret_mode(self):
        from rqvae_tpu.ops.rq_kernel import _nearest_code_pallas, _nearest_code_xla

        rng = np.random.RandomState(10)
        x = rng.randn(300, 48).astype(np.float32)
        cb = rng.randn(200, 48).astype(np.float32)
        ref = np.asarray(_nearest_code_xla(jnp.asarray(x), jnp.asarray(cb)))
        out = np.asarray(
            _nearest_code_pallas(jnp.asarray(x), jnp.asarray(cb), interpret=True)
        )
        np.testing.assert_array_equal(out, ref)
