"""Generate tests/goldens/eval_stack_golden.npz — pinned flax outputs of the
eval stack under the synthetic weights used by tests/test_eval_parity.py.

Run from the repo root (CPU): python tools/gen_eval_goldens.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import test_eval_parity as tep


def main():
    _, inc = tep.build_ref_fid_inception(seed=0)
    from rqvae_tpu.metrics.inception import FIDInceptionV3, convert_fid_inception

    variables = {"params": convert_fid_inception(inc.state_dict())}
    model = FIDInceptionV3()
    rng = np.random.RandomState(7)
    imgs = rng.rand(2, 128, 128, 3).astype(np.float32)
    pool, logits = jax.jit(model.apply)(variables, jnp.asarray(imgs))

    _, _, vgg_sd, lin_sd = tep.build_ref_lpips(seed=0)
    from rqvae_tpu.losses.lpips import LPIPS, convert_lpips, init_lpips

    lvars = convert_lpips(init_lpips(), vgg_sd, lin_sd)
    rng = np.random.RandomState(11)
    a = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2.0) - 1.0
    b = (rng.rand(2, 64, 64, 3).astype(np.float32) * 2.0) - 1.0
    vals = LPIPS().apply(lvars, jnp.asarray(a), jnp.asarray(b), reduction="none")

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests",
                       "goldens", "eval_stack_golden.npz")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(
        out,
        inc_input_seed=7,
        inc_pool=np.asarray(pool),
        inc_logits=np.asarray(logits),
        lpips_input_seed=11,
        lpips_vals=np.asarray(vals)[:, 0, 0, 0],
    )
    print("wrote", os.path.abspath(out))


if __name__ == "__main__":
    main()
