"""Checkpointing: Orbax for native train states + torch .pt conversion.

Replaces the reference torch.save checkpoints
(/root/reference/rqvae/trainers/trainer_rqvae.py:391-403). Layout:
<result_path>/ckpt/<step>/ Orbax directories; `latest_step` finds the resume
point. Reference .pt checkpoints load through
rqvae_tpu.checkpoint.torch_convert.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


_CKPTR = None


def _ckptr():
    global _CKPTR
    if _CKPTR is None:
        import atexit

        import orbax.checkpoint as ocp

        _CKPTR = ocp.StandardCheckpointer()
        atexit.register(_CKPTR.close)
    return _CKPTR


def save_checkpoint(ckpt_dir: str, state: Any, step: int):
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = _ckptr()
    ckptr.save(path, jax.device_get(state), force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for d in os.listdir(ckpt_dir)
        if (m := re.fullmatch(r"step_(\d+)", d))
    ]
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, target: Any, step: Optional[int] = None) -> Any:
    """Restore into the structure of `target` (an abstract or concrete state)."""
    import orbax.checkpoint as ocp

    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(target))
    return _ckptr().restore(path, abstract)


from rqvae_tpu.checkpoint import torch_convert  # noqa: E402,F401
