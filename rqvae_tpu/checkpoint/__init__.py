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

        # async: save() returns once the state is snapshotted to host
        # memory; serialization/writes happen on a background thread (a
        # 1.4B train state is ~17 GB — a synchronous write stalls training
        # for its full disk/GCS time once per save_ckpt_freq). A second
        # save (or close at exit) waits for the previous commit first.
        _CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
        atexit.register(_CKPTR.close)
    return _CKPTR


def save_checkpoint(ckpt_dir: str, state: Any, step: int, block: bool = True):
    """Save `state` under ckpt_dir/step_<step>.

    block=False returns as soon as the host snapshot is taken and lets the
    write complete in the background (the trainers use this between
    epochs); block=True waits for the files to be durable — use it for the
    final save or when the caller reads the checkpoint right back."""
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    ckptr = _ckptr()
    ckptr.save(path, jax.device_get(state), force=True)
    if block:
        ckptr.wait_until_finished()
    return path


def wait_for_checkpoints():
    """Block until all pending async checkpoint writes are durable."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


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

    ckptr = _ckptr()
    ckptr.wait_until_finished()  # a pending async save may be the target
    step = step if step is not None else latest_step(ckpt_dir)
    if step is None:
        raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, jax.device_get(target))
    return ckptr.restore(path, abstract)


from rqvae_tpu.checkpoint import torch_convert  # noqa: E402,F401
