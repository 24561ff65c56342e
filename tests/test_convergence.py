"""Multi-step LEARNING regression tests (VERDICT r2 item 1).

One-step smoke tests prove the trainers run; these prove they LEARN: on a
tiny fixed procedural dataset the stage-1 recon loss and the stage-2
teacher-forced loss must decrease substantially over a few dozen steps, the
codebook must stay in use, and nothing may go non-finite. The full-scale
on-chip run (tools/train_convergence.py) produces the committed artifacts;
this test keeps the same harness from regressing, on CPU geometry.
"""

import sys
import os

import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

import train_convergence as TC  # noqa: E402


def test_stage1_and_stage2_learn():
    state, model, s1, data = TC.run_stage1(
        steps=24, res=32, bs=8, n_images=16, small=True, fetch_every=4,
        save_artifacts=False, seed=0,
    )
    assert s1["finite"], "stage-1 produced non-finite losses"
    assert s1["last_loss_recon"] < 0.7 * s1["first_loss_recon"], s1
    # the adaptive GAN weight must stay bounded (clip is 1e4; a healthy run
    # stays far below)
    assert s1["max_g_weight"] < 1e3, s1
    # codebook in use: entropy of every depth > 1 bit at the end
    assert min(s1["last_entropy"]) > 1.0, s1

    s2 = TC.run_stage2(
        state, model, data, steps=48, bs=8, small=True, fetch_every=8,
        save_artifacts=False, seed=10,
    )
    assert np.isfinite(s2["last_loss"])
    # 48 CPU steps reach ~0.57x (measured); the on-chip run
    # (tools/train_convergence.py, 800 steps) asserts the strong 0.3x bound
    assert s2["last_loss"] < 0.7 * s2["first_loss"], s2


def test_stage2_text_conditional_learns():
    """The TEXT-conditional trainer learns: cond_classifier txt-weighted
    loss live (caption prefix, reference transformers.py:101-105,151-153),
    both the image xent and the caption xent must decrease on a tiny fixed
    set. The on-chip run (tools/train_convergence.py text) closes the
    prompt -> sample -> decode loop and commits convergence_text.json."""
    state, model, s1, data = TC.run_stage1(
        steps=24, res=32, bs=8, n_images=16, small=True, fetch_every=4,
        save_artifacts=False, seed=0,
    )
    st = TC.run_stage2_text(
        state, model, data, steps=48, bs=8, small=True, fetch_every=8,
        save_artifacts=False, seed=20, cond_len=4, vocab_cond=16,
    )
    assert np.isfinite(st["last_loss"]) and np.isfinite(st["last_loss_txt"])
    assert st["last_loss"] < 0.7 * st["first_loss"], st
    assert st["last_loss_txt"] < 0.8 * st["first_loss_txt"], st
