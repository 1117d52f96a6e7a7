"""Checkpoint/resume for renders and inverse-rendering optimization.

The reference has none (SURVEY.md §5: partial-image flush on SIGHUP is the
only 'resume-ish' facility, mitsuba.cpp:93-124); this is a deliberate
improvement: the film accumulator + pass counter + RNG seed fully determine a
resumable render (counter-based RNG makes replay exact), and optimizer state
makes inverse-rendering runs restartable."""
from __future__ import annotations

import json
import os

import numpy as np


def save_render_state(path: str, accum, pass_idx: int, seed: int, cfg):
    """Persist a partially accumulated render (atomic write)."""
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        accum=np.asarray(accum),
        pass_idx=np.int64(pass_idx),
        seed=np.int64(seed),
        cfg=json.dumps(cfg._asdict()),
    )
    os.replace(tmp, path)


def load_render_state(path: str):
    """Returns (accum, pass_idx, seed, cfg_dict) or None if absent."""
    if not os.path.exists(path):
        return None
    with np.load(path, allow_pickle=False) as z:
        return (
            z["accum"],
            int(z["pass_idx"]),
            int(z["seed"]),
            json.loads(str(z["cfg"])),
        )


def save_train_state(path: str, params, opt_state, step: int, extra=None):
    """Persist MediumParams + optax state (flattened leaves)."""
    import jax

    leaves, treedef = jax.tree.flatten((params, opt_state))
    tmp = path + ".tmp.npz"
    np.savez_compressed(
        tmp,
        step=np.int64(step),
        n_leaves=np.int64(len(leaves)),
        extra=json.dumps(extra or {}),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    os.replace(tmp, path)


def load_train_state(path: str, params_like, opt_state_like):
    """Restore into the same pytree structure; returns
    (params, opt_state, step, extra) or None."""
    import jax

    if not os.path.exists(path):
        return None
    _, treedef = jax.tree.flatten((params_like, opt_state_like))
    with np.load(path, allow_pickle=False) as z:
        n = int(z["n_leaves"])
        leaves = [z[f"leaf_{i}"] for i in range(n)]
        params, opt_state = jax.tree.unflatten(treedef, leaves)
        return params, opt_state, int(z["step"]), json.loads(str(z["extra"]))
