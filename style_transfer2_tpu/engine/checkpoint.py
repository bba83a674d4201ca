"""Checkpoint/resume of a StyleTransfer session.

The reference has no real checkpointing — only the router's pickled registry
and in-memory warm-start resampling (SURVEY.md §5). Here the full device
state — iterate, optimizer pytree (including the L-BFGS ring buffer and Adam
moments), style Grams, content, first-eval norm cache — saves through orbax
with a JSON sidecar for the host-side config (weights document, optimizer,
step size, iterate count). Content features are recomputed on load rather
than stored (they are the largest tensors and derive from the content
image)."""

import json
from pathlib import Path

import jax.numpy as jnp
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def save_checkpoint(st, path):
    """Saves the session state of a StyleTransfer to `path` (a directory)."""
    path = Path(path).absolute()
    arrays = {
        'opt_state': st.opt_state,
        'input': st._input,
        'content': st.content,
        'grams': st.grams,
        'norm_vals': {k: jnp.asarray(v) for k, v in st.norm_vals.items()},
        'norm_set': {k: jnp.asarray(v) for k, v in st.norm_set.items()},
    }
    arrays = {k: v for k, v in arrays.items() if v is not None}
    _checkpointer().save(path / 'arrays', arrays, force=True)
    meta = {
        't': st.t,
        'optimizer_name': st.optimizer_name,
        'step_size': st.step_size,
        'weights': st.weights,
        'scalar_params': st.scalar_params,
        'precision': st.precision,
        'n_corr': st.n_corr,
        'needs_init': st._needs_init,
        'has': sorted(arrays.keys()),
    }
    with open(path / 'meta.json', 'w') as f:
        json.dump(meta, f)


def load_checkpoint(st, path):
    """Restores a checkpoint into a StyleTransfer (recomputing content
    features from the restored content image)."""
    path = Path(path).absolute()
    with open(path / 'meta.json') as f:
        meta = json.load(f)
    arrays = _checkpointer().restore(path / 'arrays')

    st.t = int(meta['t'])
    st.optimizer_name = meta['optimizer_name']
    st.step_size = float(meta['step_size'])
    st.weights = meta['weights']
    st.scalar_params = meta['scalar_params']
    st.n_corr = int(meta['n_corr'])
    st._needs_init = bool(meta['needs_init'])
    st._weights_cache = None
    st._step_size_dev = None

    def arr(tree):
        return jnp.asarray(tree) if not isinstance(tree, dict) else {
            k: arr(v) for k, v in tree.items()}

    if 'opt_state' in arrays:
        st.opt_state = {k: arr(v) for k, v in arrays['opt_state'].items()}
        # Integer counters restore as arrays; keep dtypes tight.
        for key in ('g1_items', 'g2_items', 't', 'count', 'pos'):
            if key in st.opt_state:
                st.opt_state[key] = jnp.int32(st.opt_state[key])
        # Migration: checkpoints from the short-lived flat-history
        # experiment stored the L-BFGS buffers as (n_corr, N); the
        # buffers are (n_corr,) + x.shape (optim/lbfgs.py init
        # docstring — the flat layout regressed 26-40% on hardware).
        if 'x' in st.opt_state:
            x_shape = st.opt_state['x'].shape
            for key in ('sk', 'yk'):
                if key in st.opt_state and st.opt_state[key].ndim == 2:
                    st.opt_state[key] = st.opt_state[key].reshape(
                        (st.opt_state[key].shape[0],) + x_shape)
    else:
        st.opt_state = None
    st._input = arr(arrays['input']) if 'input' in arrays else None
    if st.opt_state is not None and st._input is not None:
        st.opt_state['x'] = st._input
    st.content = arr(arrays['content']) if 'content' in arrays else None
    st.grams = ({k: arr(v) for k, v in arrays['grams'].items()}
                if 'grams' in arrays else None)
    st.norm_vals = {k: jnp.float32(v)
                    for k, v in arrays.get('norm_vals', {}).items()}
    st.norm_set = {k: bool(np.asarray(v))
                   for k, v in arrays.get('norm_set', {}).items()}

    if st.placement is not None:
        st._input = st._place_image(st._input) if st._input is not None else None
        st.opt_state = st._place_state(st.opt_state) if st.opt_state else None
        st.content = st._place_image(st.content) if st.content is not None else None
        st.grams = st._place_replicated(st.grams) if st.grams else None

    if st.content is not None:
        st.features = st._content_features()
    return st
