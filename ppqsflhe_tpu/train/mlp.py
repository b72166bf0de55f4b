"""Pure-JAX windowed-MLP forecaster (Keras-compatible weight layout).

Third model family next to the GRU (the reference's architecture,
c_trainAndUpdate.py:47-56) and the stacked LSTM: the (lookback, F) window is
flattened and passed through Dense(h)→ReLU→Dense(h)→ReLU→Dense(1). Layout
matches ``keras.layers.Dense``: kernel (in, out), bias (out,) — so the
weights_summary export/warm-start round-trips through the encrypted FedAvg
pipeline exactly like the other families.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .gru import _glorot

HIDDEN = 64


def init_params(key, n_features: int, hidden: int = HIDDEN,
                lookback: int | None = None) -> List[jnp.ndarray]:
    """[W1, b1, W2, b2, Wd, bd]. ``lookback`` must be pinned at init because
    the flattened window is the input width; default 72 (the reference's)."""
    lb = int(lookback or 72)
    k = jax.random.split(key, 3)
    d_in = lb * n_features
    return [
        _glorot(k[0], (d_in, hidden)), jnp.zeros((hidden,), jnp.float32),
        _glorot(k[1], (hidden, hidden)), jnp.zeros((hidden,), jnp.float32),
        _glorot(k[2], (hidden, 1)), jnp.zeros((1,), jnp.float32),
    ]


def forward(params: List[jnp.ndarray], x, *, train: bool = False,
            rng=None, dropout_rate: float = 0.3, **_):
    """x: (B, lookback, F) → (B,) prediction."""
    h = x.reshape(x.shape[0], -1)
    h = jax.nn.relu(h @ params[0] + params[1])
    if train and rng is not None:
        rng, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1 - dropout_rate, h.shape)
        h = jnp.where(keep, h / (1 - dropout_rate), 0.0)
    h = jax.nn.relu(h @ params[2] + params[3])
    if train and rng is not None:
        _, sub = jax.random.split(rng)
        keep = jax.random.bernoulli(sub, 1 - dropout_rate, h.shape)
        h = jnp.where(keep, h / (1 - dropout_rate), 0.0)
    return (h @ params[4] + params[5])[:, 0]


def num_params(params) -> int:
    return int(sum(np.asarray(p).size for p in params))
