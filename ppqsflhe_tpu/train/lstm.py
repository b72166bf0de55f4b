"""Pure-JAX LSTM forecaster (Keras-compatible weight layout).

Second model family alongside the GRU (train/gru.py). BASELINE.json config 5
benchmarks "16 clients × 1M-param LSTM weights"; ``init_params(n_features=7,
hidden=300)`` (the default) yields 1,091,101 parameters. Layout matches
``keras.layers.LSTM``: kernel (F, 4H), recurrent (H, 4H), bias (4H,) with
gate order [i, f, c, o] and unit_forget_bias.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .gru import _glorot, _orthogonal


def init_params(key, n_features: int, hidden: int = 300) -> List[jnp.ndarray]:
    """[W1, U1, b1, W2, U2, b2, Wd, bd] — stacked LSTM(h) → LSTM(h) → Dense(1)."""
    k = jax.random.split(key, 5)
    b1 = np.zeros(4 * hidden, np.float32)
    b1[hidden : 2 * hidden] = 1.0  # unit_forget_bias
    b2 = b1.copy()
    return [
        _glorot(k[0], (n_features, 4 * hidden)),
        _orthogonal(k[1], (hidden, 4 * hidden)),
        jnp.asarray(b1),
        _glorot(k[2], (hidden, 4 * hidden)),
        _orthogonal(k[3], (hidden, 4 * hidden)),
        jnp.asarray(b2),
        _glorot(k[4], (hidden, 1)),
        jnp.zeros((1,), jnp.float32),
    ]


def _cell(carry, x, W, U, b, hidden):
    h, c = carry
    z = x @ W + h @ U + b
    i = jax.nn.sigmoid(z[:, :hidden])
    f = jax.nn.sigmoid(z[:, hidden : 2 * hidden])
    g = jnp.tanh(z[:, 2 * hidden : 3 * hidden])
    o = jax.nn.sigmoid(z[:, 3 * hidden :])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)
    return (h2, c2)


def lstm_layer(params3, x_seq, return_sequences: bool, hidden: int):
    W, U, b = params3
    B = x_seq.shape[0]
    h0 = (jnp.zeros((B, hidden), x_seq.dtype), jnp.zeros((B, hidden), x_seq.dtype))

    def step(carry, x_t):
        carry = _cell(carry, x_t, W, U, b, hidden)
        return carry, carry[0]

    (h_last, _), hs = jax.lax.scan(step, h0, jnp.swapaxes(x_seq, 0, 1))
    return jnp.swapaxes(hs, 0, 1) if return_sequences else h_last


def forward(params: List[jnp.ndarray], x, *, hidden: int | None = None, **_):
    hidden = hidden or params[1].shape[0]
    h = lstm_layer(params[0:3], x, True, hidden)
    h = lstm_layer(params[3:6], h, False, hidden)
    return (h @ params[6] + params[7])[:, 0]


def num_params(params) -> int:
    return sum(int(np.prod(p.shape)) for p in params)
