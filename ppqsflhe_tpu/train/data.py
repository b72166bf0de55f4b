"""Time-series data pipeline for the FL clients.

Mirrors the reference client's pandas feature engineering exactly
(client/src/c_trainAndUpdate.py:104-119): calendar features from the
Timestamp column, StandardScaler fit on the train split only, and
lookback-window sequences whose channels are [6 scaled features, scaled
target] (prepare_sequences, c_trainAndUpdate.py:36-44).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

FEATURE_NAMES = ["DayOfYear", "Month", "DayOfWeek", "WeekOfYear", "AcademicMonth", "HourOfDay"]
TARGET = "Data"


def load_timeseries(csv_path: str) -> pd.DataFrame:
    df = pd.read_csv(csv_path)
    if "Timestamp" not in df.columns:
        raise ValueError(f"expected 'Timestamp' column, got {list(df.columns)}")
    df["Timestamp"] = pd.to_datetime(df["Timestamp"], errors="coerce", dayfirst=True)
    df["DayOfYear"] = df["Timestamp"].dt.dayofyear
    df["Month"] = df["Timestamp"].dt.month
    df["DayOfWeek"] = df["Timestamp"].dt.dayofweek
    df["WeekOfYear"] = df["Timestamp"].dt.isocalendar().week.astype(np.int64)
    df["AcademicMonth"] = df["Month"].apply(lambda x: 1 if x in [1, 2, 3, 4, 5, 8, 9, 10, 11] else 0)
    df["HourOfDay"] = df["Timestamp"].dt.hour
    return df


@dataclass
class Scaler:
    """StandardScaler twin (mean/std per column, ddof=0 like sklearn)."""

    mean: np.ndarray = None
    std: np.ndarray = None

    def fit(self, x: np.ndarray) -> "Scaler":
        self.mean = np.asarray(x, np.float64).mean(axis=0)
        self.std = np.asarray(x, np.float64).std(axis=0)
        self.std = np.where(self.std == 0, 1.0, self.std)
        return self

    def transform(self, x):
        return (np.asarray(x, np.float64) - self.mean) / self.std

    def inverse(self, x):
        return np.asarray(x, np.float64) * self.std + self.mean


def prepare_sequences(df: pd.DataFrame, lookback: int, fs: Scaler, ts: Scaler):
    """Sliding windows: X[i] = [features||target][i-lookback:i], y[i] = target[i]."""
    features = fs.transform(df[FEATURE_NAMES].values)
    targets = ts.transform(df[[TARGET]].values)
    chan = np.concatenate([features, targets], axis=1)
    n = len(df)
    if n <= lookback:
        return np.zeros((0, lookback, chan.shape[1])), np.zeros((0,))
    idx = np.arange(lookback, n)
    seqs = np.stack([chan[i - lookback : i] for i in idx])
    targs = targets[idx, 0]
    return seqs.astype(np.float32), targs.astype(np.float32)


def train_test_frames(df: pd.DataFrame, train_end: str, test_start: str):
    train = df[df["Timestamp"] <= train_end]
    test = df[df["Timestamp"] >= test_start]
    return train, test


def train_val_split(X, y, val_frac: float = 0.1):
    """Last-10%-as-validation split (c_trainAndUpdate.py:122-123)."""
    nval = int(val_frac * len(X))
    if nval == 0:
        return X, y, X[:0], y[:0]
    return X[:-nval], y[:-nval], X[-nval:], y[-nval:]
