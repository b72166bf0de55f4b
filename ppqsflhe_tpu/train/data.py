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


def load_timeseries(csv_path: str, dayfirst: bool = True) -> pd.DataFrame:
    """``dayfirst=True`` (default) parses the reference datasets' DD-MM-YYYY
    timestamps correctly. ``dayfirst=False`` replicates the reference
    scripts' own month-first pandas default (c_trainAndUpdate.py:96,
    c_evalulate_rounds.py:75): on its day-first CSVs that reading turns
    days 1-12 of July into the 7th of Jan..Dec and coerces days 13+ to NaT
    (dropped by the date-split comparisons) — the committed reference
    metrics were computed on THAT 168-train-row/120-test-row view, so
    bug-compatible parsing is required for apples-to-apples parity
    (docs/PARITY.md, VERDICT r4 missing #3)."""
    df = pd.read_csv(csv_path)
    if "Timestamp" not in df.columns:
        raise ValueError(f"expected 'Timestamp' column, got {list(df.columns)}")
    df["Timestamp"] = pd.to_datetime(df["Timestamp"], errors="coerce",
                                     dayfirst=dayfirst)
    df["DayOfYear"] = df["Timestamp"].dt.dayofyear
    df["Month"] = df["Timestamp"].dt.month
    df["DayOfWeek"] = df["Timestamp"].dt.dayofweek
    wk = df["Timestamp"].dt.isocalendar().week
    # NaT timestamps (possible under bug-compatible month-first parsing)
    # leave NA weeks; those rows are excluded by the date-split comparisons,
    # so carry them as NaN instead of failing the int cast
    df["WeekOfYear"] = (wk.astype("float64") if wk.isna().any()
                        else wk.astype(np.int64))
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
