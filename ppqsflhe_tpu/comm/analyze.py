"""Offline communication-metrics analysis.

Python twin of the reference's orchestration/metrics/analyze_comm_metrics.py
(:65-115 load, :120-181 client↔server cross-check, :186-249 summaries,
:264-316 plots): loads the client and server CSVs, type-infers rows,
cross-checks matching endpoint+file within a time window flagging size
mismatches, and emits summaries + optional PNG plots.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List

import pandas as pd

MATCH_WINDOW_S = 60          # reference: 60 s pairing window (:139)
SIZE_TOLERANCE = 0.01        # reference: 1% size tolerance (:160)


def load_metrics(path: str) -> pd.DataFrame:
    df = pd.read_csv(path)
    df["timestamp"] = pd.to_datetime(df["timestamp"], errors="coerce", format="mixed")
    for col in ("payload_size", "bytes_sent", "bytes_received", "latency_ms"):
        df[col] = pd.to_numeric(df[col], errors="coerce").fillna(0)
    # type inference for rows missing it (reference heuristics :98-112)
    def infer(row):
        t = str(row.get("type", "") or "")
        if t and t != "-":
            return t
        e = str(row["endpoint"])
        for key, name in (("PubKey", "pubkey"), ("ReKey", "rekey"),
                          ("EncWeights", "enc_weights"), ("getCC", "cc"),
                          ("aggregated", "aggregated"), ("domainChange", "aggregated")):
            if key in e:
                return name
        return "other"

    df["type"] = df.apply(infer, axis=1)
    return df


@dataclass
class CrossCheckResult:
    matched: int = 0
    unmatched_client: int = 0
    size_mismatches: List[Dict] = field(default_factory=list)


def cross_check(client_df: pd.DataFrame, server_df: pd.DataFrame) -> CrossCheckResult:
    """Pair client rows with server rows on endpoint+basename within the
    window; flag payload size disagreements (> tolerance)."""
    res = CrossCheckResult()
    sdf = server_df.copy()
    sdf["file_base"] = sdf["file"].astype(str).map(os.path.basename)
    for _, row in client_df.iterrows():
        base = os.path.basename(str(row["file"]))
        cand = sdf[(sdf["endpoint"] == row["endpoint"]) & (sdf["file_base"] == base)]
        if len(cand) and pd.notna(row["timestamp"]):
            dt = (cand["timestamp"] - row["timestamp"]).dt.total_seconds().abs()
            cand = cand[dt <= MATCH_WINDOW_S]
        if not len(cand):
            res.unmatched_client += 1
            continue
        res.matched += 1
        srow = cand.iloc[0]
        c_size = max(row["payload_size"], row["bytes_received"])
        s_size = max(srow["payload_size"], srow["bytes_received"], srow["bytes_sent"])
        if c_size and s_size:
            rel = abs(c_size - s_size) / max(c_size, s_size)
            if rel > SIZE_TOLERANCE:
                res.size_mismatches.append({
                    "endpoint": row["endpoint"], "file": base,
                    "client_size": int(c_size), "server_size": int(s_size),
                })
    return res


def summarize(df: pd.DataFrame) -> pd.DataFrame:
    """Per-type totals: calls, bytes, latency stats (reference :186-249)."""
    g = df.groupby("type").agg(
        calls=("endpoint", "count"),
        bytes_sent=("bytes_sent", "sum"),
        bytes_received=("bytes_received", "sum"),
        payload_total=("payload_size", "sum"),
        latency_ms_mean=("latency_ms", "mean"),
        latency_ms_max=("latency_ms", "max"),
    )
    return g.reset_index()


def plot_metrics(df: pd.DataFrame, out_dir: str) -> List[str]:
    """The reference's 3 plots: bytes by type, per-call payloads, latency
    histogram (:264-316). Silently skips without matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return []
    os.makedirs(out_dir, exist_ok=True)
    out = []

    s = summarize(df)
    fig, ax = plt.subplots(figsize=(8, 4))
    ax.bar(s["type"], s["payload_total"] / 1e6)
    ax.set_ylabel("payload MB")
    ax.set_title("Bytes by artifact type")
    p = os.path.join(out_dir, "bytes_by_type.png")
    fig.savefig(p, dpi=100, bbox_inches="tight")
    plt.close(fig)
    out.append(p)

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.plot(df["payload_size"].values / 1e6, marker="o", ms=3, lw=0.5)
    ax.set_ylabel("payload MB")
    ax.set_xlabel("call #")
    ax.set_title("Per-call payloads")
    p = os.path.join(out_dir, "per_call_payloads.png")
    fig.savefig(p, dpi=100, bbox_inches="tight")
    plt.close(fig)
    out.append(p)

    fig, ax = plt.subplots(figsize=(8, 4))
    ax.hist(df["latency_ms"].values, bins=30)
    ax.set_xlabel("latency ms")
    ax.set_title("Latency distribution")
    p = os.path.join(out_dir, "latency_hist.png")
    fig.savefig(p, dpi=100, bbox_inches="tight")
    plt.close(fig)
    out.append(p)
    return out


def analyze(client_csv: str, server_csv: str | None = None,
            plot_dir: str | None = None) -> Dict:
    cdf = load_metrics(client_csv)
    result = {"client_summary": summarize(cdf).to_dict("records")}
    if server_csv and os.path.exists(server_csv):
        sdf = load_metrics(server_csv)
        result["server_summary"] = summarize(sdf).to_dict("records")
        cc = cross_check(cdf, sdf)
        result["cross_check"] = {
            "matched": cc.matched,
            "unmatched_client": cc.unmatched_client,
            "size_mismatches": cc.size_mismatches,
        }
    if plot_dir:
        result["plots"] = plot_metrics(cdf, plot_dir)
    return result
