"""Readers for the reference repo's serialized OpenFHE (cereal-JSON)
artifacts — the checked-in CryptoContext and client keys
(client/storage/*/private/*.key, server/storage/CC.json; SURVEY.md §2.3).

These artifacts pin the exact CKKS parameter set and key material of the
authors' run, giving us *bit-exact* interop tests without OpenFHE itself:
iNTT-ing a secret-key tower with the right negacyclic convention must yield a
ternary polynomial in {0, 1, q-1}, CRT-consistent across towers
(tests/test_interop.py).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class OpenFhePoly:
    """A DCRTPoly: per-tower residue vectors + moduli + 2N-th roots."""

    towers: np.ndarray          # u64[L, N]
    moduli: List[int]
    roots: List[int]
    fmt: int                    # 0 = EVALUATION (NTT domain), 1 = COEFFICIENT
    ring_dim: int


def _tower_arrays(poly_node: dict) -> OpenFhePoly:
    towers, moduli, roots = [], [], []
    for t in poly_node["v"]:
        data = t["v"]["ptr_wrapper"]["data"]
        towers.append(np.array([int(x) for x in data["v"]], dtype=np.uint64))
        moduli.append(int(data["m"]["v"]))
        p = t["p"]["ptr_wrapper"]["data"]["value0"]
        ru = p.get("ru")
        roots.append(int(ru["v"]) if isinstance(ru, dict) and "v" in ru else 0)
    params = poly_node["p"]["ptr_wrapper"]["data"]["value0"]
    return OpenFhePoly(
        towers=np.stack(towers),
        moduli=moduli,
        roots=roots,
        fmt=int(poly_node["f"]),
        ring_dim=int(params["rd"]),
    )


def _find_first(node, key: str):
    """DFS for the first dict containing `key` (cereal graphs nest deeply)."""
    stack = [node]
    while stack:
        cur = stack.pop()
        if isinstance(cur, dict):
            if key in cur:
                return cur[key]
            stack.extend(cur.values())
        elif isinstance(cur, list):
            stack.extend(cur)
    return None


def load_secret_key(path: str) -> OpenFhePoly:
    """client_*-private.key → the secret DCRTPoly `s` (EVAL format, 4 towers)."""
    with open(path) as f:
        doc = json.load(f)
    s = _find_first(doc, "s")
    if s is None or "v" not in s:
        raise ValueError(f"no secret poly found in {path}")
    return _tower_arrays(s)


def load_context_params(path: str) -> dict:
    """server/storage/CC.json → the interesting scalars (co, rd, batch,
    scaling mod size, technique enums)."""
    with open(path) as f:
        doc = json.load(f)
    out = {}
    for key in ("co", "rd"):
        out[key] = _find_first(doc, key)
    enp = _find_first(doc, "enp")
    if enp is not None:
        bs = _find_first(enp, "bs")
        out["batch_size"] = bs
    for key in ("rs", "ks", "dnum", "muld", "md", "slv", "ab", "eb"):
        v = _find_first(doc, key)
        if v is not None:
            out[key] = v
    return out
