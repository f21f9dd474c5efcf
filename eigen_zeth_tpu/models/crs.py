"""Groth16 CRS lifecycle — persisted artifacts + a pinned verifying key.

Fixes the round-4 CRS/VK seam (VERDICT r4 item 4): the stark-wrap CRS
used to be generated at runtime by the prover, per final-circuit shape —
the VK varied with the batch and nothing pinned it in the settlement
path.  Now:

  * the final circuit is padded to a FIXED leaf count
    (wrap_circuit.build_final_circuit pad_to=...), so one circuit shape
    covers every batch — the reference's on-chain verifier is one fixed
    contract (/root/reference/contracts/EigenZkVM.json, consumed at
    src/settlement/ethereum/mod.rs:338-394);
  * the CRS is generated ONCE per circuit shape by `generate` — a
    ceremony-shaped entry point (entropy comes from a named seed; a real
    deployment substitutes a multi-party ceremony transcript) — and
    persisted under artifacts/crs/<shape-key>/ (pk.npz + vk.json);
  * the VERIFYING KEY alone is `vk.json` — small, committable, and
    loadable by the settlement verifier independently of the prover
    (`load_pinned_vk`), so a prover swapping its CRS cannot change what
    the verifier accepts.

Proving keys encode as (N, 2|4, 4)-uint64 limb arrays in one .npz —
~64 B per G1 coordinate pair; JSON decimal strings would be ~4x and
minutes to parse at production circuit sizes.
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import List, Optional, Tuple

import numpy as np

from . import groth16


def _int_to_limbs(v: int) -> list[int]:
    return [(v >> (64 * i)) & 0xFFFFFFFFFFFFFFFF for i in range(4)]


def _limbs_to_int(l) -> int:
    return sum(int(x) << (64 * i) for i, x in enumerate(l))


def _enc_points(points: list, g2: bool) -> tuple[np.ndarray, np.ndarray]:
    """[(x, y) | ((x0,x1),(y0,y1)) | None, ...] -> (coords, inf_mask)."""
    width = 4 if g2 else 2
    n = len(points)
    coords = np.zeros((n, width, 4), dtype=np.uint64)
    inf = np.zeros((n,), dtype=bool)
    for i, p in enumerate(points):
        if p is None:
            inf[i] = True
            continue
        if g2:
            (x0, x1), (y0, y1) = p
            vals = [x0, x1, y0, y1]
        else:
            x, y = p
            vals = [x, y]
        for j, v in enumerate(vals):
            coords[i, j] = _int_to_limbs(int(v))
    return coords, inf


def _dec_points(coords: np.ndarray, inf: np.ndarray, g2: bool) -> list:
    out = []
    for i in range(coords.shape[0]):
        if inf[i]:
            out.append(None)
            continue
        vals = [_limbs_to_int(coords[i, j]) for j in range(coords.shape[1])]
        if g2:
            out.append(((vals[0], vals[1]), (vals[2], vals[3])))
        else:
            out.append((vals[0], vals[1]))
    return out


def _enc_one(p, g2: bool) -> list:
    coords, inf = _enc_points([p], g2)
    return [coords, inf]


def vk_to_json(vk: groth16.VerifyingKey) -> dict:
    def g1(p):
        return {"x": str(p[0]), "y": str(p[1])} if p else None

    def g2p(p):
        return (
            {"x": [str(p[0][0]), str(p[0][1])], "y": [str(p[1][0]), str(p[1][1])]}
            if p
            else None
        )

    return {
        "protocol": "groth16",
        "curve": "BN128",
        "alpha1": g1(vk.alpha1),
        "beta2": g2p(vk.beta2),
        "gamma2": g2p(vk.gamma2),
        "delta2": g2p(vk.delta2),
        "ic": [g1(p) for p in vk.ic],
    }


def vk_from_json(d: dict) -> groth16.VerifyingKey:
    def g1(p):
        return (int(p["x"]), int(p["y"])) if p else None

    def g2p(p):
        return (
            ((int(p["x"][0]), int(p["x"][1])), (int(p["y"][0]), int(p["y"][1])))
            if p
            else None
        )

    return groth16.VerifyingKey(
        alpha1=g1(d["alpha1"]),
        beta2=g2p(d["beta2"]),
        gamma2=g2p(d["gamma2"]),
        delta2=g2p(d["delta2"]),
        ic=[g1(p) for p in d["ic"]],
    )


def save(dir_path: str, pk: groth16.ProvingKey, vk: groth16.VerifyingKey) -> None:
    os.makedirs(dir_path, exist_ok=True)
    arrays = {}
    for name, pts, g2 in (
        ("a_query", pk.a_query, False),
        ("b1_query", pk.b1_query, False),
        ("b2_query", pk.b2_query, True),
        ("l_query", pk.l_query, False),
        ("h_query", pk.h_query, False),
    ):
        coords, inf = _enc_points(pts, g2)
        arrays[name] = coords
        arrays[name + "_inf"] = inf
    for name, p, g2 in (
        ("alpha1", pk.alpha1, False),
        ("beta1", pk.beta1, False),
        ("beta2", pk.beta2, True),
        ("delta1", pk.delta1, False),
        ("delta2", pk.delta2, True),
    ):
        coords, inf = _enc_points([p], g2)
        arrays[name] = coords
        arrays[name + "_inf"] = inf
    arrays["meta"] = np.asarray([pk.domain, pk.num_public], dtype=np.uint64)
    np.savez_compressed(os.path.join(dir_path, "pk.npz"), **arrays)
    with open(os.path.join(dir_path, "vk.json"), "w") as f:
        json.dump(vk_to_json(vk), f)


def load(dir_path: str) -> Optional[Tuple[groth16.ProvingKey, groth16.VerifyingKey]]:
    pk_path = os.path.join(dir_path, "pk.npz")
    vk_path = os.path.join(dir_path, "vk.json")
    if not (os.path.exists(pk_path) and os.path.exists(vk_path)):
        return None
    z = np.load(pk_path)

    def pts(name, g2=False):
        return _dec_points(z[name], z[name + "_inf"], g2)

    def one(name, g2=False):
        return pts(name, g2)[0]

    meta = z["meta"]
    pk = groth16.ProvingKey(
        alpha1=one("alpha1"),
        beta1=one("beta1"),
        beta2=one("beta2", True),
        delta1=one("delta1"),
        delta2=one("delta2", True),
        a_query=pts("a_query"),
        b1_query=pts("b1_query"),
        b2_query=pts("b2_query", True),
        l_query=pts("l_query"),
        h_query=pts("h_query"),
        domain=int(meta[0]),
        num_public=int(meta[1]),
    )
    with open(vk_path) as f:
        vk = vk_from_json(json.load(f))
    return pk, vk


def load_pinned_vk(dir_path: str) -> Optional[groth16.VerifyingKey]:
    """The settlement verifier's side: ONLY the pinned vk.json — a prover
    regenerating its CRS cannot move what the verifier accepts."""
    vk_path = os.path.join(dir_path, "vk.json")
    if not os.path.exists(vk_path):
        return None
    with open(vk_path) as f:
        return vk_from_json(json.load(f))


def shape_key(parts: List[str]) -> str:
    """Stable directory name for a circuit shape."""
    h = hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]
    return f"shape-{h}"


def generate(
    r1cs: groth16.R1CS, seed: str = "ezt-groth16-dev"
) -> Tuple[groth16.ProvingKey, groth16.VerifyingKey]:
    """Ceremony-shaped CRS generation: deterministic from `seed` (a dev
    stand-in; a production deployment replaces this with the output of a
    multi-party powers-of-tau + circuit-specific phase-2 ceremony, which
    produces exactly the same (pk, vk) structure)."""
    return groth16.setup(r1cs, seed=seed)
