"""Groth16: pairing laws, setup/prove/verify, proof-schema parity."""

import json
import os

import pytest

from eigen_zeth_tpu.models import groth16
from eigen_zeth_tpu.ops import bn254, pairing as pr
from eigen_zeth_tpu.ops.bn254 import G1_GEN, G2_GEN_X, G2_GEN_Y, HOST_FQ2, h_ec_mul

G2_GEN = (G2_GEN_X, G2_GEN_Y)


def test_pairing_bilinearity():
    e = pr.pairing(G1_GEN, G2_GEN)
    assert e != pr.F12_ONE
    assert pr.pairing(h_ec_mul(3, G1_GEN), G2_GEN) == pr.f12_pow(e, 3)
    assert pr.pairing(G1_GEN, h_ec_mul(5, G2_GEN, HOST_FQ2)) == pr.f12_pow(e, 5)
    # e(aP, bQ) = e(P,Q)^(ab)
    assert pr.pairing(
        h_ec_mul(7, G1_GEN), h_ec_mul(11, G2_GEN, HOST_FQ2)
    ) == pr.f12_pow(e, 77)


def test_pairing_order():
    e = pr.pairing(G1_GEN, G2_GEN)
    assert pr.f12_pow(e, bn254.R) == pr.F12_ONE


def _setup_once():
    r1cs = groth16.wrap_circuit()
    pk, vk = groth16.setup(r1cs, seed="test-crs")
    return r1cs, pk, vk


def test_wrap_circuit_satisfiable():
    r1cs = groth16.wrap_circuit()
    w, pub = groth16.wrap_witness([123, 456, 789, 1011])
    assert r1cs.is_satisfied(w)
    assert w[1] == pub


def test_groth16_end_to_end():
    r1cs, pk, vk = _setup_once()
    digest = [11111, 22222, 33333, 44444]
    w, pub = groth16.wrap_witness(digest)
    proof = groth16.prove(pk, r1cs, w, use_jit=False)
    assert proof["protocol"] == "groth16" and proof["curve"] == "BN128"
    assert groth16.verify(vk, proof, [pub])
    # wrong public input must fail
    assert not groth16.verify(vk, proof, [(pub + 1) % bn254.R])
    # tampered proof must fail
    bad = json.loads(json.dumps(proof))
    bad["pi_a"]["x"] = str((int(bad["pi_a"]["x"]) + 1) % bn254.Q)
    assert not groth16.verify(vk, bad, [pub])


def test_proof_schema_matches_reference():
    """Our encoder must parse the reference's own proof.json structure and
    emit the identical key layout."""
    ref_path = "/root/reference/proof/proof.json"
    if not os.path.exists(ref_path):
        pytest.skip("reference vectors not mounted")
    with open(ref_path) as f:
        ref = json.load(f)
    pi_a, pi_b, pi_c = groth16.decode_proof(ref)
    re_encoded = groth16.encode_proof(pi_a, pi_b, pi_c)
    assert re_encoded == ref  # value-exact round trip through our codec


def test_mimc_wrap_circuit_round_trip():
    """The production final-wrap: the aggregated digest is MiMC-x^5
    hashed INSIDE the R1CS (~1.3k constraints), so production
    gen_final_proof MSMs run through the device Pippenger rather than
    ducking under the host threshold (round-1 weak item 5).  Host-MSM
    prove here (CPU); the TPU path shares every line but the MSM call."""
    from eigen_zeth_tpu.models import groth16 as g

    wrap = g.mimc_wrap_circuit()
    assert len(wrap.r1cs.constraints) > 1000  # device-MSM scale
    digest = [123456789, 987654321, 42, (1 << 63) + 5]
    w, pub = g.mimc_wrap_witness(digest)
    assert wrap.r1cs.is_satisfied(w)
    assert pub == g.mimc_hash_host([d % g.R for d in digest])
    pk, vk = g.setup(wrap.r1cs, seed="mimc-test")
    proof = g.prove(pk, wrap.r1cs, w, use_jit=False)
    assert g.verify(vk, proof, [pub])
    assert not g.verify(vk, proof, [(pub + 1) % g.R])
    # a different digest gives a different public input (binding)
    _, pub2 = g.mimc_wrap_witness([digest[0] + 1] + digest[1:])
    assert pub2 != pub
