"""CRS/VK lifecycle (VERDICT r4 item 4): one FIXED circuit shape per
deployment — the final circuit is padded to max_wrap_leaves, the CRS is
generated once and persisted (pk.npz + vk.json), gen_final_proof never
runs groth16.setup, and batches with DIFFERENT chunk counts verify under
the same pinned VK loaded from disk."""

import json

import pytest

from eigen_zeth_tpu.models import crs, groth16, stark
from eigen_zeth_tpu.protocol import prover_service as ps
from eigen_zeth_tpu.protocol.messages import ProofResultCode

AGG = "0x" + "11" * 20


def _mk_prover(tmp_path, **kw):
    return ps.BatchProver(
        stark_params=stark.StarkParams(blowup=4, num_queries=2, terminal_size=32),
        chunk_trace_rows=8,
        agg_queries=8,
        wrap="stark",
        wrap_queries=2,
        wrap_grind_bits=4,  # exercise the PoW gadget at test scale
        wrap_blowup=8,
        use_jit=False,
        crs_dir=str(tmp_path / "crs"),
        max_wrap_leaves=2,
        **kw,
    )


def _prove_batch(prover, blocks):
    r1 = prover.gen_batch_chunks("b", blocks, chain_id=12345, program_name="evm")
    assert r1.result_code == ProofResultCode.COMPLETED_OK, r1.error_message
    r2 = prover.gen_chunk_proof(
        "b", r1.task_id, r1.chunk_count, 12345, "evm", r1.batch_data
    )
    assert r2.result_code == ProofResultCode.COMPLETED_OK, r2.error_message
    r3 = prover.gen_aggregated_proof(
        "b", r2.chunk_proofs[0].proof, r2.chunk_proofs[-1].proof
    )
    assert r3.result_code == ProofResultCode.COMPLETED_OK, r3.error_message
    r4 = prover.gen_final_proof("b", r3.result_string, "BN128", AGG)
    assert r4.result_code == ProofResultCode.COMPLETED_OK, r4.error_message
    return r1.chunk_count, r4.final_proof


@pytest.mark.slow
def test_fixed_vk_across_batches_and_processes(tmp_path, monkeypatch):
    prover = _mk_prover(tmp_path)
    # batch 1: single block -> 1 chunk (first == last, padded to 2)
    chunks1, final1 = _prove_batch(prover, [1])
    # batch 2: enough blocks for >1 chunk
    chunks2, final2 = _prove_batch(prover, list(range(1, 40)))
    assert chunks1 != chunks2, "test needs differing chunk counts"

    # the pinned VK alone, loaded from disk, verifies BOTH batches
    vk = prover.pinned_vk(AGG)
    assert vk is not None, "vk.json not persisted"
    for final in (final1, final2):
        proof = json.loads(final.proof)
        pub = [int(x) for x in json.loads(final.public_input)]
        assert groth16.verify(vk, proof, pub)

    # a SECOND prover (fresh process analog) must load the CRS from disk
    # and never call groth16.setup
    def boom(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("groth16.setup called despite persisted CRS")

    monkeypatch.setattr(crs, "generate", boom)
    monkeypatch.setattr(groth16, "setup", boom)
    prover2 = _mk_prover(tmp_path)
    _, final3 = _prove_batch(prover2, [7, 8, 9])
    proof3 = json.loads(final3.proof)
    pub3 = [int(x) for x in json.loads(final3.public_input)]
    assert groth16.verify(vk, proof3, pub3)

    # tamper resistance through the pinned VK: a proof from a DIFFERENT
    # seed's CRS must not verify under the pinned VK
    import shutil

    other_dir = tmp_path / "crs2"
    prover3 = _mk_prover(other_dir.parent / "crs2_root")
    prover3._groth16_seed = "ezt-groth16-other"
    _, final4 = _prove_batch(prover3, [1])
    proof4 = json.loads(final4.proof)
    pub4 = [int(x) for x in json.loads(final4.public_input)]
    assert not groth16.verify(vk, proof4, pub4)


@pytest.mark.slow
def test_crs_roundtrip_serialization(tmp_path):
    """crs.save/load round-trips the proving and verifying keys."""
    r1cs = groth16.wrap_circuit()
    pk, vk = crs.generate(r1cs, seed="ezt-test")
    d = str(tmp_path / "shape-x")
    crs.save(d, pk, vk)
    loaded = crs.load(d)
    assert loaded is not None
    pk2, vk2 = loaded
    assert pk2.a_query == pk.a_query
    assert pk2.b2_query == pk.b2_query
    assert pk2.h_query == pk.h_query
    assert pk2.domain == pk.domain and pk2.num_public == pk.num_public
    assert vk2.ic == vk.ic and vk2.alpha1 == vk.alpha1
    assert crs.load_pinned_vk(d).ic == vk.ic
    # VK JSON matches the reference proof-format conventions
    j = crs.vk_to_json(vk)
    assert j["protocol"] == "groth16" and j["curve"] == "BN128"
