"""Recursive verification: the verifier AIR attests chunk-proof validity
inside an aggregation STARK (VERDICT item 6; reference semantics
proto/prover/v1/prover.proto:115-119).

The acceptance property: corrupting a chunk proof makes the AGGREGATED
proof unprovable/unverifiable — and nothing in the aggregated-proof
verification path re-runs host chunk verification."""

import json

import pytest

from eigen_zeth_tpu.models import recursion, stark
from eigen_zeth_tpu.ops import goldilocks as gl

# tiny recursion-friendly shape: n_c=8 trace, m_c=32 LDE, 2 child queries,
# zero-layer FRI (terminal >= m_c)
PARAMS = stark.StarkParams(blowup=4, num_queries=2, terminal_size=32)
N_ROWS = 8
AGG_Q = 8


@pytest.fixture(scope="module")
def child_and_attestation():
    child = stark.prove_chunk([3, 1, 4, 1, 5, 9, 2], iv=7,
                              params=PARAMS, n_rows=N_ROWS)
    assert stark.verify_chunk(child, PARAMS)
    att = recursion.attest_chunk(child, num_queries_agg=AGG_Q)
    return child, att


def test_attestation_round_trip(child_and_attestation):
    child, att = child_and_attestation
    digest = recursion.verify_attestation(att)
    from eigen_zeth_tpu.protocol.prover_service import chunk_digest

    assert digest == chunk_digest(child)


def test_tampered_chunk_is_unattestable(child_and_attestation):
    """An aggregator holding a corrupted chunk proof cannot produce the
    attestation STARK: the transcribed trace violates the verifier AIR and
    the prover's FRI degree gate fires."""
    child, _ = child_and_attestation
    bad = json.loads(json.dumps(child))
    row = bad["trace_openings"][0][0]["row"]
    row[0] = str((int(row[0]) + 1) % gl.P)
    with pytest.raises(AssertionError):
        recursion.attest_chunk(bad, num_queries_agg=AGG_Q)


def test_tampered_header_rejected(child_and_attestation):
    """Swapping the attested header (claiming a different trace root /
    output) must fail WITHOUT re-running chunk verification."""
    _, att = child_and_attestation
    for field, mutate in [
        ("trace_root", lambda h: h["trace_root"].__setitem__(
            0, str((int(h["trace_root"][0]) + 1) % gl.P))),
        ("out", lambda h: h["public"].__setitem__(
            "out", str((int(h["public"]["out"]) + 1) % gl.P))),
        ("coeff", lambda h: h["final_coeffs"].__setitem__(
            0, str((int(h["final_coeffs"][0]) + 1) % gl.P))),
    ]:
        bad = json.loads(json.dumps(att))
        mutate(bad["header"])
        with pytest.raises(ValueError):
            recursion.verify_attestation(bad)


def test_tampered_air_proof_rejected(child_and_attestation):
    _, att = child_and_attestation
    bad = json.loads(json.dumps(att))
    row = bad["air_proof"]["trace_openings"][0][0]["row"]
    row[5] = str((int(row[5]) + 1) % gl.P)
    with pytest.raises(ValueError):
        recursion.verify_attestation(bad)


def test_prover_service_aggregation_is_recursive():
    """The 4-step pipeline with recursion on: aggregation replaces chunk
    children with attestations; the final step validates them via the
    verifier AIR only."""
    from eigen_zeth_tpu.protocol import prover_service as ps
    from eigen_zeth_tpu.protocol.messages import ProofResultCode

    prover = ps.BatchProver(
        stark_params=PARAMS, chunk_trace_rows=N_ROWS, agg_queries=AGG_Q,
        use_jit=False, wrap="linear",
    )
    r1 = prover.gen_batch_chunks("b", [1, 2], chain_id=1, program_name="evm")
    assert r1.result_code == ProofResultCode.COMPLETED_OK
    r2 = prover.gen_chunk_proof("b", r1.task_id, r1.chunk_count, 1, "evm",
                                r1.batch_data)
    assert r2.result_code == ProofResultCode.COMPLETED_OK, r2.error_message
    r3 = prover.gen_aggregated_proof(
        "b", r2.chunk_proofs[0].proof, r2.chunk_proofs[-1].proof
    )
    assert r3.result_code == ProofResultCode.COMPLETED_OK, r3.error_message
    agg = json.loads(r3.result_string)
    assert agg["type"] == "aggregated"
    assert all(k["type"] == "chunk-attested" for k in agg["children"])
    # the aggregated object carries NO chunk openings — validity rests on
    # the attestation STARKs alone
    assert "stark" not in agg["children"][0]
    r4 = prover.gen_final_proof("b", r3.result_string, "BN128", "0xaa")
    assert r4.result_code == ProofResultCode.COMPLETED_OK, r4.error_message

    # corrupt one attested child inside the aggregated proof: the final
    # step must reject it (via the verifier AIR, not chunk re-verification)
    bad = json.loads(r3.result_string)
    ro = bad["children"][0]["air_proof"]["trace_openings"][0][0]["row"]
    ro[0] = str((int(ro[0]) + 1) % gl.P)
    r4b = prover.gen_final_proof("b", json.dumps(bad), "BN128", "0xaa")
    assert r4b.result_code == ProofResultCode.COMPLETED_ERROR


def test_tampered_sequenced_chunk_breaks_aggregation():
    """End-to-end tamper: corrupt a chunk proof before aggregation — the
    aggregator cannot emit an aggregated proof."""
    from eigen_zeth_tpu.protocol import prover_service as ps
    from eigen_zeth_tpu.protocol.messages import ProofResultCode

    prover = ps.BatchProver(
        stark_params=PARAMS, chunk_trace_rows=N_ROWS, agg_queries=AGG_Q,
        use_jit=False, wrap="linear",
    )
    r1 = prover.gen_batch_chunks("b", [1], chain_id=1, program_name="evm")
    r2 = prover.gen_chunk_proof("b", r1.task_id, r1.chunk_count, 1, "evm",
                                r1.batch_data)
    assert r2.result_code == ProofResultCode.COMPLETED_OK
    good = r2.chunk_proofs[0].proof
    node = json.loads(good)
    row = node["stark"]["trace_openings"][0][0]["row"]
    row[1] = str((int(row[1]) + 1) % gl.P)
    bad = json.dumps(node)
    r3 = prover.gen_aggregated_proof("b", good, bad)
    assert r3.result_code == ProofResultCode.COMPLETED_ERROR


def test_attestation_query_count_is_pinned():
    """An attestation claiming FEWER queries than the protocol's chunk
    params is a strictly weaker statement and must be rejected even if its
    AIR proof verifies (q_c is an attacker-influenced field)."""
    from eigen_zeth_tpu.protocol import prover_service as ps
    from eigen_zeth_tpu.protocol.messages import ProofResultCode

    # a chunk proved with only ONE query, attested honestly for q_c=1
    weak_params = stark.StarkParams(blowup=4, num_queries=1, terminal_size=32)
    weak_child = stark.prove_chunk([9, 9, 9], iv=5, params=weak_params,
                                   n_rows=N_ROWS)
    weak_att = recursion.attest_chunk(weak_child, num_queries_agg=AGG_Q)
    # standalone verification accepts it without a pin...
    assert recursion.verify_attestation(weak_att)
    # ...but the prover pipeline (2-query protocol) must reject it
    with pytest.raises(ValueError):
        recursion.verify_attestation(weak_att, expected_queries=2,
                                     expected_rows=N_ROWS)
    prover = ps.BatchProver(
        stark_params=PARAMS, chunk_trace_rows=N_ROWS, agg_queries=AGG_Q,
        use_jit=False, wrap="linear",
    )
    import json as _json

    forged_agg = {
        "type": "aggregated",
        "digest": [str(x) for x in __import__(
            "eigen_zeth_tpu.ops.poseidon", fromlist=["poseidon"]
        ).hash_two_host(
            recursion.verify_attestation(weak_att),
            recursion.verify_attestation(weak_att),
        )],
        "children": [weak_att, weak_att],
    }
    r = prover.gen_final_proof("b", _json.dumps(forged_agg), "BN128", "0xaa")
    assert r.result_code.name == "COMPLETED_ERROR"


# ---------------------------------------------------------------------------
# fold-layer recursion (VERDICT r2 item 4): children with REAL FRI layers


# n_c=32 trace, m_c=128 LDE, terminal 32 -> R=2 fold layers in the AIR
FOLD_PARAMS = stark.StarkParams(blowup=4, num_queries=2, terminal_size=32)
FOLD_ROWS = 32


@pytest.fixture(scope="module")
def fold_child_and_attestation():
    child = stark.prove_chunk(list(range(1, 30)), iv=11,
                              params=FOLD_PARAMS, n_rows=FOLD_ROWS)
    assert stark.verify_chunk(child, FOLD_PARAMS)
    assert len(child["fri"]["roots"]) == 2  # real fold layers
    att = recursion.attest_chunk(child, num_queries_agg=AGG_Q)
    return child, att


def test_fold_attestation_round_trip(fold_child_and_attestation):
    child, att = fold_child_and_attestation
    digest = recursion.verify_attestation(att, expected_terminal=32)
    from eigen_zeth_tpu.protocol.prover_service import chunk_digest

    assert digest == chunk_digest(child)


def test_fold_attestation_requires_pinned_terminal(fold_child_and_attestation):
    """A fold-layer attestation must be rejected unless the caller pins
    the terminal size (shrunken terminals weaken the degree bound)."""
    _, att = fold_child_and_attestation
    with pytest.raises(ValueError):
        recursion.verify_attestation(att)  # no expected_terminal
    with pytest.raises(ValueError):
        recursion.verify_attestation(att, expected_terminal=64)


def test_fold_tampered_chunk_is_unattestable(fold_child_and_attestation):
    """Corrupting a fold-layer opening (u value of layer 1) makes the
    attestation unprovable — the fold/select/Merkle constraints fire."""
    child, _ = fold_child_and_attestation
    bad = json.loads(json.dumps(child))
    lay = bad["fri"]["queries"][0]["layers"][1]
    lay["u"] = str((int(lay["u"]) + 1) % gl.P)
    with pytest.raises(AssertionError):
        recursion.attest_chunk(bad, num_queries_agg=AGG_Q)


def test_fold_tampered_beta_rejected(fold_child_and_attestation):
    """Mutating a fold-layer root in the header shifts the replayed betas
    and indices; the attestation no longer verifies."""
    _, att = fold_child_and_attestation
    bad = json.loads(json.dumps(att))
    bad["header"]["roots"][0][0] = str(
        (int(bad["header"]["roots"][0][0]) + 1) % gl.P
    )
    with pytest.raises(ValueError):
        recursion.verify_attestation(bad, expected_terminal=32)
