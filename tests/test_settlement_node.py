"""Settlement encoding, workers, operator, eigenrpc — the node pipeline."""

import json
import threading
import time
import urllib.request

import pytest

from eigen_zeth_tpu.models import stark
from eigen_zeth_tpu.operator import Operator
from eigen_zeth_tpu.protocol import kv, rpc, vectors
from eigen_zeth_tpu.protocol.prover_service import BatchProver, ChainExecutor
from eigen_zeth_tpu.settlement import abi, proof_codec
from eigen_zeth_tpu.settlement.interface import BatchData
from eigen_zeth_tpu.settlement.mock import MockSettlement
from eigen_zeth_tpu.settlement.worker import WorkerConfig, encode_legacy_tx

FAST_STARK = stark.StarkParams(blowup=4, num_queries=2, terminal_size=16)


# --- ABI / proof encoding ---------------------------------------------------


def test_selector_known_vector():
    # universally known: transfer(address,uint256) = 0xa9059cbb
    assert abi.selector("transfer(address,uint256)").hex() == "a9059cbb"


def test_abi_static_encoding():
    out = abi.encode([("uint", 256), ("bool",)], [0x1234, True])
    assert out.hex() == "0" * 60 + "1234" + "0" * 63 + "1"


def test_abi_dynamic_bytes():
    out = abi.encode([("uint", 8), ("bytes",)], [7, b"ab"])
    # head: 7, offset 64; tail: len 2, "ab" padded
    assert out[31] == 7
    assert int.from_bytes(out[32:64], "big") == 64
    assert int.from_bytes(out[64:96], "big") == 2
    assert out[96:98] == b"ab"


def test_parse_proof_reference_vectors():
    """Same parse the reference applies (ethereum/mod.rs:445-481 and its
    tests mod.rs:487-589): decimal strings, no coefficient reordering."""
    proof_json = json.dumps(vectors.reference_proof())
    (a, b, c) = proof_codec.parse_proof(proof_json)
    ref = vectors.reference_proof()
    assert a == (int(ref["pi_a"]["x"]), int(ref["pi_a"]["y"]))
    assert b[0] == [int(x) for x in ref["pi_b"]["x"]]
    assert b[1] == [int(x) for x in ref["pi_b"]["y"]]
    assert c == (int(ref["pi_c"]["x"]), int(ref["pi_c"]["y"]))
    pub = proof_codec.parse_public_input(json.dumps(vectors.reference_public_input()))
    assert pub == [int(vectors.reference_public_input()[0])]


def test_encode_verify_batches_layout():
    proof_json = json.dumps(vectors.reference_proof())
    input_json = json.dumps(vectors.reference_public_input())
    data = proof_codec.encode_verify_batches(
        0, 1, 2, b"\x11" * 32, b"\x22" * 32, proof_json, input_json
    )
    assert data[:4] == abi.selector(proof_codec.VERIFY_BATCHES_SIG)
    # 4 selector + (3 uints + 2 bytes32 + 8 proof words + 1 input) * 32
    assert len(data) == 4 + 32 * (3 + 2 + 8 + 1)
    words = [data[4 + i * 32 : 4 + (i + 1) * 32] for i in range(14)]
    ref = vectors.reference_proof()
    assert int.from_bytes(words[5], "big") == int(ref["pi_a"]["x"])
    assert int.from_bytes(words[13], "big") == int(
        vectors.reference_public_input()[0]
    )


def test_encode_sequence_batches():
    data = proof_codec.encode_sequence_batches(
        [BatchData(b"\xab\xcd", b"\x01" * 32, 42)]
    )
    assert data[:4] == abi.selector(proof_codec.SEQUENCE_BATCHES_SIG)
    assert b"\xab\xcd" in data


def test_encode_legacy_tx():
    tx = {
        "nonce": "0x1",
        "gasPrice": "0x3b9aca00",
        "gas": "0x5208",
        "to": "0x" + "11" * 20,
        "value": "0xde0b6b3a7640000",
        "input": "0x",
        "chainId": "0x3039",
        "v": "0x60ad",
        "r": "0x1234",
        "s": "0x5678",
    }
    out = encode_legacy_tx(tx, 12345)
    assert out.endswith(b"24749" + b"4660" + b"22136")  # decimal v,r,s
    assert out[0] >= 0xC0  # RLP list header


# --- workers + operator end-to-end ------------------------------------------


def test_node_pipeline_end_to_end():
    """MockChain blocks -> watcher -> rollup -> prover -> verify: blocks
    reach Finalized with a pairing-verified Groth16 proof settled."""
    db = kv.MemDb()
    chain = rpc.MockChain()
    prover = BatchProver(
        executor=ChainExecutor(chain), stark_params=FAST_STARK, use_jit=False, wrap="linear", chunk_trace_rows=16, recursion=False
    )
    settlement = MockSettlement(verifying_key=prover.verifying_key)
    op = Operator(
        db=db,
        chain=chain,
        settlement=settlement,
        prover=prover,
        worker_config=WorkerConfig(
            proof_interval=0.05,
            verify_interval=0.05,
            rollup_interval=0.05,
            watcher_interval=0.05,
        ),
    )

    tx = {
        "nonce": "0x0", "gasPrice": "0x1", "gas": "0x5208",
        "to": "0x" + "22" * 20, "value": "0x1", "input": "0x",
        "chainId": "0x3039", "v": "0x1b", "r": "0x2", "s": "0x3",
    }
    chain.add_block([tx], timestamp=1000)  # block 1: non-empty
    chain.add_block([], timestamp=1001)  # block 2: empty (fast path)

    op.run()
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if (db.get_status(1) == kv.Status.Finalized
                    and db.get_status(2) == kv.Status.Finalized):
                break
            time.sleep(0.2)
        assert db.get_status(1) == kv.Status.Finalized, db.get_status(1)
        assert db.get_status(2) == kv.Status.Finalized, db.get_status(2)
    finally:
        op.stop()

    # block 1 went through sequencing + proving + pairing-checked verify
    assert len(settlement.sequenced) == 1
    assert len(settlement.verified) == 1
    proof = db.get_proof(1)
    assert json.loads(proof.proof)["protocol"] == "groth16"
    # block 2 took the empty fast path: placeholder proof, no settlement
    assert db.get_proof(2).proof == ""


def test_eigenrpc_get_batch_proof_flow():
    """The SDK-facing polling surface (eigen.rs:76-97): store a proof,
    query it over HTTP JSON-RPC."""
    db = kv.MemDb()
    chain = rpc.MockChain()
    chain.add_block([])
    db.put_status(1, kv.Status.Finalized)
    db.put_proof(
        1,
        kv.ProofResult(
            1,
            json.dumps(vectors.reference_proof()),
            json.dumps(vectors.reference_public_input()),
            b"\x01" * 32,
            b"\x02" * 32,
        ),
    )
    server = rpc.EigenRpcServer(db, chain).start()
    try:
        def call(method, params):
            payload = json.dumps(
                {"jsonrpc": "2.0", "id": 1, "method": method, "params": params}
            ).encode()
            req = urllib.request.Request(
                f"http://127.0.0.1:{server.port}",
                data=payload,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=5) as resp:
                return json.loads(resp.read())

        out = call("eigenrpc_getBatchProof", [1])["result"]
        assert out["preStateRoot"] == "0x" + "01" * 32
        assert json.loads(out["proof"]) == vectors.reference_proof()

        blk = call("eigenrpc_getBlockByNumber", [1])["result"]
        assert blk["status"] == "Finalized"

        missing = call("eigenrpc_getBatchProof", [99])["result"]
        assert missing is None

        err = call("eigenrpc_traceTransaction", ["0xdead"])
        assert "error" in err
    finally:
        server.stop()
