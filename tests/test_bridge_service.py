"""CustomSettlement against a LIVE bridge HTTP service — the endpoint
surface of src/settlement/custom/methods.rs exercised over real sockets
(the reference ships only the client; the in-repo BridgeService makes the
custom-settlement path hermetically testable)."""

import pytest

from eigen_zeth_tpu.settlement.bridge_mock import BridgeService
from eigen_zeth_tpu.settlement.custom import CustomSettlement
from eigen_zeth_tpu.settlement.interface import BatchData


@pytest.fixture()
def bridge():
    svc = BridgeService().start()
    yield svc
    svc.stop()


def test_exit_roots_round_trip(bridge):
    s = CustomSettlement(bridge.url)
    assert s.get_last_rollup_exit_root() == bytes(32)
    root = bytes(range(32))
    s.update_exit_root(1, root)  # network 1 = rollup side
    assert s.get_last_rollup_exit_root() == root
    ger = s.get_global_exit_root()
    assert len(ger) == 32 and ger != bytes(32)


def test_bridge_and_claim_endpoints(bridge):
    s = CustomSettlement(bridge.url)
    s.bridge_asset(1, "0x" + "aa" * 20, 1000, "0x" + "00" * 20, True, b"\x01\x02")
    s.bridge_message(1, "0x" + "bb" * 20, False, b"")
    s.claim_asset([b"\x00" * 32] * 2, 7, bytes(32), bytes(32), 0,
                  "0x" + "00" * 20, 1, "0x" + "cc" * 20, 5, b"")
    s.claim_message([b"\x00" * 32] * 2, 8, bytes(32), bytes(32), 0,
                    "0x" + "dd" * 20, 1, "0x" + "ee" * 20, 5, b"meta")
    assert [b["kind"] for b in bridge.state.bridges] == [
        "bridge-asset", "bridge-message"
    ]
    assert [c["index"] for c in bridge.state.claims] == [7, 8]


def test_sequence_and_verify_batches(bridge):
    s = CustomSettlement(bridge.url)
    s.sequence_batches(
        [BatchData(transactions=b"\xaa\xbb", global_exit_root=bytes(32),
                   timestamp=42)]
    )
    assert bridge.state.sequenced[0]["transactions"] == "aabb"
    s.verify_batches(0, 0, 1, bytes(32), bytes(32), '{"pi_a": {}}', "[]")
    assert len(bridge.state.verified) == 1


def test_bridge_groth16_verifies_proofs():
    """With a verifying key configured, the bridge plays the L1 verifier
    contract's role: a wrong proof is rejected with status 0."""
    import json

    from eigen_zeth_tpu.models import groth16

    r1cs = groth16.wrap_circuit()
    pk, vk = groth16.setup(r1cs, seed="bridge-test")
    w, pub = groth16.wrap_witness([1, 2, 3, 4])
    proof = groth16.prove(pk, r1cs, w, use_jit=False)

    svc = BridgeService(verifying_key=vk).start()
    try:
        s = CustomSettlement(svc.url)
        s.verify_batches(0, 0, 1, bytes(32), bytes(32),
                         json.dumps(proof), json.dumps([str(pub)]))
        assert len(svc.state.verified) == 1
        with pytest.raises(RuntimeError):
            s.verify_batches(0, 1, 2, bytes(32), bytes(32),
                             json.dumps(proof), json.dumps([str(pub + 1)]))
        assert len(svc.state.verified) == 1  # the bad one is NOT recorded
    finally:
        svc.stop()


def test_full_pipeline_settles_through_live_bridge():
    """The whole node pipeline with `--settlement custom` semantics: the
    rollup/verify workers settle through a LIVE bridge HTTP service (the
    reference topology, BRIDGE_SERVICE_ADDR src/config/env.rs:30-31), and
    the bridge Groth16-verifies the submitted proof as the L1 verifier
    contract would."""
    import time

    from eigen_zeth_tpu.models import stark
    from eigen_zeth_tpu.operator import Operator
    from eigen_zeth_tpu.protocol import kv, rpc
    from eigen_zeth_tpu.protocol.prover_service import BatchProver, ChainExecutor
    from eigen_zeth_tpu.settlement.worker import WorkerConfig

    db = kv.MemDb()
    chain = rpc.MockChain()
    prover = BatchProver(
        executor=ChainExecutor(chain),
        stark_params=stark.StarkParams(blowup=4, num_queries=2, terminal_size=16),
        use_jit=False, wrap="linear", chunk_trace_rows=16, recursion=False,
    )
    bridge = BridgeService(verifying_key=prover.verifying_key).start()
    try:
        settlement = CustomSettlement(bridge.url)
        op = Operator(
            db=db, chain=chain, settlement=settlement, prover=prover,
            worker_config=WorkerConfig(
                proof_interval=0.05, verify_interval=0.05,
                rollup_interval=0.05, watcher_interval=0.05,
            ),
        )
        tx = {"nonce": "0x0", "gasPrice": "0x1", "gas": "0x5208",
              "to": "0x" + "22" * 20, "value": "0x1", "input": "0x",
              "chainId": "0x3039", "v": "0x1b", "r": "0x2", "s": "0x3"}
        chain.add_block([tx], timestamp=1000)
        op.run()
        try:
            deadline = time.time() + 120
            while time.time() < deadline:
                if db.get_status(1) == kv.Status.Finalized:
                    break
                time.sleep(0.2)
            assert db.get_status(1) == kv.Status.Finalized
        finally:
            op.stop()
        assert len(bridge.state.sequenced) == 1
        assert len(bridge.state.verified) == 1  # Groth16-checked over HTTP
    finally:
        bridge.stop()
