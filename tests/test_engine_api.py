"""Engine-API analog over the in-process sequencer: forkchoiceUpdated
with attributes builds a payload, getPayload returns it, newPayload
validates against the canonical chain.  Reference analog: the embedded
reth's payload service + CustomPayloadAttributes
(custom_reth/mod.rs:84-205,302-339)."""

import pytest

from eigen_zeth_tpu.protocol import kv, rpc
from eigen_zeth_tpu.sequencer.chain import Ledger, Sequencer

SENDER = "0x" + "11" * 20
FEE_TO = "0x" + "fe" * 20
BEACON = "0x" + "ab" * 32


def _mk():
    seq = Sequencer()
    return seq, rpc.EigenRpcServer(kv.MemDb(), seq)


def test_fcu_builds_payload_with_attributes():
    seq, server = _mk()
    seq.send_raw_transaction({
        "nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208",
        "from": SENDER, "to": "0x" + "22" * 20, "value": "0x5", "input": "0x",
    })
    head0 = seq.get_block_by_number(0)
    r = server.dispatch("engine_forkchoiceUpdatedV3", [
        {"headBlockHash": head0["hash"]},
        {"timestamp": hex(1_700_000_000), "suggestedFeeRecipient": FEE_TO,
         "parentBeaconBlockRoot": BEACON},
    ])
    assert r["payloadStatus"]["status"] == "VALID"
    pid = r["payloadId"]
    assert pid and pid.startswith("0x")

    p = server.dispatch("engine_getPayloadV3", [pid])
    blk = p["executionPayload"]
    assert blk["number"] == "0x1" and len(blk["transactions"]) == 1
    # attributes honored: timestamp, fee recipient, beacon root (in the
    # header AND the EIP-4788 ring buffer)
    assert blk["timestamp"] == hex(1_700_000_000)
    assert blk["miner"] == FEE_TO
    assert blk["parentBeaconBlockRoot"] == BEACON
    acct = seq.ledger.state.get(Ledger.BEACON_ROOTS_ADDRESS)
    slot = 1_700_000_000 % Ledger.HISTORY_BUFFER_LENGTH
    assert acct.storage[slot + Ledger.HISTORY_BUFFER_LENGTH] == int(BEACON, 16)
    # the payload IS the canonical block
    assert seq.get_block_by_number(1)["hash"] == blk["hash"]


def test_new_payload_validates_against_chain():
    seq, server = _mk()
    r = server.dispatch("engine_forkchoiceUpdatedV3", [
        {}, {"timestamp": hex(1_700_000_000)},
    ])
    blk = server.dispatch("engine_getPayloadV3", [r["payloadId"]])["executionPayload"]
    ok = server.dispatch("engine_newPayloadV3", [blk, [], blk["parentBeaconBlockRoot"]])
    assert ok["status"] == "VALID" and ok["latestValidHash"] == blk["hash"]
    bad = dict(blk, stateRoot="0x" + "00" * 32)
    r2 = server.dispatch("engine_newPayloadV3", [bad, [], blk["parentBeaconBlockRoot"]])
    assert r2["status"] == "INVALID"


def test_fcu_wrong_head_is_syncing():
    seq, server = _mk()
    r = server.dispatch("engine_forkchoiceUpdatedV3", [
        {"headBlockHash": "0x" + "99" * 32},
        {"timestamp": hex(1_700_000_000)},
    ])
    assert r["payloadStatus"]["status"] == "SYNCING"
    assert r["payloadId"] is None
    assert seq.block_number() == 0  # nothing was built


def test_get_payload_unknown_id():
    _, server = _mk()
    with pytest.raises(ValueError):
        server.dispatch("engine_getPayloadV3", ["0xdeadbeefdeadbeef"])


def test_fcu_withdrawals_credited_and_committed():
    """EIP-4895 analog: PayloadAttributes.withdrawals credit balances
    (Gwei -> wei) and the header commits to the list via an
    rlp(index)-keyed trie (reference commit_withdrawals,
    custom_reth/mod.rs:687-699)."""
    seq, server = _mk()
    w_addr = "0x" + "77" * 20
    wds = [
        {"index": "0x0", "validatorIndex": "0x5", "address": w_addr,
         "amount": "0x3b9aca00"},  # 1e9 Gwei = 1 ether
        {"index": "0x1", "validatorIndex": "0x6", "address": w_addr,
         "amount": "0x1"},
    ]
    r = server.dispatch("engine_forkchoiceUpdatedV3", [
        {}, {"timestamp": hex(1_700_000_100), "withdrawals": wds},
    ])
    blk = server.dispatch("engine_getPayloadV3", [r["payloadId"]])["executionPayload"]
    assert seq.ledger.state.get(w_addr).balance == (10**9 + 1) * 10**9
    assert blk["withdrawals"] == wds
    # the root is a real trie commitment: order/content changes move it
    from eigen_zeth_tpu.utils import mpt
    assert blk["withdrawalsRoot"] != "0x" + mpt.EMPTY_ROOT.hex()
    b2 = Sequencer().build_block(timestamp=1_700_000_100,
                                 withdrawals=list(reversed(wds)))
    assert b2["withdrawalsRoot"] != blk["withdrawalsRoot"]
    # empty list -> canonical empty root (and post-withdrawal state root
    # differs from a no-withdrawals build)
    b3 = Sequencer().build_block(timestamp=1_700_000_100)
    assert b3["withdrawalsRoot"] == "0x" + mpt.EMPTY_ROOT.hex()
    assert b3["stateRoot"] != blk["stateRoot"]


def test_cl_driver_slot_produces_block_via_engine_flow():
    """The CL-analog slot ticker (sequencer/cl_driver.py) drives the full
    forkchoiceUpdatedV3 -> getPayloadV3 -> newPayloadV3 handshake over
    HTTP and the chain advances WITHOUT auto-mine (VERDICT r2 item 10;
    lighthouse's role in the reference PoS topology,
    /root/reference/scripts/launch-pos-eigen-zeth-node.sh:54-61)."""
    from eigen_zeth_tpu.protocol import kv, rpc
    from eigen_zeth_tpu.sequencer import cl_driver

    seq = Sequencer()
    seq.send_raw_transaction(
        {"from": "0x" + "11" * 20, "to": "0x" + "22" * 20, "value": "0x5"}
    )
    server = rpc.EigenRpcServer(kv.MemDb(), seq).start()
    try:
        produced = cl_driver.run(
            f"http://127.0.0.1:{server.port}", slot_seconds=0.05,
            fee_recipient="0x" + "ab" * 20, max_slots=2,
        )
        assert produced == 2
        assert seq.block_number() == 2
        b1 = seq.get_block_by_number(1)
        assert len(b1["transactions"]) == 1
        assert b1["miner"] == "0x" + "ab" * 20
    finally:
        server.stop()


# -- PoS forkchoice depth: safe/finalized markers + reorg (VERDICT r4 item 10)


def test_forkchoice_reorg_rolls_back_state_and_requeues_txs():
    """engine_forkchoiceUpdatedV3 with headBlockHash = a canonical
    ANCESTOR reorgs the chain: blocks above it are orphaned, world state
    restores to that block's post-state, and the orphaned txs re-enter
    the mempool (reth re-injects reorged txs the same way)."""
    seq, server = _mk()
    rcpt_a, rcpt_b = "0x" + "a1" * 20, "0x" + "b2" * 20
    seq.send_raw_transaction({
        "nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208",
        "from": SENDER, "to": rcpt_a, "value": "0x5", "input": "0x",
    })
    b1 = seq.build_block(timestamp=1_700_000_000)
    assert seq.ledger.state.get(rcpt_a).balance == 5
    root1 = b1["stateRoot"]
    seq.send_raw_transaction({
        "nonce": "0x1", "gasPrice": "0x2", "gas": "0x5208",
        "from": SENDER, "to": rcpt_b, "value": "0x7", "input": "0x",
    })
    b2 = seq.build_block(timestamp=1_700_000_012)
    assert seq.ledger.state.get(rcpt_b).balance == 7
    orphan_txh = b2["transactions"][0]["hash"] if b2["transactions"][0].get(
        "hash") else None
    assert seq.block_number() == 2 and len(seq.pool) == 0

    r = server.dispatch("engine_forkchoiceUpdatedV3", [
        {"headBlockHash": b1["hash"], "safeBlockHash": b1["hash"],
         "finalizedBlockHash": b1["hash"]},
    ])
    assert r["payloadStatus"]["status"] == "VALID"
    # head rolled back; block-2 effects undone; its tx is pending again
    assert seq.block_number() == 1
    assert seq.get_block_by_number(1)["stateRoot"] == root1
    assert seq.ledger.state.get(rcpt_b).balance == 0
    assert seq.ledger.state.get(rcpt_a).balance == 5
    assert len(seq.pool) == 1
    if orphan_txh:
        assert seq.get_transaction_receipt(orphan_txh) is None
    # rebuilding mines the re-injected tx on the new branch
    b2p = seq.build_block(timestamp=1_700_000_024)
    assert len(b2p["transactions"]) == 1
    assert seq.ledger.state.get(rcpt_b).balance == 7
    assert b2p["hash"] != b2["hash"]  # different branch (timestamp)


def test_forkchoice_safe_finalized_markers_and_tags():
    """safe/finalized markers set by the CL resolve the eth block tags,
    finalized is monotonic, and nothing below finalized can reorg."""
    import pytest as _pytest

    seq, server = _mk()
    blocks = [seq.build_block(timestamp=1_700_000_000 + 12 * i)
              for i in range(1, 4)]
    b1, b2, b3 = blocks
    r = server.dispatch("engine_forkchoiceUpdatedV3", [
        {"headBlockHash": b3["hash"], "safeBlockHash": b2["hash"],
         "finalizedBlockHash": b1["hash"]},
    ])
    assert r["payloadStatus"]["status"] == "VALID"
    assert seq.get_block_by_number("safe")["hash"] == b2["hash"]
    assert seq.get_block_by_number("finalized")["hash"] == b1["hash"]
    assert seq.get_block_by_number("latest")["hash"] == b3["hash"]
    # finalized cannot move backwards
    with _pytest.raises(ValueError, match="monotonic"):
        seq.set_forkchoice(finalized_hash=seq.get_block_by_number(0)["hash"])
    # advancing finalized to b2 then reorging below it is rejected
    assert seq.set_forkchoice(finalized_hash=b2["hash"]) == "VALID"
    with _pytest.raises(ValueError, match="below finalized"):
        seq.set_forkchoice(head_hash=b1["hash"])
    # an unknown (non-canonical) safe hash reports SYNCING
    assert seq.set_forkchoice(safe_hash="0x" + "77" * 32) == "SYNCING"


def test_cl_driver_finality_trails_head():
    """The slot ticker's finalized marker trails the head by
    finality_depth blocks (the justified/finalized analog)."""
    from eigen_zeth_tpu.protocol import kv, rpc
    from eigen_zeth_tpu.sequencer import cl_driver

    seq = Sequencer()
    server = rpc.EigenRpcServer(kv.MemDb(), seq).start()
    try:
        produced = cl_driver.run(
            f"http://127.0.0.1:{server.port}", slot_seconds=0.05,
            fee_recipient="0x" + "ab" * 20, max_slots=4, finality_depth=2,
        )
        assert produced == 4 and seq.block_number() == 4
        fin = seq.get_block_by_number("finalized")
        safe = seq.get_block_by_number("safe")
        assert int(safe["number"], 16) == 4
        assert int(fin["number"], 16) == 2  # trails the head by 2
    finally:
        server.stop()
