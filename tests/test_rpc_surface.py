"""The read RPC surface a reth-backed node serves and ours must too:
eth_call (view execution, state discarded), eth_getLogs (bloom-
prefiltered), eth_getStorageAt, eth_getTransactionCount, eth_chainId.
Reference analog: reth's eth-API modules merged into the node's RPC
(src/custom_reth/mod.rs:864-904)."""

from eigen_zeth_tpu.protocol import kv, rpc
from eigen_zeth_tpu.sequencer.chain import Sequencer

SENDER = "0x" + "11" * 20

COUNTER_RUNTIME = bytes(
    [0x60, 0x00, 0x54,  # SLOAD slot0
     0x60, 0x01, 0x01,  # +1
     0x60, 0x00, 0x55,  # SSTORE slot0
     0x60, 0x00, 0x54,  # SLOAD slot0
     0x60, 0x00, 0x52,  # MSTORE
     0x60, 0x20, 0x60, 0x00, 0xF3]
)
# emit LOG1(data=0xaa padded to 32B, topic=0x42) then STOP
LOGGER_RUNTIME = bytes(
    [0x60, 0xAA, 0x60, 0x00, 0x52,
     0x60, 0x42, 0x60, 0x20, 0x60, 0x00, 0xA1, 0x00]
)


def _init(runtime: bytes) -> bytes:
    return bytes(
        [0x60, len(runtime), 0x60, 0x0C, 0x60, 0x00, 0x39,
         0x60, len(runtime), 0x60, 0x00, 0xF3]
    ) + runtime


def _node():
    seq = Sequencer()
    server = rpc.EigenRpcServer(kv.MemDb(), seq)
    return seq, server


def _deploy(seq: Sequencer, runtime: bytes, nonce: int) -> str:
    seq.send_raw_transaction({
        "nonce": hex(nonce), "gasPrice": "0x1", "gas": hex(5_000_000),
        "from": SENDER, "to": None, "value": "0x0",
        "input": "0x" + _init(runtime).hex(),
    })
    blk = seq.build_block(timestamp=1_700_000_000 + nonce)
    txh = __import__(
        "eigen_zeth_tpu.sequencer.chain", fromlist=["tx_hash"]
    ).tx_hash(blk["transactions"][0])
    return seq.get_transaction_receipt(txh)["contractAddress"]


def test_eth_call_discards_state():
    seq, server = _node()
    addr = _deploy(seq, COUNTER_RUNTIME, 0)
    # one REAL increment: storage slot0 == 1
    seq.send_raw_transaction({
        "nonce": "0x1", "gasPrice": "0x1", "gas": hex(5_000_000),
        "from": SENDER, "to": addr, "value": "0x0", "input": "0x",
    })
    seq.build_block(timestamp=1_700_000_100)
    # eth_call executes (sees 2) but commits nothing
    out = server.dispatch("eth_call", [{"from": SENDER, "to": addr}])
    assert int(out, 16) == 2
    assert server.dispatch("eth_getStorageAt", [addr, "0x0"]) == "0x%064x" % 1
    # repeatable — still 2
    assert int(server.dispatch("eth_call", [{"from": SENDER, "to": addr}]), 16) == 2


def test_eth_getlogs_filtering():
    seq, server = _node()
    addr = _deploy(seq, LOGGER_RUNTIME, 0)
    seq.send_raw_transaction({
        "nonce": "0x1", "gasPrice": "0x1", "gas": hex(5_000_000),
        "from": SENDER, "to": addr, "value": "0x0", "input": "0x",
    })
    blk = seq.build_block(timestamp=1_700_000_100)
    topic = "0x%064x" % 0x42
    logs = server.dispatch("eth_getLogs", [{"address": addr}])
    assert len(logs) == 1
    log = logs[0]
    assert log["topics"] == [topic]
    assert log["data"] == "0x" + (0xAA).to_bytes(32, "big").hex()
    assert log["blockNumber"] == blk["number"] and log["logIndex"] == "0x0"
    # positional topic filter matches; a wrong topic does not
    assert server.dispatch("eth_getLogs", [{"topics": [topic]}]) == logs
    assert server.dispatch("eth_getLogs", [{"topics": ["0x%064x" % 0x43]}]) == []
    # block-range filter
    assert server.dispatch("eth_getLogs", [{"fromBlock": "0x3"}]) == []
    # the block header's bloom covers the emitting address + topic
    from eigen_zeth_tpu.utils import receipts as rc
    bloom = bytes.fromhex(blk["logsBloom"][2:])
    assert rc.bloom_contains(bloom, bytes.fromhex(addr[2:]))
    assert rc.bloom_contains(bloom, (0x42).to_bytes(32, "big"))


def test_get_block_by_hash_and_tx_by_hash():
    seq, server = _node()
    seq.send_raw_transaction({
        "nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208",
        "from": SENDER, "to": "0x" + "22" * 20, "value": "0x5", "input": "0x",
    })
    blk = seq.build_block(timestamp=1_700_000_000)
    assert server.dispatch("eth_getBlockByHash", [blk["hash"]])["number"] == "0x1"
    assert server.dispatch("eth_getBlockByHash", ["0x" + "00" * 32]) is None
    txh = __import__(
        "eigen_zeth_tpu.sequencer.chain", fromlist=["tx_hash"]
    ).tx_hash(blk["transactions"][0])
    tx = server.dispatch("eth_getTransactionByHash", [txh])
    assert tx["hash"] == txh and tx["blockHash"] == blk["hash"]
    assert tx["transactionIndex"] == "0x0" and tx["value"] == "0x5"
    assert server.dispatch("eth_getTransactionByHash", ["0xdead"]) is None


REVERTER = bytes([0x60, 0x00, 0x60, 0x00, 0xFD])  # REVERT(0, 0)


def test_eth_misc_getters_and_call_revert():
    seq, server = _node()
    addr = _deploy(seq, REVERTER, 0)
    assert server.dispatch("eth_chainId", []) == hex(12345)
    assert server.dispatch("eth_getTransactionCount", [SENDER]) == "0x1"
    import pytest

    with pytest.raises(ValueError, match="revert"):
        server.dispatch("eth_call", [{"from": SENDER, "to": addr}])


def test_estimate_gas_and_gas_price():
    seq, server = _node()
    # plain transfer: 21000 intrinsic, state unchanged by the dry run
    est = server.dispatch("eth_estimateGas", [{
        "from": SENDER, "to": "0x" + "22" * 20, "value": "0x5",
    }])
    assert int(est, 16) == 21_000
    root_before = seq.ledger.state_root()
    # contract execution costs more than intrinsic and leaves no trace
    addr = _deploy(seq, COUNTER_RUNTIME, nonce=0)
    root_mid = seq.ledger.state_root()
    est2 = server.dispatch("eth_estimateGas", [{"from": SENDER, "to": addr}])
    assert int(est2, 16) > 21_000
    assert seq.ledger.state_root() == root_mid != root_before
    assert int(server.dispatch("eth_gasPrice", []), 16) >= 1
    assert server.dispatch("eth_syncing", []) is False
    assert server.dispatch("net_version", []) == str(seq.chain_id)


def test_fee_history_and_block_tx_lookups():
    seq, server = _node()
    seq.send_raw_transaction({
        "nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208",
        "from": SENDER, "to": "0x" + "22" * 20, "value": "0x5", "input": "0x",
    })
    blk = seq.build_block(timestamp=1_700_000_000)
    fh = server.dispatch("eth_feeHistory", ["0x2", "latest", [50]])
    assert fh["oldestBlock"] == "0x0"
    assert len(fh["gasUsedRatio"]) == 2 and fh["gasUsedRatio"][1] > 0
    assert len(fh["baseFeePerGas"]) == 3  # +1 for the next block
    assert fh["reward"] == [["0x0"], ["0x0"]]
    assert server.dispatch(
        "eth_getBlockTransactionCountByNumber", ["0x1"]) == "0x1"
    assert server.dispatch(
        "eth_getBlockTransactionCountByHash", [blk["hash"]]) == "0x1"
    tx = server.dispatch(
        "eth_getTransactionByBlockNumberAndIndex", ["0x1", "0x0"])
    assert tx["from"] == SENDER and tx["blockHash"] == blk["hash"]
    assert server.dispatch(
        "eth_getTransactionByBlockHashAndIndex", [blk["hash"], "0x1"]) is None
    assert server.dispatch("eth_getUncleCountByBlockNumber", ["0x1"]) == "0x0"


def test_send_raw_transaction_legacy_and_typed():
    """eth_sendRawTransaction: wire-format RLP decode + sender recovery
    (the reth rpc ingestion path; our signer round-trips through it)."""
    from eigen_zeth_tpu.utils import ethtx, rlp as rlp_m, secp256k1

    seq, server = _node()
    priv = 0xC0FFEE
    sender = secp256k1.priv_to_address(priv)
    seq.ledger.state.touch(sender).balance = 10**18

    # legacy EIP-155, signed with the repo's settlement signer
    tx = {"nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208",
          "to": "0x" + "22" * 20, "value": "0x5", "input": "0x"}
    signed = ethtx.sign_legacy_tx(tx, 12345, priv)
    raw = ethtx.encode_signed_raw(signed, 12345)
    h = server.dispatch("eth_sendRawTransaction", ["0x" + raw.hex()])
    assert h.startswith("0x")
    seq.build_block(timestamp=1_700_000_100)
    bal = server.dispatch("eth_getBalance", ["0x" + "22" * 20, "latest"])
    assert int(bal, 16) == 5
    # the recovered sender (not a caller-supplied from) paid the nonce
    assert seq.ledger.state.get(sender).nonce == 1

    # typed 0x02 (EIP-1559) envelope
    from eigen_zeth_tpu.ops import keccak

    payload = [12345, 1, 1, 2, 21000, bytes.fromhex("33" * 20), 7, b"", []]
    sighash = keccak.keccak256_host(b"\x02" + rlp_m.encode(payload))
    yp, r, s = secp256k1.sign(sighash, priv)
    raw2 = b"\x02" + rlp_m.encode(payload + [yp, r, s])
    decoded = ethtx.decode_raw_tx(raw2)
    assert decoded["from"] == sender and decoded["chainId"] == hex(12345)
    assert decoded["to"] == "0x" + "33" * 20 and int(decoded["value"], 16) == 7
    server.dispatch("eth_sendRawTransaction", ["0x" + raw2.hex()])
    seq.build_block(timestamp=1_700_000_200)
    bal = server.dispatch("eth_getBalance", ["0x" + "33" * 20, "latest"])
    assert int(bal, 16) == 7

    # garbage bytes are rejected
    import pytest

    with pytest.raises(ValueError):
        server.dispatch("eth_sendRawTransaction", ["0xdeadbeef"])
