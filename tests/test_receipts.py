"""Canonical receipts (bloom + receipts root) and the Cancun header
fields the payload builder seals (reference: custom_reth/mod.rs:687-788,
pre-block EIP-4788 call at mod.rs:554-580)."""

from eigen_zeth_tpu.ops import keccak
from eigen_zeth_tpu.sequencer.chain import Ledger, Sequencer
from eigen_zeth_tpu.utils import mpt, receipts as rc

LOG = {
    "address": "0x" + "ab" * 20,
    "topics": ["0x" + "cd" * 32],
    "data": "0x1234",
}


def test_empty_receipts_root_is_empty_trie_root():
    assert rc.receipts_root([]) == mpt.EMPTY_ROOT


def test_bloom_bit_convention():
    """Yellow-paper M3:2048 — 3 bits per item, index taken from byte
    pairs (0,1),(2,3),(4,5) of keccak(item), bloom read as a 2048-bit
    big-endian integer with bit 0 at the LOW end."""
    item = bytes.fromhex(LOG["address"][2:])
    bloom = rc.logs_bloom([{"address": LOG["address"], "topics": []}])
    as_int = int.from_bytes(bloom, "big")
    h = keccak.keccak256_host(item)
    bits = {((h[i] << 8) | h[i + 1]) & 2047 for i in (0, 2, 4)}
    for bit in bits:
        assert (as_int >> bit) & 1
    # no other bits set
    assert bin(as_int).count("1") == len(bits)


def test_receipts_root_binds_logs_and_status():
    base = [{"status": 1, "gasUsed": 21000, "logs": [LOG]}]
    r0 = rc.receipts_root(base)
    tampered_topic = [{
        "status": 1, "gasUsed": 21000,
        "logs": [dict(LOG, topics=["0x" + "ce" * 32])],
    }]
    assert rc.receipts_root(tampered_topic) != r0
    tampered_status = [{"status": 0, "gasUsed": 21000, "logs": [LOG]}]
    assert rc.receipts_root(tampered_status) != r0


def _mine_one(seq: Sequencer) -> dict:
    seq.send_raw_transaction({
        "nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208",
        "from": "0x" + "11" * 20, "to": "0x" + "22" * 20,
        "value": "0x5", "input": "0x",
    })
    return seq.build_block(timestamp=1_700_000_000)


def test_header_cancun_fields():
    seq = Sequencer()
    genesis = seq.get_block_by_number(0)
    blk = _mine_one(seq)
    assert blk["withdrawalsRoot"] == "0x" + mpt.EMPTY_ROOT.hex()
    assert blk["blobGasUsed"] == "0x0" and blk["excessBlobGas"] == "0x0"
    assert blk["parentBeaconBlockRoot"] == genesis["hash"]
    assert blk["gasLimit"] == hex(seq.block_gas_limit)
    assert len(bytes.fromhex(blk["logsBloom"][2:])) == 256
    # a value transfer emits no logs: empty bloom, but a REAL receipts
    # root over the one receipt (not the empty-trie root)
    assert int(blk["logsBloom"], 16) == 0
    assert blk["receiptsRoot"] != "0x" + mpt.EMPTY_ROOT.hex()
    rcpt = seq.get_transaction_receipt(blk["transactions"][0] and __import__(
        "eigen_zeth_tpu.sequencer.chain", fromlist=["tx_hash"]
    ).tx_hash(blk["transactions"][0]))
    assert rcpt["cumulativeGasUsed"] == rcpt["gasUsed"]
    assert int(rcpt["logsBloom"], 16) == 0


def test_eip4788_ring_buffer_write():
    """begin_block writes ts -> slot ts%8191 and the parent beacon root
    (here: parent L2 block hash) -> slot ts%8191 + 8191 in the
    beacon-roots system contract, BEFORE tx execution (EIP-4788)."""
    seq = Sequencer()
    genesis = seq.get_block_by_number(0)
    blk = _mine_one(seq)
    ts = int(blk["timestamp"], 16)
    acct = seq.ledger.state.get(Ledger.BEACON_ROOTS_ADDRESS)
    slot = ts % Ledger.HISTORY_BUFFER_LENGTH
    assert acct.storage[slot] == ts
    assert acct.storage[slot + Ledger.HISTORY_BUFFER_LENGTH] == int(
        genesis["hash"], 16
    )
    # the write is part of the committed state root: a chain with an
    # identical tx but different timestamp commits a different root
    seq2 = Sequencer()
    seq2.send_raw_transaction({
        "nonce": "0x0", "gasPrice": "0x2", "gas": "0x5208",
        "from": "0x" + "11" * 20, "to": "0x" + "22" * 20,
        "value": "0x5", "input": "0x",
    })
    blk2 = seq2.build_block(timestamp=1_700_000_777)
    assert blk2["stateRoot"] != blk["stateRoot"]
