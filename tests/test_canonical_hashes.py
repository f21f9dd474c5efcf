"""Canonical Ethereum hashing: block hash = keccak(rlp(header)), tx hash
= keccak(signed envelope) — golden-vectored against mainnet genesis and
the EIP-155 example tx (VERDICT round-2 item 6; reference seal:
/root/reference/src/custom_reth/mod.rs:751-788)."""

from eigen_zeth_tpu.ops import keccak
from eigen_zeth_tpu.sequencer.chain import Sequencer, tx_hash
from eigen_zeth_tpu.utils import ethtx, header, rlp

PRIV = 0x4646464646464646464646464646464646464646464646464646464646464646


def test_empty_ommers_constant():
    assert keccak.keccak256_host(rlp.encode([])) == header.EMPTY_OMMERS_HASH


def test_mainnet_genesis_block_hash():
    """encode_header must reproduce the mainnet genesis hash exactly."""
    genesis = {
        "parentHash": "0x" + "00" * 32,
        "miner": "0x" + "00" * 20,
        "stateRoot": "0xd7f8974fb5ac78d9ac099b9ad5018bedc2ce0a72dad1827a1709da30580f0544",
        "transactionsRoot": "0x56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421",
        "receiptsRoot": "0x56e81f171bcc55a6ff8345e692c0f86e5b48e01b996cadc001622fb5e363b421",
        "logsBloom": "0x" + "00" * 256,
        "difficulty": "0x400000000",
        "number": "0x0",
        "gasLimit": "0x1388",
        "gasUsed": "0x0",
        "timestamp": "0x0",
        "extraData": "0x11bbe8db4e347b4e8c937c1c8370e4b5ed33adb3db69cbdb7a38e1e50b1b82fa",
        "mixHash": "0x" + "00" * 32,
        "nonce": "0x0000000000000042",
    }
    assert header.block_hash(genesis) == (
        "0xd4e56740f876aef8c010b86a40d5f56745a118d0906a34e69aec8c0db1cb8fa3"
    )


EIP155_TX = {
    "nonce": 9,
    "gasPrice": 20_000_000_000,
    "gas": 21000,
    "to": "0x3535353535353535353535353535353535353535",
    "value": 10**18,
    "input": "0x",
}
EIP155_RAW = (
    "f86c098504a817c800825208943535353535353535353535353535353535353535880d"
    "e0b6b3a764000080"
    "25a028ef61340bd939bc2195fe537567866003e1a15d3c71ff63e1590620aa636276"
    "a067cbe9d8997f761aecb703304b3800ccf555c9f3dc64214b297fb1966a3b6d83"
)


def test_eip155_signing_vector():
    """The EIP-155 spec example: sighash, signed raw bytes, v=37."""
    assert ethtx.legacy_sighash(EIP155_TX, 1).hex() == (
        "daf5a779ae972f972197303d7b574746c7ef83eadac0f2791ad23db92e4c8e53"
    )
    signed = ethtx.sign_legacy_tx(EIP155_TX, 1, PRIV)
    assert signed["v"] == "0x25"
    assert ethtx.encode_signed_raw(signed, 1).hex() == EIP155_RAW


def test_tx_hash_is_envelope_hash():
    """chain.tx_hash of a decoded raw tx == keccak(raw wire bytes)."""
    raw = bytes.fromhex(EIP155_RAW)
    tx = ethtx.decode_raw_tx(raw)
    assert tx_hash(tx) == "0x" + keccak.keccak256_host(raw).hex()
    # and a locally signed tx hashes its own envelope
    signed = ethtx.sign_legacy_tx(EIP155_TX, 1, PRIV)
    assert tx_hash(signed) == "0x" + keccak.keccak256_host(raw).hex()


def test_sealed_block_hash_is_header_rlp_keccak():
    seq = Sequencer()
    seq.send_raw_transaction({"to": "0x" + "22" * 20, "value": "0x1",
                              "from": "0x" + "11" * 20})
    block = seq.build_block(timestamp=1_700_000_000)
    assert block["hash"] == header.block_hash(block)
    assert block["sha3Uncles"] == "0x" + header.EMPTY_OMMERS_HASH.hex()
    # genesis too
    g = seq.get_block_by_number(0)
    assert g["hash"] == header.block_hash(g)


def test_replay_and_nonce_discipline():
    """The same signed tx mines exactly once; future nonces wait; stale
    nonces are evicted (VERDICT item 7; revm's enforcement in the
    reference loop: /root/reference/src/custom_reth/mod.rs:604-640)."""
    seq = Sequencer(chain_id=1)
    sender = ethtx.recover_sender(ethtx.sign_legacy_tx(EIP155_TX, 1, PRIV), 1)

    def signed_tx(nonce, value=1):
        tx = dict(EIP155_TX, nonce=nonce, value=value, gasPrice=7)
        s = ethtx.sign_legacy_tx(tx, 1, PRIV)
        return dict(s, **{"from": sender})

    t0 = signed_tx(0)
    seq.send_raw_transaction(t0)
    b1 = seq.build_block(timestamp=1)
    assert len(b1["transactions"]) == 1
    # replay: same raw tx again -> stale nonce -> never mined, evicted
    seq.send_raw_transaction(dict(t0))
    b2 = seq.build_block(timestamp=2)
    assert len(b2["transactions"]) == 0
    assert len(seq.pool) == 0
    # future nonce waits in the pool until the gap fills
    seq.send_raw_transaction(signed_tx(3))
    b3 = seq.build_block(timestamp=3)
    assert len(b3["transactions"]) == 0
    assert len(seq.pool) == 1
    seq.send_raw_transaction(signed_tx(1))
    seq.send_raw_transaction(signed_tx(2))
    b4 = seq.build_block(timestamp=4)
    assert len(b4["transactions"]) == 3  # 1, 2 and the deferred 3
    assert len(seq.pool) == 0


def test_per_sender_fee_ordering():
    """A high-fee later-nonce tx cannot jump its own earlier nonce."""
    seq = Sequencer(chain_id=1)
    a = "0x" + "aa" * 20
    seq.send_raw_transaction({"from": a, "to": "0x" + "22" * 20,
                              "nonce": "0x1", "gasPrice": hex(100)})
    seq.send_raw_transaction({"from": a, "to": "0x" + "22" * 20,
                              "nonce": "0x0", "gasPrice": hex(1)})
    block = seq.build_block(timestamp=5)
    nonces = [int(t["nonce"], 16) for t in block["transactions"]]
    assert nonces == [0, 1]
