"""Ethereum legacy-transaction signing / sender recovery (EIP-155).

The reference signs settlement txs with ethers local wallets
(src/settlement/ethereum/mod.rs:97-120) and relies on revm's secp256k1
for sender recovery.  This module is the host-side equivalent: build the
EIP-155 signing payload, sign with utils/secp256k1, emit the raw signed
RLP a stock JSON-RPC node accepts via eth_sendRawTransaction, and
recover senders of incoming txs.
"""

from __future__ import annotations

from ..ops import keccak
from . import rlp, secp256k1


def _tx_fields(tx: dict, chain_id: int):
    to = tx.get("to")
    return [
        rlp.tx_int(tx.get("nonce")),
        rlp.tx_int(tx.get("gasPrice")),
        rlp.tx_int(tx.get("gas")),
        bytes.fromhex(to[2:]) if to else b"",
        rlp.tx_int(tx.get("value")),
        bytes.fromhex(tx.get("input", tx.get("data", "0x"))[2:]),
    ]


def legacy_sighash(tx: dict, chain_id: int | None) -> bytes:
    """keccak of the signing payload: rlp([n,gp,g,to,v,d,cid,0,0]) with
    EIP-155 replay protection, rlp([n,gp,g,to,v,d]) pre-155."""
    fields = _tx_fields(tx, chain_id)
    if chain_id is not None:
        fields += [chain_id, 0, 0]
    return keccak.keccak256_host(rlp.encode(fields))


def sign_legacy_tx(tx: dict, chain_id: int, priv: int) -> dict:
    """Sign in place-style: returns a new tx dict with v, r, s set."""
    yp, r, s = secp256k1.sign(legacy_sighash(tx, chain_id), priv)
    v = secp256k1.v_from_parity(yp, chain_id)
    out = dict(tx)
    out["chainId"] = hex(chain_id)
    out["v"], out["r"], out["s"] = hex(v), hex(r), hex(s)
    return out


def encode_signed_raw(tx: dict, chain_id: int) -> bytes:
    """Raw signed RLP for eth_sendRawTransaction."""
    v = rlp.tx_int(tx.get("v"))
    r = rlp.tx_int(tx.get("r"))
    s = rlp.tx_int(tx.get("s"))
    return rlp.encode(_tx_fields(tx, chain_id) + [v, r, s])


def tx_hash(tx: dict, chain_id: int) -> bytes:
    return keccak.keccak256_host(encode_signed_raw(tx, chain_id))


def recover_sender(tx: dict, default_chain_id: int):
    """Sender address of a signed legacy tx, or None if unrecoverable."""
    v = rlp.tx_int(tx.get("v"))
    r = rlp.tx_int(tx.get("r"))
    s = rlp.tx_int(tx.get("s"))
    try:
        yp, chain_id = secp256k1.parity_from_v(v)
    except ValueError:
        return None
    digest = legacy_sighash(tx, chain_id)  # None -> pre-155 payload
    return secp256k1.recover_address(digest, yp, r, s)
