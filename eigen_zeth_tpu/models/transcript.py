"""Fiat-Shamir transcript — a Poseidon duplex sponge over Goldilocks.

Host-side (python bigint) by design: challenges are derived *between*
device-side proving phases (commit → challenge → fold), so the transcript
never sits inside a jit trace.  Prover and verifier replay the identical
absorb/challenge sequence; bit-equality is guaranteed by the shared
poseidon.perm_host permutation (itself tested bit-identical to the device
permutation).

Replaces: the implicit transcript inside the reference's external prover
service; the public-input hashing anchor is proof/public_input.json (a
single field element — parsed by the reference at
src/settlement/ethereum/mod.rs:475-481).
"""

from __future__ import annotations

from ..ops import goldilocks as gl
from ..ops import poseidon
from ..ops.poseidon import RATE, WIDTH, _sha_to_field


class Transcript:
    """Duplex sponge: absorb field elements, squeeze challenges.

    Every absorb/challenge call is framed with a domain-separation tag so
    reordering or re-labeling protocol messages changes all subsequent
    challenges."""

    def __init__(self, domain: str):
        self._state = [0] * WIDTH
        self._pos = 0  # next rate lane to absorb into
        self._absorb_one(_sha_to_field("ezt-transcript/" + domain))

    def _permute(self):
        self._state = poseidon.perm_host(self._state)
        self._pos = 0

    def _absorb_one(self, v: int):
        if self._pos == RATE:
            self._permute()
        self._state[self._pos] = (self._state[self._pos] + v % gl.P) % gl.P
        self._pos += 1

    def absorb(self, label: str, values) -> None:
        self._absorb_one(_sha_to_field("ezt-absorb/" + label))
        for v in values:
            self._absorb_one(int(v))

    def absorb_digest(self, label: str, digest) -> None:
        self.absorb(label, digest)

    def challenge(self, label: str) -> int:
        return self.challenges(label, 1)[0]

    def challenges(self, label: str, n: int) -> list[int]:
        self._absorb_one(_sha_to_field("ezt-challenge/" + label))
        self._permute()
        out = []
        pos = 0
        while len(out) < n:
            if pos == RATE:
                self._permute()
                pos = 0
            out.append(self._state[pos])
            pos += 1
        # absorbing continues after the squeezed lanes
        self._pos = pos
        return out

    def challenge_indices(self, label: str, n: int, domain_size: int) -> list[int]:
        """n query indices in [0, domain_size); domain_size a power of 2."""
        mask = domain_size - 1
        assert domain_size & mask == 0
        return [c & mask for c in self.challenges(label, n)]

    # -- state export/import: the fused device prover (models/fri_fused.py)
    #    runs the identical sponge on-device and hands the state back so
    #    host and device transcripts stay one logical object.

    def export_state(self) -> tuple[list[int], int]:
        return list(self._state), self._pos

    def set_state(self, state: list[int], pos: int) -> None:
        assert len(state) == WIDTH and 0 <= pos <= RATE
        self._state = [v % gl.P for v in state]
        self._pos = pos
