"""Fiat-Shamir transcript over BN254 Fr — a Poseidon2-Fr duplex sponge.

The final-wrap layer's transcript (models/air_wrap.py).  Same framing
discipline as the Goldilocks transcript (models/transcript.py) but every
absorbed element and every squeezed challenge is one Fr element, so the
Groth16 wrap circuit replays it with plain Poseidon2-Fr permutation
gadgets (~492 constraints each) instead of arithmetizing a foreign-field
sponge.

Goldilocks challenges are derived as the LOW 63 BITS of a squeezed Fr
element: 2^63 < p_GL, so the value is always a canonical Goldilocks
element and the circuit needs no mod-p_GL comparison — just the bit
decomposition it performs anyway.  Query indices take the low log2(n)
bits of the same decomposition.
"""

from __future__ import annotations

from ..ops import poseidon_fr as pfr

GL_CHALLENGE_BITS = 63


class TranscriptFr:
    """Duplex sponge over Fr: absorb field elements, squeeze challenges."""

    def __init__(self, domain: str):
        self._state = [0] * pfr.WIDTH
        self._pos = 0
        self._absorb_one(pfr._sha_to_fr("ezt-transcript-fr/" + domain))

    def _permute(self):
        self._state = pfr.perm_host(self._state)
        self._pos = 0

    def _absorb_one(self, v: int):
        if self._pos == pfr.RATE:
            self._permute()
        self._state[self._pos] = (self._state[self._pos] + int(v) % pfr.R) % pfr.R
        self._pos += 1

    def absorb(self, label: str, values) -> None:
        self._absorb_one(pfr._sha_to_fr("ezt-absorb-fr/" + label))
        for v in values:
            self._absorb_one(int(v))

    def absorb_packed_gl(self, label: str, values) -> None:
        """Absorb Goldilocks values packed 3-per-Fr (the same packing the
        Merkle leaves use, so the circuit shares one unpack gadget)."""
        self.absorb(label, pfr.pack_gl_host([int(v) for v in values]))

    def challenge_fr(self, label: str) -> int:
        self._absorb_one(pfr._sha_to_fr("ezt-challenge-fr/" + label))
        self._permute()
        out = self._state[0]
        self._pos = 1
        return out

    # -- proof-of-work grinding (EthSTARK-style) ---------------------------

    def grind(self, bits: int) -> int:
        """Find + commit a nonce whose grind challenge has `bits` low
        zero bits; each bit adds one conjectured soundness bit (the
        attacker pays 2^bits transcript attempts).  Prover-side cost is
        ~2^bits Poseidon2-Fr permutations (host)."""
        base_state, base_pos = list(self._state), self._pos
        try:
            from ..native import poseidon_fr as nfr

            if nfr.available():
                nonce = nfr.grind(
                    base_state, base_pos,
                    pfr._sha_to_fr("ezt-absorb-fr/grind"),
                    pfr._sha_to_fr("ezt-challenge-fr/grind-ok"),
                    bits,
                )
                if nonce is not None:
                    # replay on this transcript to advance its state
                    self.absorb("grind", [nonce])
                    c = self.challenge_fr("grind-ok")
                    assert c & ((1 << bits) - 1) == 0
                    return nonce
        except Exception:
            pass  # toolchain unavailable: python fallback below
        nonce = 0
        while True:
            self._state, self._pos = list(base_state), base_pos
            self.absorb("grind", [nonce])
            c = self.challenge_fr("grind-ok")
            if c & ((1 << bits) - 1) == 0:
                return nonce
            nonce += 1

    def grind_check(self, nonce: int, bits: int) -> bool:
        """Verifier side: replay the nonce, check the zero bits."""
        self.absorb("grind", [int(nonce)])
        c = self.challenge_fr("grind-ok")
        return c & ((1 << bits) - 1) == 0

    def challenge_gl(self, label: str) -> int:
        """A canonical Goldilocks challenge: low 63 bits of one squeeze."""
        return self.challenge_fr(label) & ((1 << GL_CHALLENGE_BITS) - 1)

    def challenges_gl(self, label: str, n: int) -> list[int]:
        return [self.challenge_gl(f"{label}/{i}") for i in range(n)]

    def challenge_index(self, label: str, domain_size: int) -> int:
        mask = domain_size - 1
        assert domain_size & mask == 0
        return self.challenge_fr(label) & mask

    def challenge_indices(self, label: str, n: int, domain_size: int) -> list[int]:
        return [self.challenge_index(f"{label}/{i}", domain_size) for i in range(n)]
